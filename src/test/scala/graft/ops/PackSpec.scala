package graft.ops

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.SparkSpec

class PackSpec extends SparkSpec {

  private def docs(n: Int) = df(
    "doc_id BIGINT, text STRING",
    (0L until n.toLong).map(i => Row(i, ("w " * (10 + (i % 30).toInt)).trim)))

  test("packSequences: offsets tile each sequence contiguously in doc order") {
    val packed = Pack.packSequences(docs(400), "doc_id", "text",
      budget = 64, shards = 4)
    // within a shard, documents in id order have strictly increasing
    // (seq_id, seq_offset) and each doc starts where the previous ended
    // (modulo the budget roll-over)
    val rows = packed.orderBy("shard", "doc_id")
      .collect().groupBy(_.getAs[Int]("shard"))
    rows.values.foreach { rs =>
      var cum = 0L
      rs.foreach { r =>
        val start = r.getAs[Long]("seq_id") * 64 + r.getAs[Long]("seq_offset")
        start shouldBe cum
        cum += r.getAs[Int]("n_tokens")
      }
    }
  }

  test("packSequences: a document never starts past the budget boundary") {
    val packed = Pack.packSequences(docs(400), "doc_id", "text",
      budget = 64, shards = 4)
    packed.filter(col("seq_offset") < 0 || col("seq_offset") >= 64)
      .count() shouldBe 0
  }

  test("packSequences is deterministic and total (one row per doc)") {
    val d = docs(250)
    val p1 = Pack.packSequences(d, "doc_id", "text", budget = 128, shards = 8)
    p1.count() shouldBe 250
    val p2 = Pack.packSequences(d, "doc_id", "text", budget = 128, shards = 8)
    p1.exceptAll(p2).count() shouldBe 0
  }

  test("packSequencesBy packs on the provided counts, not the text proxy") {
    // counts chosen so the hand-checkable tiling differs from any
    // word-count derivation: doc i carries 100+i tokens, budget 256
    val counts = df("doc_id BIGINT, n BIGINT",
      (0L until 6L).map(i => Row(i, 100L + i)))
    val packed = Pack.packSequencesBy(counts, "doc_id", "n",
      budget = 256, shards = 1)
    val rows = packed.orderBy("doc_id").collect()
      .map(r => (r.getAs[Long]("n_tokens"), r.getAs[Long]("seq_id"), r.getAs[Long]("seq_offset")))
    // running starts: 0,100,201,303,406,510 -> seq floor(start/256)
    rows.toSeq shouldBe Seq(
      (100L, 0L, 0L), (101L, 0L, 100L), (102L, 0L, 201L),
      (103L, 1L, 47L), (104L, 1L, 150L), (105L, 1L, 254L))
  }

  test("mixtureResample: integer weights emit exactly weight/100 epochs") {
    val out = Pack.mixtureResample(docs(100), "doc_id", lit(300))
    out.count() shouldBe 300
    out.groupBy("doc_id").count().filter(col("count") =!= 3).count() shouldBe 0
  }

  test("mixtureResample: fractional weight keeps ~pct% deterministically") {
    val d = docs(1000)
    val out = Pack.mixtureResample(d, "doc_id", lit(25))
    val n = out.count()
    n.toDouble should (be > 150.0 and be < 350.0) // md5-bucket ~25%
    out.agg(max("epoch")).collect()(0).getInt(0) shouldBe 1
    // rerun-stable: the kept multiset is identical
    Pack.mixtureResample(d, "doc_id", lit(25)).exceptAll(out).count() shouldBe 0
  }

  test("mixtureResample: 250 = every doc twice plus ~half a third time") {
    val out = Pack.mixtureResample(docs(1000), "doc_id", lit(250))
    val perDoc = out.groupBy("doc_id").count()
    perDoc.filter(col("count") < 2 || col("count") > 3).count() shouldBe 0
    perDoc.count() shouldBe 1000
    val extra = out.count() - 2000
    extra.toDouble should (be > 350.0 and be < 650.0)
  }
}
