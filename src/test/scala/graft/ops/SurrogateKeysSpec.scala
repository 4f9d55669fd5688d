package graft.ops

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.SparkSpec

class SurrogateKeysSpec extends SparkSpec {

  private def names(n: Int) =
    df("name STRING", scala.util.Random.shuffle((1 to n).toList).map(i => Row(f"n$i%05d")))

  test("rowNumberKey: dense 1..N in order (W1)") {
    val keyed = SurrogateKeys.rowNumberKey(names(50), "k", Seq("name"))
    collectCol[Int](keyed.orderBy("name").select("k")) shouldBe (1 to 50)
  }

  test("denseRankKey: identical result to global row_number, distributed") {
    val d = names(500).repartition(7)
    val dist = SurrogateKeys.denseRankKey(d, "k", Seq("name"))
      .select(col("name"), col("k"))
    val global = SurrogateKeys.rowNumberKey(d, "k", Seq("name"))
      .select(col("name"), col("k").cast("long"))
    dist.exceptAll(global).count() shouldBe 0
    global.exceptAll(dist).count() shouldBe 0
  }

  test("denseRankKey: keys are dense 1..N (no gaps, no dups)") {
    val keyed = SurrogateKeys.denseRankKey(names(200), "k", Seq("name"))
    collectCol[Long](keyed.orderBy("k").select("k")) shouldBe (1L to 200L)
  }

  test("prefixSum matches a single-partition window exclusive sum") {
    import spark.implicits._
    val d = (1 to 5000).map(i => ((i * 2654435761L) % 997, i.toLong, (i % 7 + 1).toLong))
      .toDF("a", "b", "w")
    val got = SurrogateKeys.prefixSum(d, "w", "pre", Seq("a", "b"))
    val expected = d.withColumn("pre",
      coalesce(sum(col("w")).over(
        org.apache.spark.sql.expressions.Window.orderBy(col("a"), col("b"))
          .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)),
        lit(0L)))
    got.exceptAll(expected).count() shouldBe 0
    expected.exceptAll(got).count() shouldBe 0
  }

  test("denseRankKey: dense at 300k rows over a checkpointed input (two-reader divergence regression)") {
    // Round-13 regression: with a LogicalRDD (checkpointed) input at
    // ~270k rows, the offsets pass and the row-number pass could read
    // the range exchange through DIVERGENT physical instances (different
    // sampled boundaries / AQE coalescing), producing gapped or
    // duplicated keys — every small-input run stayed correct, which is
    // why only the q146 sf0.1 differential caught it. The fix freezes
    // one ranged layout (localCheckpoint inside denseRankKey); this pins
    // density at a size and input shape that reproduced the divergence.
    import spark.implicits._
    val big = (1 to 300000).map(i => (i * 2654435761L % 1000003, i))
      .toDF("a", "b").localCheckpoint()
    val keyed = SurrogateKeys.denseRankKey(big, "k", Seq("a", "b"))
    val agg = keyed.agg(count(lit(1)), countDistinct(col("k")),
      max(col("k")), min(col("k"))).head
    agg.getLong(0) shouldBe 300000L
    agg.getLong(1) shouldBe 300000L
    agg.getLong(2) shouldBe 300000L
    agg.getLong(3) shouldBe 1L
  }
}
