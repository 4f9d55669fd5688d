package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

class CmsSpec extends SparkSpec {

  private def items(ws: String*) =
    df("word STRING", ws.map(Row(_)))

  test("sketch has at most Depth*4096 cells and cell sums equal Depth*N") {
    val in = items(Seq.fill(50)("a") ++ Seq.fill(30)("b") ++
      (1 to 20).map(i => s"w$i"): _*)
    val cells = Cms.sketch(in, "word")
    val byRow = cells.groupBy(col("i")).agg(sum(col("cnt")).as("s"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    byRow.keySet shouldBe (0 until Cms.Depth).toSet
    byRow.values.foreach(_ shouldBe 100L) // every row counts every item
    cells.count() should be <= (Cms.Depth * 4096).toLong
  }

  test("estimates never undercount, and are exact when no bucket collides") {
    val in = items(Seq.fill(7)("alpha") ++ Seq.fill(3)("beta") ++
      Seq("gamma"): _*)
    val est = Cms.estimates(in.distinct(), "word", Cms.sketch(in, "word"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = Map("alpha" -> 7L, "beta" -> 3L, "gamma" -> 1L)
    exact.foreach { case (w, c) => est(w) should be >= c }
    // 3 words over 4096 buckets: verify this corpus is collision-free
    // per row, so the one-sided bound is tight here
    val cellCount = Cms.sketch(in, "word").count()
    if (cellCount == Cms.Depth * 3L) est shouldBe exact
  }

  test("never-seen candidates get est 0, not dropped or inflated") {
    // An empty bucket has no cell row; the probe must count it as 0 —
    // an inner join drops a fully-missing candidate and reports
    // min-over-present-cells (inflated) when only some buckets miss.
    val in = items(Seq.fill(5)("alpha") ++ Seq.fill(2)("beta"): _*)
    val cands = items("alpha", "beta", "never_seen_1", "never_seen_2")
    val est = Cms.estimates(cands, "word", Cms.sketch(in, "word"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    est.keySet shouldBe Set("alpha", "beta", "never_seen_1", "never_seen_2")
    est("never_seen_1") shouldBe 0L
    est("never_seen_2") shouldBe 0L
    est("alpha") should be >= 5L
    est("beta") should be >= 2L
  }

  test("property: estimates never undercount on random multisets") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    val corpus = Gen.chooseNum(1, 40).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf((1 to 12).map(i => s"w$i"))))
    val prop = Prop.forAll(corpus) { ws =>
      val in = items(ws: _*)
      val est = Cms.estimates(in.distinct(), "word", Cms.sketch(in, "word"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val exact = ws.groupBy(identity).view.mapValues(_.size.toLong)
      exact.forall { case (w, c) => est(w) >= c }
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(8), prop)
    assert(res.passed, res.status.toString)
  }

  test("sketch maintained by a streaming aggregation equals the batch sketch") {
    // The merge-by-addition property is exactly what makes the sketch a
    // streaming aggregate: complete-mode groupBy over a MemoryStream
    // must land on the identical cell table, microbatching included.
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val ws = Seq.fill(9)("alpha") ++ Seq.fill(4)("beta") ++ Seq("gamma", "delta")
    val ms = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[String]
    val q = Cms.sketch(ms.toDF().toDF("word"), "word")
      .writeStream.format("memory").queryName("cms_stream")
      .outputMode("complete").start()
    try {
      ms.addData(ws.take(7): _*)  // two microbatches: merge must hold
      q.processAllAvailable()
      ms.addData(ws.drop(7): _*)
      q.processAllAvailable()
      val streamed = spark.table("cms_stream")
        .collect().map(r => (r.getInt(0), r.getString(1)) -> r.getLong(2)).toMap
      val batch = Cms.sketch(items(ws: _*), "word")
        .collect().map(r => (r.getInt(0), r.getString(1)) -> r.getLong(2)).toMap
      streamed shouldBe batch
    } finally q.stop()
  }

  test("merge is cell-wise addition: sketch(A ++ B) = sketch(A) + sketch(B)") {
    val a = items("x", "x", "y")
    val b = items("y", "z")
    val merged = Cms.sketch(a.unionAll(b), "word")
      .collect().map(r => (r.getInt(0), r.getString(1)) -> r.getLong(2)).toMap
    val summed = Cms.sketch(a, "word").unionByName(Cms.sketch(b, "word"))
      .groupBy(col("i"), col("bucket")).agg(sum(col("cnt")).as("cnt"))
      .collect().map(r => (r.getInt(0), r.getString(1)) -> r.getLong(2)).toMap
    merged shouldBe summed
  }

  test("maintainSketch ≡ fresh sketch over the new stream (incl. count-to-zero drop)") {
    // old stream: x×3, y×2, z×1; delta removes one x, removes z entirely
    // (its cells must COUNT TO ZERO and drop — a fresh build never emits
    // them), and adds two w. New stream: x×2, y×2, w×2.
    val oldItems = items("x", "x", "x", "y", "y", "z")
    val minus = items("x", "z")
    val plus = items("w", "w")
    val newItems = items("x", "x", "y", "y", "w", "w")
    val inc = Cms.maintainSketch(Cms.sketch(oldItems, "word"),
        minus, plus, "word")
      .collect().map(r => (r.getInt(0), r.getString(1)) -> r.getLong(2)).toMap
    val fresh = Cms.sketch(newItems, "word")
      .collect().map(r => (r.getInt(0), r.getString(1)) -> r.getLong(2)).toMap
    inc shouldBe fresh
  }

  test("maintainServeLocal treats a NULL panel predicate as not-in-panel (no NPE)") {
    // A null predicate value (e.g. a null doc attribute) must behave
    // exactly as the distributed tier's filter — the row is simply not
    // in the panel — instead of NPE-ing inside the one-task fold.
    val prevCells = df("i INT, bucket STRING, cnt BIGINT", Seq.empty)
    val prevHashes = df("doc_id BIGINT, content_hash STRING", Seq.empty)
    val oldDocs = df("doc_id BIGINT, text STRING", Seq.empty)
    val newDocs = df("doc_id BIGINT, text STRING, flag BOOLEAN", Seq(
      Row(1L, "alpha beta", java.lang.Boolean.TRUE),
      Row(2L, "gamma", null),
      Row(3L, "delta", java.lang.Boolean.FALSE)))
    val out = Cms.maintainServeLocal(prevCells, prevHashes, oldDocs, newDocs,
        "doc_id", "text", col("flag"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // Panel = words of the flag=true doc only; every word of all three
    // docs still entered the sketch (est counts the full stream).
    out shouldBe Map("alpha" -> 1L, "beta" -> 1L)
  }
}
