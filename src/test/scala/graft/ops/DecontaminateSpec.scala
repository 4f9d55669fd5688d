package graft.ops

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpec

class DecontaminateSpec extends SparkSpec {

  private def docs(rows: (Long, String)*) = {
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType)))
    spark.createDataFrame(spark.sparkContext.parallelize(
      rows.map { case (i, t) => Row(i, t) }, 2), schema)
  }

  // eval set = doc_id < 10; span length 5
  private def run(dropPct: Int, rows: (Long, String)*) =
    Decontaminate.removeEvalSpans(docs(rows: _*), "doc_id", "text",
      evalPred = col("doc_id") < 10, spanLen = 5, dropPct = dropPct)
      .collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getBoolean(3), r.getBoolean(4),
          r.getString(5))))
      .toMap

  test("eval spans are cut from training docs; eval docs never appear") {
    val out = run(50,
      0L -> "e1 e2 e3 e4 e5",
      11L -> "x1 x2 x3 x4 x5 x6 e1 e2 e3 e4 e5 y1",
      12L -> "p q r s t u")
    out.keySet shouldBe Set(11L, 12L)
    // 12 tokens, the 5-window at p=6 matches -> tokens 7..11 cut
    out(11L) shouldBe ((12L, 5L, true, true, "x1 x2 x3 x4 x5 x6 y1"))
    out(12L) shouldBe ((6L, 0L, false, true, "p q r s t u"))
  }

  test("docs past the drop threshold are dropped, not shredded") {
    val out = run(50,
      0L -> "e1 e2 e3 e4 e5",
      10L -> "a b e1 e2 e3 e4 e5 c")
    // 8 tokens, 5 removed = 62.5% > 50% -> dropped with empty text
    out(10L) shouldBe ((8L, 5L, true, false, ""))
  }

  test("EVERY matching occurrence is removed — no canonical survivor") {
    val out = run(95,
      0L -> "e1 e2 e3 e4 e5",
      13L -> "e1 e2 e3 e4 e5 z e1 e2 e3 e4 e5")
    out(13L) shouldBe ((11L, 10L, true, true, "z"))
  }

  test("training docs shorter than the span length pass through") {
    val out = run(50, 0L -> "e1 e2 e3 e4 e5", 14L -> "e1 e2 e3")
    out(14L) shouldBe ((3L, 0L, false, true, "e1 e2 e3"))
  }

  test("a corpus-sized eval window set fails fast instead of broadcasting") {
    // 3 eval docs x 2 windows each = 6 distinct windows > bound of 4:
    // the guard must trip BEFORE any broadcast with an actionable message.
    val d = docs(
      0L -> "a1 a2 a3 a4 a5 a6", 1L -> "b1 b2 b3 b4 b5 b6",
      2L -> "c1 c2 c3 c4 c5 c6", 11L -> "x1 x2 x3 x4 x5 x6")
    val e = intercept[Throwable] {
      Decontaminate.removeEvalSpans(d, "doc_id", "text",
        evalPred = col("doc_id") < 10, spanLen = 5, dropPct = 50,
        maxEvalWindows = 4L).collect()
    }
    // assert_true surfaces as a SparkRuntimeException (possibly wrapped)
    // carrying the actionable message somewhere in the cause chain
    val msgs = Iterator.iterate(e)(_.getCause).takeWhile(_ != null)
      .map(t => Option(t.getMessage).getOrElse("")).mkString(" | ")
    msgs should include("maxEvalWindows")
    // same predicate under the default bound still runs
    Decontaminate.removeEvalSpans(d, "doc_id", "text",
      evalPred = col("doc_id") < 10, spanLen = 5, dropPct = 50)
      .count() shouldBe 1L
  }
}
