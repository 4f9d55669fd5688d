package graft.ops

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

import graft.SparkSpec

class ExactSpansSpec extends SparkSpec {

  private def docs(rows: (Long, String)*) = {
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType)))
    spark.createDataFrame(spark.sparkContext.parallelize(
      rows.map { case (i, t) => Row(i, t) }, 2), schema)
  }

  private def run(rows: (Long, String)*) =
    ExactSpans.dedupSpans(docs(rows: _*), "doc_id", "text", spanLen = 5)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3))))
      .toMap

  test("cross-document span keeps the globally-first occurrence, cuts the rest") {
    val out = run(
      1L -> "a b c d e f",
      2L -> "x a b c d e")
    out(1L) shouldBe ((6L, 0L, "a b c d e f")) // canonical: untouched
    out(2L) shouldBe ((6L, 5L, "x"))           // span cut, prefix survives
  }

  test("in-document repetition self-dedups: second run of the span is removed") {
    val out = run(3L -> "a b c d e a b c d e")
    out(3L) shouldBe ((10L, 5L, "a b c d e"))
  }

  test("overlapping marked spans union through the mask (can empty a doc)") {
    // doc 3 carries BOTH 5-spans whose canonicals live in docs 1 and 2;
    // their covered ranges 1..5 and 2..6 union to all six tokens.
    val out = run(
      1L -> "p q r s t",
      2L -> "q r s t u",
      3L -> "p q r s t u")
    out(1L) shouldBe ((5L, 0L, "p q r s t"))
    out(2L) shouldBe ((5L, 0L, "q r s t u"))
    out(3L) shouldBe ((6L, 6L, ""))
  }

  test("documents shorter than the span length pass through untouched") {
    val out = run(4L -> "a b c", 5L -> "a b c")
    out(4L) shouldBe ((3L, 0L, "a b c"))
    out(5L) shouldBe ((3L, 0L, "a b c"))
  }
}
