package graft.ops

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpec

class LmScoreSpec extends SparkSpec {

  private def docs(rows: (Long, String)*) = {
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType)))
    spark.createDataFrame(spark.sparkContext.parallelize(
      rows.map { case (i, t) => Row(i, t) }, 2), schema)
  }

  test("bit-length weights, misses, and the averaged score are exact") {
    val d = docs(
      1L -> "a b a b",  // reference: bigrams "a b" x2, "b a" x1
      2L -> "a b c",    // reference: "a b", "b c" -> counts a_b=3, b_a=1, b_c=1
      20L -> "a b c d", // scored: bits(3)=2 + bits(1)=1 + miss 0 = 3 over 3
      21L -> "x")       // no bigrams
    val model = LmScore.trainCounts(d, "doc_id", "text", col("doc_id") < 10)
    val out = LmScore.score(d, "doc_id", "text", model)
      .collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))))
      .toMap
    out(20L) shouldBe ((3L, 2L, 3L, 1.0))
    out(21L) shouldBe ((0L, 0L, 0L, 0.0))
    // reference docs score against their own counts too
    out(2L) shouldBe ((2L, 2L, 3L, 1.5))
  }
}
