package graft.ops

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpec

class QualityFilterSpec extends SparkSpec {

  // Two docs, features hand-controlled: A is "the"-dense (y=+1), B is not
  // (y=-1). n_chars is pinned to 10 for both so the char feature carries
  // no signal. x_A=(1,10,10,10), x_B=(1,2,10,0).
  private def docs = {
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType),
      StructField("lang", StringType), StructField("n_chars", LongType)))
    spark.createDataFrame(spark.sparkContext.parallelize(Seq(
      Row(1L, "the the the the the the the the the the", "en", 10L),
      Row(2L, "aa bb", "zh", 10L)), 2), schema)
  }

  private def train(rounds: Int) =
    QualityFilter.trainPerceptron(docs, "doc_id", "text", "n_chars",
      when(col("lang") === "en", 1L).otherwise(-1L), rounds)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))

  test("the hand-computed perceptron recurrence, round by round") {
    // w0=0 -> round 1 flags both: w1 = x_A - x_B = (0,8,0,10)
    // round 2: margin_A=180 ok, margin_B=16 flagged -> w2 = (-1,6,-10,10)
    // round 3: margin_A=59 ok, margin_B=-89 ok -> CONVERGED, w3 = w2
    val out = train(3)
    val w = out.filter(_._1 == "w").map(t => (t._2, t._3) -> t._4).toMap
    (0 to 3).map(j => w((1L, j.toLong))) shouldBe Seq(0L, 8L, 0L, 10L)
    (0 to 3).map(j => w((2L, j.toLong))) shouldBe Seq(-1L, 6L, -10L, 10L)
    (0 to 3).map(j => w((3L, j.toLong))) shouldBe Seq(-1L, 6L, -10L, 10L)
  }

  test("converged corpus separates: final predictions match labels") {
    val d = train(3).filter(_._1 == "d").map(t => t._2 -> (t._3, t._4)).toMap
    d(1L) shouldBe ((1L, 59L))   // "the"-dense doc: +1, margin 59
    d(2L) shouldBe ((-1L, -89L)) // word-soup doc: -1, margin -89
  }

  test("custom feature vectors widen k without changing the recurrence") {
    // k=2: bias + word count. w0=0 -> round 1 flags both:
    // w1 = (1,10) - (1,2) = (0,8). round 2: m_A=80 ok, m_B=16 flagged
    // -> w2 = (-1,6). round 3: m_A=59 ok, m_B=-(1)-... = -1+12=11>0
    // flagged (y=-1, y*m=-11<=0... m_B = -1+6*2 = 11, y*m = -11 <= 0)
    // -> w3 = (-2,4).
    val out = QualityFilter.trainPerceptronFeatures(docs, "doc_id",
      when(col("lang") === "en", 1L).otherwise(-1L),
      Seq(lit(1L), TextStats.wordCount(col("text")).cast("long")),
      rounds = 3)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val w = out.filter(_._1 == "w").map(t => (t._2, t._3) -> t._4).toMap
    (0 to 1).map(j => w((1L, j.toLong))) shouldBe Seq(0L, 8L)
    (0 to 1).map(j => w((2L, j.toLong))) shouldBe Seq(-1L, 6L)
    (0 to 1).map(j => w((3L, j.toLong))) shouldBe Seq(-2L, 4L)
  }

  test("post-convergence rounds are an exact no-op (empty flagged set)") {
    val out = train(4)
    val w = out.filter(_._1 == "w").map(t => (t._2, t._3) -> t._4).toMap
    (0 to 3).map(j => w((4L, j.toLong))) shouldBe Seq(-1L, 6L, -10L, 10L)
    // doc rows unchanged by the extra round
    val d = out.filter(_._1 == "d").map(t => t._2 -> (t._3, t._4)).toMap
    d(1L) shouldBe ((1L, 59L))
    d(2L) shouldBe ((-1L, -89L))
  }
}
