package graft.ops

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.SparkSpec

class SimilaritySpec extends SparkSpec {

  private val vecs = df("id BIGINT, v ARRAY<FLOAT>", Seq(
    Row(0L, Seq(1.0f, 0.0f, 0.0f)),
    Row(1L, Seq(2.0f, 0.0f, 0.0f)),   // same direction as 0
    Row(2L, Seq(0.0f, 1.0f, 0.0f)),   // orthogonal to 0
    Row(3L, Seq(-1.0f, 0.0f, 0.0f)),  // opposite to 0
    Row(4L, Seq(1.0f, 1.0f, 0.0f))))

  test("cosine: parallel=1, orthogonal=0, opposite=-1") {
    val a = array(lit(1.0f), lit(0.0f))
    collectCol[Double](vecs.limit(1).select(
      Similarity.cosine(a, array(lit(3.0f), lit(0.0f))))) shouldBe Seq(1.0)
    collectCol[Double](vecs.limit(1).select(
      Similarity.cosine(a, array(lit(0.0f), lit(2.0f))))) shouldBe Seq(0.0)
    collectCol[Double](vecs.limit(1).select(
      Similarity.cosine(a, array(lit(-1.0f), lit(0.0f))))) shouldBe Seq(-1.0)
  }

  test("bruteForceTopK ranks by cosine desc, excludes the query itself") {
    val out = Similarity.bruteForceTopK(vecs, "id", "v", col("id") === 0, 4)
      .orderBy("rank").collect()
    out.map(_.getLong(1)).take(2) shouldBe Array(1L, 4L) // parallel first, 45° second
    out.map(_.getLong(1)) should not contain 0L
    out.map(_.getInt(3)) shouldBe Array(1, 2, 3, 4)
  }

  test("lshTopK returns ranked bucket-mates with exact cosines, never the query") {
    val out = Similarity.lshTopK(vecs, "id", "v", col("id") === 0, 4, tables = 4, bits = 4)
      .collect()
    out.foreach { r =>
      r.getLong(0) shouldBe 0L
      r.getLong(1) should not be 0L
    }
    // any candidate it does return must carry the true cosine
    val brute = Similarity.bruteForceTopK(vecs, "id", "v", col("id") === 0, 4)
      .collect().map(r => r.getLong(1) -> r.getDouble(2)).toMap
    out.foreach(r => r.getDouble(2) shouldBe brute(r.getLong(1)))
  }
}
