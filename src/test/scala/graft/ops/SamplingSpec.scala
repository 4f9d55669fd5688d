package graft.ops

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.SparkSpec

class SamplingSpec extends SparkSpec {

  private def keys(n: Int) = df("k BIGINT", (0L until n.toLong).map(Row(_)))

  test("hashBucket lands in [0, buckets) and is deterministic across runs") {
    val d = keys(500)
    val b1 = collectCol[Int](d.select(Sampling.hashBucket(col("k")).as("b")))
    b1.foreach { b => b should (be >= 0 and be < 100) }
    val b2 = collectCol[Int](d.select(Sampling.hashBucket(col("k")).as("b")))
    b1 shouldBe b2
  }

  test("split covers all folds with roughly the requested proportions") {
    val counts = keys(2000)
      .select(Sampling.split(col("k")).as("s"))
      .groupBy("s").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    counts.keySet shouldBe Set("train", "val", "test")
    // 80/10/10 with 2-hex-char granularity: generous tolerance, the point
    // is gross proportionality + total preservation, not exactness
    counts("train").toDouble / 2000 should (be > 0.7 and be < 0.9)
    counts.values.sum shouldBe 2000
  }

  test("split is a pure function of the key — disjoint folds, rerun-stable") {
    val d = keys(300).select(col("k"), Sampling.split(col("k")).as("s"))
    d.groupBy("k").agg(countDistinct("s").as("n"))
      .filter(col("n") > 1).count() shouldBe 0
  }

  test("keep(pct) uses a salted key: sample membership doesn't equal fold membership") {
    val d = keys(1000).select(
      Sampling.hashBucket(col("k")).as("fold_bucket"),
      Sampling.keep(col("k"), 50).as("kept"))
    // if keep() reused the fold bucket, kept would be exactly fold_bucket<50
    val disagree = d.filter((col("fold_bucket") < 50) =!= col("kept")).count()
    disagree should be > 0L
  }

  test("invalid parameters are rejected") {
    an[IllegalArgumentException] should be thrownBy Sampling.hashBucket(col("k"), 0)
    an[IllegalArgumentException] should be thrownBy Sampling.split(col("k"), 95, 10)
    an[IllegalArgumentException] should be thrownBy Sampling.keep(col("k"), 101)
  }
}
