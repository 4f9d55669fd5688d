package graft.ops

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkSpec

class TopNSpec extends SparkSpec {

  import spark.implicits._

  // Skewed input: one mega-key with 5000 rows, a mid key with 37, a key
  // with fewer rows than N, and a singleton. Scores collide heavily so
  // the doc-id tiebreaker does real work.
  private def skewed = (
    (1 to 5000).map(i => ("mega", i.toLong, (i % 17).toLong)) ++
      (1 to 37).map(i => ("mid", 10000L + i, (i % 5).toLong)) ++
      (1 to 3).map(i => ("tiny", 20000L + i, i.toLong)) ++
      Seq(("one", 30000L, 42L))
    ).toDF("key", "id", "score")

  test("salted two-phase top-N equals the single-window ranking exactly") {
    val n = 10
    val fast = TopN.saltedTopNPerKey(skewed,
      key = Seq(col("key")), order = Seq(col("score").desc, col("id")),
      tiebreaker = col("id"), n = n, salts = 8)
      .select("key", "id", "score", "rank")
    val w = Window.partitionBy(col("key")).orderBy(col("score").desc, col("id"))
    val naive = skewed.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= n)
      .select("key", "id", "score", "rank")
    fast.collect().map(_.toSeq).sortBy(_.toString) shouldBe
      naive.collect().map(_.toSeq).sortBy(_.toString)
  }

  test("keys with fewer than N rows keep every row, rank still 1-based dense") {
    val out = TopN.saltedTopNPerKey(skewed,
      key = Seq(col("key")), order = Seq(col("score").desc, col("id")),
      tiebreaker = col("id"), n = 10)
      .filter(col("key").isin("tiny", "one"))
      .select("key", "rank").as[(String, Int)].collect().toSet
    out shouldBe Set(("tiny", 1), ("tiny", 2), ("tiny", 3), ("one", 1))
  }

  test("salts=1 degenerates to the plain ranking (still correct)") {
    val out = TopN.saltedTopNPerKey(skewed,
      key = Seq(col("key")), order = Seq(col("score").desc, col("id")),
      tiebreaker = col("id"), n = 3, salts = 1)
      .filter(col("key") === "mega")
      .select("id", "rank").as[(Long, Int)].collect().sortBy(_._2)
    // score = i % 17, max score 16 first at ids 16, 33, 50
    out.map(_._1).toSeq shouldBe Seq(16L, 33L, 50L)
    out.map(_._2).toSeq shouldBe Seq(1, 2, 3)
  }
}
