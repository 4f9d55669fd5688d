package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.ops.TextStats

class TokenEstimateSpec extends SparkSpec {

  test("native expression equals the builtin regex+fold form") {
    val d = strDf("s", Seq(
      "hello world", "", "a", "abcd", "abcde", "12345", "a1b2c3",
      "punct!@# and  spaces", "tabs\tand\nnewlines", "héllo wörld",
      "averyveryverylongsingleword", null))
    val out = d.select(
      TextStats.tokenEstimate(col("s")).as("native"),
      TextStats.tokenEstimateHof(col("s")).as("hof")).collect()
    out.foreach { r => r.get(0) shouldBe r.get(1) }
  }

  test("known values: ceil(run/4) for letter runs, 1 per digit/punct") {
    // "abcde" = one 5-letter run -> ceil(5/4) = 2
    // "12345" = five single digits -> 5
    // "a!b"   = 1 + 1 + 1 = 3
    val d = strDf("s", Seq("abcde", "12345", "a!b"))
    collectCol[Long](d.select(TextStats.tokenEstimate(col("s")).as("t"))) shouldBe
      Seq(2L, 5L, 3L)
  }
}
