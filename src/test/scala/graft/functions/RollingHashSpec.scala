package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.ops.TextStats

class RollingHashSpec extends SparkSpec {

  test("native expression equals the builtin HOF fold (BMP text)") {
    val d = strDf("s", Seq(
      "hello world", "", "a", "the quick brown fox", "héllo wörld",
      "punct!@# and  spaces", "ABC abc 123", null))
    val out = d.select(
      TextStats.rollingHash(col("s")).as("native"),
      TextStats.rollingHashHof(col("s")).as("hof")).collect()
    out.foreach { r => r.get(0) shouldBe r.get(1) }
  }

  test("known value: left fold of (acc*31 + codepoint) mod 1e9+7") {
    // "ab" -> ((0*31+97)*31+98) % M = 3105
    collectCol[Long](strDf("s", Seq("ab"))
      .select(TextStats.rollingHash(col("s")).as("h"))) shouldBe Seq(3105L)
  }

  test("normalization applies before hashing: case/whitespace-insensitive") {
    val d = strDf("s", Seq("Hello   World", "hello world"))
    collectCol[Long](d.select(TextStats.rollingHash(col("s")).as("h")))
      .distinct.size shouldBe 1
  }
}
