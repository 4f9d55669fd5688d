package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

class DateDimSpec extends SparkSpec {

  private lazy val week = DateDim.dateDim(spark, "2024-01-01", "2024-01-07")

  test("row count and date_key format (F13)") {
    week.count() shouldBe 7
    collectCol[Int](week.orderBy("full_date").select("date_key")).head shouldBe 20240101
  }

  test("PG DOW offset: Sunday=0..Saturday=6, weekend flag (F12 quirk)") {
    // 2024-01-07 is a Sunday.
    val sun = week.filter(col("full_date") === "2024-01-07")
    collectCol[Int](sun.select("day_of_week")) shouldBe Seq(0)
    collectCol[Boolean](sun.select("is_weekend")) shouldBe Seq(true)
    val mon = week.filter(col("full_date") === "2024-01-01")
    collectCol[Int](mon.select("day_of_week")) shouldBe Seq(1)
    collectCol[Boolean](mon.select("is_weekend")) shouldBe Seq(false)
  }

  test("month/day names are trimmed full names (F14 divergence)") {
    collectCol[String](week.limit(1).select("month_name")) shouldBe Seq("January")
    collectCol[String](
      week.filter(col("full_date") === "2024-01-01").select("day_name")) shouldBe Seq("Monday")
  }
}
