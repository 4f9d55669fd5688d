package graft.ops

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.SparkSpec

class CleaningSpec extends SparkSpec {

  test("fillSentinel replaces only nulls") {
    val out = collectCol[String](
      strDf("c", Seq("x", null, ""))
        .select(Cleaning.fillSentinel(col("c"), "Unknown")))
    out shouldBe Seq("x", "Unknown", "")
  }

  test("boolTfToYesNo maps t/f and everything else to Unknown") {
    val out = collectCol[String](
      strDf("c", Seq("t", "f", null, "T", "yes"))
        .select(Cleaning.boolTfToYesNo(col("c"))))
    out shouldBe Seq("Yes", "No", "Unknown", "Unknown", "Unknown")
  }

  test("capped: null→0, above cap→cap, else passthrough; flag mirrors") {
    val d = df("v INT", Seq(Row(null), Row(5), Row(99)))
    collectCol[Int](d.select(Cleaning.capped(col("v"), lit(10)))) shouldBe Seq(0, 5, 10)
    collectCol[String](d.select(Cleaning.cappedFlag(col("v"), lit(10)))) shouldBe
      Seq("Missing", "Original", "Capped")
  }

  test("imputeFutureDate: null or beyond asOf → fallback; flag mirrors (F11)") {
    val d = df("d DATE", Seq(Row(null),
      Row(java.sql.Date.valueOf("2020-01-01")),
      Row(java.sql.Date.valueOf("2030-01-01"))))
    val asOf = to_date(lit("2023-08-09"))
    collectCol[java.sql.Date](
      d.select(Cleaning.imputeFutureDate(col("d"), to_date(lit("1999-09-17")), asOf)))
      .map(_.toString) shouldBe Seq("1999-09-17", "2020-01-01", "1999-09-17")
    collectCol[String](d.select(Cleaning.imputeFlag(col("d"), asOf))) shouldBe
      Seq("Imputed", "Actual", "Imputed")
  }
}
