package graft.sources

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

import graft.SparkSpec

class CsvSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("id", IntegerType),
    StructField("s", StringType),
    StructField("d", DoubleType)))

  private val rows = Seq(
    Row(1, null, 1.5),
    Row(2, "", 2.25),
    Row(3, "plain", null),
    Row(4, "with|pipe", 0.1 + 0.2), // delimiter + non-terminating double
    Row(5, "with,comma", -7.0))

  private def roundtrip(sep: String): Seq[Row] = {
    val path = s"/root/repo/target/csv_spec/${sep.hashCode}"
    Csv.write(df("id INT, s STRING, d DOUBLE", rows), path, sep)
    Csv.read(spark, path, schema, sep).orderBy("id").collect().toSeq
  }

  test("pipe CSV round-trip: NULL vs empty string preserved (S1, PG semantics)") {
    val back = roundtrip("|")
    back.map(_.isNullAt(1)) shouldBe Seq(true, false, false, false, false)
    back(1).getString(1) shouldBe ""
    back(3).getString(1) shouldBe "with|pipe" // quoted by writer
  }

  test("doubles survive exactly; null numerics stay null") {
    val back = roundtrip("|")
    back(3).getDouble(2) shouldBe (0.1 + 0.2)
    back(2).isNullAt(2) shouldBe true
  }

  test("comma CSV (S2 mapping-file dialect)") {
    val back = roundtrip(",")
    back.map(_.getInt(0)) shouldBe Seq(1, 2, 3, 4, 5)
    back(4).getString(1) shouldBe "with,comma"
  }

  test("bronze studies ingest: the 71-column AACT export parses typed end-to-end") {
    import graft.schema.Schemas
    Schemas.studies.fields.length shouldBe 71
    // one pipe-delimited line shaped like the AACT studies.txt export:
    // mostly-\N row with typed islands (dates, ints, timestamp, texts)
    val fields = Schemas.studies.fields.map(_.name)
    val vals: Map[String, String] = Map(
      "nct_id" -> "NCT00000102",
      "study_first_submitted_date" -> "1999-10-18",
      "start_date" -> "2000-01-01",
      "brief_title" -> "Congenital Adrenal Hyperplasia: Calcium Channels as Therapeutic Targets",
      "overall_status" -> "Completed",
      "phase" -> "Phase 1/Phase 2",
      "enrollment" -> "18",
      "number_of_arms" -> "2",
      "created_at" -> "2024-01-02T03:04:05.000Z",
      "why_stopped" -> "") // quoted-empty: stays a string, not NULL
    val header = fields.mkString("|")
    val line = fields.map {
      case "why_stopped" => "\"\""
      case f => vals.getOrElse(f, "\\N")
    }.mkString("|")
    val path = "/root/repo/target/csv_spec/studies"
    val dir = new java.io.File(path)
    dir.mkdirs()
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$path/part-0.csv"), s"$header\n$line\n")
    val back = Csv.read(spark, path, Schemas.studies).collect()
    back.length shouldBe 1
    val r = back(0)
    r.getAs[String]("nct_id") shouldBe "NCT00000102"
    r.getAs[java.sql.Date]("start_date").toString shouldBe "2000-01-01"
    r.getAs[Int]("enrollment") shouldBe 18
    r.getAs[Int]("number_of_arms") shouldBe 2
    r.getAs[java.sql.Timestamp]("created_at") should not be null
    r.getAs[String]("why_stopped") shouldBe ""
    r.isNullAt(r.fieldIndex("completion_date")) shouldBe true   // \N → NULL date
    r.isNullAt(r.fieldIndex("number_of_groups")) shouldBe true  // \N → NULL int
  }

  test("readWithQuarantine nulls only the failed field and keeps the raw line") {
    val path = graft.Tables.scratchDir(spark) + "/csv_quarantine_spec"
    spark.createDataFrame(
        spark.sparkContext.parallelize(Seq(
          Row("id|s|d"),
          Row("1|ok|1.5"),
          Row("oops|partial|2.5"),  // type garbage in id: id nulls, s/d keep
          Row("3|fine|notanumber")  // type garbage in d
        ), 1),
        StructType(Seq(StructField("value", StringType))))
      .write.mode("overwrite").text(path)
    val back = Csv.readWithQuarantine(spark, path, schema)
      .collect().sortBy(r => Option(r.getAs[String]("s")).getOrElse(""))
    back.length shouldBe 3
    val byS = back.map(r => r.getAs[String]("s") -> r).toMap
    byS("ok").isNullAt(3) shouldBe true // no corrupt record
    byS("ok").getInt(0) shouldBe 1
    val p2 = byS("partial")
    p2.isNullAt(0) shouldBe true               // failed field nulls...
    p2.getDouble(2) shouldBe 2.5               // ...parseable ones survive
    p2.getString(3) shouldBe "oops|partial|2.5" // raw line quarantined
    val p3 = byS("fine")
    p3.getInt(0) shouldBe 3
    p3.isNullAt(2) shouldBe true
    p3.getString(3) shouldBe "3|fine|notanumber"
  }
}
