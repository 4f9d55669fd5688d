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
}
