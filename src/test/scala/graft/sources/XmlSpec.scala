package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

class XmlSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("doc_id", LongType), StructField("text", StringType),
    StructField("lang", StringType), StructField("n_chars", LongType)))

  test("write -> read round-trip is lossless: markup escaping, nulls, empty strings") {
    val rows = Seq(
      Row(1L, "a <b> & \"c\" 'd' </doc>", "en", 22L), // markup + fake close tag
      Row(2L, null, null, 5L),                        // null typed columns
      Row(3L, "plain", "fr", 0L))
    val src = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), schema)
    val path = s"${System.getProperty("java.io.tmpdir")}/graft-test-xml-rt"
    Xml.write(src, path)
    val back = Xml.read(spark, path, schema)
    back.schema.fields.map(f => (f.name, f.dataType)).toSeq shouldBe
      schema.fields.map(f => (f.name, f.dataType)).toSeq
    back.collect().sortBy(_.getLong(0)).toSeq shouldBe
      rows.sortBy(_.getLong(0))
  }

  test("empty-string vs null distinction survives when the writer is told to keep them") {
    // Spark's XML writer emits <text/> for "" and omits the element for
    // null — reading back through the schema must keep them distinct.
    val rows = Seq(Row(1L, "", "en", 0L), Row(2L, null, "en", 0L))
    val src = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1), schema)
    val path = s"${System.getProperty("java.io.tmpdir")}/graft-test-xml-null"
    Xml.write(src, path)
    val got = Xml.read(spark, path, schema).collect()
      .map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    got(1L) shouldBe Some("")
    got(2L) shouldBe None
  }
}
