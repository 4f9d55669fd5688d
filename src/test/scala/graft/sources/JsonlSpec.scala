package graft.sources

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

import graft.SparkSpec

class JsonlSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("id", LongType),
    StructField("text", StringType),
    StructField("score", DoubleType)))

  test("write→read round-trip is lossless, including nulls and JSON-hostile text") {
    val rows = Seq(
      Row(1L, "plain", 1.5),
      Row(2L, null, 2.25),                       // null field: writer drops it,
      Row(3L, "quote \" backslash \\ tab\t", null), // schema-read restores it
      Row(4L, "newline\ninside", -0.125),
      Row(5L, "unicode: héllo wörld", 0.0))
    val d = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), schema)
    val path = graft.Tables.scratchDir(spark) + "/jsonl_spec"
    Jsonl.write(d, path)
    val back = Jsonl.read(spark, path, schema)
    back.schema shouldBe schema
    back.collect().sortBy(_.getLong(0)) shouldBe rows.sortBy(_.getLong(0))
  }
}
