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

  test("readWithQuarantine routes broken lines to _corrupt_record, parses the rest") {
    val path = graft.Tables.scratchDir(spark) + "/jsonl_quarantine_spec"
    spark.createDataFrame(
        spark.sparkContext.parallelize(Seq(
          Row("""{"id":1,"text":"ok","score":1.0}"""),
          Row("""{"id":2,"text":"truncated"""), // malformed: unterminated
          Row("""not json at all"""),
          Row("""{"id":4,"text":null,"score":-2.5}""")), 2),
        StructType(Seq(StructField("value", StringType))))
      .write.mode("overwrite").text(path)
    val back = Jsonl.readWithQuarantine(spark, path, schema)
    val rows = back.collect()
    rows.length shouldBe 4
    val bad = rows.filter(!_.isNullAt(3))
    bad.map(_.getString(3)).toSet shouldBe
      Set("""{"id":2,"text":"truncated""", "not json at all")
    bad.foreach { r => r.isNullAt(0) shouldBe true } // typed cols null
    val good = rows.filter(_.isNullAt(3)).sortBy(_.getLong(0))
    good.map(_.getLong(0)).toSeq shouldBe Seq(1L, 4L)
    good.head.getString(1) shouldBe "ok"
    // NOTE: Spark disallows scans whose projection references ONLY the
    // corrupt column (QUERY_ONLY_CORRUPT_RECORD_COLUMN) — consumers must
    // select it alongside typed columns, which q125 and the collect()
    // above both do.
  }
}
