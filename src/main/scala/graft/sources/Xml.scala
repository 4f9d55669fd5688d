package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.types.StructType

/** XML source/sink over Spark 4's built-in XML datasource — the third
  * text format after `|`-CSV ([[Csv]]) and JSON-lines ([[Jsonl]]):
  * one `<rowTag>` element per record, the interchange format of
  * article dumps (Wikipedia/PubMed-style exports) an LLM corpus
  * pipeline ingests.
  *
  * Reads ALWAYS take an explicit schema (SURVEY §2.1 S3 — same rule as
  * CSV/JSONL/parquet ingest): schema inference re-reads the whole
  * input and races against drift, both unacceptable at 100 TB. The
  * writer entity-escapes markup characters and omits null fields;
  * reading back through the explicit schema restores them as nulls, so
  * a write→read round-trip is lossless on typed columns (asserted by
  * the q156 oracle).
  *
  * DELIBERATELY NO `readWithQuarantine` counterpart: XML records are
  * not line-delimited, so a malformed record does not fail in
  * isolation — the tokenizer loses the record boundary and a single
  * bad element can swallow every following record in its input split
  * into one corrupt blob (measured on this build: one unclosed tag
  * collapsed a 4-record file to 2 rows). Per-record quarantine over
  * drift-prone feeds belongs to the line-delimited formats
  * ([[Jsonl.readWithQuarantine]], [[Csv.readWithQuarantine]]); XML
  * ingest should validate upstream or convert to JSONL first.
  */
object Xml {

  /** The record element name: `<doc>...</doc>` per row. */
  val RowTag = "doc"

  def write(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite)
      .option("rowTag", RowTag).format("xml").save(path)

  def read(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).option("rowTag", RowTag)
      .format("xml").load(path)
}
