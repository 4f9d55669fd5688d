package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.types.StructType

/** JSON-lines source/sink — the second text format after the `|`-CSV path
  * ([[Csv]]): one JSON object per line, the interchange format most LLM
  * corpus tooling emits.
  *
  * Reads ALWAYS take an explicit schema (SURVEY §2.1 S3 — same rule as
  * CSV/parquet ingest): schema inference re-reads the whole input and
  * races against drift, both unacceptable at 100 TB. Spark's JSON writer
  * omits null fields per row; reading back through the explicit schema
  * restores them as nulls, so a write→read round-trip is lossless on
  * typed columns (asserted by the q51 oracle).
  */
object Jsonl {

  def write(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).json(path)

  def read(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).json(path)

  /** Read with malformed-line QUARANTINE — what a production ingest runs
    * against upstream drops it does not control: PERMISSIVE mode routes
    * every unparseable line's raw text into `_corrupt_record` (typed
    * columns null) instead of failing the job or silently dropping the
    * line, so the caller can count, audit, and re-drive quarantined
    * rows. The returned frame carries `schema` plus the string
    * `_corrupt_record` column. */
  def readWithQuarantine(spark: SparkSession, path: String,
                         schema: StructType): DataFrame =
    spark.read
      .schema(schema.add("_corrupt_record", org.apache.spark.sql.types.StringType))
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .json(path)
}
