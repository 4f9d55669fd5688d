package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.types.StructType

/** Delimited-text ingest (SURVEY §2.1 S1/S2) — the Spark analog of
  * `COPY ... WITH (FORMAT 'csv', DELIMITER '|', HEADER true)`
  * (`aact_bronze_layer.sql:93-99` pipe-delimited AACT exports;
  * `:144-150,224-230` comma-delimited mapping spreadsheets).
  *
  * PG null semantics are preserved via PG's own text-format NULL sentinel:
  * Spark's CSV parser cannot distinguish an unquoted empty field from a
  * quoted `""` (both hit `nullValue`), so NULL travels as `\N` — exactly
  * `COPY ... NULL '\N'`. A quoted `""` then round-trips as the empty
  * string, an unquoted empty field still reads as NULL (PG COPY csv
  * behavior), and `\N` is unambiguous.
  *
  * At scale the scan parallelizes per file split; an explicit schema means
  * zero inference passes (see [[graft.schema.Schemas]]).
  */
object Csv {

  /** `COPY table FROM file WITH (FORMAT csv, DELIMITER sep, HEADER true)`.
    * Never inferSchema — mirror of the reference's explicit DDL.
    *
    * Read-side null policy: `\N` (and an unquoted empty field) → NULL; a
    * quoted `""` → empty string. Do NOT set `emptyValue` on read — its
    * read semantics are inverted (it is the literal the parser substitutes
    * for empties). */
  def read(spark: SparkSession, path: String, schema: StructType,
           sep: String = "|"): DataFrame =
    spark.read
      .schema(schema)
      .option("header", "true")
      .option("sep", sep)
      .option("nullValue", "\\N")
      .option("mode", "PERMISSIVE")
      .csv(path)

  /** [[read]] with malformed-row QUARANTINE — the defense a production
    * ingest needs against upstream export drift (ragged rows, type
    * garbage): PERMISSIVE mode routes every row the schema cannot fully
    * parse into `_corrupt_record` as raw text (typed columns null where
    * unparseable) instead of failing the COPY or silently coercing.
    * Same dialect (`\N` nulls, header, sep) as [[read]]. */
  def readWithQuarantine(spark: SparkSession, path: String, schema: StructType,
                         sep: String = "|"): DataFrame =
    spark.read
      .schema(schema.add("_corrupt_record", org.apache.spark.sql.types.StringType))
      .option("header", "true")
      .option("sep", sep)
      .option("nullValue", "\\N")
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .csv(path)

  /** Idempotent CSV sink (S4 overwrite semantics) writing the dialect
    * [[read]] parses — NULL as `\N`, empty string as quoted `""`. */
  def write(df: DataFrame, path: String, sep: String = "|"): Unit =
    df.write
      .mode(SaveMode.Overwrite)
      .option("header", "true")
      .option("sep", sep)
      .option("nullValue", "\\N")
      .option("emptyValue", "\"\"")
      .option("timestampFormat", "yyyy-MM-dd'T'HH:mm:ss.SSSXXX")
      .csv(path)
}
