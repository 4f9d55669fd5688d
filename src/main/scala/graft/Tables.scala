package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated testdata tables (TESTDATA.md).
  *
  * Mirrors the reference's bronze ingest role (`aact_bronze_layer.sql:93-99`):
  * a typed scan of raw files. Here the raw files are already Parquet, so the
  * schema travels with the data and the scan is vectorized + column-pruned by
  * Spark automatically (the 100 TB-scale version of `COPY ... FORMAT csv`).
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Scratch directory for queries with a write side (CSV round-trip, CTAS
    * sinks): `spark.graft.scratchDir` when set, else a subdir of the JVM
    * temp dir — never an absolute repo path, so any checkout/driver layout
    * works. */
  def scratchDir(spark: SparkSession): String =
    spark.conf.getOption("spark.graft.scratchDir")
      .getOrElse(s"${System.getProperty("java.io.tmpdir")}/graft-scratch")

  /** Path-based build-once write: run `write` only when `path` has no
    * `_SUCCESS` marker (the committer drops it only after a COMPLETE write,
    * so a half-written directory from a killed JVM is rebuilt, not
    * trusted). Same amortization contract as
    * [[graft.sources.Bucketed.writeIfAbsent]] for non-catalog parquet
    * layouts (partitioned dirs): repeated runs over immutable inputs pay
    * the write once and every later run only reads. */
  def writePathIfAbsent(spark: SparkSession, path: String)(write: => Unit): Unit = {
    val p = new org.apache.hadoop.fs.Path(path, "_SUCCESS")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) write
  }

  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") events(spark, dir) else
      spark.read.parquet(s"$dir/$name.parquet")

  /** Normalize `events.ts` to Spark's native TimestampType regardless of
    * how the generator wrote it: TIMESTAMP(NANOS) parquet (Spark's reader
    * rejects it; read nanos as long, truncate to micros — integer `div`,
    * not `/`: Column./ is DOUBLE division and epoch nanos ~1.7e15 lose
    * their low digits in a double), TIMESTAMP_NTZ (cast preserves the wall
    * clock under the UTC session), or already-TIMESTAMP micros. */
  private def events(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = spark.read.parquet(s"$dir/events.parquet")
    raw.schema("ts").dataType match {
      case LongType => raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType => raw.withColumn("ts", col("ts").cast(TimestampType))
      case _ => raw
    }
  }
}
