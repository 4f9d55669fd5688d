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

  /** Fixed, session-INDEPENDENT sidecar dir for q163's stored-merge
    * replay oracle: the query (re)writes its trained merge table here as
    * JSON on every invocation, and [[Oracles]] — which has no
    * SparkSession and therefore no conf — inlines it into the replay SQL
    * when the oracle map is materialized. Works because graft.Verify
    * runs every query BEFORE dumping oracle_sql.json (the dump happens
    * in the same process, after q163 refreshed the sidecar from the
    * corpus under test). Deliberately NOT salted with the corpus tag:
    * the freshest write is by construction the corpus the dump
    * describes. */
  val Bpe512Sidecar: String =
    s"${System.getProperty("java.io.tmpdir")}/graft-scratch/bpe512_sidecar_v1"

  /** q169's stored-merge sidecar — same contract as [[Bpe512Sidecar]]
    * at the 8192-merge production budget. */
  val Bpe8kSidecar: String =
    s"${System.getProperty("java.io.tmpdir")}/graft-scratch/bpe8k_sidecar_v1"

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

  /** Build-once artifact, served through the session catalog cache:
    * [[writePathIfAbsent]] + `read.parquet`, but the `_SUCCESS` existence
    * check and the footer/schema read happen once per session instead of
    * on every query build. Artifact paths are content-salted (corpusTag /
    * parameter versions), so within a session the path's content never
    * changes — the same immutability that makes [[table]] cacheable. */
  def servedArtifact(spark: SparkSession, path: String)(write: => Unit): DataFrame =
    memo(spark, s"artifact:$path") {
      // The build's terminal action (the parquet write) completes inside
      // the block, so every multi-consumer frame an operator persisted
      // during it (Bpe vocab rounds, Dedup signature frames — via
      // CacheScope.scopedPersist) is released here instead of
      // accumulating until a session-wide clearCache (VERDICT r12 #7).
      CacheScope.withCachedFrames {
        writePathIfAbsent(spark, path)(write)
      }
      spark.read.parquet(path)
    }

  /** Session-scoped resolved-table cache — the library's stand-in for a
    * metastore catalog. `spark.read.parquet` pays driver-side filesystem
    * work EVERY call (directory listing + footer read for schema
    * inference) before a single task runs; a real deployment resolves a
    * table once (HMS/Unity/Glue entry with schema + file index) and every
    * query references that entry. The DuckDB oracle baseline has exactly
    * this shape too (`CREATE VIEW t AS read_parquet(...)` once per
    * session, queries reference the view), so benching against cached
    * resolution is symmetric, not a shortcut. DataFrames are immutable —
    * reuse across queries is safe; keyed per session so tests with
    * multiple sessions never share state. */
  private val resolved =
    new java.util.concurrent.ConcurrentHashMap[(Int, String), DataFrame]()
  // NOT computeIfAbsent: a servedArtifact build re-enters memo (table(),
  // corpusTag-salted sub-artifacts), and a reentrant computeIfAbsent
  // throws "Recursive update" whenever the two keys land in the same
  // bin — a nondeterministic, data-dependent crash. get/putIfAbsent is
  // reentrancy-safe; a racing duplicate build is harmless (DataFrames
  // are immutable plans, either instance serves).
  private def memo(spark: SparkSession, key: String)(build: => DataFrame): DataFrame = {
    val k = (System.identityHashCode(spark), key)
    val hit = resolved.get(k)
    if (hit != null) hit
    else {
      val built = build
      val prev = resolved.putIfAbsent(k, built)
      if (prev != null) prev else built
    }
  }

  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    memo(spark, s"table:$dir/$name") {
      if (name == "events") events(spark, dir)
      else spark.read.parquet(s"$dir/$name.parquet")
    }

  /** Production-layout scan: the generator writes each table as ONE
    * parquet row group, so every scan plans exactly one input split and
    * a compute-bound narrow map runs on one core — a layout no real
    * deployment has (at 100 TB a table is thousands of splits, and
    * compacting small/degenerate files into well-sized ones is the
    * standard ingest step; see also [[graft.sources.Bucketed]] for the
    * keyed version of the same amortized-artifact contract). wide()
    * materializes that realistic layout ONCE per scratch dir and serves
    * it thereafter: content-identical rows, multi-split files, so
    * downstream plans stay shuffle-free but scan with the parallelism a
    * production layout provides. Use for scan-/compute-bound queries
    * whose results don't depend on row order (maps, aggregations).
    * Cache the tiny frames you'd broadcast anyway via [[table]]. */
  /** Identity tag for the corpus snapshot behind `dir/name.parquet`:
    * `<basename>_<bytes>_<mtime>` — the same salt [[wide]] uses. Derived
    * artifacts (shingle sets, pair tables, trained models, ground-truth
    * top-k) must key their scratch paths with this, not the bare dir
    * basename: a table regenerated in place, or two corpora whose
    * directories share a final path component, would otherwise silently
    * serve each other's artifacts. */
  private val tags =
    new java.util.concurrent.ConcurrentHashMap[String, String]()
  def corpusTag(spark: SparkSession, dir: String, name: String): String =
    // Memoized per path: the tag is a filesystem stat of IMMUTABLE-for-
    // the-process testdata, and derived-artifact consumers re-ask for it
    // on every query build.
    tags.computeIfAbsent(s"$dir/$name", _ => {
      val p = new org.apache.hadoop.fs.Path(s"$dir/$name.parquet")
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      val st = fs.getFileStatus(p)
      val bytes =
        if (st.isFile) st.getLen else fs.getContentSummary(p).getLength
      // Tags COMPOSE: derived artifacts key their paths by one or more
      // corpus tags, and a derived CORPUS (ScaleCorpus's 10× dir) bakes
      // four source tags into its own dir name — so an uncapped dir
      // part compounds geometrically and a two-tag artifact over the
      // scale corpus exceeds the filesystem's 255-byte path-segment
      // limit (observed r19: q172's hybrid_rrf artifact failed mkdir at
      // the 10× corpus). Long dir parts collapse to a deterministic
      // digest; identity is preserved, short base tags are unchanged.
      val dirPart = dir.replaceAll(".*/", "")
      val dp =
        if (dirPart.length <= 80) dirPart
        else "h" + java.security.MessageDigest.getInstance("MD5")
          .digest(dirPart.getBytes("UTF-8")).map("%02x".format(_))
          .mkString.take(16)
      s"${dp}_${bytes}_${st.getModificationTime}"
    })

  def wide(spark: SparkSession, dir: String, name: String): DataFrame =
    memo(spark, s"wide:$dir/$name")(wideUncached(spark, dir, name))

  private def wideUncached(spark: SparkSession, dir: String, name: String): DataFrame = {
    val src = new org.apache.hadoop.fs.Path(s"$dir/$name.parquet")
    val fs = src.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // Already a multi-split layout (any real deployment): serve the source.
    val srcFiles = fs.listStatus(src) match {
      case null => Array.empty[org.apache.hadoop.fs.FileStatus]
      case xs => xs.filter(f => f.isFile && f.getPath.getName.endsWith(".parquet"))
    }
    if (!fs.getFileStatus(src).isFile && srcFiles.length >= 8)
      return table(spark, dir, name)
    // Key the artifact by the source's size+mtime so a regenerated input
    // (same path, new content) rebuilds instead of silently serving the
    // old copy — the staleness trap Tables-level artifacts must not have.
    val st = fs.getFileStatus(src)
    val tag = s"${st.getLen}_${st.getModificationTime}"
    val sfTag = dir.replaceAll(".*/", "")
    val path = s"${scratchDir(spark)}/wide_v1/$sfTag/${name}_$tag.parquet"
    writePathIfAbsent(spark, path) {
      table(spark, dir, name).repartition(16)
        .write.mode(org.apache.spark.sql.SaveMode.Overwrite).parquet(path)
    }
    spark.read.parquet(path)
  }

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
