package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** AS-OF JOIN — the temporal-alignment operator Spark's built-in join
  * repertoire lacks (Flink temporal joins / kdb aj / DuckDB ASOF JOIN /
  * pandas merge_asof are the public references): every left row is
  * matched to the single right row with the LARGEST right-time ≤ its
  * own time within the same key — "the latest state known as of this
  * moment". The training-data uses are everywhere the event stream
  * meets slowly-changing context: attach the most recent crawl
  * snapshot/license/robots state to each document fetch, the latest
  * model-version row to each eval event, the last-seen quality score
  * to each reprocessing pass.
  *
  * Naive formulations fail at scale: a theta-join on (key, r.t ≤ l.t)
  * explodes to every PAIR of (left, right) rows per key before the
  * max-aggregation prunes it (quadratic in the hot key), and the
  * textbook union-then-window carries `Window.partitionBy(key)` — one
  * task per key, serialized on exactly the mega-key a real event log
  * has. This implementation is the house window-free pattern
  * ([[SurrogateKeys.prefixSum]]'s): ONE range exchange on
  * (key, time, side) makes each key's timeline contiguous across
  * partitions, a per-(partition, key) window computes the local
  * last-known payload (bounded by PARTITION size, never key size), and
  * a partition-summary frame — ≈ one row per (partition, key-run),
  * i.e. #keys + #partitions rows, not data-sized — carries the
  * boundary payload forward with one tiny per-key window. A mega-key
  * spans many range partitions and parallelizes; correctness does not
  * depend on the partition count (the spec asserts
  * partitioning-independence).
  *
  * The ranged frame is eagerly localCheckpoint-ed for the same reason
  * prefixSum's is: `_pid` must mean ONE physical layout to both its
  * readers (the main window pass and the boundary summary) — two
  * instances of the exchange may sample different range boundaries.
  *
  * CONTRACT: the right side must be UNIQUE per (key, time) — the
  * "latest right row" is otherwise ambiguous and no two engines would
  * agree on ties (pre-aggregate duplicates away; q164 does). Rows with
  * a null key or null time are dropped from both sides (SQL comparison
  * with NULL never matches — same net semantics as DuckDB's ASOF).
  */
object AsofJoin {

  /** Backward (inclusive) as-of join: for every `left` row, attach
    * `payloadCols` from the `right` row with the largest
    * `right.timeCol` ≤ `left.timeCol` in the same `keyCol` group, or
    * nulls when no such row exists (left-outer semantics). Returns all
    * `left` columns followed by `payloadCols`. */
  def backward(left: DataFrame, right: DataFrame, keyCol: String,
               timeCol: String, payloadCols: Seq[String]): DataFrame = {
    require(payloadCols.nonEmpty, "payloadCols must be non-empty")
    val spark = left.sparkSession
    val leftCols = left.columns.toSeq
    val payStruct = struct(payloadCols.map(col): _*)
    // side 0 (right) sorts BEFORE side 1 (left) at equal time, which is
    // exactly the inclusive <= semantics.
    val r = right
      .filter(col(keyCol).isNotNull && col(timeCol).isNotNull)
      .select(col(keyCol).as("_k"), col(timeCol).as("_t"),
        lit(0).as("_side"), payStruct.as("_pl"),
        lit(null).cast(org.apache.spark.sql.types.StructType(
          left.schema.fields)).as("_lrow"))
    val l = left
      .filter(col(keyCol).isNotNull && col(timeCol).isNotNull)
      .select(col(keyCol).as("_k"), col(timeCol).as("_t"),
        lit(1).as("_side"),
        lit(null).cast(r.schema("_pl").dataType).as("_pl"),
        struct(leftCols.map(col): _*).as("_lrow"))
    val ranged = r.unionByName(l)
      .repartitionByRange(
        spark.sessionState.conf.numShufflePartitions,
        col("_k"), col("_t"), col("_side"))
      .withColumn("_pid", spark_partition_id())
      .localCheckpoint()
    // Local pass: last known right payload within (partition, key) —
    // window size bounded by the partition, never by the key.
    val w = Window.partitionBy(col("_pid"), col("_k"))
      .orderBy(col("_t"), col("_side"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val local = ranged.withColumn("_loc", last(col("_pl"), true).over(w))
    // Boundary carry: per (partition, key) the last right payload, then
    // for each (partition, key) the latest payload from any EARLIER
    // partition — a frame of ~(#keys + #partitions) rows (keys are
    // contiguous in range order), so the per-key window here is over a
    // handful of rows no matter how hot the key is in the data.
    val summary = ranged.filter(col("_side") === 0)
      .groupBy(col("_pid"), col("_k"))
      .agg(max_by(col("_pl"), struct(col("_t"), col("_side"))).as("_lastpl"))
    val allPk = ranged.select(col("_pid"), col("_k")).distinct()
    val carryW = Window.partitionBy(col("_k")).orderBy(col("_pid"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val carry = allPk.join(summary, Seq("_pid", "_k"), "left")
      .withColumn("_cin", last(col("_lastpl"), true).over(carryW))
      .select(col("_pid"), col("_k"), col("_cin"))
    val matched = local
      .join(carry, Seq("_pid", "_k"))
      .filter(col("_side") === 1)
      .withColumn("_m", coalesce(col("_loc"), col("_cin")))
    matched.select(
      leftCols.map(c => col("_lrow").getField(c).as(c)) ++
        payloadCols.map(c => col("_m").getField(c).as(c)): _*)
  }
}
