package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Surrogate-key generation — `aact_gold_layer.sql:27,66,138,161`:
  * `ROW_NUMBER() OVER (ORDER BY k)` keys every dimension.
  *
  * Scale note (SURVEY §2.5 W1): a global un-partitioned window collapses to a
  * single task. That is fine for dimensions (small after `distinct`), and
  * [[rowNumberKey]] reproduces the reference exactly. For fact-scale keying
  * at 100 TB use [[denseRankKey]] — same dense 1..N result, fully
  * distributed, no RDD round-trip out of Tungsten (and unlike
  * `monotonically_increasing_id`, dense AND aligned with the sort order).
  */
object SurrogateKeys {

  /** Reference-exact dimension keying (small inputs only). */
  def rowNumberKey(df: DataFrame, keyCol: String, orderCols: Seq[String]): DataFrame =
    df.withColumn(keyCol, row_number().over(Window.orderBy(orderCols.map(col): _*)))

  /** Scale-safe dense sequential keying, DataFrame-native two-phase:
    *
    *   1. range-repartition on the order columns (the same exchange a global
    *      sort needs — but no global window after it);
    *   2. per-partition `row_number` (window PARTITIONed by
    *      `spark_partition_id` → one parallel task per partition);
    *   3. add each partition's starting offset = running sum of partition
    *      counts — a broadcast-joined frame of numPartitions rows.
    *
    * Global key = offset + local row number: dense, 1..N, ordered by
    * `orderCols` (which must be a total order for determinism — include a
    * unique tiebreaker). Every stage is Catalyst-planned and codegen'd.
    * Implemented as [[prefixSum]] with unit weights (key = exclusive
    * prefix count + 1).
    */
  def denseRankKey(df: DataFrame, keyCol: String, orderCols: Seq[String]): DataFrame =
    prefixSum(df.withColumn("_one", lit(1L)), "_one", keyCol, orderCols)
      .withColumn(keyCol, col(keyCol) + 1)
      .drop("_one")

  /** Scale-safe EXCLUSIVE prefix sum: adds `prefixCol` = the sum of
    * `weightCol` (BIGINT, non-negative) over all rows STRICTLY preceding
    * this one in the total order given by `orderCols` (first row → 0).
    * The distributed-prefix-sum backbone of [[denseRankKey]] (weight 1)
    * and of weighted selection generally (cumulative-weight sampling,
    * contiguous byte-offset assignment, shard boundary planning):
    *
    *   1. range-repartition on the order columns;
    *   2. per-partition exclusive window sum (one parallel task each);
    *   3. add each partition's starting offset = running sum of partition
    *      totals — a broadcast-joined frame of numPartitions rows.
    *
    * MATERIALIZED ranged layout (round-13 correctness fix): `_pid` must
    * mean the same partition layout in the offsets pass and the
    * window pass — but the range exchange feeds TWO readers, and each
    * gets its own physical instance when exchange reuse doesn't fire
    * (observed with checkpointed inputs under AQE at 270k rows): the two
    * instances sample different range boundaries and/or coalesce
    * differently, so offsets keyed on layout A were added to window sums
    * from layout B — keys came out with gaps (max 303k over 270k rows)
    * or duplicates, while every small-input run stayed correct because
    * the samplers happened to agree. The eager localCheckpoint freezes
    * ONE layout that both passes then read — correctness by
    * construction, at the cost of materializing the frame (at true fact
    * scale substitute a storage-backed materialization, e.g. the
    * bucketed-write path; the offsets technique fundamentally requires a
    * read-consistent snapshot of the partitioning). The explicit
    * partition count additionally pins the pre-checkpoint layout against
    * AQE coalescing. SurrogateKeysSpec pins key density at a size that
    * reproduced the divergence.
    */
  def prefixSum(df: DataFrame, weightCol: String, prefixCol: String,
                orderCols: Seq[String]): DataFrame = {
    val ranged = df
      .repartitionByRange(df.sparkSession.sessionState.conf.numShufflePartitions,
        orderCols.map(col): _*)
      .withColumn("_pid", spark_partition_id())
      .localCheckpoint()
    val offsets = ranged
      .groupBy(col("_pid")).agg(sum(col(weightCol)).as("_cnt"))
      .withColumn("_offset",
        coalesce(
          sum(col("_cnt")).over(
            Window.orderBy(col("_pid"))
              .rowsBetween(Window.unboundedPreceding, -1)),
          lit(0L)))
      .select(col("_pid"), col("_offset"))
    val w = Window.partitionBy(col("_pid")).orderBy(orderCols.map(col): _*)
      .rowsBetween(Window.unboundedPreceding, -1)
    ranged
      .withColumn("_ps", coalesce(sum(col(weightCol)).over(w), lit(0L)))
      .join(broadcast(offsets), Seq("_pid"))
      .withColumn(prefixCol, col("_offset") + col("_ps"))
      .drop("_pid", "_ps", "_offset")
  }
}
