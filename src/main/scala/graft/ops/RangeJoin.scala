package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Range (interval-containment) join without an equi-key — the second
  * classic operator Spark's planner has no native strategy for: naively,
  * `points JOIN intervals ON p BETWEEN s AND e` plans as a broadcast
  * nested-loop (or cartesian) because there is no equality to hash on,
  * which is O(|P|·|I|) work regardless of selectivity.
  *
  * Spark-first fix — bucketize the time axis so the inequality becomes an
  * equality Catalyst can hash-partition on: each point maps to ONE bucket
  * `floor(t / width)`; each interval EXPLODES to the buckets it overlaps
  * (`sequence(floor(s/width), floor(e/width))` — `len/width + 1` rows).
  * Equi-join on the bucket, then re-check the exact predicate. A (point,
  * interval) pair can only meet in the point's single bucket, so no
  * dedup pass is needed. Cost: |P| + Σ(len_i/width + 1) shuffled rows and
  * only same-bucket candidate pairs — the join is an ordinary shuffled
  * hash join that scales out and AQE-splits like any other.
  *
  * `bucketWidthSeconds` tunes replication vs. candidate-set size: pick
  * near the TYPICAL interval length (≈2 buckets per interval; candidates
  * per point ≈ intervals overlapping ±1 width).
  */
object RangeJoin {

  /** Inner-join `points` to the `intervals` containing them:
    * `start <= t <= end` (timestamp columns). Column sets must be
    * disjoint; every matching (point, interval) pair is emitted once. */
  def pointInInterval(points: DataFrame, intervals: DataFrame,
                      pointTime: String, intervalStart: String,
                      intervalEnd: String,
                      bucketWidthSeconds: Long): DataFrame = {
    require(bucketWidthSeconds > 0, "bucket width must be positive")
    require(points.columns.toSet.intersect(intervals.columns.toSet).isEmpty,
      "points/intervals column names must be disjoint")
    val w = lit(bucketWidthSeconds)
    val p = points.withColumn("_bkt",
      floor(unix_timestamp(col(pointTime)) / w))
    val i = intervals.withColumn("_bkt", explode(sequence(
      floor(unix_timestamp(col(intervalStart)) / w),
      floor(unix_timestamp(col(intervalEnd)) / w))))
    p.join(i, Seq("_bkt"))
      .filter(col(pointTime) >= col(intervalStart) &&
        col(pointTime) <= col(intervalEnd))
      .drop("_bkt")
  }
}
