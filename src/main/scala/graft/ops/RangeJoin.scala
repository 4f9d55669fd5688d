package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Range (interval) joins without a native planner strategy — naively,
  * `points JOIN intervals ON p BETWEEN s AND e` plans as a broadcast
  * nested-loop (or cartesian) because there is no equality to hash on,
  * which is O(|P|·|I|) work regardless of selectivity. Both operators
  * here bucketize the time axis so the inequality becomes an equality
  * Catalyst can hash-partition on — the standard fix every batch and
  * streaming interval-join implementation (Flink's included) uses.
  *
  * Two flavors for the two real shapes:
  *   - [[pointInInterval]]: an INTERVALS TABLE (campaign windows,
  *     validity ranges) with no key equality — intervals explode to the
  *     buckets they overlap, points map to one bucket;
  *   - [[lookbackPairs]]: a PER-LEFT-ROW sliding window WITH a key
  *     equality (views preceding an error for the same user) — here the
  *     key must join too, or same-bucket rows of every other key become
  *     candidates (a 1500-user corpus would fan each probe 1500×; at
  *     corpus scale that is the blow-up, not the time axis). The window
  *     length is fixed, so the LEFT side probes exactly 2 buckets and
  *     the right side maps to 1 — bounded replication on the probe side
  *     instead of the interval side.
  */
object RangeJoin {

  /** Inner-join `points` to the `intervals` containing them:
    * `start <= t <= end` (timestamp columns). Column sets must be
    * disjoint; every matching (point, interval) pair is emitted once.
    *
    * Each point maps to ONE bucket `floor(t / width)`; each interval
    * EXPLODES to the buckets it overlaps (`sequence(floor(s/width),
    * floor(e/width))` — `len/width + 1` rows). Equi-join on the bucket,
    * then re-check the exact predicate. A (point, interval) pair can
    * only meet in the point's single bucket, so no dedup pass is
    * needed. `bucketWidthSeconds` tunes replication vs candidate-set
    * size: pick near the TYPICAL interval length (≈2 buckets per
    * interval; candidates per point ≈ intervals overlapping ±1 width).
    */
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

  /** All (a, b) pairs whose closed intervals OVERLAP:
    * `a.start <= b.end AND b.start <= a.end` — the third temporal-join
    * shape (concurrent sessions, co-running experiments, incident
    * windows crossing deploy windows), completing [[pointInInterval]]
    * (no key, point probe) and [[lookbackPairs]] (keyed, fixed
    * window). Column sets must be disjoint; every overlapping pair is
    * emitted exactly once.
    *
    * Both sides EXPLODE to the buckets they cover, the join is an
    * equi-join on the bucket, and the exact predicate re-checks. An
    * overlapping pair shares every bucket in
    * [max(startBuckets), min(endBuckets)] — potentially MANY — so
    * emitting on the bucket join alone would duplicate; the pair is
    * kept only in its CANONICAL meeting bucket, max of the two start
    * buckets (the first bucket both cover — always inside the shared
    * range when an overlap exists, never otherwise). A filter, not a
    * distinct: dedup costs nothing and the output needs no shuffle.
    * Replication per row ≈ len/width + 1; pick `bucketWidthSeconds`
    * near the typical interval length.
    *
    * Inverted intervals (start > end) FAIL FAST in-plan (the q178
    * assert-in-a-filter idiom): `sequence(hi, lo)` silently generates a
    * DESCENDING bucket range, so a malformed row would still explode,
    * join, and could emit pairs the closed-interval predicate never
    * sanctioned — an invalid input is caller error and must be loud. */
  def intervalOverlapPairs(a: DataFrame, b: DataFrame,
                           aStart: String, aEnd: String,
                           bStart: String, bEnd: String,
                           bucketWidthSeconds: Long): DataFrame = {
    require(bucketWidthSeconds > 0, "bucket width must be positive")
    require(a.columns.toSet.intersect(b.columns.toSet).isEmpty,
      "a/b column names must be disjoint")
    val w = lit(bucketWidthSeconds)
    def bkt(c: String) = floor(unix_timestamp(col(c)) / w)
    // coalesce: a null endpoint is NOT an inversion — it drops at the
    // explode exactly as before (null sequence → no buckets), matching
    // the SQL predicate's null semantics; only a definite start > end
    // fails.
    def checked(df: DataFrame, start: String, end: String): DataFrame =
      df.filter(assert_true(coalesce(col(start) <= col(end), lit(true)),
        concat(lit("intervalOverlapPairs: inverted interval "),
          col(start), lit(" > "), col(end))).isNull)
    val ae = checked(a, aStart, aEnd).withColumn("_sba", bkt(aStart))
      .withColumn("_bkt", explode(sequence(col("_sba"), bkt(aEnd))))
    val be = checked(b, bStart, bEnd).withColumn("_sbb", bkt(bStart))
      .withColumn("_bkt", explode(sequence(col("_sbb"), bkt(bEnd))))
    ae.join(be, Seq("_bkt"))
      .filter(col("_bkt") === greatest(col("_sba"), col("_sbb")) &&
        col(aStart) <= col(bEnd) && col(bStart) <= col(aEnd))
      .drop("_bkt", "_sba", "_sbb")
  }

  /** All (left × matching right) pairs for the KEYED inclusive-end
    * lookback window: same `keyCol`, right.`timeCol` ∈ (left.t −
    * `windowSec`, left.t]. Returns every `left` column followed by
    * `payloadCols` from the matched right row — one output row per
    * match (inner semantics; left rows with no match emit nothing —
    * callers wanting zero-counts left-join the aggregate back, as q166
    * does).
    *
    * bucket(t) = epoch_micros(t) div window; each LEFT row probes its
    * own and the previous bucket (any right row in (l.t − W, l.t] lands
    * in exactly one of those two), the join is a plain equi-join on
    * (key, bucket) + the exact interval filter. Output volume is the
    * true match set — the operator's semantics, not an artifact
    * (aggregate consumers that only need counts/max can pre-aggregate
    * the right side per bucket upstream). Rows with null key/time drop
    * from both sides (a NULL comparison never matches). Domain:
    * timestamps at/after the epoch (integer `div` truncates toward
    * zero, which equals floor only for non-negative micros). */
  def lookbackPairs(left: DataFrame, right: DataFrame, keyCol: String,
                    timeCol: String, windowSec: Long,
                    payloadCols: Seq[String]): DataFrame = {
    require(windowSec >= 1, s"windowSec must be >= 1; got $windowSec")
    require(payloadCols.nonEmpty, "payloadCols must be non-empty")
    val span = windowSec * 1000000L
    val leftCols = left.columns.toSeq
    val l = left
      .filter(col(keyCol).isNotNull && col(timeCol).isNotNull)
      .select(struct(leftCols.map(col): _*).as("_lrow"),
        col(keyCol).as("_k"), col(timeCol).as("_lt"))
      .withColumn("_b", explode(array(
        expr(s"unix_micros(_lt) div ${span}L") - 1,
        expr(s"unix_micros(_lt) div ${span}L"))))
    val r = right
      .filter(col(keyCol).isNotNull && col(timeCol).isNotNull)
      .select(col(keyCol).as("_k"), col(timeCol).as("_rt"),
        struct(payloadCols.map(col): _*).as("_pl"))
      .withColumn("_b", expr(s"unix_micros(_rt) div ${span}L"))
    l.join(r, Seq("_k", "_b"))
      .filter(expr(s"_rt > _lt - INTERVAL '$windowSec' SECOND") &&
        col("_rt") <= col("_lt"))
      .select(leftCols.map(c => col("_lrow").getField(c).as(c)) ++
        payloadCols.map(c => col("_pl").getField(c).as(c)): _*)
  }
}
