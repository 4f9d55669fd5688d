package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Discrete percentiles — `aact_silver_layer.sql:926-928`:
  * `PERCENTILE_DISC(0.997) WITHIN GROUP (ORDER BY enrollment)` per
  * `study_type` derives the hard-coded enrollment caps (566401 / 15886,
  * `aact_silver_layer.sql:164-165`).
  *
  * Scale-safe two-pass formulation. A naive `cume_dist()` window sorts each
  * group in ONE task — with 2-3 study_types over 100 TB that is 2-3 tasks
  * sorting ~33 TB each. Instead:
  *
  *   1. histogram: groupBy(group, value).count — a partial-aggregating
  *      (map-side combined) shuffle, fully parallel; output is one row per
  *      DISTINCT value per group (tiny for bounded-domain measures like
  *      enrollment counts / quantities);
  *   2. pick: a cumulative sum over the per-group histogram (cheap — runs
  *      over distinct values, not rows), taking the smallest value whose
  *      cumulative count reaches ceil(p * n) — the standard
  *      PERCENTILE_DISC definition (smallest v with cume_dist(v) >= p).
  *
  * For continuous measures with ~no repeats the histogram degenerates to the
  * full data and step 2's window is again per-group; in that regime use
  * `percentile_approx` to bracket the tail and run this exact pass on the
  * bracketed remainder.
  *
  * All-null groups are KEPT with a null percentile — SQL `PERCENTILE_DISC`
  * aggregates to NULL over empty input rather than dropping the group.
  */
object Percentiles {

  /** One row per group: (partitionCols*, outCol). */
  def percentileDisc(df: DataFrame, valueCol: String, p: Double,
                     partitionCols: Seq[String], outCol: String): DataFrame = {
    require(p >= 0 && p <= 1, s"p=$p out of [0, 1]") // match the siblings
    val grp = partitionCols.map(col)

    // ONE linear chain (r19, guide §2.3/§2.4): the old shape scanned the
    // data twice (per-group totals + histogram) and re-joined/unioned the
    // histogram against itself — and because exchange reuse does not
    // dedup those branches at runtime, the corpus aggregation actually
    // ran once PER consumer. Now: one corpus-sized histogram keyed by
    // (group, value) with null values kept as a null-keyed row, one
    // window pass over the TINY histogram carrying both the per-group
    // non-null total (whole-partition frame) and the running count, and
    // one final per-group min over the qualifying values — which is also
    // the all-null-group branch (no qualifying row ⇒ SQL min = null), so
    // no join, no union, no second corpus pass. The final groupBy rides
    // the window's partitioning — no extra exchange. Integer rank
    // comparison as before (no float-division boundary sensitivity);
    // null histogram rows sort first and contribute 0 to the running
    // count, so non-null rows' _cum is exactly the old null-filtered one.
    val hist = df
      .groupBy((partitionCols :+ valueCol).map(col): _*)
      .agg(count(lit(1)).as("_cnt"))
    val nnCnt = when(col(valueCol).isNotNull, col("_cnt")).otherwise(lit(0L))
    val wAll = Window.partitionBy(grp: _*)
    val wOrd = Window.partitionBy(grp: _*).orderBy(col(valueCol))
    hist
      .withColumn("_n", sum(nnCnt).over(wAll))
      .withColumn("_cum", sum(nnCnt).over(wOrd))
      .groupBy(grp: _*)
      .agg(min(when(col(valueCol).isNotNull &&
        col("_cum") >= ceil(lit(p) * col("_n")), col(valueCol))).as(outCol))
  }

  /** Exact PERCENTILE_DISC via a TWO-LEVEL histogram — one corpus-sized
    * shuffle total (round-10 convergence of the two formulations below;
    * the 3-pass sketch-bracket version kept for reference/regression).
    *
    *   1. histogram: ONE map-side-combined groupBy over (group,
    *      floor(value/bucketWidth)) — nulls ride along as a null bucket,
    *      so all-null groups survive without a second totals pass;
    *      output is O(groups × value_range/bucketWidth), tiny;
    *   2. target bucket: per-group cumulative counts over the tiny
    *      histogram locate the bucket holding rank k = ceil(p·n) and the
    *      in-bucket rank j = k − count_before — window over bucket rows,
    *      not data rows;
    *   3. in-bucket pick: re-scan filtered to each group's ONE target
    *      bucket (broadcast semi-join on (group, bucket)) and take the
    *      j-th smallest — the only row-level window runs over ~n/B rows
    *      per group, never a whole group.
    *
    * vs [[percentileDisc]]: that one keys the histogram by DISTINCT
    * VALUE — optimal for low-cardinality domains (quantities,
    * enrollment counts) but degenerate for continuous measures. vs
    * [[percentileDiscContinuous]]: same output, one corpus shuffle
    * instead of three barriers, and no sketch/eps tuning — the bracket
    * is exact by construction. */
  def percentileDiscTwoLevel(df: DataFrame, valueCol: String, p: Double,
                             partitionCols: Seq[String], outCol: String,
                             bucketWidth: Double = 1000.0): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be > 0; got $bucketWidth")
    require(p >= 0 && p <= 1, s"p=$p out of [0, 1]")
    val grp = partitionCols.map(col)
    val valueType = df.schema(valueCol).dataType
    val v = col(valueCol)

    // Pass 1: (group, bucket) histogram; null values → null bucket.
    val hist = df
      .groupBy(grp :+ when(v.isNotNull,
        floor(v.cast("double") / bucketWidth).cast("long")).as("_bkt"): _*)
      .agg(count(lit(1)).as("_cnt"))

    // Target bucket + all-null groups from ONE window pass over the tiny
    // histogram (round 17: the per-group total and the running count
    // share the partitionBy(group) exchange — formerly a groupBy + join
    // + a second histogram aggregation, three extra barriers of pure
    // scheduling latency on a frame of O(groups × range/bucketWidth)
    // rows). Nulls sort first, so the running sum counts only preceding
    // NON-NULL buckets.
    val wAll = Window.partitionBy(grp: _*)
    val wB = Window.partitionBy(grp: _*).orderBy(col("_bkt"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val nonNullCnt = when(col("_bkt").isNotNull, col("_cnt"))
    val marked = hist
      .withColumn("_n", sum(nonNullCnt).over(wAll))
      .withColumn("_before", coalesce(sum(nonNullCnt).over(wB), lit(0L)))
      // k >= 1: PERCENTILE_DISC(0) is the minimum (SQL semantics); a bare
      // ceil(0·n) = 0 would match no bucket and silently drop the group
      .withColumn("_k", greatest(ceil(lit(p) * col("_n")).cast("long"), lit(1L)))
    val target = marked
      .filter(col("_bkt").isNotNull && col("_before") < col("_k") &&
        col("_k") <= col("_before") + col("_cnt"))
      .select(grp :+ col("_bkt") :+ (col("_k") - col("_before")).as("_j"): _*)

    // Pass 2: j-th smallest inside the one target bucket per group.
    val wV = Window.partitionBy(grp: _*).orderBy(v)
    val picked = df
      .filter(v.isNotNull)
      .withColumn("_bkt", floor(v.cast("double") / bucketWidth).cast("long"))
      .join(broadcast(target), partitionCols :+ "_bkt")
      .withColumn("_rn", row_number().over(wV))
      .filter(col("_rn") === col("_j"))
      .select(grp :+ v.as(outCol): _*)

    // All-null groups: a null _n means the group's histogram holds ONLY
    // the null bucket (sum over an empty when-set) — emit the group with
    // a null percentile, same frame, no second aggregation.
    val emptyGroups = marked
      .filter(col("_bkt").isNull && col("_n").isNull)
      .select(grp :+ lit(null).cast(valueType).as(outCol): _*)

    picked.unionByName(emptyGroups)
  }

  /** Exact PERCENTILE_DISC via the bucketed histogram in ONE corpus pass
    * (round 17): [[percentileDiscTwoLevel]]'s level-2 re-scan exists to
    * avoid carrying values through the shuffle, but its cost is a whole
    * extra scan + broadcast join + window SERIALIZED behind the
    * histogram (the target bucket must be known before pass 2 can
    * start) — at serving scale that is 2-3 stages of pure latency. Here
    * each (group, bucket) cell carries its sorted value array alongside
    * its count, so the pick is a closed-form `element_at` on the one
    * target row — scan → map-side-combined agg → one window pass over
    * the tiny histogram, done.
    *
    * Scale contract — SAME per-task bound as the two-level variant, made
    * explicit: a (group, bucket) cell's array is O(n/B) rows, exactly
    * the rows two-level's pass-2 window holds in one task for the
    * target bucket; `bucketWidth` is the knob that keeps n/B
    * task-sized in both formulations (the in-plan guard fails loudly at
    * the Int.MaxValue in-bucket-rank ceiling instead of mis-picking).
    * The difference is WHERE the non-target buckets go: two-level never
    * shuffles them (histogram counts only) at the price of the second
    * scan; this one ships every value through the one shuffle — the
    * right trade whenever a second full scan costs more than shuffling
    * the column (always at serving scale; at 100 TB pick by scan cost
    * vs column width). Output/null semantics identical to
    * [[percentileDisc]]: one row per group, all-null groups emit null. */
  def percentileDiscOnePass(df: DataFrame, valueCol: String, p: Double,
                            partitionCols: Seq[String], outCol: String,
                            bucketWidth: Double = 1000.0): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be > 0; got $bucketWidth")
    require(p >= 0 && p <= 1, s"p=$p out of [0, 1]")
    val grp = partitionCols.map(col)
    val valueType = df.schema(valueCol).dataType
    val v = col(valueCol)

    // One pass: (group, bucket) → (count, sorted values). collect_list
    // skips nulls, so the null bucket's array is empty — only its count
    // matters (all-null-group detection).
    val hist = df
      .groupBy(grp :+ when(v.isNotNull,
        floor(v.cast("double") / bucketWidth).cast("long")).as("_bkt"): _*)
      .agg(count(lit(1)).as("_cnt"), sort_array(collect_list(v)).as("_vs"))

    val wAll = Window.partitionBy(grp: _*)
    val wB = Window.partitionBy(grp: _*).orderBy(col("_bkt"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val nonNullCnt = when(col("_bkt").isNotNull, col("_cnt"))
    val marked = hist
      .withColumn("_n", sum(nonNullCnt).over(wAll))
      .withColumn("_before", coalesce(sum(nonNullCnt).over(wB), lit(0L)))
      // k >= 1: PERCENTILE_DISC(0) is the minimum (SQL semantics).
      .withColumn("_k", greatest(ceil(lit(p) * col("_n")).cast("long"), lit(1L)))

    // Exactly one row per group survives: the target bucket (its j-th
    // smallest is the answer) or, for an all-null group (_n null — the
    // sum saw only the null bucket), the null-percentile row.
    marked
      .filter((col("_bkt").isNotNull && col("_before") < col("_k") &&
          col("_k") <= col("_before") + col("_cnt")) ||
        (col("_bkt").isNull && col("_n").isNull))
      // element_at is 1-based int: fail loudly if one bucket outgrew the
      // rank ceiling (shrink bucketWidth) instead of mis-picking.
      .filter(assert_true(
        col("_bkt").isNull || col("_cnt") <= lit(Int.MaxValue.toLong),
        concat(lit("percentileDiscOnePass: bucket "), col("_bkt"),
          lit(" holds "), col("_cnt"),
          lit(" rows — over the in-bucket rank ceiling; shrink " +
            "bucketWidth"))).isNull)
      .select(grp :+ when(col("_bkt").isNotNull,
        element_at(col("_vs"), (col("_k") - col("_before")).cast("int")))
        .cast(valueType).as(outCol): _*)
  }

  /** Exact PERCENTILE_DISC for CONTINUOUS measures (~no repeated values,
    * where [[percentileDisc]]'s histogram degenerates to the full data).
    *
    * Three bounded passes, no per-group full sort:
    *   1. per group: non-null count n + approx_percentile sketch bounds at
    *      p±eps — a single partial-aggregating shuffle;
    *   2. exact rank of the lower bound: count of values < lo (broadcast
    *      the tiny per-group bounds back over the data);
    *   3. the answer is the (k - rank_lo)-th smallest value INSIDE the
    *      [lo, hi] bracket (≈ 2·eps·n rows per group, not n) — a window
    *      over the small bracket only, k = ceil(p·n).
    *
    * `eps` must exceed the sketch's rank error (accuracy is set so it
    * does); if the bracket still misses the answer the group is emitted
    * with a null — callers can assert or fall back to the exact path.
    */
  def percentileDiscContinuous(df: DataFrame, valueCol: String, p: Double,
                               partitionCols: Seq[String], outCol: String,
                               eps: Double = 0.01): DataFrame = {
    require(eps > 0 && eps < 0.5, s"eps=$eps out of (0, 0.5)")
    val grp = partitionCols.map(col)
    val accuracy = math.max(100, math.ceil(2.0 / eps).toInt) // rank err ≤ n/accuracy < eps·n
    val pLo = math.max(0.0, p - eps)
    val pHi = math.min(1.0, p + eps)

    // Pass 1: count + sketch bracket per group.
    val bounds = df
      .groupBy(grp: _*)
      .agg(
        count(col(valueCol)).as("_n"),
        percentile_approx(col(valueCol), lit(pLo), lit(accuracy)).as("_lo"),
        percentile_approx(col(valueCol), lit(pHi), lit(accuracy)).as("_hi"))

    // Pass 2: exact rank of the bracket floor.
    val withBounds = df
      .filter(col(valueCol).isNotNull)
      .join(broadcast(bounds), partitionCols)
    val ranks = withBounds
      .groupBy(grp: _*)
      .agg(sum(when(col(valueCol) < col("_lo"), 1L).otherwise(0L)).as("_below"))

    // Pass 3: k-th order statistic inside the bracket only.
    val w = Window.partitionBy(grp: _*).orderBy(col(valueCol))
    val picked = withBounds
      .filter(col(valueCol) >= col("_lo") && col(valueCol) <= col("_hi"))
      .withColumn("_rn", row_number().over(w))
      .join(broadcast(ranks), partitionCols)
      .filter(col("_below") + col("_rn") === ceil(lit(p) * col("_n")).cast("long"))
      .groupBy(grp: _*)
      .agg(min(col(valueCol)).as(outCol))

    // Keep every group (all-null groups and any bracket miss → null).
    bounds.select(grp: _*).join(picked, partitionCols, "left")
      .select(grp :+ col(outCol): _*)
  }

  /** Exact WEIGHTED percentile per key, window-free: the smallest value
    * v (in (value, id) order) whose cumulative WEIGHT reaches
    * ceil(pct·W_key/100) — e.g. the token-weighted median document
    * length ("half this source's tokens sit in docs of ≤ L tokens"),
    * the curation statistic the unweighted family can't express.
    *
    * Same machinery as [[Sampling.systematicWeightedPerKey]]: ONE
    * global range exchange on (key, value, id) ([[SurrogateKeys
    * .prefixSum]] — no `Window.partitionBy(key)`, so a mega-key spreads
    * across range partitions), key-local prefixes as global − first-of-
    * key, then the pick is a closed-form filter — exactly one row per
    * key satisfies prefix < t ≤ prefix+w because weights are positive
    * and t ∈ [1, W]. All-BIGINT (ceil-div via `div`), so another engine
    * replays the identical pick; pct·W_key is overflow-guarded in-plan.
    * Rows with weight ≤ 0 own an empty interval and are dropped; a key
    * whose every weight is ≤ 0 disappears (no defined weighted
    * percentile). */
  def weightedPercentileByKey(df: DataFrame, keyCol: String, valueCol: String,
                              idCol: String, weightCol: String,
                              pct: Int): DataFrame = {
    require(pct >= 1 && pct <= 100, s"pct must be in [1,100]; got $pct")
    val pref = SurrogateKeys.prefixSum(
      df.filter(col(weightCol) > 0),
      weightCol, "_gp", Seq(keyCol, valueCol, idCol))
    val perKey = pref.groupBy(col(keyCol))
      .agg(min(col("_gp")).as("_base"), sum(col(weightCol)).as("_W"))
      // Guard covers the FULL expression _W·pct + 99, not just the
      // product — in non-ANSI mode a wrapped BIGINT picks silently
      // wrong instead of failing loudly.
      .filter(assert_true(
        col("_W") <= (Long.MaxValue - 99L) / pct,
        concat(lit(s"weightedPercentileByKey: pct=$pct times key weight "),
          col("_W"),
          lit(" overflows BIGINT threshold arithmetic — rescale the " +
            "weights (the pick only needs their ratios)"))).isNull)
    pref.join(perKey, Seq(keyCol))
      .withColumn("_p", col("_gp") - col("_base"))
      .withColumn("_t", expr(s"((_W * $pct) + 99) div 100"))
      .filter(col("_p") < col("_t") && col("_t") <= col("_p") + col(weightCol))
      .select(col(keyCol), col(valueCol).as(s"p$pct"))
  }
}
