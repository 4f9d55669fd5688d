package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic corpus-curation sampling — train/val/test assignment and
  * stratified subsampling for the LLM-data-pipeline extension (SURVEY §7.5).
  *
  * The hash basis is md5 of the key (engine-portable; xxhash64 is
  * Spark-only), folded to a uniform bucket with plain ascii/modulo
  * arithmetic so any engine — including the DuckDB oracle — reproduces the
  * assignment bit-for-bit. Determinism is the point: re-running the
  * pipeline, or computing the split on a different engine, must put every
  * document in the same fold; `rand()`-based sampling can't promise that
  * and silently leaks val/test into train on reruns.
  *
  * The hash-bucket family ([[hashBucket]]/[[split]]/[[keep]]) is pure
  * `Column` composition: narrow, shuffle-free, codegen'd.
  * [[systematicWeighted]] adds the one selection that NEEDS global state
  * (an exact-k weighted budget) and pays exactly one range exchange.
  */
object Sampling {

  /** Uniform pseudo-random bucket in [0, buckets) from the key: first two
    * hex chars of md5, combined with ascii arithmetic (portable — no
    * hex-to-int builtin shared across engines). Two hex chars = 256
    * distinct states, so `buckets` must stay ≤ 256 for uniformity-ish;
    * 100 (percent granularity) is the intended use. */
  def hashBucket(key: Column, buckets: Int = 100): Column = {
    require(buckets > 0 && buckets <= 256, s"buckets must be in [1,256]; got $buckets")
    val h = md5(key.cast("string"))
    (ascii(substring(h, 1, 1)) * 31 + ascii(substring(h, 2, 1))) % buckets
  }

  /** Deterministic fold assignment: 'train'/'val'/'test' by hash bucket —
    * same document, same fold, on every engine and every rerun. */
  def split(key: Column, trainPct: Int = 80, valPct: Int = 10): Column = {
    require(trainPct > 0 && valPct >= 0 && trainPct + valPct <= 100,
      s"invalid split percentages: train=$trainPct val=$valPct")
    val b = hashBucket(key)
    when(b < trainPct, lit("train"))
      .when(b < trainPct + valPct, lit("val"))
      .otherwise(lit("test"))
  }

  /** Deterministic ~pct% keep-filter, independent of the fold split (uses
    * a salted key so sampling and splitting don't correlate). Use per
    * stratum for stratified subsampling:
    * `docs.filter(Sampling.keep(concat(col("lang"), col("doc_id")), 10))`. */
  def keep(key: Column, pct: Int): Column = {
    require(pct >= 0 && pct <= 100, s"pct must be in [0,100]; got $pct")
    hashBucket(concat(lit("smp:"), key.cast("string"))) < pct
  }

  /** Deterministic SYSTEMATIC weighted sampling of exactly `k` picks
    * (with multiplicity) proportional to an integer weight — the
    * weighted counterpart of [[keep]], for "sample a fixed token/byte
    * budget from a weighted corpus" selection where Bernoulli keep-%
    * can't hit an exact budget and floating-point A-ES/A-Res keys
    * (u^(1/w)) are libm-rounding-dependent and so never bit-portable.
    *
    * Classic systematic (cumulative-interval) sampling on a pseudo-random
    * permutation: rows are laid on the integer line [0, W) in (md5(id),
    * id) order, each owning the interval [prefix, prefix+w); the k
    * equally-spaced pick points p_j = floor(j·W/k), j = 0..k-1, select
    * whichever rows' intervals they land in. A row's multiplicity is
    * counted in closed form — the number of integers j with
    * prefix ≤ j·W/k < prefix+w, i.e.
    *
    *   mult = ceil((prefix+w)·k / W) − ceil(prefix·k / W)
    *
    * — no explode, no per-pick join: the selection pass is one map over
    * the prefix-summed frame. ALL-INTEGER (BIGINT ceil-div), so the
    * sample is bit-identical on any engine and any partitioning; the
    * md5-permutation makes it unbiased-in-practice and independent of
    * input order, and weights bound each row's advantage exactly
    * (Σ mult = k always; a row can be picked more than once only when
    * w > W/k). Scale shape: ONE range exchange ([[SurrogateKeys
    * .prefixSum]]) + a broadcast 1-row total; linear, skew-free.
    *
    * Domain: weights must be positive (rows with w ≤ 0 are filtered out —
    * they own an empty interval and can never be picked) and
    * k·W must stay below 2^63 — guarded lazily in-plan (the same
    * assert-riding-the-broadcast idiom as
    * [[Decontaminate.removeEvalSpans]]'s size guard).
    *
    * Returns the SELECTED rows only: all input columns plus
    * `prefixCol`/`multCol` (pick multiplicity ≥ 1).
    */
  def systematicWeighted(df: DataFrame, idCol: String, weightCol: String,
                         k: Int, prefixCol: String = "prefix_w",
                         multCol: String = "pick_mult"): DataFrame = {
    require(k >= 1, s"k must be >= 1; got $k")
    val pref = SurrogateKeys.prefixSum(
      df.filter(col(weightCol) > 0)
        .withColumn("_h", md5(col(idCol).cast("string"))),
      weightCol, prefixCol, Seq("_h", idCol))
    // Total weight W rides the plan as a broadcast 1-row frame (no eager
    // driver action), carrying the k·W overflow guard with it.
    val tot = pref.agg(max(col(prefixCol) + col(weightCol)).as("_W"))
    // Guard bounds the FULL pick expression (prefix+w)·k + _W − 1 ≤
    // _W·(k+1) − 1, not just k·_W — a wrapped BIGINT in non-ANSI mode
    // picks silently wrong rather than failing loudly.
    val guardedTot = tot.filter(assert_true(
      col("_W") <= Long.MaxValue / (k.toLong + 1L),
      concat(lit(s"systematicWeighted: k=$k times total weight "), col("_W"),
        lit(" overflows BIGINT pick arithmetic — reduce k or rescale " +
          "the weights (selection only needs their ratios)"))).isNull)
    // Exact BIGINT ceil-div (a + W - 1) div W; `div` avoids Spark's
    // double-routed `/` (same discipline as Graph.pageRank's shares).
    pref.crossJoin(broadcast(guardedTot))
      .withColumn("_ca", (col(prefixCol) + col(weightCol)) * k + col("_W") - 1)
      .withColumn("_cb", col(prefixCol) * k + col("_W") - 1)
      .withColumn(multCol, expr("_ca div _W") - expr("_cb div _W"))
      .filter(col(multCol) > 0)
      .drop("_h", "_W", "_ca", "_cb")
  }

  /** STRATIFIED [[systematicWeighted]]: exactly k weighted picks PER KEY
    * (Σ mult = k within every key with positive total weight) — the
    * "draw each source's budget" step a mixture builder runs once per
    * crawl, as ONE plan instead of a per-source loop.
    *
    * Same integer machinery, derived per key without a per-key window:
    * the global prefix sum ranges on (key, md5(id), id), so each key's
    * rows are CONTIGUOUS on the integer line and its local prefix is
    * just `global − first-of-key` — one aggregate (min prefix, total
    * weight per key) joined back on the key. No
    * `Window.partitionBy(key)` anywhere, so a mega-key spreads across
    * range partitions instead of serializing on one task (the q124
    * lesson); the per-key totals frame is #keys rows and joins hash- or
    * broadcast-side as the optimizer sees fit.
    *
    * Same domain rules per key: w > 0 rows only; k·W_key < 2^63,
    * guarded lazily in-plan. `prefixCol` is the KEY-LOCAL prefix. */
  def systematicWeightedPerKey(df: DataFrame, keyCol: String, idCol: String,
                               weightCol: String, k: Int,
                               prefixCol: String = "prefix_w",
                               multCol: String = "pick_mult"): DataFrame = {
    require(k >= 1, s"k must be >= 1; got $k")
    val pref = SurrogateKeys.prefixSum(
      df.filter(col(weightCol) > 0)
        .withColumn("_h", md5(col(idCol).cast("string"))),
      weightCol, "_gp", Seq(keyCol, "_h", idCol))
    val perKey = pref.groupBy(col(keyCol))
      .agg(min(col("_gp")).as("_base"), sum(col(weightCol)).as("_W"))
      // k+1 divisor: the pick expression reaches _W·(k+1) − 1 (see
      // systematicWeighted's guard note).
      .filter(assert_true(
        col("_W") <= Long.MaxValue / (k.toLong + 1L),
        concat(lit(s"systematicWeightedPerKey: k=$k times key weight "),
          col("_W"),
          lit(" overflows BIGINT pick arithmetic — reduce k or rescale " +
            "the weights (selection only needs their ratios)"))).isNull)
    pref.join(perKey, Seq(keyCol))
      .withColumn(prefixCol, col("_gp") - col("_base"))
      .withColumn("_ca", (col(prefixCol) + col(weightCol)) * k + col("_W") - 1)
      .withColumn("_cb", col(prefixCol) * k + col("_W") - 1)
      .withColumn(multCol, expr("_ca div _W") - expr("_cb div _W"))
      .filter(col(multCol) > 0)
      .drop("_h", "_gp", "_base", "_W", "_ca", "_cb")
  }
}
