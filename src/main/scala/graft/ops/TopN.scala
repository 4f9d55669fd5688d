package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Skew-proof per-key top-N — the reusable form of the curation-pipeline
  * quota cap (q124, reference `gold_layer.sql`-style per-group ranking).
  *
  * Why it exists: `row_number().over(Window.partitionBy(key))` is the one
  * skew shape AQE can NOT mitigate — adaptive execution splits skewed
  * *join* partitions, but a window partition requires every row of a key
  * in a single task, so at 100 TB a mega-key (common-crawl's top domain
  * is ~1% of the corpus) serializes on — and can OOM — one core.
  *
  * The fix is declarative and exact: phase 1 ranks within (key, salt)
  * where salt is a deterministic hash bucket of the row's tiebreaker, so
  * a mega-key spreads across `salts` tasks and each keeps only its local
  * top N; any global-top-N row is necessarily in its own bucket's top N,
  * so phase 2 — the same window on the key alone — sees at most salts·N
  * rows per key and emits the identical ranking the single-window plan
  * would. Output: the input columns plus an integer `rank` (1-based,
  * dense within key by the given order).
  *
  * `order` must be a TOTAL order per key, and `tiebreaker` must be the
  * plain VALUE column that makes it total (it salts phase 1, so it has
  * to be hashable — passing it explicitly instead of inferring
  * `order.last` keeps a `col(x).desc` sort expression from ever
  * reaching `hash()` and failing at analysis) — with ties, `row_number`
  * would make both the single- and two-phase rankings nondeterministic.
  */
object TopN {

  def saltedTopNPerKey(df: DataFrame, key: Seq[Column], order: Seq[Column],
                       tiebreaker: Column, n: Int,
                       salts: Int = 16): DataFrame = {
    require(n >= 1, s"n must be >= 1; got $n")
    require(salts >= 1, s"salts must be >= 1; got $salts")
    // salt from the unique tiebreaker's value: hash-uniform across the
    // salt buckets, deterministic across retries
    val salted = df.withColumn("_salt", pmod(hash(tiebreaker), lit(salts)))
    val wSalt = Window.partitionBy(key :+ col("_salt"): _*).orderBy(order: _*)
    val wFinal = Window.partitionBy(key: _*).orderBy(order: _*)
    salted
      .withColumn("_lrank", row_number().over(wSalt))
      .filter(col("_lrank") <= n)
      .withColumn("rank", row_number().over(wFinal))
      .filter(col("rank") <= n)
      .drop("_salt", "_lrank")
  }
}
