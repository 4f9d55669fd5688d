package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Shared combine for ADDITIVE (abelian-group) count-model maintenance —
  * the single-shuffle core of [[LmScore.maintainCounts]] (bigram LM) and
  * [[Dsir.maintainBucketCounts]] (hashed-feature histograms): the stored
  * model's (key, cnt) rows union with raw ±1 occurrence streams and ONE
  * map-side-combined sum produces the new model, zero-count rows dropped
  * (a full retrain never emits them). Correctness is the group axioms:
  * per-key sums commute and have inverses, so
  * prev − removed-occurrences + added-occurrences IS the full retrain.
  * Pre-aggregating the legs separately would pay extra key shuffles for
  * frames the final sum re-aggregates anyway (measured on q155: 3
  * shuffles → 1, 2.3 s → 0.94 s). */
private[graft] object AdditiveCounts {

  /** `prevModel`: (keyCol, cnt). `minusKeys`/`plusKeys`: one row per
    * REMOVED/ADDED occurrence (multiplicity = row count). */
  def maintain(prevModel: DataFrame, keyCol: String,
               minusKeys: DataFrame, plusKeys: DataFrame): DataFrame =
    maintain(prevModel, Seq(keyCol), minusKeys, plusKeys)

  /** Composite-key flavor (the CMS cell table's (i, bucket) — q180). */
  def maintain(prevModel: DataFrame, keyCols: Seq[String],
               minusKeys: DataFrame, plusKeys: DataFrame): DataFrame =
    prevModel.select(keyCols.map(col) :+ col("cnt").as("d"): _*)
      .unionByName(minusKeys.select(keyCols.map(col) :+ lit(-1L).as("d"): _*))
      .unionByName(plusKeys.select(keyCols.map(col) :+ lit(1L).as("d"): _*))
      .groupBy(keyCols.map(col): _*).agg(sum(col("d")).as("cnt"))
      .filter(col("cnt") > 0)
}
