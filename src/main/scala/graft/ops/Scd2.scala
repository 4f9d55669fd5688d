package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension type-2 merge — the incremental counterpart of
  * the reference's full-rebuild dims (aact_gold_layer.sql:25-46 rebuilds
  * `dim_studies` from scratch every run). At warehouse scale a 100 TB dim
  * can't be rebuilt per batch; the standard alternative is an SCD2 upsert:
  * changed keys get their current row closed (`valid_to` = effective date)
  * and a new open row appended; unchanged and absent keys pass through.
  *
  * Pure batch DataFrame composition — one shuffle on the key (the join),
  * map-side unions, no window functions, no driver-side state — so the
  * merge scales exactly like an equi-join: AQE broadcasts a small update
  * batch (the common case: daily deltas vs a huge dim), sort-merge when
  * both sides are big.
  */
object Scd2 {

  /** Merge `updates` into `current` (an SCD2 dim with `valid_from`,
    * `valid_to`, `is_current` audit columns), producing the next dim state.
    *
    * @param current  existing dim rows: key ++ attrs ++ (valid_from,
    *                 valid_to, is_current). Closed history rows
    *                 (is_current = false) pass through untouched.
    * @param updates  one row per key: key ++ attrs (no audit columns).
    * @param key      business key column name
    * @param attrs    tracked attribute column names; a change in ANY closes
    *                 the current row
    * @param effDate  effective date of this batch: `valid_to` of closed
    *                 rows and `valid_from` of opened rows
    */
  def merge(current: DataFrame, updates: DataFrame, key: String,
            attrs: Seq[String], effDate: Column): DataFrame = {
    require(attrs.nonEmpty, "attrs must be non-empty")
    val audit = Seq("valid_from", "valid_to", "is_current")
    val outCols = (key +: attrs) ++ audit

    val cur = current.filter(col("is_current"))
    val hist = current.filter(!col("is_current")).select(outCols.map(col): _*)

    val u = updates.select((key +: attrs).map(c => col(c).as(s"u_$c")): _*)
    // One join gives every current-vs-update disposition; null-safe
    // attribute compare so NULL→value and value→NULL both count as change.
    val joined = cur.join(u, col(key) === col(s"u_$key"), "full_outer")
    val changed = attrs.map(a => !(col(a) <=> col(s"u_$a"))).reduce(_ || _)

    // current rows kept open: no update arrived, or update is identical
    val keptOpen = joined.filter(col(key).isNotNull && (col(s"u_$key").isNull || !changed))
      .select(outCols.map(col): _*)
    // current rows closed by a differing update
    val closed = joined.filter(col(key).isNotNull && col(s"u_$key").isNotNull && changed)
      .select((key +: attrs).map(col) ++ Seq(
        col("valid_from"), effDate.as("valid_to"), lit(false).as("is_current")): _*)
    // opened rows: differing update (new version) or brand-new key
    val opened = joined.filter(col(s"u_$key").isNotNull && (col(key).isNull || changed))
      .select((key +: attrs).map(c => col(s"u_$c").as(c)) ++ Seq(
        effDate.as("valid_from"), lit(null).cast("date").as("valid_to"),
        lit(true).as("is_current")): _*)

    hist.unionByName(keptOpen).unionByName(closed).unionByName(opened)
  }
}
