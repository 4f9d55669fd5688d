package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed as-of join — the classic time-series operator Spark's join
  * surface lacks (pandas `merge_asof`, DuckDB `ASOF JOIN`, kdb `aj`): for
  * every left row, attach the single right row with the LARGEST right time
  * `<=` the left time (backward, inclusive) within the same partition keys —
  * or the SMALLEST right time `>=` for forward mode.
  *
  * Spark-first formulation: NOT a join at all. A join-based as-of either
  * range-explodes (left ⋈ right on key + inequality, then argmax — the
  * candidate set is O(|left|·|right|) per key) or falls to a broadcast
  * nested-loop. Instead both sides are unioned, shuffled ONCE on the
  * partition keys, sorted by (time, side) within each key, and the right
  * payload is carried forward with a running `last(_, ignoreNulls)` window —
  * O((|L|+|R|) log) per key, one Exchange, no candidate blow-up, and AQE
  * still splits a skewed key's sort. This is the standard distributed
  * as-of shape (same plan family as sessionization).
  *
  * Tie discipline: right rows must be unique per (keys, time) — enforce
  * upstream with an argmax pre-aggregation (see `latestPerKeyTime`) —
  * otherwise which duplicate wins is sort-nondeterministic.
  */
object AsOf {

  /** Backward (default) or forward match direction. */
  sealed trait Direction
  case object Backward extends Direction
  case object Forward extends Direction

  /** Reduce `right` to one row per (keys, timeCol), keeping per group the
    * row with the greatest `tieCol` — the deterministic-tie-break
    * preparation for [[joinAsOf]]. One partial-aggregating shuffle. */
  def latestPerKeyTime(right: DataFrame, keys: Seq[String], timeCol: String,
                       tieCol: String, payload: Seq[String]): DataFrame = {
    val ordered = struct((tieCol +: payload.filterNot(_ == tieCol)).map(col): _*)
    right.groupBy((keys :+ timeCol).map(col): _*)
      .agg(max(ordered).as("_best"))
      .select((keys :+ timeCol).map(col) ++
        (tieCol +: payload.filterNot(_ == tieCol)).map(c => col(s"_best.$c").as(c)): _*)
  }

  /** As-of join `left` ← `right` on equal `keys` and time proximity.
    *
    * Every left row and column survives (left-outer semantics); matched
    * right `payload` columns are appended as `prefix + name` (right time
    * included automatically as `prefix + rightTime`), NULL when no right
    * row qualifies. `tolerance`: optional predicate `(leftT, rightT) =>
    * keep` applied AFTER the nearest match is found (pandas-`tolerance`
    * semantics: a too-old match becomes NULL, it does not fall back to an
    * older one).
    */
  def joinAsOf(left: DataFrame, right: DataFrame, keys: Seq[String],
               leftTime: String, rightTime: String, payload: Seq[String],
               direction: Direction = Backward, prefix: String = "asof_",
               tolerance: Option[(Column, Column) => Column] = None): DataFrame = {
    require(keys.nonEmpty, "as-of join needs at least one partition key")
    val payloadAll = (rightTime +: payload.filterNot(_ == rightTime)).distinct

    // Union schema: keys, _t, left-row struct, right-payload struct, side.
    // Nulls need explicit casts to the OTHER side's struct type.
    val lStructT = left.select(struct(left.columns.map(col): _*).as("s")).schema("s").dataType
    val pStructT = right.select(struct(payloadAll.map(col): _*).as("s")).schema("s").dataType
    val lSide = left.select(
      keys.map(col) ++ Seq(
        col(leftTime).as("_t"),
        struct(left.columns.map(col): _*).as("_l"),
        lit(null).cast(pStructT).as("_p"),
        lit(1).as("_side")): _*)
    val rSide = right.select(
      keys.map(col) ++ Seq(
        col(rightTime).as("_t"),
        lit(null).cast(lStructT).as("_l"),
        struct(payloadAll.map(col): _*).as("_p"),
        lit(0).as("_side")): _*)

    // Within a key, order by time (reversed for forward) with right rows
    // (side 0) before left rows at EQUAL time → inclusive match. The
    // running last(ignoreNulls) is the carried nearest right payload.
    val timeOrd = direction match {
      case Backward => col("_t").asc
      case Forward  => col("_t").desc
    }
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(timeOrd, col("_side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val matched = lSide.unionByName(rSide)
      .withColumn("_m", last(col("_p"), ignoreNulls = true).over(w))
      .filter(col("_side") === 1)
    val kept = tolerance match {
      case Some(keep) => matched.withColumn("_m",
        when(col("_m").isNotNull &&
          keep(col("_t"), col(s"_m.$rightTime")), col("_m")))
      case None => matched
    }
    kept.select(
      left.columns.map(c => col(s"_l.$c").as(c)) ++
        payloadAll.map(c => col(s"_m.$c").as(prefix + c)): _*)
  }
}
