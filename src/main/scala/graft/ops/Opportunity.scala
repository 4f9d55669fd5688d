package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Flagship analytical dataflow — a faithful structural clone of
  * `gold.opportunity_rank` (`aact_gold_layer.sql:260-349`) over the testdata
  * star schema (SURVEY §7.3 mapping: orders=trials, lineitem=interventions,
  * part=conditions, customer=sponsors).
  *
  * Reference dataflow (4 CTEs):
  *   trial_priority    := GroupBy(orderkey) min(CASE returnflag)       (:264-275)
  *   relevant_trials   := Filter(coalesce(bp,99)<=2 AND status='F')
  *                          (orders LEFT JOIN trial_priority)          (:278-290)
  *   condition_metrics := GroupBy(name) count + 3×sum(CASE)            (:293-308)
  *   condition_sponsors:= GroupBy(name) count(DISTINCT sponsor)        (:311-325)
  *   final             := weighted score over metrics ⟕ sponsors       (:328-349)
  *
  * We fuse condition_metrics and condition_sponsors into ONE aggregation:
  * the sponsor count is `COUNT(DISTINCT sponsor) FILTER (industry)`, which a
  * left join to the pre-filtered sponsor dim followed by
  * `countDistinct(c_custkey)` computes exactly (nulls never count, so
  * no-industry groups get 0 — same as the reference's COALESCE(...,0) on the
  * left join). Semantically identical, and it halves the plan: the reference
  * shape made Catalyst execute the whole relevant⋈items⋈part subtree TWICE
  * (once per aggregate) — at 100 TB that is two full fact scans instead of
  * one, plus an extra shuffle for the metrics⟕sponsors join.
  *
  * Pre-aggregation BEFORE joining the per-condition results back to anything
  * wider remains semantic, not stylistic — aggregating after a further
  * fan-out join would double-count (SURVEY §4.1).
  */
object Opportunity {

  /** @param excludePattern NOT-ILIKE exclusion over the condition name,
    *                       mirroring `name NOT ILIKE '%healthy%'`
    *                       (aact_gold_layer.sql:349). Matched
    *                       case-insensitively on BOTH sides, so
    *                       '%Healthy%' and '%healthy%' behave identically. */
  def opportunityRank(orders: DataFrame, lineitem: DataFrame,
                      part: DataFrame, customer: DataFrame,
                      excludePattern: String = "%old%"): DataFrame = {
    // trial_priority — aact_gold_layer.sql:264-275 (A4 min-CASE best-of).
    // Columns pruned/renamed per branch: lineitem feeds both this aggregate
    // and the fan-out below, and distinct attribute sets keep the two reads
    // unambiguous (and let each scan prune to just the columns it needs).
    val priority = lineitem
      .select(col("l_orderkey").as("tp_orderkey"), col("l_returnflag"))
      .groupBy(col("tp_orderkey"))
      .agg(min(
        when(col("l_returnflag") === "R", 1)
          .when(col("l_returnflag") === "A", 2)
          .otherwise(3)).as("best_priority"))

    // relevant_trials — aact_gold_layer.sql:278-290 (J5 left join + fallback filter)
    val relevant = orders
      .join(priority, col("o_orderkey") === col("tp_orderkey"), "left")
      .filter(coalesce(col("best_priority"), lit(99)) <= 2 && col("o_orderstatus") === "F")
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderdate"))

    // M:N fan-out trials ⋈ conditions — aact_gold_layer.sql:302-305 (J6)
    val items = lineitem.select(col("l_orderkey"), col("l_partkey"), col("l_quantity"))
    val fanout = relevant
      .join(items, col("o_orderkey") === col("l_orderkey"))
      .join(part.select(col("p_partkey"), col("p_name")),
        col("l_partkey") === col("p_partkey"))

    // Industry-sponsor lookup: pre-filtered, single unique-key column, so the
    // left join below is row-preserving (c_custkey is unique) and broadcast.
    val industry = customer
      .filter(col("c_mktsegment") === "BUILDING")
      .select(col("c_custkey"))

    // condition_metrics + condition_sponsors fused — aact_gold_layer.sql:
    // 293-325 (A1-A3 + A5) in one shuffle; countDistinct ignores the nulls
    // the left join leaves for non-industry rows.
    val joined = fanout
      .join(broadcast(industry), col("o_custkey") === col("c_custkey"), "left")
      .groupBy(col("p_name"))
      .agg(
        count(lit(1)).as("total_trials"),
        sum(when(col("l_quantity") >= 30, 1).otherwise(0)).as("late_phase_count"),
        sum(when(col("o_orderdate").between(
          to_timestamp(lit("1997-01-01 00:00:00")),
          to_timestamp(lit("1998-08-01 00:00:00"))), 1).otherwise(0)).as("recent_trials"),
        sum(when(col("o_orderdate") < to_timestamp(lit("1996-01-01 00:00:00")), 1)
          .otherwise(0)).as("older_trials"),
        countDistinct(col("c_custkey")).as("industry_sponsors"))
      .filter(col("total_trials") > 10 && !Categorize.ilike(col("p_name"), excludePattern))

    val relevance = col("late_phase_count").cast("double") / col("total_trials").cast("double")
    val density = col("recent_trials").cast("double") / col("total_trials").cast("double")
    val saturation = lit(1.0) / (lit(1.0) + col("industry_sponsors").cast("double"))
    val momentum = col("recent_trials").cast("double") / (col("older_trials").cast("double") + lit(1.0))
    val score = lit(0.4) * relevance + lit(0.3) * density + lit(0.2) * saturation + lit(0.1) * momentum

    joined
      .withColumn("opportunity_score", round(score, 6))
      .withColumn("opportunity_rank",
        row_number().over(Window.orderBy(col("opportunity_score").desc, col("p_name"))))
      .select(
        col("p_name"), col("total_trials"), col("late_phase_count"),
        col("recent_trials"), col("older_trials"), col("industry_sponsors"),
        col("opportunity_score"), col("opportunity_rank"))
  }
}
