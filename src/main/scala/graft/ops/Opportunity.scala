package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Flagship analytical dataflow — a faithful structural clone of
  * `gold.opportunity_rank` (`aact_gold_layer.sql:260-349`) over the testdata
  * star schema (SURVEY §7.3 mapping: orders=trials, lineitem=interventions,
  * part=conditions, customer=sponsors).
  *
  * Four-stage shape preserved exactly:
  *   trial_priority    := GroupBy(orderkey) min(CASE returnflag)       (:264-275)
  *   relevant_trials   := Filter(coalesce(bp,99)<=2 AND status='F')
  *                          (orders LEFT JOIN trial_priority)          (:278-290)
  *   condition_metrics := GroupBy(name) count + 3×sum(CASE)            (:293-308)
  *   condition_sponsors:= GroupBy(name) count(DISTINCT sponsor)        (:311-325)
  *   final             := weighted score over metrics ⟕ sponsors       (:328-349)
  *
  * Pre-aggregation BEFORE the final join is semantic, not stylistic —
  * aggregating after the 3-way join would double-count the M:N fan-out
  * (SURVEY §4.1). Scale notes: the priority aggregate is per-order (large) →
  * sort-merge join under AQE; the two per-condition aggregates are small →
  * the final join broadcasts; `relevant` is used by both aggregations, and
  * Catalyst would recompute the subtree, so callers running the full pipeline
  * should `.cache()` it (Bench does; a one-shot query need not).
  */
object Opportunity {

  /** @param excludePattern NOT-ILIKE exclusion over the condition name,
    *                       mirroring `name NOT ILIKE '%healthy%'`
    *                       (aact_gold_layer.sql:349). */
  def opportunityRank(orders: DataFrame, lineitem: DataFrame,
                      part: DataFrame, customer: DataFrame,
                      excludePattern: String = "%old%",
                      cacheRelevant: Boolean = false): DataFrame = {
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
    val relevant0 = orders
      .join(priority, col("o_orderkey") === col("tp_orderkey"), "left")
      .filter(coalesce(col("best_priority"), lit(99)) <= 2 && col("o_orderstatus") === "F")
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderdate"))
    val relevant = if (cacheRelevant) relevant0.cache() else relevant0

    // M:N fan-out trials ⋈ conditions — aact_gold_layer.sql:302-305 (J6)
    val items = lineitem.select(col("l_orderkey"), col("l_partkey"), col("l_quantity"))
    val fanout = relevant
      .join(items, col("o_orderkey") === col("l_orderkey"))
      .join(part.select(col("p_partkey"), col("p_name")),
        col("l_partkey") === col("p_partkey"))

    // condition_metrics — aact_gold_layer.sql:293-308 (A1-A3)
    val metrics = fanout
      .groupBy(col("p_name"))
      .agg(
        count(lit(1)).as("total_trials"),
        sum(when(col("l_quantity") >= 30, 1).otherwise(0)).as("late_phase_count"),
        sum(when(col("o_orderdate").between(
          to_timestamp(lit("1997-01-01 00:00:00")),
          to_timestamp(lit("1998-08-01 00:00:00"))), 1).otherwise(0)).as("recent_trials"),
        sum(when(col("o_orderdate") < to_timestamp(lit("1996-01-01 00:00:00")), 1)
          .otherwise(0)).as("older_trials"))

    // condition_sponsors — aact_gold_layer.sql:311-325 (A5 exact count-distinct)
    val sponsors = fanout
      .join(customer.filter(col("c_mktsegment") === "BUILDING"),
        col("o_custkey") === col("c_custkey"))
      .groupBy(col("p_name").as("sp_name"))
      .agg(countDistinct(col("c_custkey")).as("industry_sponsors"))

    // final weighted score — aact_gold_layer.sql:328-349 (F16; int→double only
    // at the end, identical operation order to the DuckDB oracle)
    val joined = metrics
      .join(sponsors, col("p_name") === col("sp_name"), "left")
      .withColumn("industry_sponsors", coalesce(col("industry_sponsors"), lit(0L)))
      .filter(col("total_trials") > 10 && !lower(col("p_name")).like(excludePattern))

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
