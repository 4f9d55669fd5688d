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
    val grp = partitionCols.map(col)
    val valueType = df.schema(valueCol).dataType

    // Non-null count per group (0 for all-null groups — kept, null result).
    val totals = df.groupBy(grp: _*).agg(count(col(valueCol)).as("_n"))

    // Pass 1: per-(group, value) histogram.
    val hist = df
      .filter(col(valueCol).isNotNull)
      .groupBy((partitionCols :+ valueCol).map(col): _*)
      .agg(count(lit(1)).as("_cnt"))

    // Pass 2: cumulative count over the (small) histogram, then pick the
    // smallest value with _cum >= ceil(p * n). Integer comparison — no
    // float-division boundary sensitivity.
    val w = Window.partitionBy(grp: _*).orderBy(col(valueCol))
    val picked = hist
      .withColumn("_cum", sum(col("_cnt")).over(w))
      .join(totals, partitionCols)
      .filter(col("_cum") >= ceil(lit(p) * col("_n")))
      .groupBy(grp: _*)
      .agg(min(col(valueCol)).as(outCol))

    val emptyGroups = totals
      .filter(col("_n") === 0)
      .select(grp :+ lit(null).cast(valueType).as(outCol): _*)

    picked.unionByName(emptyGroups)
  }
}
