package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Discrete percentiles — `aact_silver_layer.sql:926-928`:
  * `PERCENTILE_DISC(0.997) WITHIN GROUP (ORDER BY enrollment)` per
  * `study_type` derives the hard-coded enrollment caps (566401 / 15886,
  * `aact_silver_layer.sql:164-165`).
  *
  * Spark has no `percentile_disc` aggregate; we use its definition directly:
  * the smallest value whose cumulative distribution is >= p. Formulated with
  * `cume_dist()` so any ANSI engine (the DuckDB oracle included) can run the
  * identical algorithm — no interpolation-formula mismatch possible.
  */
object Percentiles {

  /** One row per partition: (partitionCols*, <valueCol>_p<pct>). */
  def percentileDisc(df: DataFrame, valueCol: String, p: Double,
                     partitionCols: Seq[String], outCol: String): DataFrame = {
    val w = Window.partitionBy(partitionCols.map(col): _*).orderBy(col(valueCol))
    df.filter(col(valueCol).isNotNull)
      .withColumn("_cume", cume_dist().over(w))
      .filter(col("_cume") >= p)
      .groupBy(partitionCols.map(col): _*)
      .agg(min(col(valueCol)).as(outCol))
  }
}
