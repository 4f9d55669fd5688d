package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Calendar dimension generator — `aact_gold_layer.sql:92-125`:
  * `generate_series(DATE'1980-01-01', DATE'2030-12-31', INTERVAL '1 day')`
  * with date_key (yyyyMMdd int), year/quarter/month/day parts, names,
  * ISO week, PG-style day-of-week and weekend flag.
  *
  * Spark-first: `sequence(...)` + `explode` — one row-generator expression,
  * no driver-side loop; the array is built once and exploded in parallel.
  *
  * Cross-engine notes (SURVEY §2.8): PG `EXTRACT(DOW)` is 0=Sun..6=Sat while
  * Spark `dayofweek` is 1=Sun..7=Sat → we emit `dayofweek-1`; PG
  * `TO_CHAR(d,'Month')` blank-pads to 9 chars → we emit trimmed names
  * (documented divergence, matches DuckDB `monthname`).
  */
object DateDim {

  def dateDim(spark: SparkSession, start: String, end: String): DataFrame =
    spark
      .range(1)
      .select(explode(sequence(
        to_date(lit(start)), to_date(lit(end)), expr("INTERVAL 1 DAY"))).as("full_date"))
      .select(
        date_format(col("full_date"), "yyyyMMdd").cast("int").as("date_key"),
        col("full_date"),
        year(col("full_date")).as("year"),
        quarter(col("full_date")).as("quarter"),
        month(col("full_date")).as("month"),
        date_format(col("full_date"), "MMMM").as("month_name"),
        dayofmonth(col("full_date")).as("day_of_month"),
        date_format(col("full_date"), "EEEE").as("day_name"),
        weekofyear(col("full_date")).as("week_of_year"),
        (dayofweek(col("full_date")) - 1).as("day_of_week"),
        dayofweek(col("full_date")).isin(1, 7).as("is_weekend"))
}
