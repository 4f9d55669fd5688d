package graft.pipeline

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.{Categorize, Cleaning, Duration}

/** Silver layer — cleanse/conform/enrich (`aact_silver_layer.sql:13-408`):
  * one wide projection per entity built from the cleaning combinators; a
  * narrow, shuffle-free map stage (zero joins except broadcast mapping
  * enrichment), exactly the reference's one-CTE-per-entity CTAS shape.
  */
object Silver {

  /** silver.orders — sentinel fills, status recode, value banding, date
    * imputation with provenance flags (the silver.studies pattern,
    * `aact_silver_layer.sql:18-360`). `asOf` parameterizes CURRENT_DATE
    * (F11) so rebuilds are reproducible. */
  def cleanOrders(orders: DataFrame, asOf: String = "1998-08-01"): DataFrame = {
    val asOfD = to_date(lit(asOf))
    val od = col("o_orderdate").cast("date")
    orders.select(
      col("o_orderkey"), col("o_custkey"),
      Cleaning.fillSentinel(col("o_orderpriority"), "Not specified").as("priority"),
      when(col("o_orderstatus") === "O", lit("Open"))
        .when(col("o_orderstatus") === "F", lit("Finished"))
        .when(col("o_orderstatus") === "P", lit("Pending"))
        .otherwise(lit("Unknown")).as("status_desc"),
      col("o_totalprice"),
      Cleaning.imputeFutureDate(od, asOfD, asOfD).as("order_date"),
      Cleaning.imputeFlag(od, asOfD).as("order_date_type"))
  }

  /** silver.lineitem — quantity cap + flag (enrollment-cap pattern,
    * `aact_silver_layer.sql:162-165`) and the best-priority recode input. */
  def cleanLineitem(lineitem: DataFrame, qtyCap: Int = 45): DataFrame =
    lineitem.select(
      col("l_orderkey"), col("l_partkey"), col("l_quantity"),
      Cleaning.capped(col("l_quantity"), lit(qtyCap)).as("quantity_capped"),
      Cleaning.cappedFlag(col("l_quantity"), lit(qtyCap)).as("quantity_flag"),
      col("l_returnflag"))

  /** silver.part — therapeutic-area-style categorizer over the name
    * (`aact_silver_layer.sql:454-500`). */
  def cleanPart(part: DataFrame): DataFrame =
    part.select(
      col("p_partkey"), col("p_name"), col("p_brand"),
      Categorize.categorize(
        col("p_name"),
        Seq(
          Seq("%red%", "%hot%") -> "Warm",
          Seq("%blue%", "%cold%", "%small%") -> "Cool",
          Seq("%gizmo%", "%widget%", "%gear%") -> "Mechanical"),
        default = "Other").as("category"))

  def run(spark: SparkSession, outDir: String): Unit = {
    val b = (n: String) => spark.read.parquet(s"$outDir/bronze/$n")
    // orders partitioned by year: queries with an order_year predicate
    // prune whole directories at the file-index level — at 100 TB this is
    // the difference between scanning one year and scanning the decade.
    cleanOrders(b("orders"))
      .withColumn("order_year", year(col("order_date")))
      .write.mode(SaveMode.Overwrite)
      .partitionBy("order_year")
      .parquet(s"$outDir/silver/orders")
    Seq(
      "lineitem" -> cleanLineitem(b("lineitem")),
      "part" -> cleanPart(b("part")),
      "customer" -> b("customer")
    ).foreach { case (n, df) =>
      df.write.mode(SaveMode.Overwrite).parquet(s"$outDir/silver/$n")
    }
  }
}
