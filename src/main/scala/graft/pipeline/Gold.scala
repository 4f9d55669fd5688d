package graft.pipeline

import org.apache.spark.sql.{SaveMode, SparkSession}

import graft.ops.{DateDim, Star}

/** Gold layer — star schema + scoring (`aact_gold_layer.sql`): dims with
  * surrogate keys, the fact with 0-defaulted dim keys, the M:N bridge, and
  * S8 uniqueness assertions after every keyed write (the reference's
  * post-hoc ADD PRIMARY KEY, `aact_gold_layer.sql:45-46` etc.).
  */
object Gold {

  def run(spark: SparkSession, outDir: String): Unit = {
    val s = (n: String) => spark.read.parquet(s"$outDir/silver/$n")
    val w = (n: String) => s"$outDir/gold/$n"

    val dimSegment = Star.dim(s("customer"), "c_mktsegment", "segment_key")
    dimSegment.write.mode(SaveMode.Overwrite).parquet(w("dim_segment"))
    Star.assertUnique(spark.read.parquet(w("dim_segment")),
      Seq("segment_key"), "dim_segment")

    val dimBrand = Star.dim(s("part"), "p_brand", "brand_key")
    dimBrand.write.mode(SaveMode.Overwrite).parquet(w("dim_brand"))
    Star.assertUnique(spark.read.parquet(w("dim_brand")),
      Seq("brand_key"), "dim_brand")

    // dim_dates lands in two slices — CTAS then INSERT-SELECT (S6), exactly
    // the reference's build: CREATE TABLE + INSERT INTO gold.dim_dates
    // SELECT ... generate_series (aact_gold_layer.sql:92-125). The S8
    // assertion then guards the append against overlap.
    DateDim.dateDim(spark, "1995-01-01", "1996-12-31")
      .write.mode(SaveMode.Overwrite).parquet(w("dim_dates"))
    DateDim.dateDim(spark, "1997-01-01", "1998-12-31")
      .write.mode(SaveMode.Append).parquet(w("dim_dates"))
    val dimDate = spark.read.parquet(w("dim_dates"))
    Star.assertUnique(dimDate, Seq("date_key"), "dim_dates")

    // Fact keeps silver column names the fact builder expects.
    val orders = s("orders")
      .withColumnRenamed("order_date", "o_orderdate")
      .withColumnRenamed("status_desc", "o_orderstatus")
    Star.factOrders(orders, s("customer"), dimSegment, dimDate)
      .write.mode(SaveMode.Overwrite).parquet(w("fact_orders"))
    Star.assertUnique(spark.read.parquet(w("fact_orders")),
      Seq("o_orderkey"), "fact_orders")

    Star.bridgeOrderBrand(s("lineitem"), s("part"), dimBrand)
      .write.mode(SaveMode.Overwrite).parquet(w("bridge_order_brand"))
    Star.assertUnique(spark.read.parquet(w("bridge_order_brand")),
      Seq("o_orderkey", "brand_key"), "bridge_order_brand")
  }
}
