package graft.pipeline

import graft.SparkSpec

/** End-to-end medallion build at sf0.001 — the composed bronze→silver→gold
  * dataflow with S8 uniqueness assertions firing inside Gold.run. */
class PipelineSpec extends SparkSpec {

  test("bronze → silver → gold runs end-to-end with assertions green") {
    val out = "/root/repo/target/pipeline_spec"
    Bronze.run(spark, "/root/testdata/sf0.001", out)
    Silver.run(spark, out)
    Gold.run(spark, out) // throws if any S8 uniqueness assertion fails

    val fact = spark.read.parquet(s"$out/gold/fact_orders")
    fact.count() shouldBe spark.read.parquet(s"$out/bronze/orders").count()
    fact.columns should contain allOf ("segment_key", "order_date_key", "total_price")

    val silverOrders = spark.read.parquet(s"$out/silver/orders")
    silverOrders.columns should contain allOf ("status_desc", "order_date_type")
  }

  test("silver orders are year-partitioned and a year predicate prunes at the file index") {
    import org.apache.spark.sql.functions.col
    val out = "/root/repo/target/pipeline_spec"
    val pruned = spark.read.parquet(s"$out/silver/orders")
      .filter(col("order_year") === 1995)
    val plan = pruned.queryExecution.executedPlan.toString
    plan should include("PartitionFilters")
    plan should include("order_year")
    pruned.count() should be > 0L
  }

  test("gold dim_dates built as CTAS + append (S6) stays gap- and overlap-free") {
    val dd = spark.read.parquet("/root/repo/target/pipeline_spec/gold/dim_dates")
    dd.count() shouldBe (365 + 366 + 365 + 365).toLong // 1995..1998
  }
}
