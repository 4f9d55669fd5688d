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
}
