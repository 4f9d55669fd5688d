package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

class KmvDistinctSpec extends SparkSpec {

  private def kmv(c: org.apache.spark.sql.Column, k: Int = 256) =
    call_function("graft_kmv_distinct", c, lit(k))

  test("exact below k distinct values") {
    import spark.implicits._
    val d = (1 to 4000).map(i => i % 97).toDF("v") // 97 distinct < 256
    collectCol[Long](d.agg(kmv(col("v")).as("n"))) shouldBe Seq(97L)
  }

  test("estimate within 10% above k (k=256 → rse ≈ 6.3%)") {
    import spark.implicits._
    val d = (1 to 60000).map(i => i % 10000).toDF("v").repartition(8)
    val est = collectCol[Long](d.agg(kmv(col("v")).as("n"))).head
    est.toDouble shouldBe 10000.0 +- 1000.0
  }

  test("partition-invariant: same sketch regardless of data layout") {
    import spark.implicits._
    val base = (1 to 30000).map(i => s"doc-${i % 5000}").toDF("v")
    val a = collectCol[Long](base.repartition(1).agg(kmv(col("v")).as("n"))).head
    val b = collectCol[Long](base.repartition(16).agg(kmv(col("v")).as("n"))).head
    val c = collectCol[Long](
      base.orderBy(desc("v")).coalesce(2).agg(kmv(col("v")).as("n"))).head
    a shouldBe b
    a shouldBe c
  }

  test("grouped aggregation with map-side combine (partial_graft_kmv_distinct)") {
    import spark.implicits._
    val d = (1 to 20000).map(i => (i % 4, i % (500 * (1 + i % 4 / 4) ))).toDF("g", "v")
    val out = d.groupBy("g").agg(kmv(col("v")).as("n"), countDistinct(col("v")).as("exact"))
    val plan = out.queryExecution.executedPlan.toString
    plan should include("partial_graft_kmv_distinct")
    out.collect().foreach { r =>
      val (est, exact) = (r.getAs[Long]("n"), r.getAs[Long]("exact"))
      withClue(s"group ${r.get(0)}: ") {
        est.toDouble shouldBe exact.toDouble +- math.max(exact * 0.1, 2.0)
      }
    }
  }

  test("nulls are ignored; all-null group counts 0") {
    import spark.implicits._
    val d = Seq[Option[Int]](None, None, None).toDF("v")
    collectCol[Long](d.agg(kmv(col("v")).as("n"))) shouldBe Seq(0L)
  }

  test("k must be a literal and >= 16") {
    import spark.implicits._
    val d = Seq(1, 2).toDF("v")
    an[Exception] should be thrownBy
      d.agg(call_function("graft_kmv_distinct", col("v"), col("v"))).collect()
    an[Exception] should be thrownBy
      d.agg(kmv(col("v"), k = 4)).collect()
  }
}
