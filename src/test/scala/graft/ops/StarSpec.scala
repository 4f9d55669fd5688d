package graft.ops

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.SparkSpec

class StarSpec extends SparkSpec {

  private val customer = df("c_custkey BIGINT, c_mktsegment STRING", Seq(
    Row(1L, "AUTO"), Row(2L, "AUTO"), Row(3L, "RETAIL"), Row(4L, null)))

  private val orders = df(
    "o_orderkey BIGINT, o_custkey BIGINT, o_orderstatus STRING, o_totalprice DOUBLE, o_orderdate TIMESTAMP",
    Seq(
      Row(10L, 1L, "F", 100.0, java.sql.Timestamp.valueOf("1995-06-01 00:00:00")),
      Row(11L, 3L, "O", 200.0, java.sql.Timestamp.valueOf("2030-01-01 00:00:00")), // outside dim range
      Row(12L, 99L, "F", 300.0, java.sql.Timestamp.valueOf("1995-06-02 00:00:00")))) // missing customer

  test("dim: distinct attrs, dense keys (A6+W1)") {
    val d = Star.dim(customer, "c_mktsegment", "segment_key")
    d.count() shouldBe 3 // AUTO, RETAIL, null
    collectCol[Int](d.select("segment_key")).sorted shouldBe Seq(1, 2, 3)
  }

  test("fact: unmatched dim keys default to 0 (J3 null-key pattern)") {
    val dimSeg = Star.dim(customer, "c_mktsegment", "segment_key")
    val dimDate = DateDim.dateDim(spark, "1995-01-01", "1995-12-31")
    val fact = Star.factOrders(orders, customer, dimSeg, dimDate)
      .orderBy("o_orderkey").collect()
    fact.length shouldBe 3
    fact(0).getInt(2) shouldBe 19950601      // in range
    fact(1).getInt(2) shouldBe 0             // date outside dim
    fact(2).getInt(1) shouldBe 0             // missing customer → segment 0
  }

  test("assertUnique passes on unique keys and throws on duplicates (S8)") {
    Star.assertUnique(customer, Seq("c_custkey"), "customer")
    val dup = df("k INT", Seq(Row(1), Row(1)))
    val ex = intercept[IllegalArgumentException] {
      Star.assertUnique(dup, Seq("k"), "dup")
    }
    ex.getMessage should include("S8 uniqueness violated")
  }

  test("bridge: distinct (order, dim-key) pairs via lineitem (J4)") {
    val part = df("p_partkey BIGINT, p_brand STRING", Seq(Row(1L, "B1"), Row(2L, "B1"), Row(3L, "B2")))
    val lineitem = df("l_orderkey BIGINT, l_partkey BIGINT", Seq(
      Row(10L, 1L), Row(10L, 2L), // same brand twice → one bridge row
      Row(10L, 3L), Row(11L, 1L)))
    val bridge = Star.bridgeOrderBrand(lineitem, part, Star.dim(part, "p_brand", "brand_key"))
    bridge.count() shouldBe 3
    Star.assertUnique(bridge, Seq("o_orderkey", "brand_key"), "bridge")
  }
}
