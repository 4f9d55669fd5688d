package graft.ops

import java.sql.Timestamp

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.SparkSpec

class RangeJoinSpec extends SparkSpec {

  private def ts(s: String) = Timestamp.valueOf(s)

  private val points = df("pid INT, pt TIMESTAMP", Seq(
    Row(1, ts("2024-01-01 00:00:00")),
    Row(2, ts("2024-01-05 12:00:00")),
    Row(3, ts("2024-01-10 00:00:00")),
    Row(4, ts("2024-02-01 00:00:00"))))

  private val intervals = df("iid INT, s TIMESTAMP, e TIMESTAMP", Seq(
    Row(10, ts("2024-01-01 00:00:00"), ts("2024-01-07 00:00:00")), // p1,p2
    Row(20, ts("2024-01-05 00:00:00"), ts("2024-01-12 00:00:00")), // p2,p3
    Row(30, ts("2024-03-01 00:00:00"), ts("2024-03-02 00:00:00")))) // none

  private def run(widthSec: Long) =
    RangeJoin.pointInInterval(points, intervals, "pt", "s", "e", widthSec)
      .select("pid", "iid").collect().map(r => (r.getInt(0), r.getInt(1))).toSet

  private val expected = Set((1, 10), (2, 10), (2, 20), (3, 20))

  test("matches the naive containment join, boundaries inclusive") {
    run(7 * 86400) shouldBe expected
  }

  test("result is width-invariant (pairs meet in exactly one bucket — no dupes)") {
    // widths smaller, equal, and much larger than the interval lengths
    run(86400) shouldBe expected
    run(3600) shouldBe expected
    run(90L * 86400) shouldBe expected
  }

  test("equals a brute-force cross check on random data") {
    val r = new scala.util.Random(11)
    val base = ts("2024-01-01 00:00:00").getTime
    val pRows = (1 to 400).map(i => Row(i, new Timestamp(base + r.nextInt(100) * 3600000L)))
    val iRows = (1 to 60).map { i =>
      val s = base + r.nextInt(90) * 3600000L
      Row(i, new Timestamp(s), new Timestamp(s + (1 + r.nextInt(30)) * 3600000L))
    }
    val p = df("pid INT, pt TIMESTAMP", pRows)
    val iv = df("iid INT, s TIMESTAMP, e TIMESTAMP", iRows)
    val brute = p.crossJoin(iv)
      .filter(col("pt") >= col("s") && col("pt") <= col("e"))
      .select("pid", "iid").collect().map(x => (x.getInt(0), x.getInt(1))).toSet
    val bucketed = RangeJoin.pointInInterval(p, iv, "pt", "s", "e", 6 * 3600)
      .select("pid", "iid").collect().map(x => (x.getInt(0), x.getInt(1))).toSet
    bucketed shouldBe brute
  }

  test("rejects overlapping column names") {
    an[IllegalArgumentException] should be thrownBy
      RangeJoin.pointInInterval(points, points, "pt", "pt", "pt", 60)
  }

  test("plan: hash-partitioned equi-join, no nested loop / cartesian") {
    val p = RangeJoin.pointInInterval(points, intervals, "pt", "s", "e", 86400)
      .queryExecution.executedPlan.toString
    p should not include "CartesianProduct"
    p should not include "BroadcastNestedLoopJoin"
  }
}
