package graft.ops

import java.sql.Timestamp

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.SparkSpec

class RangeJoinSpec extends SparkSpec {

  // ------------------------- pointInInterval (the intervals-table flavor)

  private def tsS(s: String) = Timestamp.valueOf(s)

  private val points = df("pid INT, pt TIMESTAMP", Seq(
    Row(1, tsS("2024-01-01 00:00:00")),
    Row(2, tsS("2024-01-05 12:00:00")),
    Row(3, tsS("2024-01-10 00:00:00")),
    Row(4, tsS("2024-02-01 00:00:00"))))

  private val intervals = df("iid INT, s TIMESTAMP, e TIMESTAMP", Seq(
    Row(10, tsS("2024-01-01 00:00:00"), tsS("2024-01-07 00:00:00")), // p1,p2
    Row(20, tsS("2024-01-05 00:00:00"), tsS("2024-01-12 00:00:00")), // p2,p3
    Row(30, tsS("2024-03-01 00:00:00"), tsS("2024-03-02 00:00:00")))) // none

  private def runPii(widthSec: Long) =
    RangeJoin.pointInInterval(points, intervals, "pt", "s", "e", widthSec)
      .select("pid", "iid").collect().map(r => (r.getInt(0), r.getInt(1))).toSet

  private val expectedPii = Set((1, 10), (2, 10), (2, 20), (3, 20))

  test("pointInInterval matches the naive containment join, boundaries inclusive") {
    runPii(7 * 86400) shouldBe expectedPii
  }

  test("pointInInterval is width-invariant (pairs meet in exactly one bucket)") {
    runPii(86400) shouldBe expectedPii
    runPii(3600) shouldBe expectedPii
    runPii(90L * 86400) shouldBe expectedPii
  }

  test("pointInInterval equals a brute-force cross check on random data") {
    val r = new scala.util.Random(11)
    val base = tsS("2024-01-01 00:00:00").getTime
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

  test("pointInInterval rejects overlapping column names") {
    an[IllegalArgumentException] should be thrownBy
      RangeJoin.pointInInterval(points, points, "pt", "pt", "pt", 60)
  }

  test("pointInInterval plan: hash equi-join, no nested loop / cartesian") {
    val p = RangeJoin.pointInInterval(points, intervals, "pt", "s", "e", 86400)
      .queryExecution.executedPlan.toString
    p should not include "CartesianProduct"
    p should not include "BroadcastNestedLoopJoin"
  }

  // --------------------------- lookbackPairs (the keyed sliding flavor)

  private def ts(sec: Int) =
    Timestamp.valueOf(f"2024-01-01 ${sec / 3600}%02d:${sec / 60 % 60}%02d:${sec % 60}%02d")

  private def leftDf(rows: (Long, Long, Int)*) = // (id, key, second)
    df("id BIGINT, k BIGINT, t TIMESTAMP",
      rows.map(r => Row(r._1, r._2, ts(r._3))))

  private def rightDf(rows: (Long, Int, Double)*) = // (key, second, pay)
    df("k BIGINT, t TIMESTAMP, pay DOUBLE",
      rows.map(r => Row(r._1, ts(r._2), r._3)))

  private def run(l: org.apache.spark.sql.DataFrame,
                  r: org.apache.spark.sql.DataFrame, w: Long) =
    RangeJoin.lookbackPairs(l, r, "k", "t", w, Seq("pay"))
      .collect().map(x => (x.getLong(0), x.getDouble(3))).toSet

  test("window boundaries: inclusive end, exclusive start") {
    val l = leftDf((1L, 1L, 1000))
    val r = rightDf(
      (1L, 1000, 1.0), // == l.t → inside (inclusive end)
      (1L, 701, 2.0),  // l.t - 299 → inside
      (1L, 700, 3.0),  // == l.t - W → OUTSIDE (exclusive start)
      (1L, 1001, 4.0), // after → outside
      (2L, 900, 5.0))  // other key
    run(l, r, 300) shouldBe Set((1L, 1.0), (1L, 2.0))
  }

  test("matches straddling a bucket boundary are found via the previous-bucket probe") {
    // W=300: buckets change at multiples of 300; left at 901 (bucket 3),
    // right at 899 (bucket 2) is 2 s earlier — must match
    val l = leftDf((1L, 1L, 901))
    val r = rightDf((1L, 899, 7.0))
    run(l, r, 300) shouldBe Set((1L, 7.0))
  }

  test("matches a brute-force reference on random data") {
    val rnd = new scala.util.Random(31)
    val ls = (1L to 200L).map(i => (i, 1L + rnd.nextInt(4).toLong, rnd.nextInt(5000)))
    val rs = (1 to 300).map(_ => (1L + rnd.nextInt(4).toLong, rnd.nextInt(5000), rnd.nextDouble()))
    val w = 120
    val expected = (for {
      (id, k, t) <- ls
      (rk, rt, pay) <- rs
      if rk == k && rt > t - w && rt <= t
    } yield (id, pay)).toSet
    run(leftDf(ls: _*), rightDf(rs: _*), w.toLong) shouldBe expected
  }

  test("all left columns pass through; nulls drop from both sides") {
    val l = df("id BIGINT, k BIGINT, t TIMESTAMP, note STRING", Seq(
      Row(1L, 1L, ts(100), "alpha"), Row(2L, null, ts(100), "beta")))
    val r = df("k BIGINT, t TIMESTAMP, pay DOUBLE", Seq(
      Row(1L, ts(50), 9.0), Row(1L, null, 8.0)))
    val out = RangeJoin.lookbackPairs(l, r, "k", "t", 300, Seq("pay"))
      .collect().map(x => (x.getLong(0), x.getString(3), x.getDouble(4)))
    out.toSeq shouldBe Seq((1L, "alpha", 9.0))
  }

  // ------------------- intervalOverlapPairs (the interval × interval flavor)

  private def aDf(rows: (Int, String, String)*) =
    df("aid INT, astart TIMESTAMP, aend TIMESTAMP",
      rows.map(r => Row(r._1, tsS(r._2), tsS(r._3))))

  private def bDf(rows: (Int, String, String)*) =
    df("bid INT, bstart TIMESTAMP, bend TIMESTAMP",
      rows.map(r => Row(r._1, tsS(r._2), tsS(r._3))))

  private def runOverlap(a: org.apache.spark.sql.DataFrame,
                         b: org.apache.spark.sql.DataFrame, w: Long) = {
    val out = RangeJoin.intervalOverlapPairs(a, b,
      "astart", "aend", "bstart", "bend", w)
    out.columns.toSeq shouldBe Seq("aid", "astart", "aend", "bid", "bstart", "bend")
    out.collect().map(r => (r.getInt(0), r.getInt(3)))
  }

  private val aSet = aDf(
    (1, "2024-01-01 00:00:00", "2024-01-03 00:00:00"),
    (2, "2024-01-05 00:00:00", "2024-01-05 06:00:00"),
    (3, "2024-01-08 00:00:00", "2024-01-20 00:00:00")) // long: many buckets
  private val bSet = bDf(
    (10, "2024-01-02 12:00:00", "2024-01-06 00:00:00"), // a1 (tail), a2 (whole)
    (20, "2024-01-03 00:00:00", "2024-01-04 00:00:00"), // touches a1's end
    (30, "2024-01-10 00:00:00", "2024-01-11 00:00:00"), // inside a3
    (40, "2024-02-01 00:00:00", "2024-02-02 00:00:00")) // none

  private val expectedOverlap =
    Set((1, 10), (2, 10), (1, 20), (3, 30))

  test("intervalOverlapPairs: closed-interval semantics, touching endpoints overlap") {
    runOverlap(aSet, bSet, 86400).toSet shouldBe expectedOverlap
  }

  test("intervalOverlapPairs emits each pair exactly once across shared buckets") {
    // a3 × b30 share 2+ buckets at width=1h; the canonical-bucket filter
    // must keep exactly one copy — count WITH duplicates.
    val pairs = runOverlap(aSet, bSet, 3600)
    pairs.length shouldBe pairs.toSet.size
    pairs.toSet shouldBe expectedOverlap
  }

  test("intervalOverlapPairs is width-invariant") {
    Seq(60L, 3600L, 86400L, 30L * 86400).foreach { w =>
      runOverlap(aSet, bSet, w).toSet shouldBe expectedOverlap
    }
  }

  test("intervalOverlapPairs equals a brute-force cross check on random data") {
    val r = new scala.util.Random(7)
    val base = tsS("2024-01-01 00:00:00").getTime
    def mk(n: Int) = (1 to n).map { i =>
      val s = base + r.nextInt(2000) * 3600000L
      (i, new Timestamp(s), new Timestamp(s + (1 + r.nextInt(96)) * 3600000L))
    }
    val a = df("aid INT, astart TIMESTAMP, aend TIMESTAMP",
      mk(120).map(x => Row(x._1, x._2, x._3)))
    val b = df("bid INT, bstart TIMESTAMP, bend TIMESTAMP",
      mk(150).map(x => Row(x._1, x._2, x._3)))
    val got = RangeJoin.intervalOverlapPairs(a, b, "astart", "aend", "bstart", "bend", 7200)
      .select("aid", "bid").collect().map(x => (x.getInt(0), x.getInt(1)))
    val want = a.crossJoin(b)
      .filter(col("astart") <= col("bend") && col("bstart") <= col("aend"))
      .select("aid", "bid").collect().map(x => (x.getInt(0), x.getInt(1)))
    got.length shouldBe want.length // exactly-once, not just same set
    got.toSet shouldBe want.toSet
  }

  test("intervalOverlapPairs plan: hash equi-join, no nested loop / cartesian") {
    val p = RangeJoin
      .intervalOverlapPairs(aSet, bSet, "astart", "aend", "bstart", "bend", 86400)
      .queryExecution.executedPlan.toString
    p should not include "CartesianProduct"
    p should not include "BroadcastNestedLoopJoin"
  }

  test("intervalOverlapPairs rejects overlapping column names") {
    an[IllegalArgumentException] should be thrownBy
      RangeJoin.intervalOverlapPairs(aSet, aSet, "astart", "aend", "astart", "aend", 60)
  }

  test("intervalOverlapPairs fails fast on an inverted interval (start > end)") {
    // sequence(hi, lo) would silently generate a DESCENDING bucket range
    // for the malformed row — the guard makes it loud instead.
    val inverted = aDf((9, "2024-01-05 00:00:00", "2024-01-01 00:00:00"))
    val ex = intercept[Exception] {
      RangeJoin.intervalOverlapPairs(inverted, bSet,
        "astart", "aend", "bstart", "bend", 86400).collect()
    }
    ex.getMessage should include("inverted interval")
    // a null endpoint is NOT an inversion: the row drops at the explode
    // (null bucket sequence), exactly the SQL predicate's null semantics
    val withNull = df("aid INT, astart TIMESTAMP, aend TIMESTAMP",
      Seq(Row(1, tsS("2024-01-01 00:00:00"), null)))
    RangeJoin.intervalOverlapPairs(withNull, bSet,
      "astart", "aend", "bstart", "bend", 86400).count() shouldBe 0L
  }
}
