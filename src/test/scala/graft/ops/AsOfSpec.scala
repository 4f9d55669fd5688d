package graft.ops

import java.sql.Timestamp

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.SparkSpec

class AsOfSpec extends SparkSpec {

  private def ts(s: String) = Timestamp.valueOf(s)

  // trades (left) / quotes (right) — the canonical as-of pairing
  private val trades = df("sym STRING, t TIMESTAMP, qty INT", Seq(
    Row("A", ts("2024-01-01 10:00:05"), 100),
    Row("A", ts("2024-01-01 10:00:10"), 200),
    Row("A", ts("2024-01-01 09:59:00"), 300), // before any quote
    Row("B", ts("2024-01-01 10:00:07"), 400),
    Row("C", ts("2024-01-01 10:00:07"), 500))) // no quotes for C at all

  private val quotes = df("sym STRING, qt TIMESTAMP, px DOUBLE", Seq(
    Row("A", ts("2024-01-01 10:00:00"), 1.0),
    Row("A", ts("2024-01-01 10:00:05"), 2.0), // equal-time: inclusive match
    Row("A", ts("2024-01-01 10:00:09"), 3.0),
    Row("B", ts("2024-01-01 10:00:01"), 9.0),
    Row("B", ts("2024-01-01 10:00:30"), 11.0)))

  private def backward = AsOf.joinAsOf(trades, quotes, Seq("sym"), "t", "qt",
    payload = Seq("px"))

  test("backward: latest quote at-or-before each trade, inclusive on equality") {
    val m = backward.collect()
      .map(r => (r.getAs[String]("sym"), r.getAs[Int]("qty"),
        Option(r.getAs[java.lang.Double]("asof_px")).map(_.toDouble)))
      .toSet
    m shouldBe Set(
      ("A", 100, Some(2.0)), // 10:00:05 quote matches the 10:00:05 trade
      ("A", 200, Some(3.0)),
      ("A", 300, None),      // trade precedes every quote
      ("B", 400, Some(9.0)),
      ("C", 500, None))      // key with no right rows at all
  }

  test("backward: all left rows and columns survive (left-outer semantics)") {
    backward.count() shouldBe trades.count()
    backward.columns.toSeq shouldBe Seq("sym", "t", "qty", "asof_qt", "asof_px")
  }

  test("forward: earliest quote at-or-after each trade") {
    val m = AsOf.joinAsOf(trades, quotes, Seq("sym"), "t", "qt",
      payload = Seq("px"), direction = AsOf.Forward).collect()
      .map(r => (r.getAs[String]("sym"), r.getAs[Int]("qty"),
        Option(r.getAs[java.lang.Double]("asof_px")).map(_.toDouble)))
      .toSet
    m shouldBe Set(
      ("A", 100, Some(2.0)), // inclusive at equality
      ("A", 200, None),      // no quote after 10:00:10
      ("A", 300, Some(1.0)),
      ("B", 400, Some(11.0)),
      ("C", 500, None))
  }

  test("tolerance: a too-old nearest match becomes NULL, no fallback to older") {
    val m = AsOf.joinAsOf(trades, quotes, Seq("sym"), "t", "qt",
      payload = Seq("px"),
      tolerance = Some((lt, rt) => unix_micros(lt) - unix_micros(rt) <= 2000000L))
      .collect()
      .map(r => (r.getAs[String]("sym"), r.getAs[Int]("qty"),
        Option(r.getAs[java.lang.Double]("asof_px")).map(_.toDouble)))
      .toSet
    m shouldBe Set(
      ("A", 100, Some(2.0)), // gap 0s <= 2s
      ("A", 200, Some(3.0)), // gap 1s
      ("A", 300, None),
      ("B", 400, None),      // nearest is 6s old: dropped, NOT replaced
      ("C", 500, None))
  }

  test("matches a per-row reference computation on random data") {
    val r = new scala.util.Random(7)
    val lRows = (1 to 300).map { i =>
      Row(s"k${r.nextInt(5)}", ts(f"2024-01-01 10:00:${r.nextInt(60)}%02d"), i)
    }
    val rRows = (1 to 200).map { i =>
      Row(s"k${r.nextInt(6)}", ts(f"2024-01-01 10:00:${r.nextInt(60)}%02d"), i.toDouble)
    }
    // make right unique per (key, time) first — operator's tie contract
    val left = df("k STRING, t TIMESTAMP, id INT", lRows)
    val right = AsOf.latestPerKeyTime(
      df("k STRING, rt TIMESTAMP, v DOUBLE", rRows),
      keys = Seq("k"), timeCol = "rt", tieCol = "v", payload = Seq("v"))

    val expected = {
      val rs = right.collect().map(r0 =>
        (r0.getAs[String]("k"), r0.getAs[Timestamp]("rt").getTime, r0.getAs[Double]("v")))
      lRows.map { lr =>
        val (k, t, id) = (lr.getString(0), lr.getAs[Timestamp](1).getTime, lr.getInt(2))
        val best = rs.filter(q => q._1 == k && q._2 <= t).sortBy(_._2).lastOption
        (k, id, best.map(_._3))
      }.toSet
    }
    val got = AsOf.joinAsOf(left, right, Seq("k"), "t", "rt", payload = Seq("v"))
      .collect()
      .map(r0 => (r0.getAs[String]("k"), r0.getAs[Int]("id"),
        Option(r0.getAs[java.lang.Double]("asof_v")).map(_.toDouble)))
      .toSet
    got shouldBe expected
  }

  test("latestPerKeyTime keeps exactly one row per (key, time), max tie col") {
    val dup = df("k STRING, rt TIMESTAMP, id INT, v DOUBLE", Seq(
      Row("A", ts("2024-01-01 10:00:00"), 1, 5.0),
      Row("A", ts("2024-01-01 10:00:00"), 3, 7.0),
      Row("A", ts("2024-01-01 10:00:00"), 2, 6.0),
      Row("A", ts("2024-01-01 10:00:01"), 9, 1.0)))
    val out = AsOf.latestPerKeyTime(dup, Seq("k"), "rt", "id", Seq("id", "v"))
      .collect().map(r => (r.getAs[Int]("id"), r.getAs[Double]("v"))).toSet
    out shouldBe Set((3, 7.0), (9, 1.0))
  }

  test("plan: mega-key-safe shape — no theta join, local window is (pid, key)-scoped") {
    // round 14: the textbook Window.partitionBy(key) (one task per key)
    // was replaced by range exchange + (partition, key)-local windows +
    // a small boundary-carry join; what must never appear is the
    // quadratic fallback, and the data-sized window must carry _pid.
    val p = backward.queryExecution.executedPlan.toString
    p should not include "BroadcastNestedLoopJoin"
    p should not include "CartesianProduct"
    p.split("\n").count(l => l.contains("Window [") &&
      l.contains("windowspecdefinition(_pid")) shouldBe 1
    p.split("\n").count(_.contains("Window [")) shouldBe 2
  }
}
