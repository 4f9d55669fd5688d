package graft.ops

import java.sql.Date

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.SparkSpec

class Scd2Spec extends SparkSpec {

  private def d(s: String) = Date.valueOf(s)

  // key 1: update identical -> stays open unchanged
  // key 2: attribute changes -> closed + re-opened
  // key 3: no update arrives -> stays open unchanged
  // key 4: closed history row -> passes through untouched
  // key 5: brand-new key -> inserted open
  private val current = df(
    "k INT, attr STRING, valid_from DATE, valid_to DATE, is_current BOOLEAN", Seq(
      Row(1, "a", d("2020-01-01"), null, true),
      Row(2, "b", d("2020-01-01"), null, true),
      Row(3, "c", d("2020-01-01"), null, true),
      Row(2, "old", d("2019-01-01"), d("2020-01-01"), false)))

  private val updates = df("k INT, attr STRING", Seq(
    Row(1, "a"), Row(2, "B2"), Row(5, "e")))

  private def merged = Scd2.merge(current, updates, "k", Seq("attr"),
    lit("2024-06-01").cast("date"))

  test("dispositions: keep-open, close+reopen, pass-through, insert") {
    val rows = merged.collect()
      .map(r => (r.getInt(0), r.getString(1), Option(r.getDate(2)).map(_.toString).orNull,
        Option(r.getDate(3)).map(_.toString).orNull, r.getBoolean(4))).toSet
    assert(rows === Set(
      (1, "a", "2020-01-01", null, true),
      (2, "old", "2019-01-01", "2020-01-01", false),
      (2, "b", "2020-01-01", "2024-06-01", false),
      (2, "B2", "2024-06-01", null, true),
      (3, "c", "2020-01-01", null, true),
      (5, "e", "2024-06-01", null, true)))
  }

  test("exactly one open row per key after merge") {
    val dups = merged.filter(col("is_current"))
      .groupBy("k").count().filter(col("count") > 1).count()
    assert(dups === 0)
  }

  test("null attribute transitions count as change (null-safe compare)") {
    val cur = df("k INT, attr STRING, valid_from DATE, valid_to DATE, is_current BOOLEAN",
      Seq(Row(1, null, d("2020-01-01"), null, true)))
    val upd = df("k INT, attr STRING", Seq(Row(1, "x")))
    val out = Scd2.merge(cur, upd, "k", Seq("attr"), lit("2024-06-01").cast("date"))
    assert(out.count() === 2)
    assert(out.filter(col("is_current") && col("attr") === "x").count() === 1)
  }

  test("idempotent: re-merging the same batch changes nothing") {
    val once = merged
    val twice = Scd2.merge(once, updates, "k", Seq("attr"),
      lit("2024-07-01").cast("date"))
    assert(twice.count() === once.count())
    assert(twice.exceptAll(once).count() === 0)
  }
}
