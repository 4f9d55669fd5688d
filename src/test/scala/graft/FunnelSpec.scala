package graft

import java.sql.Timestamp

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

/** Order semantics of the q77 funnel: a stage only counts when it happens
  * at or after the user's previous stage — differential data can't pin
  * this down (the synthetic events rarely violate order), so the edge is
  * asserted on crafted rows.
  */
class FunnelSpec extends SparkSpec {

  private def ts(s: String) = Timestamp.valueOf(s)

  /** Tables.events expects the on-disk ts as epoch NANOS in an int64
    * column (the testdata's TIMESTAMP(NANOS) read with nanosAsLong), so
    * the fixture writes nanos longs. */
  private def nanos(t: Timestamp): Long = t.getTime * 1000000L

  private def funnel(rows: Seq[Row]) = {
    val withNanos = rows.map(r => Row(r.get(0), nanos(r.getAs[Timestamp](1)),
      r.get(2), r.get(3), r.get(4), r.get(5)))
    val ev = df("event_id BIGINT, ts BIGINT, user_id BIGINT, event_type STRING, value DOUBLE, props STRING", withNanos)
    val dir = s"${System.getProperty("java.io.tmpdir")}/funnel_spec_${System.nanoTime()}"
    ev.write.mode("overwrite").parquet(s"$dir/events.parquet")
    Queries.q77FunnelStages(spark, dir).collect()
      .map(r => r.getLong(0) -> (Option(r.getTimestamp(1)), Option(r.getTimestamp(2)),
        Option(r.getTimestamp(3)), r.getInt(4))).toMap
  }

  test("purchase before the first post-view click does not complete the funnel") {
    // user 1: view -> purchase -> click : purchase precedes click, stage stops at 2
    // user 2: view -> click -> purchase : full funnel
    // user 3: click -> view (click precedes first view, never counts), stage 1
    val out = funnel(Seq(
      Row(1L, ts("2024-01-01 10:00:00"), 1L, "view", 0.0, "{}"),
      Row(2L, ts("2024-01-01 11:00:00"), 1L, "purchase", 5.0, "{}"),
      Row(3L, ts("2024-01-01 12:00:00"), 1L, "click", 0.0, "{}"),
      Row(4L, ts("2024-01-02 10:00:00"), 2L, "view", 0.0, "{}"),
      Row(5L, ts("2024-01-02 11:00:00"), 2L, "click", 0.0, "{}"),
      Row(6L, ts("2024-01-02 12:00:00"), 2L, "purchase", 9.0, "{}"),
      Row(7L, ts("2024-01-03 09:00:00"), 3L, "click", 0.0, "{}"),
      Row(8L, ts("2024-01-03 10:00:00"), 3L, "view", 0.0, "{}")))
    assert(out(1L)._4 === 2) // click counted (after view) but no purchase after it
    assert(out(2L)._4 === 3)
    assert(out(3L)._4 === 1) // pre-view click ignored
    assert(out(1L)._2.get === ts("2024-01-01 12:00:00"))
  }
}
