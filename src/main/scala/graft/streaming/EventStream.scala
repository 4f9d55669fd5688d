package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Streaming extension (SURVEY §2.9/§7.5 — beyond the batch-only
  * reference): incremental processing over the `events` table.
  *
  * The transforms are written once against a plain DataFrame, so the SAME
  * function runs in batch (`spark.read` → oracle-checkable) and streaming
  * (`spark.readStream` → `writeStream`) — Structured Streaming's core
  * contract. The streaming entry points only add the watermark.
  */
object EventStream {

  /** Tumbling-window per-type metrics. In streaming this is an incremental
    * stateful aggregation; with the 1h watermark state is bounded and late
    * events beyond it are dropped. Value sums go through exact decimal so
    * results are partition/arrival-order independent. */
  def windowedCounts(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(20,6)")).cast("double").as("total_value"))
      .select(
        col("window.start").as("window_start"),
        col("window.end").as("window_end"),
        col("event_type"), col("n_events"), col("total_value"))

  /** Watermarked streaming variant of [[windowedCounts]]. */
  def windowedCountsStream(events: DataFrame): DataFrame =
    windowedCounts(events.withWatermark("ts", "1 hour"))

  /** Streaming exact dedup — the incremental form of
    * [[graft.ops.Dedup.exactDedup]]: keeps one row per key among events
    * whose event times fall inside the watermark delay, with state expiring
    * as the watermark advances (bounded memory — the batch content-hash
    * window needs no state bound because it sees all data at once). */
  def streamingDedup(events: DataFrame, keyCols: Seq[String],
                     watermark: String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark(keyCols)

  /** Ingest content hash: digest of the event's PAYLOAD fields (not its
    * id), so replayed/at-least-once deliveries of the same logical event
    * collide. `value` goes in integer-quantized — double→string renders
    * differently across engines, a quantized long hashes bit-identically
    * everywhere. */
  def contentHash: org.apache.spark.sql.Column =
    md5(concat_ws("|", col("user_id"), col("event_type"),
      floor(col("value") * 1000).cast("long")))

  /** Batch form of ingest dedup — the op an ingest pipeline runs FIRST:
    * one deterministic survivor per content hash (earliest ts, ties by
    * event_id). Window over hash-sized partitions: bounded state, scales
    * by partitioning on the hash like every dedup in [[graft.ops.Dedup]].
    * [[ingestDedupStream]] is the same op incrementally; StreamingSpec
    * asserts the stream keeps exactly this key set on the same input. */
  def ingestDedup(events: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("content_hash"))
      .orderBy(col("ts"), col("event_id"))
    events.withColumn("content_hash", contentHash)
      .withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1).drop("_rn")
  }

  /** Streaming form of [[ingestDedup]]: content-hash the payload, then
    * [[streamingDedup]] on the hash — state is one entry per distinct
    * hash inside the watermark, expiring as it advances. Which duplicate
    * survives is arrival-order-dependent (the stream keeps the first
    * seen); the KEY SET is identical to the batch form's. */
  def ingestDedupStream(events: DataFrame, watermark: String = "1 hour"): DataFrame =
    streamingDedup(events.withColumn("content_hash", contentHash),
      Seq("content_hash"), watermark)

  /** Stream-stream interval join — click→purchase attribution: every
    * (purchase, click) pair for the same user where the click happened in
    * the `lookback` window ending at the purchase. Written once against
    * plain DataFrames: the SAME function is the batch form (oracle-checked
    * as q65) and the streaming form after [[clickAttributionStream]] adds
    * watermarks.
    *
    * Expects `purchases(purchase_id, user_id, purchase_ts, ...)` and
    * `clicks(click_id, click_user, click_ts, ...)`. The equi-key
    * (`user_id = click_user`) keeps the join hash-partitioned; the time
    * bound is the predicate Structured Streaming uses to expire buffered
    * state on BOTH sides — without it a stream-stream join's state grows
    * forever. */
  def clickAttribution(purchases: DataFrame, clicks: DataFrame,
                       lookback: String = "2 hours"): DataFrame =
    purchases.join(clicks,
      col("user_id") === col("click_user") &&
        col("click_ts") >= col("purchase_ts") - expr(s"INTERVAL $lookback") &&
        col("click_ts") <= col("purchase_ts"))
      .drop("click_user")

  /** Watermarked streaming variant of [[clickAttribution]]: both inputs
    * get event-time watermarks so Spark can bound join state; with
    * watermark W and lookback L, a buffered click is dropped once the
    * purchase-side watermark passes its ts + L. */
  def clickAttributionStream(purchases: DataFrame, clicks: DataFrame,
                             lookback: String = "2 hours",
                             watermark: String = "1 hour"): DataFrame =
    clickAttribution(
      purchases.withWatermark("purchase_ts", watermark),
      clicks.withWatermark("click_ts", watermark),
      lookback)

  /** Batch sessionization: a session break is a gap > `gapSeconds` between
    * a user's consecutive events; session id = running count of breaks.
    * Window partitioned by user → parallel across users (the classic
    * lag+cumsum formulation any SQL engine reproduces). */
  def sessionize(events: DataFrame, gapSeconds: Long): DataFrame = {
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val tsSec = col("ts").cast("long")
    val newSession =
      when(tsSec - lag(tsSec, 1).over(byUser) > gapSeconds, 1).otherwise(0)
    events
      .withColumn("session_seq", sum(newSession).over(byUser) + 1)
      .groupBy(col("user_id"), col("session_seq"))
      .agg(
        min(col("ts")).as("session_start"),
        max(col("ts")).as("session_end"),
        count(lit(1)).as("n_events"))
  }
}
