package graft.streaming

import java.sql.Timestamp

import org.apache.spark.api.java.Optional
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.{GroupStateTimeout, TestGroupState}

import graft.SparkSpec

class StreamingSpec extends SparkSpec {

  private def ev(id: Long, t: String, user: Long = 1L): Event =
    Event(id, Timestamp.valueOf(t), user, "click", 1.0)

  // ---------------------------------------------------- windowed aggregation

  test("windowedCountsStream: same results as the batch transform once the watermark closes windows") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._

    val firstBatch = Seq(
      ev(1, "2024-01-01 00:10:00"), ev(2, "2024-01-01 00:20:00"),
      ev(3, "2024-01-01 01:10:00"))

    val ms = MemoryStream[Event]
    val q = EventStream.windowedCountsStream(ms.toDF())
      .writeStream.format("memory").queryName("wc").outputMode("append").start()
    try {
      ms.addData(firstBatch: _*)
      q.processAllAvailable()
      // push the watermark far past the first two windows
      ms.addData(ev(99, "2024-01-01 12:00:00"))
      q.processAllAvailable()

      val streamed = spark.table("wc")
        .select("window_start", "event_type", "n_events", "total_value")
        .collect().map(_.toSeq).toSet
      val batch = EventStream.windowedCounts(firstBatch.toDF())
        .select("window_start", "event_type", "n_events", "total_value")
        .collect().map(_.toSeq).toSet
      batch.subsetOf(streamed) shouldBe true
      streamed.size shouldBe batch.size // the hour-12 window is still open
    } finally q.stop()
  }

  test("JSONL file source: readStream over a directory reproduces the batch transform") {
    import spark.implicits._
    val dir = graft.Tables.scratchDir(spark) + "/stream_jsonl_src"
    val first = Seq(
      ev(1, "2024-01-01 00:10:00"), ev(2, "2024-01-01 00:20:00"),
      ev(3, "2024-01-01 01:10:00"))
    graft.sources.Jsonl.write(first.toDF(), dir) // batch 1: the existing files
    val q = EventStream.windowedCountsStream(
        spark.readStream.schema(org.apache.spark.sql.Encoders.product[Event].schema)
          .json(dir))
      .writeStream.format("memory").queryName("wcfile").outputMode("append").start()
    try {
      q.processAllAvailable()
      // batch 2: a NEW file lands in the directory and pushes the watermark
      // past the first two windows — the file source must discover it
      Seq(ev(99, "2024-01-01 12:00:00")).toDF().write.mode("append").json(dir)
      q.processAllAvailable()
      val cols = Seq("window_start", "event_type", "n_events", "total_value")
      val streamed = spark.table("wcfile")
        .select(cols.head, cols.tail: _*).collect().map(_.toSeq).toSet
      val batch = EventStream.windowedCounts(first.toDF())
        .select(cols.head, cols.tail: _*).collect().map(_.toSeq).toSet
      batch.subsetOf(streamed) shouldBe true
      streamed.size shouldBe batch.size // the hour-12 window is still open
    } finally q.stop()
  }

  test("streamingDedup keeps one row per key within the watermark") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val ms = MemoryStream[Event]
    val q = EventStream.streamingDedup(ms.toDF(), Seq("event_id"), "30 minutes")
      .writeStream.format("memory").queryName("dedup").outputMode("append").start()
    try {
      ms.addData(ev(1, "2024-01-01 00:00:00"), ev(1, "2024-01-01 00:05:00"),
        ev(2, "2024-01-01 00:06:00"))
      q.processAllAvailable()
      spark.table("dedup").select("event_id").collect()
        .map(_.getLong(0)).sorted shouldBe Array(1L, 2L)
    } finally q.stop()
  }

  test("ingestDedupStream keeps exactly the batch form's content-hash key set") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    // ids differ but (user, type, value) repeat → same content hash;
    // user 2 and the changed value are distinct hashes.
    val events = Seq(
      ev(1, "2024-01-01 00:00:00"), ev(2, "2024-01-01 00:03:00"),
      ev(3, "2024-01-01 00:05:00", user = 2L),
      Event(4L, Timestamp.valueOf("2024-01-01 00:07:00"), 1L, "click", 2.5),
      ev(5, "2024-01-01 00:09:00"))
    val ms = MemoryStream[Event]
    val q = EventStream.ingestDedupStream(ms.toDF(), "30 minutes")
      .writeStream.format("memory").queryName("ingest_dedup")
      .outputMode("append").start()
    try {
      ms.addData(events: _*)
      q.processAllAvailable()
      val streamed = spark.table("ingest_dedup")
        .select("content_hash").collect().map(_.getString(0)).sorted
      val batch = EventStream.ingestDedup(events.toDF())
        .select("content_hash").collect().map(_.getString(0)).sorted
      streamed shouldBe batch
      streamed.length shouldBe 3 // 5 events, 2 payload-duplicates dropped
    } finally q.stop()
  }

  // -------------------------------------------------- stream-stream join

  test("clickAttributionStream: stream-stream interval join equals the batch form") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._

    val purchases = Seq(
      (10L, 1L, Timestamp.valueOf("2024-01-01 03:00:00")),
      (11L, 1L, Timestamp.valueOf("2024-01-01 08:00:00")),
      (12L, 2L, Timestamp.valueOf("2024-01-01 03:30:00")))
    val clicks = Seq(
      (100L, 1L, Timestamp.valueOf("2024-01-01 01:30:00")), // in window of p10
      (101L, 1L, Timestamp.valueOf("2024-01-01 02:59:00")), // in window of p10
      (102L, 1L, Timestamp.valueOf("2024-01-01 03:10:00")), // after p10, not p11
      (103L, 2L, Timestamp.valueOf("2024-01-01 03:00:00")), // user 2, in window
      (104L, 2L, Timestamp.valueOf("2024-01-01 00:30:00"))) // > 2h before p12

    val pDf = (d: Seq[(Long, Long, Timestamp)]) =>
      d.toDF("purchase_id", "user_id", "purchase_ts")
    val cDf = (d: Seq[(Long, Long, Timestamp)]) =>
      d.toDF("click_id", "click_user", "click_ts")

    val batch = EventStream.clickAttribution(pDf(purchases), cDf(clicks))
      .select("purchase_id", "click_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    batch shouldBe Set((10L, 100L), (10L, 101L), (12L, 103L))

    val msP = MemoryStream[(Long, Long, Timestamp)]
    val msC = MemoryStream[(Long, Long, Timestamp)]
    val q = EventStream.clickAttributionStream(
        msP.toDF().toDF("purchase_id", "user_id", "purchase_ts"),
        msC.toDF().toDF("click_id", "click_user", "click_ts"))
      .writeStream.format("memory").queryName("attr").outputMode("append").start()
    try {
      // interleaved arrival across triggers — the join must buffer state
      msP.addData(purchases.head)
      msC.addData(clicks(0), clicks(3))
      q.processAllAvailable()
      msC.addData(clicks(1), clicks(2), clicks(4))
      msP.addData(purchases(1), purchases(2))
      q.processAllAvailable()
      val streamed = spark.table("attr").select("purchase_id", "click_id")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      streamed shouldBe batch
    } finally q.stop()
  }

  // ------------------------------------------------------------ sessionize

  test("batch sessionize: gap splits sessions, bounds and counts correct") {
    import spark.implicits._
    val events = Seq(
      ev(1, "2024-01-01 00:00:00"), ev(2, "2024-01-01 00:10:00"),
      ev(3, "2024-01-01 02:00:00"),                       // > 30 min gap → new session
      ev(4, "2024-01-01 00:05:00", user = 2L))
    val out = EventStream.sessionize(events.toDF(), 1800)
      .orderBy("user_id", "session_seq").collect()
    out.length shouldBe 3
    out(0).getLong(4) shouldBe 2 // user 1 session 1: events 1,2
    out(1).getLong(4) shouldBe 1 // user 1 session 2: event 3
    out(2).getLong(0) shouldBe 2L
  }

  test("Sessionize.updateUser: gap closes a session in-batch") {
    val state = TestGroupState.create[SessionAcc](
      Optional.empty[SessionAcc](), GroupStateTimeout.EventTimeTimeout,
      1000L, Optional.of(java.lang.Long.valueOf(0L)), false)
    val out = Sessionize.updateUser(1800 * 1000L)(
      1L,
      Iterator(ev(1, "2024-01-01 00:00:00"), ev(2, "2024-01-01 00:10:00"),
        ev(3, "2024-01-01 02:00:00")),
      state).toSeq
    out.length shouldBe 1
    out.head.n_events shouldBe 2
    out.head.session_end shouldBe Timestamp.valueOf("2024-01-01 00:10:00")
    state.get.n shouldBe 1 // event 3 stays open in state
  }

  test("Sessionize.updateUser: event-time timeout flushes the open session") {
    val open = SessionAcc(0L, 600000L, 3L)
    val state = TestGroupState.create[SessionAcc](
      Optional.of(open), GroupStateTimeout.EventTimeTimeout,
      1000L, Optional.of(java.lang.Long.valueOf(10000000L)), true)
    val out = Sessionize.updateUser(1800 * 1000L)(1L, Iterator.empty, state).toSeq
    out.length shouldBe 1
    out.head.n_events shouldBe 3
    state.exists shouldBe false
  }

  test("Sessionize.updateUser: very late event does not schedule a timeout behind the watermark") {
    // Watermark at 10,000,000 ms; a single event at 1,000 ms means
    // lastMs + gap = 1,801,000 < watermark — an unclamped
    // setTimeoutTimestamp would throw and kill the streaming query.
    val state = TestGroupState.create[SessionAcc](
      Optional.empty[SessionAcc](), GroupStateTimeout.EventTimeTimeout,
      1000L, Optional.of(java.lang.Long.valueOf(10000000L)), false)
    noException should be thrownBy Sessionize.updateUser(1800 * 1000L)(
      1L, Iterator(Event(1L, new Timestamp(1000L), 1L, "click", 1.0)), state)
    state.getTimeoutTimestampMs.get() should be > 10000000L
  }

  test("Sessionize end-to-end over MemoryStream emits gap-closed sessions") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val ms = MemoryStream[Event]
    val q = Sessionize(ms.toDS(), gapSeconds = 1800, watermark = "10 minutes")
      .writeStream.format("memory").queryName("sess").outputMode("append").start()
    try {
      ms.addData(ev(1, "2024-01-01 00:00:00"), ev(2, "2024-01-01 00:10:00"))
      q.processAllAvailable()
      ms.addData(ev(3, "2024-01-01 06:00:00")) // gap-close session 1, advance watermark
      q.processAllAvailable()
      ms.addData(ev(4, "2024-01-01 23:00:00")) // timeout-flush session 2
      q.processAllAvailable()
      val sessions = spark.table("sess").orderBy("session_start").collect()
      sessions.length should be >= 1
      sessions(0).getLong(3) shouldBe 2 // first session: events 1+2
    } finally q.stop()
  }

  // ------------------------------------------------- checkpointed recovery

  test("checkpoint restart: a restarted query resumes from tracked offsets — every input row lands in the sink exactly once") {
    import spark.implicits._
    val base = graft.Tables.scratchDir(spark) + s"/stream_ckpt_${System.nanoTime()}"
    val (src, out, ckpt) = (s"$base/src", s"$base/out", s"$base/ckpt")

    def runOnce(): Unit = {
      val q = spark.readStream
        .schema(org.apache.spark.sql.Encoders.product[Event].schema)
        .json(src)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .start()
      try q.processAllAvailable() finally q.stop()
    }

    graft.sources.Jsonl.write(Seq(
      ev(1, "2024-01-01 00:10:00"), ev(2, "2024-01-01 00:20:00")).toDF(), src)
    runOnce()
    // a new file lands while the query is DOWN; the restart must pick up
    // only the unprocessed file (offsets come from the checkpoint, not a
    // re-listing from scratch)
    Seq(ev(3, "2024-01-01 00:30:00")).toDF().write.mode("append").json(src)
    runOnce()

    val ids = spark.read.parquet(out).select("event_id").as[Long].collect().sorted
    ids shouldBe Array(1L, 2L, 3L) // no loss, no reprocessing duplicates
  }
}
