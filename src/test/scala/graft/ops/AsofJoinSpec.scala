package graft.ops

import java.sql.Timestamp

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Scale-shape companion to [[AsOfSpec]] (which pins the API semantics):
  * the round-14 mega-key-safe rewrite of [[AsOf.joinAsOf]] — range
  * exchange + (partition, key)-local windows + boundary carry — must be
  * EXACT under the conditions that break the textbook
  * `Window.partitionBy(key)` shape or the carry logic: a key dominating
  * the data (spans many range partitions), matches crossing partition
  * boundaries, and any shuffle-partition count. */
class AsofJoinSpec extends SparkSpec {

  private def ts(m: Int) =
    Timestamp.valueOf(f"2024-01-01 ${10 + m / 3600}%02d:${m / 60 % 60}%02d:${m % 60}%02d")

  private def leftDf(rows: (Long, Long, Int)*) = // (id, key, second)
    df("id BIGINT, k BIGINT, t TIMESTAMP",
      rows.map(r => Row(r._1, r._2, ts(r._3))))

  private def rightDf(rows: (Long, Int, Double)*) = // (key, second, pay)
    df("k BIGINT, rt TIMESTAMP, pay DOUBLE",
      rows.map(r => Row(r._1, ts(r._2), r._3)))

  // smallInputMaxBytes = 0 throughout: this suite exists to pin the
  // DISTRIBUTED shape, which every in-memory test frame would otherwise
  // dodge via the small-input tier (tier equality has its own test).
  private def run(l: org.apache.spark.sql.DataFrame,
                  r: org.apache.spark.sql.DataFrame) =
    AsOf.joinAsOf(l, r, keys = Seq("k"), leftTime = "t", rightTime = "rt",
        payload = Seq("pay"), prefix = "m_", smallInputMaxBytes = 0L)
      .collect().map(x => x.getLong(0) ->
        (if (x.isNullAt(4)) None else Some(x.getDouble(4)))).toMap

  test("matches a brute-force reference with a mega key spanning partitions") {
    val rnd = new scala.util.Random(11)
    // key 7 is the mega key: over half of all rows on both sides
    def key() = if (rnd.nextBoolean()) 7L else 1L + rnd.nextInt(5)
    val ls = (1L to 300L).map(i => (i, key(), rnd.nextInt(5000)))
    val rs = (1 to 250).map(_ => (key(), rnd.nextInt(5000), rnd.nextInt(1000).toDouble))
      .groupBy(x => (x._1, x._2)).map(_._2.head).toSeq // unique (key, time)
    val expected = ls.map { case (id, k, t) =>
      val prior = rs.filter(r => r._1 == k && r._2 <= t)
      id -> (if (prior.isEmpty) None else Some(prior.maxBy(_._2)._3))
    }.toMap
    // few shuffle partitions → the mega key provably spans several
    val before = spark.conf.get("spark.sql.shuffle.partitions")
    try {
      spark.conf.set("spark.sql.shuffle.partitions", "5")
      run(leftDf(ls: _*), rightDf(rs: _*)) shouldBe expected
    } finally spark.conf.set("spark.sql.shuffle.partitions", before)
  }

  test("result is independent of the shuffle-partition count") {
    val rnd = new scala.util.Random(23)
    val ls = (1L to 150L).map(i => (i, 1L + rnd.nextInt(3).toLong, rnd.nextInt(3000)))
    val rs = (1 to 80).map(_ => (1L + rnd.nextInt(3).toLong, rnd.nextInt(3000), rnd.nextDouble()))
      .groupBy(x => (x._1, x._2)).map(_._2.head).toSeq
    val before = spark.conf.get("spark.sql.shuffle.partitions")
    try {
      spark.conf.set("spark.sql.shuffle.partitions", "3")
      val a = run(leftDf(ls: _*), rightDf(rs: _*))
      spark.conf.set("spark.sql.shuffle.partitions", "13")
      val b = run(leftDf(ls: _*), rightDf(rs: _*))
      a shouldBe b
    } finally spark.conf.set("spark.sql.shuffle.partitions", before)
  }

  test("null key/time left rows survive unmatched; null right rows never match") {
    val l = df("id BIGINT, k BIGINT, t TIMESTAMP", Seq(
      Row(1L, 1L, ts(100)), Row(2L, null, ts(100)), Row(3L, 1L, null)))
    val r = df("k BIGINT, rt TIMESTAMP, pay DOUBLE", Seq(
      Row(1L, ts(50), 5.0), Row(null, ts(10), 9.0), Row(1L, null, 8.0)))
    for (dirn <- Seq[AsOf.Direction](AsOf.Backward, AsOf.Forward)) {
      for (tierBytes <- Seq(0L, 64L << 20)) {
        val out = AsOf.joinAsOf(l, r, keys = Seq("k"), leftTime = "t",
            rightTime = "rt", payload = Seq("pay"), direction = dirn,
            prefix = "m_", smallInputMaxBytes = tierBytes)
          .collect().map(x => x.getLong(0) ->
            (if (x.isNullAt(4)) None else Some(x.getDouble(4)))).toMap
        withClue(s"direction=$dirn tier=$tierBytes: ") {
          out.keySet shouldBe Set(1L, 2L, 3L) // left-outer: all rows kept
          out(2L) shouldBe None               // null key matches nothing
          out(3L) shouldBe None               // null time matches nothing
        }
      }
    }
  }

  test("the small-input tier is row-identical to the distributed path") {
    // Both directions, with and without tolerance, nulls included — the
    // tier guard must be invisible to results (VERDICT r14 ask #1b).
    // LOCAL-relation inputs, not the suite's RDD-backed helper: an
    // RDD-backed plan has no size statistics (defaults to Long.Max), so
    // it always fails closed to the distributed path and the small tier
    // would never actually run here — the plan-shape asserts below make
    // the divergence (and so the test) non-vacuous.
    import spark.implicits._
    val rnd = new scala.util.Random(57)
    val ls = (1L to 200L).map(i => (i, 1L + rnd.nextInt(4).toLong, rnd.nextInt(4000)))
    val rs = (1 to 120).map(_ => (1L + rnd.nextInt(4).toLong, rnd.nextInt(4000), rnd.nextDouble()))
      .groupBy(x => (x._1, x._2)).map(_._2.head).toSeq
    val l = ls.toDF("id", "k", "s")
      .select(col("id"), col("k"), timestamp_seconds(col("s")).as("t"))
    val r = rs.toDF("k", "s", "pay")
      .select(col("k"), timestamp_seconds(col("s")).as("rt"), col("pay"))
    for (dirn <- Seq[AsOf.Direction](AsOf.Backward, AsOf.Forward);
         tol <- Seq(None,
           Some((lt: org.apache.spark.sql.Column,
                 rt: org.apache.spark.sql.Column) =>
             abs(unix_timestamp(rt) - unix_timestamp(lt)) <= 600))) {
      def frame(bytes: Long) =
        AsOf.joinAsOf(l, r, keys = Seq("k"), leftTime = "t",
          rightTime = "rt", payload = Seq("pay"), direction = dirn,
          prefix = "m_", tolerance = tol, smallInputMaxBytes = bytes)
      val small = frame(64L << 20)
      val dist = frame(0L)
      withClue(s"direction=$dirn tolerance=${tol.isDefined}: ") {
        small.queryExecution.executedPlan.toString should not include
          "windowspecdefinition(_pid" // the tier actually engaged
        dist.queryExecution.executedPlan.toString should include(
          "windowspecdefinition(_pid")
        small.collect().map(_.toSeq).sortBy(_.toString) shouldBe
          dist.collect().map(_.toSeq).sortBy(_.toString)
      }
    }
  }

  test("q164's distributed build ≡ the tier the cell actually serves, on its real inputs") {
    // The synthetic tier-equality test above covers the operator; this
    // one covers the CELL — q164's events-table inputs (pre-aggregated
    // views, purchase probes) through both tiers, row for row.
    val dir = "/root/testdata/sf0.001"
    val served = graft.Queries.q164AsofJoin(spark, dir)
      .collect().map(_.toSeq).sortBy(_.toString)
    val dist = graft.Queries.q164AsofJoinDistributed(spark, dir)
      .collect().map(_.toSeq).sortBy(_.toString)
    served should not be empty
    served shouldBe dist
    spark.catalog.clearCache()
  }

  test("forward direction is exact across partition boundaries too") {
    val rnd = new scala.util.Random(41)
    val ls = (1L to 120L).map(i => (i, 1L + rnd.nextInt(2).toLong, rnd.nextInt(2000)))
    val rs = (1 to 70).map(_ => (1L + rnd.nextInt(2).toLong, rnd.nextInt(2000), rnd.nextDouble()))
      .groupBy(x => (x._1, x._2)).map(_._2.head).toSeq
    val expected = ls.map { case (id, k, t) =>
      val after = rs.filter(r => r._1 == k && r._2 >= t)
      id -> (if (after.isEmpty) None else Some(after.minBy(_._2)._3))
    }.toMap
    val got = AsOf.joinAsOf(leftDf(ls: _*), rightDf(rs: _*),
        keys = Seq("k"), leftTime = "t", rightTime = "rt",
        payload = Seq("pay"), direction = AsOf.Forward, prefix = "m_")
      .collect().map(x => x.getLong(0) ->
        (if (x.isNullAt(4)) None else Some(x.getDouble(4)))).toMap
    got shouldBe expected
  }
}
