package graft.ops

import java.sql.Timestamp

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.SparkSpec

class AsofJoinSpec extends SparkSpec {

  private def ts(m: Int) = Timestamp.valueOf(f"2024-01-01 10:${m / 60}%02d:${m % 60}%02d")

  private def leftDf(rows: (Long, Long, Int)*) = // (id, key, minute)
    df("id BIGINT, k BIGINT, t TIMESTAMP",
      rows.map(r => Row(r._1, r._2, ts(r._3))))

  private def rightDf(rows: (Long, Int, Double)*) = // (key, minute, pay)
    df("k BIGINT, t TIMESTAMP, pay DOUBLE",
      rows.map(r => Row(r._1, ts(r._2), r._3)))

  private def run(l: org.apache.spark.sql.DataFrame,
                  r: org.apache.spark.sql.DataFrame) =
    AsofJoin.backward(l, r, "k", "t", Seq("pay"))
      .collect().map(x => x.getLong(0) ->
        (if (x.isNullAt(3)) None else Some(x.getDouble(3)))).toMap

  test("latest prior (inclusive) right row matches; no prior row yields null") {
    val l = leftDf((1L, 1L, 10), (2L, 1L, 30), (3L, 1L, 5), (4L, 2L, 10))
    val r = rightDf((1L, 10, 100.0), (1L, 20, 200.0), (2L, 15, 300.0))
    run(l, r) shouldBe Map(
      1L -> Some(100.0), // equal timestamp matches (inclusive)
      2L -> Some(200.0), // latest of the two priors
      3L -> None,        // before every right row
      4L -> None)        // right exists only after
  }

  test("matches a brute-force reference on random data incl. a mega key") {
    val rnd = new scala.util.Random(11)
    // key 7 is the mega key: over half of all rows on both sides
    def key() = if (rnd.nextBoolean()) 7L else 1L + rnd.nextInt(5)
    val ls = (1L to 300L).map(i => (i, key(), rnd.nextInt(500)))
    val rs = (1 to 200).map(_ => (key(), rnd.nextInt(500), rnd.nextInt(1000).toDouble))
      // contract: unique per (key, time)
      .groupBy(x => (x._1, x._2)).map(_._2.head).toSeq
    val expected = ls.map { case (id, k, t) =>
      val prior = rs.filter(r => r._1 == k && r._2 <= t)
      id -> (if (prior.isEmpty) None else Some(prior.maxBy(_._2)._3))
    }.toMap
    run(leftDf(ls: _*), rightDf(rs: _*)) shouldBe expected
  }

  test("result is independent of the shuffle-partition count") {
    val rnd = new scala.util.Random(23)
    val ls = (1L to 150L).map(i => (i, 1L + rnd.nextInt(3).toLong, rnd.nextInt(300)))
    val rs = (1 to 80).map(_ => (1L + rnd.nextInt(3).toLong, rnd.nextInt(300), rnd.nextDouble()))
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

  test("null keys and null times drop from both sides (never match, never crash)") {
    val l = df("id BIGINT, k BIGINT, t TIMESTAMP", Seq(
      Row(1L, 1L, ts(10)), Row(2L, null, ts(10)), Row(3L, 1L, null)))
    val r = df("k BIGINT, t TIMESTAMP, pay DOUBLE", Seq(
      Row(1L, ts(5), 50.0), Row(null, ts(1), 99.0), Row(1L, null, 98.0)))
    val out = AsofJoin.backward(l, r, "k", "t", Seq("pay"))
      .collect().map(x => x.getLong(0) -> x.getDouble(3)).toMap
    out shouldBe Map(1L -> 50.0)
  }

  test("all left columns pass through unchanged alongside the payload") {
    val l = df("id BIGINT, k BIGINT, t TIMESTAMP, note STRING", Seq(
      Row(1L, 1L, ts(10), "alpha")))
    val r = rightDf((1L, 5, 42.0))
    val row = AsofJoin.backward(l, r, "k", "t", Seq("pay")).head
    row.getLong(0) shouldBe 1L
    row.getString(3) shouldBe "alpha"
    row.getDouble(4) shouldBe 42.0
  }
}
