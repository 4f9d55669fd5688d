package graft.ops

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.SparkSpec

class SamplingSpec extends SparkSpec {

  private def keys(n: Int) = df("k BIGINT", (0L until n.toLong).map(Row(_)))

  test("hashBucket lands in [0, buckets) and is deterministic across runs") {
    val d = keys(500)
    val b1 = collectCol[Int](d.select(Sampling.hashBucket(col("k")).as("b")))
    b1.foreach { b => b should (be >= 0 and be < 100) }
    val b2 = collectCol[Int](d.select(Sampling.hashBucket(col("k")).as("b")))
    b1 shouldBe b2
  }

  test("split covers all folds with roughly the requested proportions") {
    val counts = keys(2000)
      .select(Sampling.split(col("k")).as("s"))
      .groupBy("s").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    counts.keySet shouldBe Set("train", "val", "test")
    // 80/10/10 with 2-hex-char granularity: generous tolerance, the point
    // is gross proportionality + total preservation, not exactness
    counts("train").toDouble / 2000 should (be > 0.7 and be < 0.9)
    counts.values.sum shouldBe 2000
  }

  test("split is a pure function of the key — disjoint folds, rerun-stable") {
    val d = keys(300).select(col("k"), Sampling.split(col("k")).as("s"))
    d.groupBy("k").agg(countDistinct("s").as("n"))
      .filter(col("n") > 1).count() shouldBe 0
  }

  test("keep(pct) uses a salted key: sample membership doesn't equal fold membership") {
    val d = keys(1000).select(
      Sampling.hashBucket(col("k")).as("fold_bucket"),
      Sampling.keep(col("k"), 50).as("kept"))
    // if keep() reused the fold bucket, kept would be exactly fold_bucket<50
    val disagree = d.filter((col("fold_bucket") < 50) =!= col("kept")).count()
    disagree should be > 0L
  }

  test("invalid parameters are rejected") {
    an[IllegalArgumentException] should be thrownBy Sampling.hashBucket(col("k"), 0)
    an[IllegalArgumentException] should be thrownBy Sampling.split(col("k"), 95, 10)
    an[IllegalArgumentException] should be thrownBy Sampling.keep(col("k"), 101)
  }

  private def weighted(ws: (Long, Long)*) =
    df("id BIGINT, w BIGINT", ws.map(e => Row(e._1, e._2)))

  /** Driver-side reference: same md5 order, prefix sums and ceil-div
    * multiplicities in plain Scala. */
  private def refSystematic(ws: Seq[(Long, Long)], k: Long): Map[Long, Long] = {
    def h(id: Long): String = java.security.MessageDigest.getInstance("MD5")
      .digest(id.toString.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val pos = ws.filter(_._2 > 0).sortBy { case (id, _) => (h(id), id) }
    val total = pos.map(_._2).sum
    def ceilDiv(a: Long, b: Long): Long = (a + b - 1) / b
    var prefix = 0L
    pos.flatMap { case (id, w) =>
      val m = ceilDiv((prefix + w) * k, total) - ceilDiv(prefix * k, total)
      prefix += w
      if (m > 0) Some(id -> m) else None
    }.toMap
  }

  test("systematicWeighted: exactly k picks, matching the closed-form reference") {
    val ws = (0L until 200L).map(i => (i, (i * 37) % 90 + 1))
    val out = Sampling.systematicWeighted(weighted(ws: _*), "id", "w", k = 25)
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[Long]("pick_mult")).toMap
    out.values.sum shouldBe 25L
    out shouldBe refSystematic(ws, 25)
  }

  test("systematicWeighted: a dominant weight is picked with multiplicity, zero weights never") {
    // one row owns >half the mass: with k=10 it must take >= 5 picks;
    // w=0 rows own empty intervals and must be absent
    val ws = Seq((1L, 1000L), (2L, 100L), (3L, 100L), (4L, 0L), (5L, 300L))
    val out = Sampling.systematicWeighted(weighted(ws: _*), "id", "w", k = 10)
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[Long]("pick_mult")).toMap
    out.values.sum shouldBe 10L
    out(1L) should be >= 5L
    out.contains(4L) shouldBe false
    out shouldBe refSystematic(ws, 10)
  }

  test("systematicWeighted is partitioning-independent (all-BIGINT selection)") {
    val ws = (0L until 500L).map(i => (i, (i * 13) % 40 + 1))
    val d = weighted(ws: _*)
    val r1 = Sampling.systematicWeighted(d, "id", "w", k = 40)
    val r2 = Sampling.systematicWeighted(d.repartition(17), "id", "w", k = 40)
    r1.exceptAll(r2).count() shouldBe 0
    r2.exceptAll(r1).count() shouldBe 0
  }

  test("systematicWeighted fails fast when k times total weight would overflow") {
    val e = intercept[Throwable] {
      Sampling.systematicWeighted(
        weighted((1L, Long.MaxValue / 4), (2L, Long.MaxValue / 4)),
        "id", "w", k = 100).collect()
    }
    val msgs = Iterator.iterate(e)(_.getCause).takeWhile(_ != null)
      .map(t => Option(t.getMessage).getOrElse("")).mkString(" | ")
    msgs should include("systematicWeighted")
  }

  private def keyed(ws: (Long, String, Long)*) =
    df("id BIGINT, k STRING, w BIGINT", ws.map(e => Row(e._1, e._2, e._3)))

  test("systematicWeightedPerKey: exactly k picks per key, each equal to a per-key global run") {
    val rows = (0L until 300L).map(i => (i, s"s${i % 5}", (i * 37) % 90 + 1))
    val out = Sampling.systematicWeightedPerKey(keyed(rows: _*),
        "k", "id", "w", k = 12)
      .collect()
      .map(r => (r.getAs[String]("k"), r.getAs[Long]("id"),
        r.getAs[Long]("pick_mult")))
    out.groupBy(_._1).view.mapValues(_.map(_._3).sum).toMap shouldBe
      (0 until 5).map(s => s"s$s" -> 12L).toMap
    // Per key, the stratified picks must equal running the GLOBAL
    // sampler on that key's slice alone (same order, same W_key) — the
    // reference closed form replays each stratum independently.
    (0 until 5).foreach { s =>
      val key = s"s$s"
      val slice = rows.filter(_._2 == key).map(r => (r._1, r._3))
      val got = out.filter(_._1 == key).map(t => t._2 -> t._3).toMap
      got shouldBe refSystematic(slice, 12)
    }
  }

  test("systematicWeightedPerKey is partitioning-independent") {
    val rows = (0L until 400L).map(i => (i, s"g${i % 3}", (i * 13) % 40 + 1))
    val d = keyed(rows: _*)
    val r1 = Sampling.systematicWeightedPerKey(d, "k", "id", "w", k = 15)
    val r2 = Sampling.systematicWeightedPerKey(d.repartition(17), "k", "id", "w", k = 15)
    r1.exceptAll(r2).count() shouldBe 0
    r2.exceptAll(r1).count() shouldBe 0
  }

  test("property: per-key multiplicities always sum to exactly k") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    val scenario = for {
      nKeys <- Gen.chooseNum(1, 4)
      n <- Gen.chooseNum(nKeys, 30)
      ws <- Gen.listOfN(n, Gen.chooseNum(1L, 500L))
      k <- Gen.chooseNum(1, 9)
    } yield (ws.zipWithIndex.map { case (w, i) =>
      (i.toLong, s"k${i % nKeys}", w)
    }, nKeys, k)
    val prop = Prop.forAll(scenario) { case (rows, nKeys, k) =>
      val sums = Sampling.systematicWeightedPerKey(keyed(rows: _*),
          "k", "id", "w", k)
        .groupBy(col("k")).agg(sum(col("pick_mult")).as("s"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      sums == (0 until nKeys).map(i => s"k$i" -> k.toLong).toMap
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(8), prop)
    assert(res.passed, res.status.toString)
  }

  test("systematicWeightedPerKey fails fast when one key's k*W overflows") {
    val e = intercept[Throwable] {
      Sampling.systematicWeightedPerKey(
        keyed((1L, "big", Long.MaxValue / 4), (2L, "big", Long.MaxValue / 4),
          (3L, "small", 10L)),
        "k", "id", "w", k = 100).collect()
    }
    val msgs = Iterator.iterate(e)(_.getCause).takeWhile(_ != null)
      .map(t => Option(t.getMessage).getOrElse("")).mkString(" | ")
    msgs should include("systematicWeightedPerKey")
  }
}
