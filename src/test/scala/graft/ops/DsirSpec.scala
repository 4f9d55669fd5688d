package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

class DsirSpec extends SparkSpec {

  test("features: unigrams + bigrams with multiplicity, lowercased, blanks dropped") {
    val docs = df("id BIGINT, text STRING", Seq(
      Row(1L, "The cat the cat"),
      Row(2L, ""),
      Row(3L, "solo")))
    val f = Dsir.features(docs, "id", "text")
      .groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // doc 1: 4 unigrams + 3 bigrams = 7; doc 2: none; doc 3: 1 unigram
    f shouldBe Map(1L -> 7L, 3L -> 1L)
  }

  test("features bucket is the md5 3-hex prefix of the lowercased feature") {
    val docs = df("id BIGINT, text STRING", Seq(Row(1L, "Cat")))
    val got = Dsir.features(docs, "id", "text").collect().map(_.getString(1))
    val expected = java.security.MessageDigest.getInstance("MD5")
      .digest("cat".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.take(3)
    got.toSeq shouldBe Seq(expected)
  }

  test("importance matches a hand-computed integer bitlen weight over BUCKETS") {
    // Bucket-level replay in plain Scala: collisions are part of the
    // DSIR semantics (e.g. "a" and "a b" share md5 prefix 0cc), so the
    // expectation is computed over bucket counts, not raw features.
    def bucket(f: String): String = java.security.MessageDigest
      .getInstance("MD5").digest(f.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.take(3)
    def feats(text: String): Seq[String] = {
      val w = text.split("\\s+").toSeq
      (w ++ w.sliding(2).filter(_.size == 2).map(_.mkString(" ")))
        .map(bucket)
    }
    val tCounts = feats("a a b").groupBy(identity).view.mapValues(_.size)
    val rCounts = feats("b b b b").groupBy(identity).view.mapValues(_.size)
    def bl(x: Long) = 64 - java.lang.Long.numberOfLeadingZeros(x)
    val probeFeats = feats("a b")
    val tbits = probeFeats.map(b => bl(tCounts.getOrElse(b, 0) + 1L)).sum
    val rbits = probeFeats.map(b => bl(rCounts.getOrElse(b, 0) + 1L)).sum

    val docs = df("id BIGINT, text STRING", Seq(
      Row(10L, "a a b"), Row(20L, "b b b b")))
    val tm = Dsir.trainBucketCounts(docs, "id", "text", col("id") === 10L)
    val rm = Dsir.trainBucketCounts(docs, "id", "text", col("id") === 20L)
    val probe = df("id BIGINT, text STRING", Seq(Row(1L, "a b")))
    val out = Dsir.importance(probe, "id", "text", tm, rm)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSeq
    out shouldBe Seq((1L, 3L, tbits.toLong, rbits.toLong,
      (tbits - rbits).toLong))
  }

  test("importance: featureless docs score 0 and still appear") {
    val docs = df("id BIGINT, text STRING", Seq(Row(1L, "x y"), Row(2L, "")))
    val m = Dsir.trainBucketCounts(docs, "id", "text", lit(true))
    val out = Dsir.importance(docs, "id", "text", m, m)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(4))).toMap
    out(2L) shouldBe ((0L, 0L))
    out(1L)._1 shouldBe 3L       // x, y, "x y"
    out(1L)._2 shouldBe 0L       // identical models cancel exactly
  }

  test("maintainBucketCounts equals a fresh retrain across add, remove, change") {
    val old = df("id BIGINT, text STRING", Seq(
      Row(1L, "alpha beta gamma"),   // unchanged
      Row(2L, "delta epsilon"),      // changed
      Row(3L, "zeta zeta"),          // removed: its buckets drop to zero
      Row(4L, "alpha beta")))        // unchanged
    val neu = df("id BIGINT, text STRING", Seq(
      Row(1L, "alpha beta gamma"),
      Row(2L, "eta theta iota"),     // new text of the changed doc
      Row(4L, "alpha beta"),
      Row(5L, "beta gamma beta")))   // added
    val delta = df("doc_id BIGINT, status STRING", Seq(
      Row(1L, "unchanged"), Row(2L, "changed"), Row(3L, "removed"),
      Row(4L, "unchanged"), Row(5L, "added")))
    val prev = Dsir.trainBucketCounts(old, "id", "text", lit(true))
    val inc = Dsir.maintainBucketCounts(prev, old, neu, "id", "text", delta)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val fresh = Dsir.trainBucketCounts(neu, "id", "text", lit(true))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    inc shouldBe fresh
  }

  test("maintainSplitModels equals per-split maintainBucketCounts") {
    val old = df("id BIGINT, text STRING", Seq(
      Row(20L, "alpha beta"), Row(1L, "gamma delta"),
      Row(40L, "epsilon zeta"), Row(3L, "eta theta")))
    val neu = df("id BIGINT, text STRING", Seq(
      Row(20L, "alpha beta"), Row(1L, "iota kappa"),
      Row(40L, "epsilon zeta"), Row(5L, "lambda mu")))
    val delta = df("doc_id BIGINT, status STRING", Seq(
      Row(20L, "unchanged"), Row(1L, "changed"), Row(3L, "removed"),
      Row(40L, "unchanged"), Row(5L, "added")))
    val isT = col("id") % 20 === 0
    val pt = Dsir.trainBucketCounts(old, "id", "text", isT)
    val pr = Dsir.trainBucketCounts(old, "id", "text", !isT)
    val fused = Dsir.maintainSplitModels(pt, pr, old, neu, "id", "text",
        delta, targetPred = isT)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    def per(target: Boolean) = {
      val pred = if (target) isT else !isT
      Dsir.maintainBucketCounts(if (target) pt else pr,
          old.filter(pred), neu.filter(pred), "id", "text", delta)
        .collect().map(r =>
          ((if (target) "target" else "raw"), r.getString(0)) -> r.getLong(1))
    }
    fused shouldBe (per(true) ++ per(false)).toMap
  }

  test("target-affine docs outrank target-absent docs") {
    val target = (1 to 5).map(i =>
      Row(100L + i, "quality prose about careful analysis and methods"))
    val raw = (1 to 5).map(i =>
      Row(200L + i, "spam spam buy now click here free offer"))
    val corpus = df("id BIGINT, text STRING", target ++ raw)
    val tm = Dsir.trainBucketCounts(corpus, "id", "text", col("id") < 200L)
    val rm = Dsir.trainBucketCounts(corpus, "id", "text", col("id") >= 200L)
    val probes = df("id BIGINT, text STRING", Seq(
      Row(1L, "careful analysis and methods"),
      Row(2L, "buy now click here")))
    val imp = Dsir.importance(probes, "id", "text", tm, rm)
      .collect().map(r => r.getLong(0) -> r.getLong(4)).toMap
    imp(1L) should be > imp(2L)
    imp(1L) should be > 0L
    imp(2L) should be < 0L
  }
}
