package graft.ops

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.SparkSpec

class DedupSpec extends SparkSpec {

  private val docs = df("id BIGINT, text STRING", Seq(
    Row(1L, "the quick brown fox jumps over the lazy dog again and again"),
    Row(2L, "THE  quick Brown fox jumps over the lazy dog again and again"), // exact dup after normalize
    Row(3L, "the quick brown fox jumps over the lazy cat again and again"),  // near dup of 1
    Row(4L, "completely different content with no shared phrases at all"),
    Row(5L, "the quick brown fox jumps over the lazy dog again and again")))  // exact dup of 1

  test("exactDedup: normalized content hash groups case/whitespace variants") {
    val out = Dedup.exactDedup(docs, "id", "text")
    out.count() shouldBe 5
    val canon = out.collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    canon(1L) shouldBe 1L
    canon(2L) shouldBe 1L
    canon(5L) shouldBe 1L
    canon(4L) shouldBe 4L
    out.filter(col("is_canonical")).count() shouldBe 3
    out.filter(col("id") === 1L).select("n_copies").collect()(0).getLong(0) shouldBe 3
  }

  test("shingleArray: fewer than n words → empty, else size-n windows") {
    val d = strDf("t", Seq("a b", "a b c d"))
    val out = d.select(Dedup.shingleArray(TextStats.words(col("t")), 3))
      .collect().map(_.getSeq[String](0))
    out(0) shouldBe Seq.empty
    out(1) shouldBe Seq("a b c", "b c d")
  }

  test("ngramJaccardPairs finds near-dups above threshold, not unrelated docs") {
    val byName = Dedup.ngramJaccardPairs(docs, "id", "text", 3, 0.5)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    byName should contain((1L, 3L)) // one-word edit
    byName should contain((1L, 5L)) // identical text
    byName.foreach { case (a, b) => assert(a < b) }
    assert(!byName.exists { case (a, b) => a == 4L || b == 4L })
  }

  test("minHash pairs are a subset of exact-Jaccard pairs and catch the planted dup") {
    val exact = Dedup.ngramJaccardPairs(docs, "id", "text", 3, 0.5)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val mh = Dedup.minHashNearDupPairs(docs, "id", "text", 3, 16, 2, 0.5)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    mh.subsetOf(exact) shouldBe true
    mh should contain((1L, 5L)) // identical text → identical signatures, always caught
  }

  test("nearDupClusters: transitive closure groups chains pairs cannot") {
    // 1 ~ 3 (one-word edit) and 1 ~ 5 (identical) — cluster {1,3,5} under
    // canonical 1 even though 3 ~ 5 may also pair; 2 and 4 depend on their
    // own pairings.
    val clusters = Dedup.nearDupClusters(docs, "id", "text", 3, 0.5)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    clusters(1L) shouldBe 1L
    clusters(3L) shouldBe 1L
    clusters(5L) shouldBe 1L
    clusters(4L) shouldBe 4L // no near-dups → own cluster
    clusters.size shouldBe 5 // every doc assigned
  }

  test("simHash: identical docs get identical fingerprints, pairs found at distance 0") {
    val fps = Dedup.simHash(docs, "id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    fps(1L) shouldBe fps(5L)
    val pairs = Dedup.simHashNearDupPairs(docs, "id", "text", 3)
      .select("doc_a", "doc_b", "hamming").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(pairs.exists(p => p._1 == 1L && p._2 == 5L && p._3 == 0))
  }
}
