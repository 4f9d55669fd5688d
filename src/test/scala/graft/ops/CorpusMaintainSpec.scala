package graft.ops

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

import graft.SparkSpec

/** Hand-computed coverage for the one-task incremental manifest
  * ([[CorpusMaintain.manifestLocal]]) on the paths the testdata corpus
  * NEVER exercises: measured at sf0.001/sf0.01, every unchanged
  * quality doc keeps pass_exact = true across the snapshot arithmetic
  * (no canonical ever flips), so the sf-corpus equality specs and the
  * q145 oracle certify the reuse and delta paths but not PROMOTION
  * (an unchanged duplicate whose canonical left the corpus must run
  * stages 3–4 for the first time) or DEMOTION (an added lower-id
  * duplicate steals an unchanged doc's canonical status and
  * short-circuits it). This spec builds a 10-doc scenario covering
  * both flips plus the quality/decon/LM short-circuit ladder and the
  * unchanged-without-manifest-row absence rule, with expectations
  * computed by hand. */
class CorpusMaintainSpec extends SparkSpec {

  private def text(p: String, n: Int) = (1 to n).map(i => s"$p$i").mkString(" ")

  test("promotion, demotion and the disposition ladder match hand-computed rows") {
    val tA = text("a", 30); val tB = text("b", 30); val tE = text("e", 30)
    val tF = text("f", 30); val tJ = text("j", 30); val tK = text("k", 30)
    val tI = text("i", 10) // fails the 25..90 quality band
    val tBold = text("oldb", 30) // B's previous-crawl text

    def h(t: String) = LocalText.contentHash(t)
    // new snapshot (training docs; the %20 eval filter is the caller's)
    val newDocs = df("doc_id BIGINT, text STRING", Seq(
      Row(1L, tA),   // unchanged, canonical, full reuse
      Row(2L, tB),   // changed -> recompute
      Row(7L, tF),   // unchanged, PROMOTED (old canonical 3L removed)
      Row(6L, tA),   // unchanged but absent from prev manifest -> absent
      Row(32L, tE),  // added, steals 33L's canonical (32 < 33)
      Row(33L, tE),  // unchanged, DEMOTED by 32L
      Row(40L, tA),  // added duplicate of 1L -> non-canonical
      Row(50L, tI),  // added, quality fail
      Row(51L, tJ),  // added, decon drop (8 cut > 20% of 30)
      Row(52L, tK))) // added, LM fail (vocab absent from model)
    val prevHashes = df("doc_id BIGINT, content_hash STRING", Seq(
      Row(1L, h(tA)), Row(2L, h(tBold)), Row(3L, h(tF)), Row(6L, h(tA)),
      Row(7L, h(tF)), Row(33L, h(tE))))
    val prevBuild = df("doc_id BIGINT, pass_quality BOOLEAN, " +
      "pass_exact BOOLEAN, pass_decon BOOLEAN, pass_lm BOOLEAN, " +
      "final_text STRING, content_hash STRING", Seq(
      Row(1L, true, true, true, true, "prev-final-a", h(tA)),
      Row(3L, true, true, true, true, "prev-final-g", h(tF)), // removed doc
      Row(7L, true, false, false, false, "", h(tF)), // old non-canonical
      Row(33L, true, true, true, true, "prev-final-e", h(tE))))
    // one eval window: tokens 5..12 of tJ -> 8 cut tokens, 8 > 30*0.2
    val evalKeys = df("key STRING",
      Seq(Row((5 to 12).map(i => s"j$i").mkString(" "))))
    def bigrams(t: String) = {
      val w = t.split(" ")
      w.zip(w.tail).map { case (x, y) => s"$x $y" }
    }
    val lmModel = df("bigram STRING, cnt BIGINT",
      (bigrams(tA) ++ bigrams(tB) ++ bigrams(tE) ++ bigrams(tF))
        .map(b => Row(b, 1L)))

    val out = CorpusMaintain.manifestLocal(newDocs, prevHashes, prevBuild,
        evalKeys, lmModel, spanLen = 8, dropPct = 20,
        wcLo = 25L, wcHi = 90L, shards = 16)
      .collect()
      .map(r => r.getLong(0) -> (r.getBoolean(1), r.getBoolean(2),
        r.getBoolean(3), r.getBoolean(4), r.getBoolean(5),
        r.getString(6), r.getInt(7))).toMap

    out.keySet shouldBe Set(1L, 2L, 7L, 32L, 33L, 40L, 50L, 51L, 52L)
    // doc 6 (unchanged, no stored manifest row) stays absent: the
    // distributed prevU semi-join has no row to reuse
    out(1L) shouldBe ((true, true, true, true, true, "prev-final-a", 1))
    out(2L) shouldBe ((true, true, true, true, true, tB, 2))
    // PROMOTION: prev flags were short-circuit false; stages 3-4 run now
    out(7L) shouldBe ((true, true, true, true, true, tF, 7))
    out(32L) shouldBe ((true, true, true, true, true, tE, 0))
    // DEMOTION: stored keep flags must NOT be reused once exact flips
    out(33L) shouldBe ((true, false, false, false, false, "", -1))
    out(40L) shouldBe ((true, false, false, false, false, "", -1))
    out(50L) shouldBe ((false, false, false, false, false, "", -1))
    out(51L) shouldBe ((true, true, false, false, false, "", -1))
    out(52L) shouldBe ((true, true, true, false, false, "", -1))
  }
}
