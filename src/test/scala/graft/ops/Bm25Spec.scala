package graft.ops

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.SparkSpec

class Bm25Spec extends SparkSpec {

  private def docs(texts: (Long, String)*) =
    df("doc_id BIGINT, text STRING", texts.map(t => Row(t._1, t._2)))

  private def terms(ts: String*) = df("term STRING", ts.map(Row(_)))

  /** Driver-side reference of the exact integer formula. */
  private def refScore(tf: Long, dl: Long, dfT: Long, n: Long,
                       avg: Long): Long = {
    val idf = Bm25.Scale *
      java.lang.Long.toBinaryString((n + 1) / (dfT + 1)).length
    val tfp = (22 * tf * avg * Bm25.Scale) /
      (10 * avg * tf + 3 * avg + 9 * dl)
    idf * tfp / Bm25.Scale
  }

  test("postings carry tf and doc length; scores match the integer reference") {
    // corpus: N=3, tokens 4+4+2=10, avgdl = 10 div 3 = 3
    val d = docs(
      1L -> "cat dog cat bird",
      2L -> "dog dog dog fish",
      3L -> "cat fish")
    val post = Bm25.postings(d, "doc_id", "text")
    post.filter(col("term") === "cat" && col("doc_id") === 1L)
      .head.getLong(3) shouldBe 2L // tf
    val out = Bm25.topK(post, terms("cat"), k = 10)
      .collect().map(r => (r.getInt(1), r.getLong(2), r.getLong(3)))
    // df(cat)=2, n=3, avgdl=3
    val s1 = refScore(tf = 2, dl = 4, dfT = 2, n = 3, avg = 3)
    val s3 = refScore(tf = 1, dl = 2, dfT = 2, n = 3, avg = 3)
    val expected = Seq((1L, s1), (3L, s3)).sortBy(x => (-x._2, x._1))
      .zipWithIndex.map { case ((id, s), i) => (i + 1, id, s) }
    out.toSet shouldBe expected.toSet
    spark.catalog.clearCache()
  }

  test("rarer terms outrank common ones at equal tf/dl (idf monotonicity)") {
    // 'rare' appears in 1 of 8 docs, 'common' in all 8; the probe doc
    // holds both once at the same length — rare must score higher.
    val filler = (2L to 8L).map(i => i -> "common pad pad pad")
    val d = docs((1L -> "rare common pad pad") +: filler: _*)
    val out = Bm25.topK(Bm25.postings(d, "doc_id", "text"),
        terms("rare", "common"), k = 1)
      .collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    out("rare") should be > out("common")
    spark.catalog.clearCache()
  }

  test("whole-query scoring sums per-term scores and counts matched terms") {
    // q167's operator against a hand-checkable corpus: query 0 = {cat,
    // fish}, query 1 = {dog}. Doc 3 matches both of query 0's terms —
    // its score must be the SUM of the two per-term scores.
    val d = docs(
      1L -> "cat dog cat bird",
      2L -> "dog dog dog fish",
      3L -> "cat fish")
    val post = Bm25.postings(d, "doc_id", "text")
    val qs = df("query_id BIGINT, term STRING",
      Seq(Row(0L, "cat"), Row(0L, "fish"), Row(1L, "dog")))
    val out = Bm25.topKQueries(post, qs, k = 10)
      .collect()
      .map(r => (r.getLong(0), r.getLong(2)) ->
        (r.getInt(1), r.getLong(3), r.getLong(4))).toMap
    // n=3, avgdl=3; df: cat=2, fish=2, dog=2
    def s(tf: Long, dl: Long) = refScore(tf, dl, dfT = 2, n = 3, avg = 3)
    out((0L, 3L))._2 shouldBe (s(1, 2) + s(1, 2)) // cat + fish, both in doc 3
    out((0L, 3L))._3 shouldBe 2L                  // matched 2 distinct terms
    out((0L, 1L))._2 shouldBe s(2, 4)             // cat only
    out((0L, 1L))._3 shouldBe 1L
    out((1L, 2L))._2 shouldBe s(3, 4)             // dog tf=3
    out.keySet shouldBe Set((0L, 1L), (0L, 2L), (0L, 3L), (1L, 1L), (1L, 2L))
    // ranks are dense per query by (score desc, doc_id asc)
    out((0L, 3L))._1 should be < out((0L, 1L))._1 // doc 3 outranks doc 1
    spark.catalog.clearCache()
  }

  test("served dfT/stats frames give the same scores as the live derivation") {
    val d = docs((1L to 40L).map(i => i -> s"alpha tok$i beta beta"): _*)
    val post = Bm25.postings(d, "doc_id", "text")
    val live = Bm25.topK(post, terms("alpha", "beta"), k = 7)
      .collect().map(_.toSeq).sortBy(_.toString)
    val served = Bm25.topK(post, terms("alpha", "beta"), k = 7,
        dfT = Some(Bm25.docFreq(post)), stats = Some(Bm25.corpusStats(post)))
      .collect().map(_.toSeq).sortBy(_.toString)
    served shouldBe live
    spark.catalog.clearCache()
  }

  test("one-task maintain-and-serve tier ≡ distributed serve on non-ASCII tie terms") {
    // The r15 BPE lesson applied to the q171 tier: the panel tie-break
    // (df desc, term ASC) must use UTF-8 BINARY term order — Spark's
    // UTF8String sort — not Java's UTF-16 code-unit order. U+FFFF
    // (3-byte UTF-8, code unit 0xFFFF) sorts BELOW U+1F600 (4-byte
    // UTF-8, high surrogate 0xD83D) in binary order but ABOVE it in
    // UTF-16 order; planting both at EQUAL df on adjacent panel ranks
    // with different query assignments makes any divergence flip the
    // hit rows. All docs are "added" (empty stored artifacts), so the
    // maintained index equals a fresh build and the distributed twin
    // is the from-scratch serve.
    val hi = "￿"     // U+FFFF
    val lo = new String(Character.toChars(0x1F600)) // U+1F600
    // build dfs by DOC presence: aa in 9 docs (1-9), bb in 8 (1-8),
    // cc in 7 (1-7), dd in 6 (1-6), hi in docs 1,2; lo in docs 3,4;
    // ee in doc 1, ff in doc 2 → df ranks: aa,bb,cc,dd then the tie
    // pair at ranks 5,6 then ee,ff at 7,8.
    def text(i: Long): String = {
      val sb = new StringBuilder("aa")
      if (i <= 8) sb.append(" bb")
      if (i <= 7) sb.append(" cc")
      if (i <= 6) sb.append(" dd")
      if (i == 1 || i == 2) sb.append(" ").append(hi)
      if (i == 3 || i == 4) sb.append(" ").append(lo)
      if (i == 1) sb.append(" ee")
      if (i == 2) sb.append(" ff")
      sb.toString
    }
    val corpus = docs((1L to 9L).map(i => i -> text(i)): _*)
    val emptyPost = df("term STRING, doc_id BIGINT, dl BIGINT, tf BIGINT", Nil)
    val emptyHashes = df("doc_id BIGINT, content_hash STRING", Nil)
    val local = Bm25.maintainAndServeLocal(emptyPost, emptyHashes, corpus,
        "doc_id", "text", k = 5)
      .collect().map(_.toSeq).sortBy(_.toString)
    // distributed twin: fresh build + the same df-rank panel + serve
    val post = Bm25.postings(corpus, "doc_id", "text")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val dfT = Bm25.docFreq(post)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val stats = Bm25.corpusStats(post)
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("df").desc, col("term"))
    val panel = dfT.orderBy(col("df").desc, col("term")).limit(16)
      .withColumn("_r", row_number().over(w))
      .filter(col("_r") >= 5)
      .select(((col("_r") - 5) % 4).cast("long").as("query_id"), col("term"))
    val hits = Bm25.topKQueries(post, panel, k = 5,
      dfT = Some(dfT), stats = Some(stats))
    val nullL = lit(null).cast("long")
    val dist = dfT.select(lit("df").as("kind"), col("term"),
        nullL.as("query_id"), lit(null).cast("int").as("rank"),
        nullL.as("doc_id"), col("df").as("v1"), nullL.as("v2"))
      .unionByName(stats.select(lit("stats").as("kind"),
        lit(null).cast("string").as("term"), nullL.as("query_id"),
        lit(null).cast("int").as("rank"), nullL.as("doc_id"),
        col("_n").as("v1"), col("_avg").as("v2")))
      .unionByName(hits.select(lit("hit").as("kind"),
        lit(null).cast("string").as("term"), col("query_id"),
        col("rank").cast("int").as("rank"), col("doc_id"),
        col("score").as("v1"), col("n_terms").as("v2")))
      .collect().map(_.toSeq).sortBy(_.toString)
    local should not be empty
    local shouldBe dist
    // pin the BINARY order explicitly so a UTF-16 regression fails
    // loudly here even if both tiers drift together: U+FFFF takes
    // panel rank 5 (query 0 — its postings live in docs 1,2)
    val q0Docs = local.collect {
      case Seq("hit", _, qid: java.lang.Long, _, did: java.lang.Long, _, _)
        if qid == 0L => did.toLong
    }.toSet
    q0Docs shouldBe Set(1L, 2L)
    spark.catalog.clearCache()
  }

  test("salted top-k equals the single-window ranking (mega-term postings)") {
    // one stop-word-like term present in every doc: the salted two-phase
    // rank must equal a plain window ranking
    val d = docs((1L to 60L).map(i =>
      i -> s"stop tok$i ${"x " * (i % 7).toInt}trail"): _*)
    val post = Bm25.postings(d, "doc_id", "text")
    val got = Bm25.topK(post, terms("stop"), k = 5)
      .collect().map(r => (r.getInt(1), r.getLong(2))).toSet
    val stats = post.agg(count_distinct(col("doc_id")).cast("long"),
      expr("sum(tf) div count(distinct doc_id)")).head
    val (n, avg) = (stats.getLong(0), stats.getLong(1))
    val dfStop = post.filter(col("term") === "stop").count()
    val expected = post.filter(col("term") === "stop")
      .collect().map(r => (r.getLong(1),
        refScore(r.getLong(3), r.getLong(2), dfStop, n, avg)))
      .sortBy(x => (-x._2, x._1)).take(5).zipWithIndex
      .map { case ((id, _), i) => (i + 1, id) }.toSet
    got shouldBe expected
    spark.catalog.clearCache()
  }
}
