package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** BM25 ranked retrieval over a distributed inverted index (Robertson &
  * Zaragoza 2009, public) — the serving-side counterpart of q67's
  * TF-IDF diagnostics and the retrieval primitive a curation pipeline
  * runs for eval-set decontamination probes, nearest-boilerplate
  * lookups, and topic audits.
  *
  * ALL-INTEGER scoring (the [[Graph]]/[[LmScore]]/[[Dsir]] portability
  * contract — float idf/length-normalization sums are libm- and
  * order-dependent and can never hash-match another engine):
  *   - idf(t)  = Scale · (floor(log2((N+1) div (df+1))) + 1), the exact
  *     `length(bin(x))` integer-log2 both engines compute identically —
  *     a monotone proxy for ln((N−df+0.5)/(df+0.5)) with the same
  *     rare-term-wins ordering;
  *   - the tf saturation / length normalization term with k1 = 1.2 and
  *     b = 0.75 is EXACT rational arithmetic: multiplying numerator and
  *     denominator by 10·avgdl clears the decimals, so
  *     tfpart = (22·tf·avgdl·Scale) div (10·avgdl·tf + 3·avgdl + 9·dl)
  *     — one BIGINT division, bit-identical everywhere;
  *   - score = (idf · tfpart) div Scale. Domain: doc length and avgdl
  *     up to ~10^6 stay far inside BIGINT for every product above.
  *
  * Scale shape: postings build is one explode + one map-side-combined
  * count; document frequency and the (N, avgdl) stats are aggregates of
  * the postings frame (persisted once — three consumers); retrieval
  * joins the postings to the (broadcast-small) query-term list so only
  * matching postings are ever scored; ranking is the skew-proof
  * [[TopN.saltedTopNPerKey]], so a stop-word query term whose postings
  * list is the whole corpus still ranks across tasks instead of
  * serializing one window task.
  */
object Bm25 {

  /** Fixed-point scale for scores. */
  val Scale = 1000000L

  /** The inverted index with per-doc length: (term, doc_id, dl, tf).
    * `sum(tf)` over the frame is the corpus token count, so the (N,
    * avgdl) stats need no second corpus pass. */
  def postings(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol).cast("long").as("doc_id"),
        TextStats.words(lower(col(textCol))).as("ws"))
      .filter(size(col("ws")) >= 1)
      .select(col("doc_id"), size(col("ws")).cast("long").as("dl"),
        explode(col("ws")).as("term"))
      .groupBy(col("term"), col("doc_id"), col("dl"))
      .agg(count(lit(1)).as("tf"))

  /** Top-`k` documents per query term by integer BM25 — (term, rank,
    * doc_id, score). `queryTerms` is one column `term` (small — it
    * broadcasts). Ties broken by doc_id ascending (total order, the
    * [[TopN]] determinism contract). */
  def topK(post: DataFrame, queryTerms: DataFrame, k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1; got $k")
    val p = post.persist(StorageLevel.MEMORY_AND_DISK)
    // In-plan overflow guard riding the broadcast stats (the
    // Sampling/Percentiles discipline): the numerator 22·tf·avgdl·Scale
    // with tf ≤ max(dl) needs max(dl)·avgdl ≤ Long.MaxValue/(22·Scale) —
    // in non-ANSI mode a wrapped BIGINT ranks silently wrong while the
    // oracle errors loudly; fail the same way on both sides instead.
    val stats = p.agg(
        count_distinct(col("doc_id")).as("_n"),
        expr("sum(tf) div count(distinct doc_id)").as("_avg"),
        max(col("dl")).as("_maxdl"))
      .filter(assert_true(
        col("_maxdl") <= lit(Long.MaxValue / (22L * Scale)) / col("_avg"),
        concat(lit("Bm25.topK: max doc length "), col("_maxdl"),
          lit(" times avgdl "), col("_avg"),
          lit(" overflows BIGINT score arithmetic — chunk the corpus " +
            "or rescale Scale down"))).isNull)
      .select(col("_n"), col("_avg"))
    val dfT = p.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val scored = p
      .join(broadcast(queryTerms.select(col("term"))), Seq("term"))
      .join(dfT, Seq("term"))
      .crossJoin(broadcast(stats))
      .withColumn("idf",
        lit(Scale) * length(bin(expr("(_n + 1) div (df + 1)"))).cast("long"))
      .withColumn("_tfp", expr(
        s"(22 * tf * _avg * ${Scale}L) div (10 * _avg * tf + 3 * _avg + 9 * dl)"))
      .withColumn("score", expr(s"(idf * _tfp) div ${Scale}L"))
      .select(col("term"), col("doc_id"), col("score"))
    TopN.saltedTopNPerKey(scored, Seq(col("term")),
      Seq(col("score").desc, col("doc_id").asc), col("doc_id"), k)
      .select(col("term"), col("rank"), col("doc_id"), col("score"))
  }
}
