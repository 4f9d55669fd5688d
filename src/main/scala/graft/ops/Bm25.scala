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
  * count; document frequency and the (N, avgdl) stats are one-pass
  * aggregates of the postings frame. All three are INDEX artifacts —
  * build once per corpus snapshot, store, serve every retrieval from
  * the store (q165/q167 do exactly that; VERDICT r14 ask #1c) — so a
  * query pays query-sized cost, never an index rebuild. Retrieval
  * joins the postings to the (broadcast-small) query-term list so only
  * matching postings are ever scored; ranking is the skew-proof
  * [[TopN.saltedTopNPerKey]], so a stop-word term whose postings list
  * is the whole corpus still ranks across tasks instead of serializing
  * one window task.
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

  /** Per-term document frequency — the vocabulary-sized index metadata
    * every retrieval needs (idf) and every query-selection heuristic
    * reads. Store it beside the postings. */
  def docFreq(post: DataFrame): DataFrame =
    post.groupBy(col("term")).agg(count(lit(1)).as("df"))

  /** The (N, avgdl) corpus stats — ONE row, with the in-plan overflow
    * guard riding it (the Sampling/Percentiles discipline): the scoring
    * numerator 22·tf·avgdl·Scale with tf ≤ max(dl) needs max(dl)·avgdl
    * ≤ Long.MaxValue/(22·Scale) — in non-ANSI mode a wrapped BIGINT
    * ranks silently wrong while the oracle errors loudly; fail the same
    * way on both sides instead. Serving the stored stats row serves a
    * row this guard already admitted at build time. */
  def corpusStats(post: DataFrame): DataFrame =
    post.agg(
        count_distinct(col("doc_id")).as("_n"),
        expr("sum(tf) div count(distinct doc_id)").as("_avg"),
        max(col("dl")).as("_maxdl"))
      .filter(assert_true(
        col("_maxdl") <= lit(Long.MaxValue / (22L * Scale)) / col("_avg"),
        concat(lit("Bm25: max doc length "), col("_maxdl"),
          lit(" times avgdl "), col("_avg"),
          lit(" overflows BIGINT score arithmetic — chunk the corpus " +
            "or rescale Scale down"))).isNull)
      .select(col("_n"), col("_avg"))

  /** Integer BM25 scores for the postings of `queryTerms` only:
    * `queryTerms` (any extra columns — e.g. query_id — ride along) is
    * joined to the vocabulary-sized `dfT` first (broadcast of the tiny
    * term list), and THAT tiny (terms × df) frame broadcasts into the
    * postings scan — one pass over the postings, only matching rows
    * ever scored. `stats` is the one-row [[corpusStats]] frame. */
  private def scoredPostings(post: DataFrame, queryTerms: DataFrame,
                             dfT: DataFrame, stats: DataFrame): DataFrame = {
    val qdf = dfT.join(broadcast(queryTerms), Seq("term"))
    post
      .join(broadcast(qdf), Seq("term"))
      .crossJoin(broadcast(stats))
      .withColumn("idf",
        lit(Scale) * length(bin(expr("(_n + 1) div (df + 1)"))).cast("long"))
      .withColumn("_tfp", expr(
        s"(22 * tf * _avg * ${Scale}L) div (10 * _avg * tf + 3 * _avg + 9 * dl)"))
      .withColumn("score", expr(s"(idf * _tfp) div ${Scale}L"))
  }

  /** Share-or-derive plumbing: retrieval over a SERVED index passes the
    * stored df/stats artifacts and the postings frame is read as-is (a
    * parquet artifact scan — no persist needed); a live one-shot call
    * omits them and the postings frame is scope-persisted (it then
    * feeds df + stats + scoring = three consumers). */
  private def resolve(post: DataFrame, dfT: Option[DataFrame],
                      stats: Option[DataFrame])
      : (DataFrame, DataFrame, DataFrame) = {
    val p =
      if (dfT.isDefined && stats.isDefined) post
      else graft.CacheScope.scopedPersist(post, StorageLevel.MEMORY_AND_DISK)
    (p, dfT.getOrElse(docFreq(p)), stats.getOrElse(corpusStats(p)))
  }

  /** Top-`k` documents per query TERM by integer BM25 — (term, rank,
    * doc_id, score). `queryTerms` is one column `term` (small — it
    * broadcasts). Ties broken by doc_id ascending (total order, the
    * [[TopN]] determinism contract). Pass the stored `dfT`/`stats`
    * artifacts when serving a maintained index. */
  def topK(post: DataFrame, queryTerms: DataFrame, k: Int,
           dfT: Option[DataFrame] = None,
           stats: Option[DataFrame] = None): DataFrame = {
    require(k >= 1, s"k must be >= 1; got $k")
    val (p, d, st) = resolve(post, dfT, stats)
    val scored = scoredPostings(p, queryTerms.select(col("term")), d, st)
      .select(col("term"), col("doc_id"), col("score"))
    TopN.saltedTopNPerKey(scored, Seq(col("term")),
      Seq(col("score").desc, col("doc_id").asc), col("doc_id"), k)
      .select(col("term"), col("rank"), col("doc_id"), col("score"))
  }

  /** Whole-QUERY ranked retrieval (VERDICT r14 ask #3) — the shape every
    * consumer of the index actually runs: `queries` is (query_id, term);
    * a document's score for a query is the SUM of its per-term integer
    * BM25 scores over the query terms it contains (disjunctive
    * retrieval, Robertson-Zaragoza §3.3 — a doc matching no term scores
    * nothing and is absent), ranked per query by the salted top-k.
    * Output: (query_id, rank, doc_id, score, n_terms) with n_terms the
    * number of DISTINCT query terms the document matched (duplicate
    * terms within one query count once — postings are per-(term, doc)).
    * Overflow-safe without a new guard: a per-term score is ≤ idf·2.2
    * ≤ 64·2.2·Scale and a query has broadcast-few terms. */
  def topKQueries(post: DataFrame, queries: DataFrame, k: Int,
                  dfT: Option[DataFrame] = None,
                  stats: Option[DataFrame] = None): DataFrame = {
    require(k >= 1, s"k must be >= 1; got $k")
    val (p, d, st) = resolve(post, dfT, stats)
    val scored = scoredPostings(p,
        queries.select(col("query_id"), col("term")).distinct(), d, st)
      .groupBy(col("query_id"), col("doc_id"))
      .agg(sum(col("score")).as("score"), count(lit(1)).as("n_terms"))
    TopN.saltedTopNPerKey(scored, Seq(col("query_id")),
      Seq(col("score").desc, col("doc_id").asc), col("doc_id"), k)
      .select(col("query_id"), col("rank"), col("doc_id"), col("score"),
        col("n_terms"))
  }
}
