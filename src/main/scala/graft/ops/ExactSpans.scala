package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Exact duplicated-SPAN deduplication — the "Deduplicating Training Data
  * Makes Language Models Better" (Lee et al. 2022) operation: find every
  * length-L token window that occurs more than once ANYWHERE in the
  * corpus (stride 1 — sliding, unlike [[graft.Queries.q69ChunkDedup]]'s
  * non-overlapping tiles), keep one canonical occurrence, and REWRITE
  * every document with the other occurrences' tokens cut out. The paper
  * builds suffix arrays for all-lengths exactness; the fixed-L sliding
  * anchor is the standard distributed compromise (one row per token, so
  * the whole pass is linear in corpus size).
  *
  * Scale shape: window extraction is a narrow map + explode (n_tokens
  * rows); duplicate detection is ONE map-side-combined groupBy over the
  * window key — deliberately `min`-based, NOT a per-key row_number (a
  * stop-phrase window can repeat millions of times at 100 TB, and a
  * window-function canonical would serialize that key on one core — the
  * same skew lesson as [[TopN]]); the marked-occurrence join is a pure
  * equi-join (one occ row per key — fan-out is the occurrence count,
  * linear, never quadratic); the rewrite is a per-document array fold.
  *
  * The canonical occurrence is the globally smallest (doc_id, position),
  * encoded as doc_id·PosRange + position for the min aggregate — exactly
  * lexicographic because positions stay in [0, PosRange). Documents
  * longer than PosRange (10^6) tokens are OUTSIDE the dedup domain:
  * they contribute no windows and pass through unrewritten (an explicit
  * bound, not a silent truncation — a corpus with multi-million-token
  * documents should chunk them upstream or raise PosRange together with
  * the oracle's encoding constant). All strings and integers — the
  * oracle replays every stage exactly, including the rewritten text.
  */
object ExactSpans {

  val PosRange = 1000000L

  /** Per-document span-dedup manifest: (doc_id, n_tokens, n_removed,
    * deduped_text). Tokens are the lowercased whitespace tokenization
    * (same formula as the chunk/fingerprint family); documents shorter
    * than `spanLen` tokens pass through untouched. */
  def dedupSpans(docs: DataFrame, idCol: String, textCol: String,
                 spanLen: Int): DataFrame = {
    require(spanLen >= 2, s"spanLen must be >= 2; got $spanLen")
    val L = spanLen
    val tok = docs.select(col(idCol).cast("long").as("doc_id"),
      TextStats.words(lower(col(textCol))).as("ws"))

    // All stride-1 windows of length L: (doc_id, p [0-based], key).
    val win = tok
      .filter(size(col("ws")) >= L && size(col("ws")) <= lit(PosRange))
      .select(col("doc_id"), col("ws"),
        explode(sequence(lit(0), size(col("ws")) - L)).as("p"))
      .select(col("doc_id"), col("p"),
        array_join(slice(col("ws"), col("p") + 1, lit(L)), " ").as("key"))

    // Duplicated windows with their canonical (min-encoded) occurrence.
    val occ = win
      .groupBy(col("key"))
      .agg(count(lit(1)).as("n"),
        min(col("doc_id") * PosRange + col("p")).as("canon"))
      .filter(col("n") >= 2)

    // Every NON-canonical occurrence of a duplicated window.
    val marked = win.join(occ, "key")
      .filter(col("doc_id") * PosRange + col("p") =!= col("canon"))
      .groupBy(col("doc_id"))
      .agg(sort_array(collect_set(col("p"))).as("starts"))

    // Rewrite: token t (1-based) is cut iff some marked start s covers it
    // (s+1 <= t <= s+L). Overlapping spans union through the mask — no
    // explicit interval merge needed. Per-doc cost is O(tokens × marked
    // starts): tight when marked spans are the minority (the operating
    // point of this filter — a document that is MOSTLY duplicated spans
    // should have been removed by the upstream document-level dedup the
    // curation pipeline runs first, not rewritten token by token).
    tok.join(marked, Seq("doc_id"), "left")
      .withColumn("_starts",
        coalesce(col("starts"), array().cast("array<long>")))
      .withColumn("_kept", filter(sequence(lit(1), size(col("ws"))),
        t => !exists(col("_starts"), s => s + 1 <= t && t <= s + L)))
      .select(col("doc_id"),
        size(col("ws")).cast("long").as("n_tokens"),
        (size(col("ws")) - size(col("_kept"))).cast("long").as("n_removed"),
        array_join(transform(col("_kept"),
          t => element_at(col("ws"), t)), " ").as("deduped_text"))
  }
}
