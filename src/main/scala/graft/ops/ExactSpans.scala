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
  * linear, never quadratic); the rewrite is a per-document interval
  * merge + gap sweep, O(tokens + spans) per document ([[keptIdx]]).
  *
  * The canonical occurrence is the globally smallest (doc_id, position),
  * encoded as doc_id·PosRange + position for the min aggregate — exactly
  * lexicographic because positions stay in [0, PosRange). Documents
  * longer than PosRange (10^6) tokens are OUTSIDE the dedup domain:
  * they contribute no windows and pass through unrewritten (an explicit
  * bound, not a silent truncation — a corpus with multi-million-token
  * documents should use [[dedupSpansChunked]], which removes the bound
  * entirely via overlapping chunks with exactly-once window ownership,
  * or raise PosRange together with the oracle's encoding constant).
  * All strings and integers — the oracle replays every stage exactly,
  * including the rewritten text.
  *
  * KEEP-ONE-CANONICAL in [[dedupSpans]] is per WINDOW, not absolute per
  * span content: when a DIFFERENT duplicated window's non-canonical
  * occurrence overlaps a canonical occurrence, the canonical's tokens
  * can still be partially cut — under heavy overlapping duplication a
  * span's content can vanish from every document. [[dedupSpansAll]]
  * removes both limitations: its single detection length is an exact
  * all-lengths THRESHOLD (coverage theorem in its doc), and its
  * coverage-level canonical protection guarantees every duplicated
  * span's content survives somewhere. The per-window semantics here are
  * kept as the simpler primitive; each flavor's oracle replays its own
  * semantics, so both engines agree either way.
  */
object ExactSpans {

  val PosRange = 1000000L

  /** Kept 1-based token indices after cutting every length-`L` span
    * whose 0-based start is in `starts` (sorted ascending, distinct)
    * from a document of `nTokens` tokens — O(tokens + spans) per
    * document: the covered ranges [s+1, s+L] are merged into disjoint
    * intervals declaratively (all spans share length L, so a start
    * opens a new interval iff its gap to the previous start exceeds L,
    * and an interval's end is the last start of its run + L — no
    * running-max fold needed), then the kept indices are the flattened
    * gap ranges between consecutive intervals. The previous
    * formulation — `filter(sequence(1,n), t => !exists(starts, …))` —
    * was O(tokens × starts) per document: correct, but a pathological
    * boilerplate-heavy document with thousands of marked spans made one
    * row quadratic. */
  private[ops] def keptIdx(starts: Column, nTokens: Column, L: Int): Column = {
    val n = nTokens.cast("long")
    val (los, his) = coveredBounds(starts, L)
    // kept = the gaps: [1, lo1-1], [hi1+1, lo2-1], …, [hiK+1, nTokens]
    val gapLo = concat(array(lit(1L)), transform(his, h => h + 1))
    val gapHi = concat(transform(los, l => l - 1), array(n))
    when(size(starts) === 0, sequence(lit(1L), n))
      .otherwise(flatten(zip_with(gapLo, gapHi,
        (a, b) => when(a <= b, sequence(a, b))
          .otherwise(array().cast("array<bigint>")))))
  }

  /** Merged covered-interval bounds for length-`L` spans at the sorted
    * distinct 0-based `starts`: (los, his), the k-th lo pairing with the
    * k-th hi, both 1-based inclusive token indices. Shared by the kept-
    * gap sweep ([[keptIdx]]) and the cover flattening ([[coverIdx]]). */
  private[ops] def coveredBounds(starts: Column, L: Int): (Column, Column) = {
    // starts shifted right/left, with sentinels that always break a run:
    // prev sentinel -(L+1) makes s0-prev > L; next sentinel MaxValue-L
    // makes next-sLast > L without overflow (s >= 0).
    val sPrev = concat(array(lit(-(L + 1).toLong)),
      slice(starts, lit(1), size(starts) - 1))
    val sNext = concat(slice(starts, lit(2), size(starts) - 1),
      array(lit(Long.MaxValue - L)))
    // interval bounds: lo = s+1 where the gap to the previous start
    // exceeds L (run opener), hi = s+L where the gap to the next start
    // exceeds L (run closer); the k-th lo pairs with the k-th hi
    // because runs are contiguous in the sorted start list
    val los = filter(zip_with(starts, sPrev, (s, p) => when(s - p > L, s + 1)),
      x => x.isNotNull)
    val his = filter(zip_with(starts, sNext, (s, nx) => when(nx - s > L, s + L)),
      x => x.isNotNull)
    (los, his)
  }

  /** The sorted 1-based token indices COVERED by length-`L` spans at the
    * sorted distinct 0-based `starts` — [[keptIdx]]'s complement, same
    * O(tokens + spans) interval merge. */
  private[ops] def coverIdx(starts: Column, L: Int): Column = {
    val (los, his) = coveredBounds(starts, L)
    when(size(starts) === 0, array().cast("array<bigint>"))
      .otherwise(flatten(zip_with(los, his, (a, b) => sequence(a, b))))
  }

  /** Per-document span-dedup manifest: (doc_id, n_tokens, n_removed,
    * deduped_text). Tokens are the lowercased whitespace tokenization
    * (same formula as the chunk/fingerprint family); documents shorter
    * than `spanLen` tokens pass through untouched. */
  def dedupSpans(docs: DataFrame, idCol: String, textCol: String,
                 spanLen: Int): DataFrame =
    dedupSpans(docs, idCol, textCol, spanLen, PosRange)

  /** [[dedupSpans]] with an explicit position-encoding bound — raise it
    * together with the oracle's constant for corpora with longer
    * documents; the spec drives a small bound to pin the
    * outside-the-domain pass-through without building million-token
    * strings. */
  def dedupSpans(docs: DataFrame, idCol: String, textCol: String,
                 spanLen: Int, posRange: Long): DataFrame = {
    require(spanLen >= 2, s"spanLen must be >= 2; got $spanLen")
    require(posRange >= spanLen,
      s"posRange must be >= spanLen ($spanLen) — a smaller bound would " +
        s"silently exclude every document from the dedup domain; got $posRange")
    // The rewrite indexes tokens via element_at(ws, idx.cast(int)): a
    // posRange past Int.MaxValue would admit documents whose 1-based
    // token indices overflow that cast (runtime error or corrupt
    // deduped_text). Documents longer than ~2^31 tokens need upstream
    // chunking, not a larger posRange.
    require(posRange <= Int.MaxValue,
      s"posRange must be <= Int.MaxValue (token indices are materialized " +
        s"as ints in the rewrite); got $posRange — chunk longer documents " +
        "upstream instead")
    val tok = docs.select(col(idCol).cast("long").as("doc_id"),
      TextStats.words(lower(col(textCol))).as("ws"))
    rewrite(tok, markedStarts(tok, spanLen, posRange), spanLen)
  }

  /** ALL-LENGTHS exact-substring dedup — the suffix-array semantics of
    * Lee et al. 2022 without the suffix array, in two linear passes.
    *
    * COVERAGE THEOREM (what makes the fixed-window pass exact): a token
    * position lies inside some occurrence of a duplicated substring of
    * length >= L  ⇔  it is covered by a duplicated length-L window.
    * (⇐: a duplicated L-window IS a duplicated substring of length >= L.
    * ⇒: an occurrence of a duplicated substring of length m >= L has an
    * L-window starting at every offset 0..m−L, each duplicated because
    * the matching occurrence contains the same L tokens at the same
    * offset, and together they cover all m positions.) So the UNION of
    * duplicated-L-window occurrences equals the suffix-array removal set
    * for every duplicated substring of length >= L — including lengths
    * 5, 17, 1000: the single detection length is a THRESHOLD, not a
    * sampled span size the way [[dedupSpansMulti]]'s fixed list is.
    *
    * KEEP-ONE is promoted from per-window to COVERAGE level: a covered
    * token is kept iff some occurrence covering it is CANONICAL (the
    * globally smallest (doc_id, position) of its window key). This fixes
    * the documented [[dedupSpans]] flaw where overlapping foreign marks
    * could shred a canonical occurrence until a span's content vanished
    * from every document: here canonical occurrences are immune to cuts,
    * so every duplicated window's content survives verbatim somewhere,
    * while every fully-non-canonical occurrence region is cut whole.
    *
    * Scale shape identical to [[dedupSpans]]: window explode (one row
    * per token), ONE map-side-combined groupBy on the window key with a
    * min-encoded canonical (no per-key windows — the [[TopN]] skew
    * lesson), one equi-join back, one per-doc aggregation collecting the
    * marked AND canonical start lists together (conditional collect_set,
    * single shuffle), then the O(tokens + spans) interval sweep: kept =
    * gaps(marked) ∪ cover(canonical). Output the family manifest:
    * (doc_id, n_tokens, n_removed, deduped_text). */
  def dedupSpansAll(docs: DataFrame, idCol: String, textCol: String,
                    minLen: Int): DataFrame =
    dedupSpansAll(docs, idCol, textCol, minLen, PosRange)

  /** [[dedupSpansAll]] with an explicit position-encoding bound — same
    * contract as the [[dedupSpans]] overload. */
  def dedupSpansAll(docs: DataFrame, idCol: String, textCol: String,
                    minLen: Int, posRange: Long): DataFrame = {
    require(minLen >= 2, s"minLen must be >= 2; got $minLen")
    require(posRange >= minLen,
      s"posRange must be >= minLen ($minLen); got $posRange")
    require(posRange <= Int.MaxValue,
      s"posRange must be <= Int.MaxValue; got $posRange — chunk longer " +
        "documents upstream instead")
    val L = minLen
    val tok = docs.select(col(idCol).cast("long").as("doc_id"),
      TextStats.words(lower(col(textCol))).as("ws"))
    val win = tok
      .filter(size(col("ws")) >= L && size(col("ws")) <= lit(posRange))
      .select(col("doc_id"), col("ws"),
        explode(sequence(lit(0), size(col("ws")) - L)).as("p"))
      .select(col("doc_id"), col("p"),
        array_join(slice(col("ws"), col("p") + 1, lit(L)), " ").as("key"))
    val occ = win
      .groupBy(col("key"))
      .agg(count(lit(1)).as("n"),
        min(col("doc_id") * posRange + col("p")).as("canon"))
      .filter(col("n") >= 2)
    // ONE per-doc pass collects both start lists (collect_set skips the
    // nulls the when() leaves on the other branch's rows).
    val enc = col("doc_id") * posRange + col("p")
    val starts = win.join(occ, "key")
      .groupBy(col("doc_id"))
      .agg(
        sort_array(collect_set(when(enc =!= col("canon"), col("p").cast("long"))))
          .as("_ms"),
        sort_array(collect_set(when(enc === col("canon"), col("p").cast("long"))))
          .as("_cs"))
    val kept = sort_array(array_union(
      keptIdx(col("_ms"), size(col("ws")), L), coverIdx(col("_cs"), L)))
    tok.join(starts, Seq("doc_id"), "left")
      .withColumn("_ms", coalesce(col("_ms"), array().cast("array<long>")))
      .withColumn("_cs", coalesce(col("_cs"), array().cast("array<long>")))
      .withColumn("_kept", kept)
      .select(col("doc_id"),
        size(col("ws")).cast("long").as("n_tokens"),
        (size(col("ws")) - size(col("_kept"))).cast("long").as("n_removed"),
        array_join(transform(col("_kept"),
          t => element_at(col("ws"), t.cast("int"))), " ").as("deduped_text"))
  }

  /** MAXIMAL duplicated-span INVENTORY — the reporting view a suffix
    * array gives ("every maximal duplicated substring of length >= L,
    * with its location"), over the same linear window pass as
    * [[dedupSpansAll]]: per document, maximal RUNS of consecutive
    * (step-1) duplicated L-window starts are merged by a gaps-and-
    * islands sweep; a run [a..b] reports the span (start a, length
    * b−a+L). ALL occurrences are inventoried (canonical included —
    * this is analytics, not removal).
    *
    * SEMANTICS: this is the CHEAP TIER — an upper envelope, one linear
    * window pass. A run certifies every L-window inside it is
    * duplicated SOMEWHERE, not that the whole run's text occurs twice
    * as one contiguous string — two different partners can each match
    * half of a run (chaining). Every true maximal duplicated substring
    * of length >= L is contained in exactly one reported run, so the
    * inventory never misses or splits one; it can only weld two
    * abutting ones. For EXACT reporting use [[Suffix.maximalSpansExact]]
    * (distributed prefix-doubling suffix ranks + neighbor LCP — what
    * q146 serves since round 13; O(log maxDocLen) rounds instead of
    * one pass). The removal-set queries ([[dedupSpansAll]]) are
    * unaffected — coverage is exact there.
    *
    * Output: (doc_id, span_start [0-based token], span_len [tokens],
    * span_text) — one row per maximal run; span-free documents emit
    * nothing. */
  def maximalSpans(docs: DataFrame, idCol: String, textCol: String,
                   minLen: Int): DataFrame = {
    require(minLen >= 2, s"minLen must be >= 2; got $minLen")
    val L = minLen
    val tok = docs.select(col(idCol).cast("long").as("doc_id"),
      TextStats.words(lower(col(textCol))).as("ws"))
    // Persisted: the exploded window table feeds the duplicate-key
    // aggregation AND the join back — unpersisted, the explode (with
    // its per-window key-string build, the pass's dominant cost) runs
    // twice. Caching contract as the rest of the family: release with
    // `spark.catalog.clearCache()`. At production scale this frame is
    // the corpusShingles-style materialized artifact instead.
    val win = tok
      .filter(size(col("ws")) >= L && size(col("ws")) <= lit(PosRange))
      .select(col("doc_id"), col("ws"),
        explode(sequence(lit(0), size(col("ws")) - L)).as("p"))
      .select(col("doc_id"), col("p"),
        array_join(slice(col("ws"), col("p") + 1, lit(L)), " ").as("key"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val dupKeys = win.groupBy(col("key"))
      .agg(count(lit(1)).as("n")).filter(col("n") >= 2).select(col("key"))
    val starts = win.join(dupKeys, "key")
      .groupBy(col("doc_id"))
      .agg(sort_array(collect_set(col("p").cast("long"))).as("_ss"))
    // gaps-and-islands on the sorted start list: a start opens a run
    // iff its gap to the previous start exceeds 1, closes one iff the
    // next start is more than 1 away — the coveredBounds sweep at
    // run-distance 1 instead of L
    val ss = col("_ss")
    val sPrev = concat(array(lit(-2L)), slice(ss, lit(1), size(ss) - 1))
    val sNext = concat(slice(ss, lit(2), size(ss) - 1),
      array(lit(Long.MaxValue - 1)))
    val los = filter(zip_with(ss, sPrev, (s, p) => when(s - p > 1, s)),
      x => x.isNotNull)
    val his = filter(zip_with(ss, sNext, (s, nx) => when(nx - s > 1, s)),
      x => x.isNotNull)
    starts.join(tok, Seq("doc_id"))
      .select(col("doc_id"), col("ws"),
        explode(zip_with(los, his,
          (a, b) => struct(a.as("s"), (b - a + L).as("l")))).as("sp"))
      .select(col("doc_id"),
        col("sp.s").as("span_start"),
        col("sp.l").as("span_len"),
        array_join(transform(
          sequence(col("sp.s") + 1, col("sp.s") + col("sp.l")),
          t => element_at(col("ws"), t.cast("int"))), " ").as("span_text"))
  }

  /** MULTI-length span dedup — toward the paper's all-lengths exactness
    * without the suffix array: run the length-L detection at each of
    * `spanLens` independently (each length picks its own canonical
    * occurrences) and UNION the cut masks, so a token survives only if
    * NO length marks it. Catches both the short boilerplate a long
    * window straddles and the long near-template runs a short window
    * under-reports. Cost is the linear single-length pass times
    * |spanLens| (each length is its own window explode + one
    * map-side-combined groupBy); the per-doc mask union is an ordered
    * array intersection of the per-length kept sets — still
    * O(lengths · (tokens + spans)). */
  def dedupSpansMulti(docs: DataFrame, idCol: String, textCol: String,
                      spanLens: Seq[Int]): DataFrame = {
    require(spanLens.nonEmpty && spanLens.forall(_ >= 2),
      s"spanLens must be non-empty, each >= 2; got $spanLens")
    require(spanLens.distinct.size == spanLens.size,
      s"spanLens must be distinct; got $spanLens")
    val tok = docs.select(col(idCol).cast("long").as("doc_id"),
      TextStats.words(lower(col(textCol))).as("ws"))
    val joined = spanLens.zipWithIndex.foldLeft(tok) { case (df, (l, i)) =>
      df.join(markedStarts(tok, l).withColumnRenamed("starts", s"_st$i"),
        Seq("doc_id"), "left")
    }
    val kept = spanLens.zipWithIndex.map { case (l, i) =>
      keptIdx(coalesce(col(s"_st$i"), array().cast("array<long>")),
        size(col("ws")), l)
    }.reduce(array_intersect(_, _)) // sorted ∩ sorted keeps left order
    joined.select(col("doc_id"),
      size(col("ws")).cast("long").as("n_tokens"),
      (size(col("ws")) - size(kept)).cast("long").as("n_removed"),
      array_join(transform(kept,
        t => element_at(col("ws"), t.cast("int"))), " ").as("deduped_text"))
  }

  /** Detection at one length: (doc_id, starts) — the sorted distinct
    * 0-based starts of every NON-canonical occurrence of a duplicated
    * length-L window. */
  /** [[dedupSpans]] WITHOUT the document-length domain bound — the
    * chunk + boundary-overlap + reassemble formulation (VERDICT r12
    * ask #8): documents of ANY token count are processed, because no
    * per-document row ever carries more than `chunkLen` tokens past
    * the initial tokenize+explode map and no position is ever encoded
    * into a bounded integer.
    *
    * Construction (exactly-once window ownership):
    *   - chunks start every `step = chunkLen − spanLen + 1` tokens and
    *     carry `chunkLen` tokens, so consecutive chunks OVERLAP by
    *     spanLen − 1 — every global L-window [g, g+L) lies whole inside
    *     the chunk starting at floor(g/step)·step (g mod step ≤
    *     chunkLen − L by construction), and emitting from each chunk
    *     only the windows whose local offset is < step yields every
    *     global window EXACTLY ONCE with its global position;
    *   - the canonical occurrence is min(struct(doc_id, g)) — the same
    *     lexicographic (doc_id, position) order as [[dedupSpans]]'
    *     min-encoding, with no posRange constant to outgrow;
    *   - each chunk OWNS global token positions [cs+1, cs+step]
    *     (clipped to the document) — disjoint, exhaustive — and a
    *     marked span's cut is routed to EVERY chunk whose owned range
    *     it touches, i.e. owner indices g div step through
    *     (g+L−1) div step inclusive. When chunkLen ≥ 2·spanLen − 1
    *     that is at most 2 owners, but small chunkLen (step < L)
    *     legitimately puts a span across ≥3 owners — routing only to
    *     the first and last would silently keep the middle owners'
    *     tokens, so the full owner sequence is exploded (still O(1)
    *     amortized per marked token); the per-chunk rewrite is
    *     [[coveredBounds]]' interval sweep clipped to the owned
    *     range, O(chunk tokens + chunk spans);
    *   - reassembly concatenates each document's per-chunk kept token
    *     lists in chunk order — one per-doc aggregation whose rows are
    *     chunk-sized, never document-sized.
    *
    * Output and semantics are [[dedupSpans]]' EXACTLY for in-domain
    * corpora (ExactSpansSpec asserts frame equality with chunk
    * boundaries forced through spans; q149's oracle is q132's replay
    * verbatim, so the driver's hash match proves chunked ≡ direct each
    * round). The one divergence is the point of the operator: documents
    * longer than [[dedupSpans]]' posRange are deduplicated here instead
    * of passing through unrewritten. */
  def dedupSpansChunked(docs: DataFrame, idCol: String, textCol: String,
                        spanLen: Int, chunkLen: Int): DataFrame = {
    require(spanLen >= 2, s"spanLen must be >= 2; got $spanLen")
    require(chunkLen >= spanLen,
      s"chunkLen ($chunkLen) must be >= spanLen ($spanLen)")
    require(chunkLen <= Int.MaxValue / 2, s"chunkLen too large: $chunkLen")
    val L = spanLen
    val step = chunkLen - L + 1
    val tok = docs.select(col(idCol).cast("long").as("doc_id"),
      TextStats.words(lower(col(textCol))).as("ws"))
    // Persisted: the chunk table feeds window extraction AND the final
    // reassembly join (scope-released in servedArtifact builds).
    val chunks = graft.CacheScope.scopedPersist(tok
      .select(col("doc_id"), size(col("ws")).cast("long").as("n"),
        explode(sequence(lit(0L), size(col("ws")).cast("long") - 1,
          lit(step.toLong))).as("cs"), col("ws"))
      .select(col("doc_id"), col("n"), col("cs"),
        slice(col("ws"), col("cs").cast("int") + 1, lit(chunkLen)).as("cws")),
      org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val wins = chunks
      .filter(size(col("cws")) >= L)
      .select(col("doc_id"), col("cs"), col("cws"),
        explode(sequence(lit(0),
          least(lit(step - 1), size(col("cws")) - L))).as("p"))
      .select(col("doc_id"), (col("cs") + col("p")).as("g"),
        array_join(slice(col("cws"), col("p") + 1, lit(L)), " ").as("key"))
    val occ = wins.groupBy(col("key"))
      .agg(count(lit(1)).as("_cnt"),
        min(struct(col("doc_id").as("d"), col("g").as("g"))).as("canon"))
      .filter(col("_cnt") >= 2)
    val marked = wins.join(occ, "key")
      .filter(!(col("doc_id") === col("canon.d") && col("g") === col("canon.g")))
      .select(col("doc_id"), col("g"))
    // Route each cut to EVERY chunk whose OWNED token range
    // [c*step+1, c*step+step] it covers: owner indices g div step
    // through (g+L-1) div step inclusive (exact BIGINT division —
    // floor(g/step) would round-trip through DOUBLE). With step < L a
    // span covers >= 3 owners; first+last-only routing would leave the
    // middle owners' tokens uncut.
    val spanChunks = marked
      .select(col("doc_id"), col("g"),
        explode(sequence(expr(s"g div ${step}L"),
          expr(s"(g + ${L - 1}L) div ${step}L"))).as("ci"))
      .select(col("doc_id"), (col("ci") * step).as("cs"), col("g"))
      .groupBy(col("doc_id"), col("cs"))
      .agg(sort_array(collect_set(col("g"))).as("starts"))
    val ownLo = col("cs") + 1
    val ownHi = least(col("cs") + step, col("n"))
    val (los, his) = coveredBounds(col("starts"), L)
    val clipped = filter(
      zip_with(los, his, (a, b) => struct(a.as("lo"), b.as("hi"))),
      pr => pr.getField("lo") <= ownHi && pr.getField("hi") >= ownLo)
    val gapLo = concat(array(ownLo.cast("long")),
      transform(clipped, pr => least(pr.getField("hi"), ownHi) + 1))
    val gapHi = concat(
      transform(clipped, pr => greatest(pr.getField("lo"), ownLo) - 1),
      array(ownHi.cast("long")))
    val keptG = when(coalesce(size(col("starts")), lit(0)) === 0,
        sequence(ownLo.cast("long"), ownHi.cast("long")))
      .otherwise(flatten(zip_with(gapLo, gapHi,
        (a, b) => when(a <= b, sequence(a, b))
          .otherwise(array().cast("array<bigint>")))))
    val chunkKept = chunks.join(spanChunks, Seq("doc_id", "cs"), "left")
      .withColumn("_kt", transform(keptG,
        t => element_at(col("cws"), (t - col("cs")).cast("int"))))
      .select(col("doc_id"), col("n"), col("cs"), col("_kt"))
    chunkKept.groupBy(col("doc_id"))
      .agg(max(col("n")).as("n_tokens"),
        (max(col("n")) - sum(size(col("_kt")))).as("n_removed"),
        array_join(flatten(transform(
          sort_array(collect_list(struct(col("cs"), col("_kt").as("kt")))),
          s => s.getField("kt"))), " ").as("deduped_text"))
      .select(col("doc_id"), col("n_tokens"), col("n_removed"),
        col("deduped_text"))
  }

  private def markedStarts(tok: DataFrame, L: Int,
                           posRange: Long = PosRange): DataFrame = {
    // All stride-1 windows of length L: (doc_id, p [0-based], key).
    val win = tok
      .filter(size(col("ws")) >= L && size(col("ws")) <= lit(posRange))
      .select(col("doc_id"), col("ws"),
        explode(sequence(lit(0), size(col("ws")) - L)).as("p"))
      .select(col("doc_id"), col("p"),
        array_join(slice(col("ws"), col("p") + 1, lit(L)), " ").as("key"))

    // Duplicated windows with their canonical (min-encoded) occurrence.
    val occ = win
      .groupBy(col("key"))
      .agg(count(lit(1)).as("n"),
        min(col("doc_id") * posRange + col("p")).as("canon"))
      .filter(col("n") >= 2)

    // Every NON-canonical occurrence of a duplicated window.
    win.join(occ, "key")
      .filter(col("doc_id") * posRange + col("p") =!= col("canon"))
      .groupBy(col("doc_id"))
      .agg(sort_array(collect_set(col("p").cast("long"))).as("starts"))
  }

  /** The shared cut-marked-spans rewrite: `tok` = (doc_id, ws), `marked`
    * = (doc_id, starts [sorted distinct 0-based span starts]); emits
    * (doc_id, n_tokens, n_removed, deduped_text) for EVERY document
    * (unmarked docs pass through whole). One left equi-join + a per-doc
    * O(tokens + spans) interval sweep — also the removal half of
    * eval-set decontamination ([[Decontaminate]]). */
  private[ops] def rewrite(tok: DataFrame, marked: DataFrame,
                           L: Int): DataFrame =
    tok.join(marked, Seq("doc_id"), "left")
      .withColumn("_starts",
        coalesce(col("starts"), array().cast("array<long>")))
      .withColumn("_kept", keptIdx(col("_starts"), size(col("ws")), L))
      .select(col("doc_id"),
        size(col("ws")).cast("long").as("n_tokens"),
        (size(col("ws")) - size(col("_kept"))).cast("long").as("n_removed"),
        array_join(transform(col("_kept"),
          t => element_at(col("ws"), t.cast("int"))), " ").as("deduped_text"))
}
