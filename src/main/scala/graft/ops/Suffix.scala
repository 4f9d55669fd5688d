package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Distributed suffix-array machinery over the tokenized corpus —
  * PREFIX DOUBLING (Manber–Myers; the classic PRAM / external-memory
  * suffix-array construction, and the same structure Lee et al.'s
  * dedup infrastructure builds at corpus scale): rank every suffix by
  * its first 2^k tokens, k = 0, 1, … — each round one self-join of the
  * rank table at offset 2^k plus one scale-safe dense ranking
  * ([[SurrogateKeys.denseRankKey]] over the DISTINCT pair set) — until
  * 2^k reaches the longest document or every rank is already unique.
  * O(log maxDocLen) rounds, every stage a linear shuffle; no driver
  * data beyond per-round convergence counts (the CC economy:
  * [[Dedup.nearDupClustersFromPairs]]).
  *
  * Suffixes never cross documents: a position's rank components that
  * would fall past its document's end are padded with −1, which sorts
  * BELOW every real rank — the standard smallest-sentinel convention,
  * so the final order is exactly lexicographic suffix order with
  * end-of-document smallest. In-bounds rank equality at level k is
  * sound in both directions (equal 2^k-token blocks ⟺ equal ranks, by
  * induction over levels), which is what the LCP walk relies on.
  *
  * From the rank tables the per-position LONGEST DUPLICATED PREFIX
  * f(p) — the suffix array's reporting primitive ("how long a match
  * starting here occurs ANYWHERE else, same document included,
  * overlaps included") — follows exactly: the maximal-LCP partner of a
  * suffix is ADJACENT in suffix order (common prefixes cluster
  * contiguously in lexicographic order), so one neighbor pairing plus
  * a greedy high-to-low block walk over the stored rank levels
  * (accumulate 2^k whenever both positions' in-bounds level-k ranks
  * agree) computes every f in K more linear joins.
  *
  * This closes the round-12 envelope caveat ([[ExactSpans
  * .maximalSpans]], which welds abutting runs when two different
  * partners each cover half): [[maximalSpansExact]] reports EXACT
  * per-document maximal duplicated spans — every reported span's full
  * text genuinely occurs at least twice as one contiguous string, and
  * no true maximal span is missed, split, or welded.
  *
  * Domain bound (the span family's): documents longer than `posRange`
  * tokens are outside the position encoding and are EXCLUDED from the
  * index (same contract as [[ExactSpans]]; chunk upstream first).
  * CONTRACT: runs jobs during DataFrame BUILD (doubling rounds +
  * convergence probes + localCheckpoints, the iterative-operator shape
  * of [[Dedup.nearDupClustersFromPairs]] / [[Bpe.trainIterative]]).
  */
object Suffix {

  /** Per-position longest duplicated prefix over `docs`:
    * (doc_id, p [0-based token position], n_tokens, f) — f ≥ 1 when the
    * f-token substring starting at p occurs at least once more anywhere
    * in the corpus (other documents, or the same document at a
    * different position; overlapping occurrences count — standard
    * suffix-array semantics), 0 when even the single token at p is
    * unique. Rows for every in-domain position. */
  def longestDupPrefix(docs: DataFrame, idCol: String, textCol: String,
                       posRange: Long = ExactSpans.PosRange,
                       maxLocalPositions: Long = 2000000L): DataFrame = {
    val spark = docs.sparkSession
    val lvl = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val tok = docs.select(col(idCol).cast("long").as("doc_id"),
        TextStats.words(lower(col(textCol))).as("ws"))
      .filter(size(col("ws")) >= 1 && size(col("ws")) <= lit(posRange))
    // SMALL-CORPUS FAST PATH (the q153 union-find pattern applied to the
    // suffix build — VERDICT r13 ask #3's rebuild cell needs the rebuild
    // to not be pure scheduler latency at bench scale): when the total
    // position count fits one task, construct the suffix array and all
    // neighbor LCPs in ONE job — in-memory Manber–Myers prefix doubling
    // (rank pairs packed into one Long per suffix, sorted per round) +
    // Kasai's O(n) LCP walk, documents separated by per-doc UNIQUE
    // sentinel ids so no match ever crosses a document. f is an
    // engine-independent fact of the corpus (longest prefix at p
    // occurring anywhere else), so the two tiers agree by definition;
    // SuffixSpec differential-tests both against the all-lengths brute
    // force. Guard fails closed to the distributed doubling below
    // (maxLocalPositions = 0 forces it — spec coverage).
    val statsRow = tok.agg(coalesce(sum(size(col("ws"))), lit(0L)).as("_p"),
      count(lit(1)).as("_d")).head
    val nPosTotal = statsRow.getLong(0)
    val nDocsTotal = statsRow.getLong(1)
    if (nPosTotal == 0)
      return tok.select(col("doc_id"), lit(0L).as("p"), lit(0L).as("n"),
        lit(0L).as("f")).limit(0)
    // Second guard term: the local sort packs (rank, rank, index) into
    // one Long — 21 bits per field — so positions + per-doc separators
    // must stay under 2^21.
    if (nPosTotal <= maxLocalPositions &&
        nPosTotal + nDocsTotal < (1L << 21)) {
      import spark.implicits._
      return tok.select(col("doc_id"), col("ws")).as[(Long, Seq[String])]
        .coalesce(1)
        .mapPartitions(it => localDupPrefix(it))
        .toDF("doc_id", "p", "n", "f")
        .localCheckpoint() // one job; f feeds two readers downstream
    }
    val pos = tok.select(col("doc_id"), size(col("ws")).as("n"),
        posexplode(col("ws")).as(Seq("p", "tok")))
      .select(col("doc_id"), col("p").cast("long").as("p"),
        col("n").cast("long").as("n"), col("tok"))

    // Level-0 ranks: dense rank of the single token, via the scale-safe
    // two-phase ranking over the DISTINCT token set (never a global
    // window over the corpus).
    def rankDistinct(df: DataFrame, keyCols: Seq[String]): DataFrame =
      SurrogateKeys.denseRankKey(
        df.select(keyCols.map(col): _*).distinct(), "_rank", keyCols)
    var rank = pos
      .join(rankDistinct(pos, Seq("tok")), Seq("tok"))
      .select(col("doc_id"), col("p"), col("n"),
        col("_rank").cast("long").as("rank"))
      .localCheckpoint()
    val nPos = rank.count()
    if (nPos == 0)
      return rank.select(col("doc_id"), col("p"), col("n"),
        lit(0L).as("f"))
    val maxLen = rank.agg(max(col("n"))).head.getLong(0)

    // Doubling rounds. Every level's table is kept (the LCP walk reads
    // them all); superseded nothing — peak storage K+1 position-sized
    // rank tables, K = ceil(log2 maxDocLen).
    var levels: Vector[(Long, DataFrame)] = Vector((1L, rank))
    var w = 1L
    var converged = rank.agg(max(col("rank"))).head.getLong(0) == nPos
    while (w < maxLen && !converged) {
      val b = levels.last._2.select(col("doc_id").as("_d"),
        col("p").as("_p"), col("rank").as("_r2"))
      val paired = levels.last._2
        .join(b, col("_d") === col("doc_id") && col("_p") === col("p") + w,
          "left")
        .select(col("doc_id"), col("p"), col("n"), col("rank").as("_r1"),
          coalesce(col("_r2"), lit(-1L)).as("_r2"))
      val next = paired
        .join(rankDistinct(paired, Seq("_r1", "_r2")), Seq("_r1", "_r2"))
        .select(col("doc_id"), col("p"), col("n"),
          col("_rank").cast("long").as("rank"))
        .localCheckpoint()
      w = w * 2
      levels = levels :+ ((w, next))
      converged = next.agg(max(col("rank"))).head.getLong(0) == nPos
    }
    val last = levels.last._2

    // Suffix-order adjacency: dense sequence over (rank, doc_id, p) —
    // ties (identical full suffixes) ordered arbitrarily-but-totally by
    // position, which is irrelevant to LCP — then each suffix paired
    // with its successor.
    // Checkpointed: the frame feeds BOTH sides of the adjacency
    // self-join — materializing one copy makes the pairing
    // read-consistent by construction (and was the probe that exposed
    // the denseRankKey two-reader divergence this operator's sf0.1
    // differential caught in round 13).
    val ord = SurrogateKeys.denseRankKey(last, "_seq",
        Seq("rank", "doc_id", "p"))
      .select(col("doc_id"), col("p"), col("n"), col("_seq"))
      .localCheckpoint()
    val nb = ord.select(col("doc_id").as("da"), col("p").as("pa"),
        col("n").as("na"), col("_seq"))
      .join(ord.select(col("doc_id").as("db"), col("p").as("pb"),
        col("n").as("nb"), (col("_seq") - 1).as("_seq")), Seq("_seq"))
      .select(col("da"), col("pa"), col("na"),
        col("db"), col("pb"), col("nb"))

    // Greedy LCP walk, highest level first: acc += 2^k whenever both
    // sides have a full in-bounds 2^k block and the level-k ranks
    // agree. Each level is two equi-joins against its (checkpointed)
    // rank table; the pair frame's lineage is truncated every few
    // levels so no plan accumulates the whole walk.
    var cur = nb.withColumn("acc", lit(0L))
    var sinceCp = 0
    for (((lw, ltab), idx) <- levels.zipWithIndex.reverse) {
      val ra = ltab.select(col("doc_id").as("_ad"), col("p").as("_ap"),
        col("rank").as("_ar"))
      val rb = ltab.select(col("doc_id").as("_bd"), col("p").as("_bp"),
        col("rank").as("_br"))
      cur = cur
        .withColumn("_ja", col("pa") + col("acc"))
        .withColumn("_jb", col("pb") + col("acc"))
        .join(ra, col("_ad") === col("da") && col("_ap") === col("_ja"),
          "left")
        .join(rb, col("_bd") === col("db") && col("_bp") === col("_jb"),
          "left")
        .withColumn("acc",
          when(col("_ja") + lw <= col("na") && col("_jb") + lw <= col("nb")
              && col("_ar") === col("_br"), col("acc") + lw)
            .otherwise(col("acc")))
        .select(col("da"), col("pa"), col("na"),
          col("db"), col("pb"), col("nb"), col("acc"))
      sinceCp += 1
      if (sinceCp == 3 || idx == 0) { cur = cur.localCheckpoint(); sinceCp = 0 }
    }

    // f(p) = max LCP with either sort-neighbor (the suffix-array
    // adjacency property). The full position frame is unioned in at
    // acc 0 so EVERY in-domain position keeps its row even when the
    // adjacency join is empty — a one-position corpus has no
    // (seq, seq+1) pair at all, and without the default the operator
    // would emit nothing instead of (doc_id, 0, 1, f=0).
    cur.select(col("da").as("doc_id"), col("pa").as("p"),
        col("na").as("n"), col("acc"))
      .unionByName(cur.select(col("db").as("doc_id"), col("pb").as("p"),
        col("nb").as("n"), col("acc")))
      .unionByName(ord.select(col("doc_id"), col("p"), col("n"),
        lit(0L).as("acc")))
      .groupBy(col("doc_id"), col("p"), col("n"))
      .agg(max(col("acc")).as("f"))
  }

  /** The one-task tier of [[longestDupPrefix]]: in-memory suffix array
    * over the token-concatenated corpus (per-doc UNIQUE negative
    * separator ids, so no comparison ever matches across a document) by
    * Manber–Myers prefix doubling — each round packs (rank, next-rank,
    * index) into one Long per suffix and sorts the array — then Kasai's
    * O(n) walk for every suffix-order-neighbor LCP, and
    * f(p) = max(LCP with either sort neighbor), exactly the distributed
    * tier's reporting rule. Runs in O(n log n) per round over ≤ 2^21
    * entries (the packing budget the caller guards). */
  private def localDupPrefix(docsIt: Iterator[(Long, Seq[String])])
      : Iterator[(Long, Long, Long, Long)] = {
    val docs = docsIt.toArray
    if (docs.isEmpty) return Iterator.empty
    // Dense ids for real tokens (1..V, sorted — order-consistent with
    // the distributed tier's level-0 rank); separator after doc k gets
    // the unique id -(k+1): below every token and below every other
    // separator, so LCPs self-terminate at document ends.
    val distinctToks = docs.iterator.flatMap(_._2).toArray.distinct.sorted
    val tokenIds = new java.util.HashMap[String, Int](distinctToks.length * 2)
    var ti = 0
    while (ti < distinctToks.length) {
      tokenIds.put(distinctToks(ti), ti + 1); ti += 1
    }
    val n = docs.iterator.map(_._2.size).sum + docs.length
    require(n < (1 << 21), s"localDupPrefix packing budget exceeded: $n")
    val x = new Array[Int](n)
    val docIdOf = new Array[Long](n)
    val pOf = new Array[Int](n)
    val nOf = new Array[Int](n)
    var w = 0
    var k = 0
    while (k < docs.length) {
      val (d, ws) = docs(k)
      var j = 0
      while (j < ws.size) {
        x(w) = tokenIds.get(ws(j)); docIdOf(w) = d; pOf(w) = j
        nOf(w) = ws.size; w += 1; j += 1
      }
      x(w) = -(k + 1); pOf(w) = -1; w += 1
      k += 1
    }
    // Prefix doubling. Initial ranks: x shifted non-negative (order-
    // consistent; density is irrelevant to the sort keys' 21-bit budget
    // because |x| <= n). rank2 uses +1 so "past the end" packs as 0.
    val rank = new Array[Int](n)
    var i = 0
    while (i < n) { rank(i) = x(i) + docs.length; i += 1 }
    val keys = new Array[Long](n)
    val newRank = new Array[Int](n)
    var width = 1
    var unique = false
    // Termination: the unique separators make every suffix distinct, so
    // ranks are fully dense by width >= maxDocLen+1; the width bound is
    // a defensive backstop, never reached.
    while (!unique && width < 2 * n) {
      i = 0
      while (i < n) {
        val r2 = if (i + width < n) rank(i + width) + 1 else 0
        keys(i) = (rank(i).toLong << 42) | (r2.toLong << 21) | i.toLong
        i += 1
      }
      java.util.Arrays.sort(keys)
      var r = 0
      i = 0
      while (i < n) {
        if (i > 0 && (keys(i) >>> 21) != (keys(i - 1) >>> 21)) r += 1
        newRank((keys(i) & 0x1FFFFFL).toInt) = r
        i += 1
      }
      System.arraycopy(newRank, 0, rank, 0, n)
      unique = r == n - 1
      width *= 2
    }
    // rank is now the dense suffix-order slot; invert to the suffix array.
    val sa = new Array[Int](n)
    i = 0
    while (i < n) { sa(rank(i)) = i; i += 1 }
    // Kasai: lcp(slot) = LCP(suffix at sa(slot-1), suffix at sa(slot)).
    val lcp = new Array[Int](n)
    var h = 0
    i = 0
    while (i < n) {
      val slot = rank(i)
      if (slot > 0) {
        val j = sa(slot - 1)
        while (i + h < n && j + h < n && x(i + h) == x(j + h)) h += 1
        lcp(slot) = h
        if (h > 0) h -= 1
      } else h = 0
      i += 1
    }
    (0 until n).iterator.filter(pOf(_) >= 0).map { q =>
      val slot = rank(q)
      val f = math.max(lcp(slot), if (slot + 1 < n) lcp(slot + 1) else 0)
      (docIdOf(q), pOf(q).toLong, nOf(q).toLong, f.toLong)
    }
  }

  /** EXACT maximal duplicated-span inventory — the suffix array's
    * reporting view, replacing [[ExactSpans.maximalSpans]]'s
    * upper-envelope runs: one row per maximal duplicated span of token
    * length ≥ `minLen` per document, (doc_id, span_start [0-based],
    * span_len, span_text). A span is reported at position p iff
    * f(p) ≥ minLen (its text occurs at least twice in the corpus as a
    * contiguous string — the duplication claim is exact, not chained
    * through different partners) and it is not contained in the
    * previous position's span (f(p−1) = f(p)+1 — since f can fall by
    * at most 1 per step, immediate-predecessor containment is the only
    * containment possible). Overlapping maximal spans with DIFFERENT
    * partners are reported separately — exactly the welded case the
    * envelope merged. */
  def maximalSpansExact(docs: DataFrame, idCol: String, textCol: String,
                        minLen: Int,
                        posRange: Long = ExactSpans.PosRange,
                        maxLocalPositions: Long = 2000000L): DataFrame = {
    require(minLen >= 2, s"minLen must be >= 2; got $minLen")
    val f = longestDupPrefix(docs, idCol, textCol, posRange, maxLocalPositions)
    val prev = f.select(col("doc_id"), (col("p") + 1).as("p"),
      col("f").as("_fprev"))
    val tok = docs.select(col(idCol).cast("long").as("doc_id"),
      TextStats.words(lower(col(textCol))).as("ws"))
    f.join(prev, Seq("doc_id", "p"), "left")
      .filter(col("f") >= minLen &&
        coalesce(col("_fprev"), lit(0L)) <= col("f"))
      .join(tok, Seq("doc_id"))
      .select(col("doc_id"), col("p").as("span_start"),
        col("f").as("span_len"),
        array_join(transform(sequence(col("p") + 1, col("p") + col("f")),
          t => element_at(col("ws"), t.cast("int"))), " ").as("span_text"))
  }
}
