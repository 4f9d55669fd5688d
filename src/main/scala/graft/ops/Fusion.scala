package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Reciprocal-Rank Fusion (Cormack, Clarke & Buettcher 2009, public) —
  * the standard way a retrieval stack combines rankers that score on
  * incomparable scales (lexical BM25 vs embedding cosine): each
  * ranking contributes 1/(k + rank) per document and documents are
  * re-ranked by the sum, so only RANKS matter and no score calibration
  * is ever needed. This is the hybrid-retrieval shape every
  * decontamination/dedup probe over a modern corpus runs (a purely
  * lexical probe misses paraphrases; a purely semantic one misses rare
  * exact strings).
  *
  * ALL-INTEGER scoring (the [[Bm25]]/[[LmScore]] portability contract):
  * 1/(k + r) is represented exactly as D div (k + r) where D =
  * lcm(k+1 .. k+maxRank) — divisible by every reachable denominator,
  * so the division is EXACT integer arithmetic and the fused score is
  * a BIGINT any engine reproduces bit-for-bit (floating 1/61 + 1/62
  * would be libm/order hostage). D and the worst-case sum are bounds-
  * checked at plan time.
  *
  * Scale shape: inputs are per-query TOP-K lists (tiny by contract —
  * k · #queries rows), so fusion is one union + one map-side-combined
  * aggregation + the skew-proof [[TopN.saltedTopNPerKey]]; the
  * expensive work (index probe, ANN search) stays in the upstream
  * rankers where it is already scale-proofed.
  */
object Fusion {

  private def lcm(a: BigInt, b: BigInt): BigInt = a / a.gcd(b) * b

  /** Fuse per-query rankings. Each entry is (name, frame) with columns
    * (query_id, doc_id, rank); rows past `maxRank` are ignored (the
    * fusion contract is top-`maxRank` lists). Output: (query_id, rank,
    * doc_id, rrf_score, <name>_rank...) — the per-source rank columns
    * are NULL when that ranker did not surface the document. Ties
    * break by doc_id ascending (total order). */
  def rrf(rankings: Seq[(String, DataFrame)], kRrf: Int = 60,
          maxRank: Int = 10, topN: Int = 10): DataFrame = {
    require(rankings.nonEmpty, "rrf needs at least one ranking")
    require(kRrf >= 1 && maxRank >= 1 && topN >= 1,
      s"kRrf/maxRank/topN must be >= 1; got $kRrf/$maxRank/$topN")
    require(rankings.map(_._1).distinct.size == rankings.size,
      "ranking names must be distinct")
    val d = (kRrf + 1 to kRrf + maxRank)
      .map(BigInt(_)).foldLeft(BigInt(1))(lcm)
    // Two bounds, both required (ADVICE r15): D itself must fit a Long
    // (lcm(61..74) ≈ 2.74e19 > Long.MaxValue would silently truncate in
    // d.toLong below even though the worst-case-sum bound passes), and
    // the worst case — every ranker contributing its best rank — must
    // stay far inside BIGINT.
    require(d <= BigInt(Long.MaxValue) &&
        d / (kRrf + 1) * rankings.size <= BigInt(Long.MaxValue) / 4,
      s"rrf denominator lcm $d overflows BIGINT score arithmetic — " +
        "lower maxRank or kRrf")
    val D = d.toLong
    val tagged = rankings.map { case (nm, df) =>
      df.select(col("query_id"), col("doc_id"),
        col("rank").cast("int").as("rank"), lit(nm).as("_src"))
    }.reduce(_.unionByName(_))
    val perSource = rankings.map { case (nm, _) =>
      min(when(col("_src") === nm, col("rank"))).as(s"${nm}_rank")
    }
    val scored = tagged
      .filter(col("rank") <= maxRank)
      .groupBy(col("query_id"), col("doc_id"))
      .agg(sum(expr(s"${D}L div ($kRrf + rank)")).as("rrf_score"),
        perSource: _*)
    // Plain per-query window, NOT the salted two-phase top-N (r16 floor
    // trim): the salt exists for hot keys whose candidate list is
    // data-sized, but a fused group is bounded by CONSTRUCTION at
    // `rankings.size * maxRank` rows (inputs are top-maxRank lists), so
    // no key can ever be hot at any corpus scale — the second exchange
    // + window pair the salt costs is pure stage latency here. Still
    // parallel across queries (partitionBy), and WindowGroupLimit
    // prunes each group to topN before the sort.
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id"))
      .orderBy(col("rrf_score").desc, col("doc_id").asc)
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= topN)
      .select(col("query_id") +: col("rank") +: col("doc_id") +:
        col("rrf_score") +: rankings.map(r => col(s"${r._1}_rank")): _*)
  }
}
