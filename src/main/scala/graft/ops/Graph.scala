package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Graph operators over edge-list DataFrames — the second graph primitive
  * next to [[Dedup.nearDupClusters]]'s connected components. Used to rank
  * documents inside a near-dup cluster (centrality ≈ "most representative
  * version") and generally whenever a pipeline derives a graph (link
  * structure, citation edges, co-occurrence).
  *
  * All arithmetic is FIXED-POINT INTEGER: distributed float summation is
  * order-dependent (partial sums combine in partition-completion order), so
  * a float PageRank differs run-to-run in the last bits and can never
  * hash-match another engine. Scaling ranks by 1e6 and keeping every
  * operation in BIGINT (integer `div` for the per-neighbor share, ×85 `div`
  * 100 for damping) makes the result bit-identical on any engine and any
  * partitioning — the same trick [[Pack]] uses for deterministic sampling.
  */
object Graph {

  /** Scale factor: ranks are BIGINTs in units of 1e-6. */
  val RankScale = 1000000L

  /** Fixed-iteration damped PageRank over an UNDIRECTED edge list
    * (`srcCol`, `dstCol`; each undirected edge listed once). Returns
    * (node, pagerank) with pagerank in [[RankScale]] fixed-point units.
    *
    * Per iteration: rank(u) = 0.15 + 0.85 · Σ_{v∈N(u)} rank(v) div deg(v),
    * all in scaled integers. A fixed `iterations` count (not a convergence
    * probe) keeps the whole computation ONE lazy plan — no driver actions,
    * no persisted loop state; at 3–5 iterations the plan is shallow enough
    * that lineage truncation isn't needed. Each iteration is one shuffle
    * (the groupBy on the edge destination); the static edge+degree frame is
    * persisted so it materializes once, not once per iteration branch.
    *
    * Isolated nodes never appear in an edge list, so by default the result
    * covers only nodes with at least one edge. Callers that need the full
    * node universe pass it as `allNodes` (one column, any name): nodes
    * without edges are attached AFTER the iterations with one left join at
    * rank 0.15 — their exact fixed point (no in-links) — the same
    * post-convergence singleton pattern as [[Dedup.nearDupClusters]],
    * keeping the whole universe out of the per-iteration shuffles.
    */
  def pageRank(edges: DataFrame, srcCol: String, dstCol: String,
               iterations: Int, allNodes: Option[DataFrame] = None): DataFrame = {
    require(iterations >= 1 && iterations <= 10,
      s"iterations must be in [1,10] (fixed-point plans unroll per iteration); got $iterations")
    // The caller's edge plan can be arbitrarily expensive (q86 feeds the
    // whole shingle self-join in here), and it appears FOUR times in the
    // adjacency plan below (twice in the union, twice more through deg) —
    // exchange reuse usually dedupes identical subtrees but is not
    // guaranteed across differing projections. localCheckpoint runs the
    // plan exactly once and every downstream branch reads the stored
    // blocks; same edge-set-first pattern as [[Dedup.nearDupClusters]].
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .localCheckpoint()
    // Both directions + per-source degree, computed once. deg joins on the
    // SAME key the per-iteration groupBy shuffles on, so iterations reuse
    // the partitioning.
    val both = e.union(e.select(col("dst").as("src"), col("src").as("dst")))
    val deg = both.groupBy(col("src")).agg(count(lit(1)).as("deg"))
    val adj = both.join(deg, Seq("src"))
      .persist(StorageLevel.MEMORY_AND_DISK)

    val base = lit(15L * RankScale / 100) // 0.15 scaled
    var ranks = deg.select(col("src").as("node"), lit(RankScale).as("rank"))
    for (_ <- 1 to iterations) {
      ranks = adj
        .join(ranks.withColumnRenamed("node", "src"), Seq("src"))
        // `div` is exact BIGINT division (Spark's `/` on longs goes through
        // DOUBLE, whose rounding another engine need not reproduce); all
        // values are positive, so truncation == floor == DuckDB's `//`.
        .select(col("dst"), expr("rank div deg").as("share"))
        .groupBy(col("dst").as("node"))
        .agg(sum(col("share")).as("inflow"))
        .select(col("node"), (base + expr("(inflow * 85) div 100")).as("rank"))
    }
    val connected = ranks.select(col("node"), col("rank").as("pagerank"))
    allNodes match {
      case None => connected
      case Some(universe) =>
        val nodeCol = universe.columns.head
        universe.select(col(nodeCol).as("node")).distinct()
          .join(connected, Seq("node"), "left")
          .select(col("node"),
            coalesce(col("pagerank"), lit(15L * RankScale / 100)).as("pagerank"))
    }
  }
}
