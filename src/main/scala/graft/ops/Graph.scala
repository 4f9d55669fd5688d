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

  /** Triangle ENUMERATION over an undirected edge list — one row
    * (node_a < node_b < node_c) per triangle, each triangle exactly once.
    *
    * Algorithm: degree-ordered orientation + wedge join (the standard
    * distributed formulation — e.g. Suri & Vassilvitskii's MapReduce
    * triangle counting). Every edge is oriented from its lower endpoint
    * to its higher endpoint in the total order (degree, node id); a
    * triangle {x,y,z} with x < y < z in that order then contains exactly
    * one wedge at its minimum vertex (x→y, x→z), and the triangle is
    * found by joining that wedge against the oriented edge y→z. The
    * orientation bounds every node's FORWARD degree by O(√m) on any
    * graph (a node of degree d > √2m has all-but-√2m of its neighbors
    * with smaller degree, so they orient INTO it), which bounds the
    * wedge count — and therefore the join input — by O(m^1.5) total,
    * independent of skew: the classic hub node that would make a naive
    * neighbor self-join quadratic contributes almost no wedges because
    * nearly all its edges point in. Three shuffles (degree, wedge
    * self-join, closing equi-join), no cartesian anywhere.
    *
    * Dedup/orientation rules are PURE ORDER LOGIC (no hashing, no
    * floats), so any engine replays the identical triangle set.
    */
  def triangles(edges: DataFrame, aCol: String, bCol: String): DataFrame = {
    // Canonicalize: undirected, no self-loops, each edge once (a < b by
    // node id — input may list either direction or both).
    val e = edges.select(
        least(col(aCol), col(bCol)).as("u"),
        greatest(col(aCol), col(bCol)).as("v"))
      .filter(col("u") =!= col("v"))
      .distinct()
      // Feeds the degree aggregate AND (twice) the oriented frame below —
      // materialize once; same two-reader discipline as pageRank's edge
      // checkpoint.
      .localCheckpoint()
    val deg = e.select(col("u").as("n")).union(e.select(col("v").as("n")))
      .groupBy(col("n")).agg(count(lit(1)).as("d"))
    // Orient by (degree, id): s → t with (d_s, s) < (d_t, t). The target's
    // degree rides along — the wedge pair below must be canonicalized in
    // the SAME (degree, id) order the edges are oriented in, or the
    // closing edge of a triangle whose two out-neighbors' id order
    // disagrees with their degree order exists only in the reverse
    // direction and the join silently drops the triangle.
    val oriented = e
      .join(deg.select(col("n").as("u"), col("d").as("du")), Seq("u"))
      .join(deg.select(col("n").as("v"), col("d").as("dv")), Seq("v"))
      .select(
        when(col("du") < col("dv") ||
             (col("du") === col("dv") && col("u") < col("v")),
          col("u")).otherwise(col("v")).as("s"),
        when(col("du") < col("dv") ||
             (col("du") === col("dv") && col("u") < col("v")),
          col("v")).otherwise(col("u")).as("t"),
        when(col("du") < col("dv") ||
             (col("du") === col("dv") && col("u") < col("v")),
          col("dv")).otherwise(col("du")).as("dt"))
    // Wedges at each minimum vertex, the pair canonicalized by the
    // ORIENTATION order (d_t1, t1) < (d_t2, t2) — so each wedge is
    // generated once AND the closing edge is guaranteed to be oriented
    // t1 → t2, making the equi-join below complete.
    val w1 = oriented.select(col("s"), col("t").as("t1"), col("dt").as("d1"))
    val w2 = oriented.select(col("s"), col("t").as("t2"), col("dt").as("d2"))
    w1.join(w2, Seq("s"))
      .filter(col("d1") < col("d2") ||
              (col("d1") === col("d2") && col("t1") < col("t2")))
      .join(oriented.select(col("s").as("_ws"), col("t").as("_wt")),
        col("t1") === col("_ws") && col("t2") === col("_wt"))
      // Report in plain id order (orientation order is an internal detail).
      .select(
        least(col("s"), col("t1"), col("t2")).as("node_a"),
        greatest(least(col("s"), col("t1")), least(col("s"), col("t2")),
          least(col("t1"), col("t2"))).as("node_b"),
        greatest(col("s"), col("t1"), col("t2")).as("node_c"))
  }

  /** Bipartite co-occurrence PROJECTION — how a pipeline derives an
    * item–item graph in the first place: from (context, item) incidence
    * rows (order→part, session→page, doc→entity), emit one row
    * (item_a < item_b, cooc) per item pair sharing ≥1 context, weighted
    * by the number of shared contexts. [[triangles]]/[[pageRank]]/CC then
    * run on the projected edge list.
    *
    * The scale hazard is the hot context: a context containing d items
    * contributes C(d,2) pairs, so one viral session with 10^6 items
    * yields half a trillion pairs from a single key — quadratic blowup
    * no partitioning fixes. `maxFan` is the standard guard: contexts
    * with more than `maxFan` distinct items are DROPPED ENTIRELY before
    * the self-join (deterministic, unlike sampling; the co-occurrence
    * literature drops or truncates hot baskets for exactly this reason,
    * and a hot context carries near-zero pairwise signal anyway). Every
    * surviving key fans out ≤ C(maxFan, 2), so the join output is
    * ≤ C(maxFan,2)/maxFan · |incidence| — linear in the input with a
    * small constant, skew-free by construction. Callers auditing the
    * drop re-aggregate the incidence frame against `maxFan` themselves
    * (one groupBy — cheaper than this op carrying a side channel).
    */
  def bipartiteProject(incidence: DataFrame, contextCol: String,
                       itemCol: String, maxFan: Int): DataFrame = {
    require(maxFan >= 2, s"maxFan must be >= 2; got $maxFan")
    // Distinct incidence feeds the degree aggregate and the guarded
    // collect — distinct's map-side partial aggregate dedups BEFORE the
    // shuffle (on heavy-dup incidence that shuffles far less than the
    // raw rows), and AQE's shuffle-stage reuse materializes the shared
    // distinct exchange ONCE for both consumers (pinned by PlanSpec's
    // q152 runtime assertion; an r20 A/B that dropped the distinct from
    // the collect side so each branch had a private subtree measured
    // 1.09 -> 1.65 s standalone — two scans, no reuse, and the heavy
    // partial collect_set concentrated into scan-split tasks).
    val e = incidence.select(col(contextCol).as("l"), col(itemCol).as("r"))
      .distinct()
    val okKeys = e.groupBy(col("l")).agg(count(lit(1)).as("_d"))
      .filter(col("_d") <= maxFan).select(col("l"))
    val kept = e.join(okKeys, Seq("l"))
    // r19 reshape (guide §2.3/§2.4): pairs are generated IN-TASK from a
    // per-context sorted item array instead of a context-keyed self-join
    // — one groupBy(l) exchange of the kept incidence replaces the
    // self-join (which either broadcast the whole kept side or paid two
    // more context-keyed exchanges at scale), and the C(d,2) pair rows
    // never cross a join, only the final map-side-combined aggregate.
    // The degree guard still runs FIRST, so no collected array exceeds
    // maxFan elements — a viral context never concentrates its payload
    // in one task (the reason the guard cannot ride the collect itself).
    // localCheckpoint dropped with the self-join (r19): the checkpoint's
    // eager materialization job + lineage scan (an ExistingRDD that
    // blocked parquet column pruning) cost more than it saved. Pair
    // order: items sorted ascending and distinct, each element paired
    // with its strict successors — exactly the self-join's (_ra < _rb).
    val grouped = kept.groupBy(col("l"))
      .agg(sort_array(collect_set(col("r"))).as("_items"))
    grouped
      .select(posexplode(col("_items")).as(Seq("_i", "item_a")), col("_items"))
      .select(col("item_a"),
        explode(slice(col("_items"), col("_i") + 2,
          greatest(size(col("_items")) - col("_i") - 1, lit(0)))).as("item_b"))
      .groupBy(col("item_a"), col("item_b"))
      .agg(count(lit(1)).as("cooc"))
  }
}
