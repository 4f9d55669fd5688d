package graft.ops

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.SparkSpec

class GraphSpec extends SparkSpec {

  private def edges(es: (Long, Long)*) =
    df("src BIGINT, dst BIGINT", es.map(e => Row(e._1, e._2)))

  /** Driver-side reference: same fixed-point rule, plain Scala. */
  private def refRanks(es: Seq[(Long, Long)], iters: Int): Map[Long, Long] = {
    val both = es ++ es.map(e => (e._2, e._1))
    val adj = both.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val deg = adj.view.mapValues(_.size.toLong).toMap
    var r = deg.keys.map(_ -> 1000000L).toMap
    for (_ <- 1 to iters) {
      val inflow = both.groupBy(_._2).map { case (dst, in) =>
        dst -> in.map { case (src, _) => r(src) / deg(src) }.sum
      }
      r = r.keys.map(n => n -> (150000L + inflow.getOrElse(n, 0L) * 85L / 100L)).toMap
    }
    r
  }

  test("pageRank on a 3-node path matches hand-computed fixed-point values") {
    // path 1-2-3; two iterations computed by hand:
    //   iter1: end nodes 150000+85%·500000=575000, center 150000+85%·2000000=1850000
    //   iter2: ends 150000+85%·925000=936250, center 150000+85%·1150000=1127500
    val out = Graph.pageRank(edges((1L, 2L), (2L, 3L)), "src", "dst", iterations = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    out shouldBe Map(1L -> 936250L, 2L -> 1127500L, 3L -> 936250L)
  }

  test("pageRank ranks the hub of a star highest and matches the reference rule") {
    val es = Seq((10L, 1L), (10L, 2L), (10L, 3L), (10L, 4L), (1L, 2L))
    val out = Graph.pageRank(edges(es: _*), "src", "dst", iterations = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    out shouldBe refRanks(es, 3)
    out(10L) should be > out(3L)
    out(10L) should be > out(1L)
  }

  test("pageRank is deterministic across partitionings (integer arithmetic)") {
    val es = (0L until 40L).map(i => (i, (i * 7 + 1) % 40)).filter(e => e._1 != e._2)
    val e1 = edges(es: _*)
    val r1 = Graph.pageRank(e1, "src", "dst", 3)
    val r2 = Graph.pageRank(e1.repartition(13), "src", "dst", 3)
    r1.exceptAll(r2).count() shouldBe 0
    r2.exceptAll(r1).count() shouldBe 0
    r1.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap shouldBe refRanks(es, 3)
  }

  test("pageRank attaches isolated nodes at their 0.15 fixed point when given the universe") {
    // universe 1..5; only 1-2-3 have edges, 4 and 5 are isolated
    val universe = df("doc_id BIGINT", (1L to 5L).map(Row(_)))
    val out = Graph.pageRank(edges((1L, 2L), (2L, 3L)), "src", "dst",
        iterations = 2, allNodes = Some(universe))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    out.keySet shouldBe Set(1L, 2L, 3L, 4L, 5L)
    out(4L) shouldBe 150000L // 0.15 · RankScale: exact fixed point, no in-links
    out(5L) shouldBe 150000L
    // connected nodes unchanged by the attachment
    out(2L) shouldBe 1127500L
  }

  test("pageRank rejects iteration counts outside the unrolled-plan range") {
    an[IllegalArgumentException] should be thrownBy
      Graph.pageRank(edges((1L, 2L)), "src", "dst", 0)
    an[IllegalArgumentException] should be thrownBy
      Graph.pageRank(edges((1L, 2L)), "src", "dst", 11)
  }

  /** Driver-side reference: every 3-subset closed under the edge set. */
  private def refTriangles(es: Seq[(Long, Long)]): Set[(Long, Long, Long)] = {
    val und = es.flatMap(e => Seq(e, e.swap)).filter(e => e._1 != e._2).toSet
    val vs = und.map(_._1).toSeq.sorted
    (for {
      a <- vs; b <- vs if b > a && und((a, b))
      c <- vs if c > b && und((a, c)) && und((b, c))
    } yield (a, b, c)).toSet
  }

  private def triSet(es: Seq[(Long, Long)]): Set[(Long, Long, Long)] =
    Graph.triangles(edges(es: _*), "src", "dst")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

  test("triangles: K4 yields its four triangles, a path yields none") {
    val k4 = for (a <- 1L to 4L; b <- (a + 1) to 4L) yield (a, b)
    triSet(k4) shouldBe Set((1L, 2L, 3L), (1L, 2L, 4L), (1L, 3L, 4L), (2L, 3L, 4L))
    triSet(Seq((1L, 2L), (2L, 3L), (3L, 4L))) shouldBe Set.empty
  }

  test("triangles: duplicate edges, reversed directions and self-loops canonicalize away") {
    // same K3 listed messily: both directions, dups, a self-loop
    triSet(Seq((1L, 2L), (2L, 1L), (2L, 3L), (1L, 3L), (3L, 1L), (2L, 2L))) shouldBe
      Set((1L, 2L, 3L))
  }

  test("triangles matches an all-subsets brute force on random graphs incl. a hub") {
    // deterministic pseudo-random graph + a hub node touching everything:
    // the hub exercises the degree-orientation bound (its edges orient IN)
    val rnd = (0L until 120L).map(i => ((i * 13) % 25, (i * 7 + 3) % 25))
      .filter(e => e._1 != e._2)
    val withHub = rnd ++ (0L until 25L).map(v => (99L, v))
    triSet(rnd) shouldBe refTriangles(rnd)
    triSet(withHub) shouldBe refTriangles(withHub)
  }

  test("triangles: wedge out-neighbors whose id order disagrees with degree order") {
    // {1-2,1-3,2-3,2-4,2-5}: deg(2)=4 > deg(3)=2, so orientation order
    // at the wedge vertex is (3, 2) while id order is (2, 3). A pair
    // canonicalized by plain id would look for closing edge 2→3, which
    // is oriented 3→2 — the regression that silently dropped {1,2,3}.
    triSet(Seq((1L, 2L), (1L, 3L), (2L, 3L), (2L, 4L), (2L, 5L))) shouldBe
      Set((1L, 2L, 3L))
  }

  test("triangles matches brute force on random graphs that actually contain triangles") {
    var total = 0
    for (seed <- 1L to 6L) {
      val es = (0L until 220L)
        .map(i => ((i * (13 + seed)) % 28, (i * 7 + seed) % 28))
        .filter(e => e._1 != e._2)
      val ref = refTriangles(es)
      total += ref.size
      withClue(s"seed=$seed (${ref.size} expected triangles): ") {
        triSet(es) shouldBe ref
      }
    }
    // Guard against the round-13 blind spot: a differential over graphs
    // with zero triangles proves nothing.
    total should be > 20
  }

  test("triangles is partitioning-independent (pure order logic)") {
    val es = (0L until 80L).map(i => ((i * 11) % 20, (i * 3 + 1) % 20))
      .filter(e => e._1 != e._2)
    val e1 = edges(es: _*)
    val r1 = Graph.triangles(e1, "src", "dst")
    val r2 = Graph.triangles(e1.repartition(13), "src", "dst")
    r1.exceptAll(r2).count() shouldBe 0
    r2.exceptAll(r1).count() shouldBe 0
  }

  private def incidence(es: (Long, Long)*) =
    df("ctx BIGINT, item BIGINT", es.map(e => Row(e._1, e._2)))

  /** Driver-side reference: pair counts over contexts within the fan cap. */
  private def refProject(es: Seq[(Long, Long)], maxFan: Int): Map[(Long, Long), Long] =
    es.distinct.groupBy(_._1).values
      .filter(_.size <= maxFan)
      .flatMap { rows =>
        val items = rows.map(_._2).sorted
        for (i <- items.indices; j <- (i + 1) until items.size)
          yield (items(i), items(j))
      }
      .groupBy(identity).view.mapValues(_.size.toLong).toMap

  test("bipartiteProject: co-occurrence counts match the brute force; dup incidence collapses") {
    // ctx 1 {a,b,c}, ctx 2 {a,b}, ctx 3 {b,c} (+ a duplicate row)
    val es = Seq((1L, 10L), (1L, 11L), (1L, 12L), (2L, 10L), (2L, 11L),
      (3L, 11L), (3L, 12L), (3L, 12L))
    val out = Graph.bipartiteProject(incidence(es: _*), "ctx", "item", maxFan = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    out shouldBe Map((10L, 11L) -> 2L, (10L, 12L) -> 1L, (11L, 12L) -> 2L)
    out shouldBe refProject(es, 5)
  }

  test("bipartiteProject: a hot context is dropped entirely by the fan guard") {
    // ctx 9 touches 6 items (> maxFan 5) and must contribute NO pairs;
    // the small contexts still project
    val hot = (0L until 6L).map(i => (9L, 100L + i))
    val es = hot ++ Seq((1L, 10L), (1L, 11L))
    val out = Graph.bipartiteProject(incidence(es: _*), "ctx", "item", maxFan = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    out shouldBe Map((10L, 11L) -> 1L)
    out shouldBe refProject(es, 5)
  }

  test("bipartiteProject matches the brute force on a pseudo-random incidence") {
    val es = (0L until 400L).map(i => ((i * 13) % 60, 100L + (i * 7 + 3) % 50))
    val out = Graph.bipartiteProject(incidence(es: _*), "ctx", "item", maxFan = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    out shouldBe refProject(es, 8)
  }
}
