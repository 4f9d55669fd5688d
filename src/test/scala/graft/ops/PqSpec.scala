package graft.ops

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.SparkSpec

class PqSpec extends SparkSpec {

  private def pts(vs: (Long, Seq[Long])*) =
    df("id BIGINT, qv ARRAY<BIGINT>", vs.map(v => Row(v._1, v._2)))

  // 8-dim quantized vectors, two obvious mirror groups per half: EVEN
  // ids near (10.., 90..), ODD ids near (90.., 10..). Interleaving the
  // groups puts the two smallest-id seeds (0 and 1) one in each blob —
  // smallest-id seeding cannot separate blobs it never seeds.
  private val sample: Seq[(Long, Seq[Long])] = Seq(
    0L -> Seq(10L, 11, 9, 10, 90L, 91, 89, 90),
    2L -> Seq(11L, 10, 10, 9, 89L, 90, 91, 90),
    4L -> Seq(9L, 10, 11, 10, 91L, 90, 90, 89),
    6L -> Seq(10L, 9, 10, 11, 90L, 89, 90, 91),
    1L -> Seq(90L, 91, 89, 90, 10L, 11, 9, 10),
    3L -> Seq(89L, 90, 91, 90, 11L, 10, 10, 9),
    5L -> Seq(91L, 90, 90, 89, 9L, 10, 11, 10),
    7L -> Seq(90L, 89, 90, 91, 10L, 9, 10, 11))

  test("subvectors slices contiguous subspaces and drops ragged rows") {
    val in = pts(1L -> Seq(1L, 2, 3, 4, 5, 6), 2L -> Seq(1L, 2, 3, 4, 5)) // 5 % 2 != 0
    val out = Pq.subvectors(in, m = 2).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getSeq[Long](2))).toSet
    out shouldBe Set((1L, 0, Seq(1L, 2, 3)), (1L, 1, Seq(4L, 5, 6)))
  }

  test("trainCodebooks: k codewords per subspace, each the floor-mean of its members") {
    val books = Pq.trainCodebooks(pts(sample: _*), m = 2, k = 2, iterations = 2)
      .collect().map(r => ((r.getInt(0), r.getLong(1)), r.getSeq[Long](2))).toMap
    books.keySet.map(_._1) shouldBe Set(0, 1)
    books.size shouldBe 4 // 2 subspaces x 2 codewords
    // Seeds are ids 0 and 1 — one per mirror blob — so two Lloyd rounds
    // converge each codeword onto its blob's floor-mean: every trained
    // component must sit inside one blob's value range, never on a mixed
    // mean between them.
    for (((_, _), cw) <- books) {
      cw should have size 4
      val lvl = cw.head
      all(cw.map(math.abs(_))) should be <= math.abs(lvl) + 3
      assert(cw.forall(v => (v >= 8 && v <= 12) || (v >= 88 && v <= 92)),
        s"codeword $cw is not centered on either blob")
    }
  }

  test("encode: every full-length vector gets exactly m codes from the trained books") {
    val p = pts(sample: _*)
    val books = Pq.trainCodebooks(p, m = 2, k = 2, iterations = 2)
    val codes = Pq.encode(p, books, m = 2).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    codes.groupBy(_._1).values.foreach(_.map(_._2).toSet shouldBe Set(0, 1))
    codes.length shouldBe sample.size * 2
    val bookIds = books.select(col("code_id")).collect().map(_.getLong(0)).toSet
    all(codes.map(_._3)) should (be(bookIds.head) or be(bookIds.last))
    // The two mirror groups must land on different codes in BOTH subspaces
    val byId = codes.groupBy(_._1).map { case (id, cs) =>
      id -> cs.sortBy(_._2).map(_._3).toSeq
    }
    byId(0L) shouldBe byId(2L)
    byId(1L) shouldBe byId(3L)
    byId(0L) should not be byId(1L)
  }

  test("topKQ: ADC shortlist + exact re-rank finds the true in-group neighbors") {
    val p = pts(sample: _*)
    val books = Pq.trainCodebooks(p, m = 2, k = 2, iterations = 2)
    val codes = Pq.encode(p, books, m = 2)
    val res = Pq.topKQ(p, books, codes, m = 2,
      queries = p.filter(col("id") === 0L).select(col("id")),
      k = 3, oversample = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3)))
    res.map(_._1).toSet shouldBe Set(0L)
    res should have size 3
    // The 3 nearest of id 0 are its group mates 2,4,6 — the mirror group
    // is ~2*4*80² away and must not appear.
    res.map(_._2).toSet shouldBe Set(2L, 4L, 6L)
    // ranks are 1..k and distances nondecreasing in rank
    res.sortBy(_._4).map(_._4).toSeq shouldBe Seq(1, 2, 3)
    val byRank = res.sortBy(_._4).map(_._3)
    byRank.zip(byRank.tail).foreach { case (a, b) => a should be <= b }
    // dist is the EXACT quantized L2, not the ADC approximation
    val v0 = sample.head._2
    def d2(a: Seq[Long], b: Seq[Long]) = a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    res.foreach { case (_, cand, dist, _) =>
      dist shouldBe d2(v0, sample.find(_._1 == cand).get._2)
    }
  }

  test("recall against brute force on scattered data with oversampling") {
    // 40 spread-out vectors (deterministic pseudo-random), m=2/k=4 books,
    // oversample 4: ADC-shortlisted top-3 must recover most of the true
    // top-3 (PQ is approximate — assert a floor, not equality).
    val vs = (0L until 40L).map { i =>
      i -> Seq.tabulate(8)(j => ((i * 2654435761L + j * 40503L) % 1000L) - 500L)
    }
    val p = pts(vs: _*)
    val books = Pq.trainCodebooks(p, m = 2, k = 4, iterations = 2)
    val codes = Pq.encode(p, books, m = 2)
    val got = Pq.topKQ(p, books, codes, m = 2,
      queries = p.filter(col("id") % 10 === 0).select(col("id")),
      k = 3, oversample = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    def d2(a: Seq[Long], b: Seq[Long]) = a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    val exact = vs.filter(_._1 % 10 == 0).flatMap { case (q, qv) =>
      vs.filter(_._1 != q)
        .map { case (c, cv) => (d2(qv, cv), c) }.sorted.take(3)
        .map { case (_, c) => (q, c) }
    }.toSet
    val recall = (got & exact).size.toDouble / exact.size
    assert(recall >= 0.5, s"PQ recall $recall below floor (got=$got exact=$exact)")
  }

  test("ivfPqTopK: coarse lists bound the search, ADC+re-rank find in-blob neighbors") {
    val p = pts(sample: _*)
    val cents = Cluster.train(p, k = 2, iterations = 2)
    val books = Pq.trainCodebooks(p, m = 2, k = 2, iterations = 2)
    val codes = Pq.encode(p, books, m = 2)
    val res = Pq.ivfPqTopK(p, cents, books, codes, m = 2,
      queries = p.filter(col("id") <= 1L).select(col("id")),
      k = 3, nProbe = 1, oversample = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3)))
    // With nProbe=1 each query searches only its own blob's inverted
    // list: id 0's neighbors are exactly its even group mates, id 1's the
    // odd ones — the mirror blob is structurally excluded by the coarse
    // router before ADC ever runs.
    res.filter(_._1 == 0L).map(_._2).toSet shouldBe Set(2L, 4L, 6L)
    res.filter(_._1 == 1L).map(_._2).toSet shouldBe Set(3L, 5L, 7L)
    // dist is the exact quantized L2 of the original vectors
    def d2(a: Seq[Long], b: Seq[Long]) = a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    res.foreach { case (q, c, dist, _) =>
      dist shouldBe d2(sample.find(_._1 == q).get._2, sample.find(_._1 == c).get._2)
    }
    // ranks contiguous from 1, distances nondecreasing per query
    res.groupBy(_._1).values.foreach { rs =>
      rs.sortBy(_._4).map(_._4).toSeq shouldBe (1 to rs.size)
      val byRank = rs.sortBy(_._4).map(_._3)
      byRank.zip(byRank.tail).foreach { case (a, b) => a should be <= b }
    }
    p.sparkSession.catalog.clearCache()
  }

  test("ivfPqTopK at exhaustive parameters collapses to exact L2 top-k") {
    // nProbe = every cluster and oversample covering the corpus: the
    // coarse router excludes nothing, the ADC shortlist admits everyone,
    // so the exact re-rank IS brute force — the whole approximate
    // pipeline must return the true top-k, ranks included.
    val vs = (0L until 30L).map { i =>
      i -> Seq.tabulate(8)(j => ((i * 2654435761L + j * 40503L) % 1000L) - 500L)
    }
    val p = pts(vs: _*)
    val cents = Cluster.train(p, k = 2, iterations = 2)
    val books = Pq.trainCodebooks(p, m = 2, k = 4, iterations = 2)
    val codes = Pq.encode(p, books, m = 2)
    val got = Pq.ivfPqTopK(p, cents, books, codes, m = 2,
      queries = p.filter(col("id") % 10 === 0).select(col("id")),
      k = 3, nProbe = 2, oversample = 10) // 3*10 >= N: full shortlist
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(3))).toSet
    def d2(a: Seq[Long], b: Seq[Long]) = a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    val exact = vs.filter(_._1 % 10 == 0).flatMap { case (q, qv) =>
      vs.filter(_._1 != q).map { case (c, cv) => (d2(qv, cv), c) }.sorted.take(3)
        .zipWithIndex.map { case ((_, c), r) => (q, c, r + 1) }
    }.toSet
    got shouldBe exact
    p.sparkSession.catalog.clearCache()
  }

  test("shortlistPct: derived bound floors at k·oversample, holds corpus share above it") {
    // The scale-stable recall lever (q117 / the q83e gate): the ADC
    // shortlist bound is max(k·oversample, ceil(N·pct/100)), derived
    // in-plan from the corpus count. (a) While the density term sits
    // under the floor, results are BIT-IDENTICAL to the fixed bound —
    // the base-regime contract that keeps q117's recorded hashes
    // unchanged. (b) When it dominates (pct=100 ⇒ bound = N), the
    // shortlist admits every routed candidate, so the same tiny
    // oversample collapses to the exhaustive-shortlist result — the
    // recall the fixed bound loses at density is recovered by the
    // derived one.
    val vs = (0L until 30L).map { i =>
      i -> Seq.tabulate(8)(j => ((i * 2654435761L + j * 40503L) % 1000L) - 500L)
    }
    val p = pts(vs: _*)
    val cents = Cluster.train(p, k = 2, iterations = 2)
    val books = Pq.trainCodebooks(p, m = 2, k = 4, iterations = 2)
    val codes = Pq.encode(p, books, m = 2)
    val queries = p.filter(col("id") % 10 === 0).select(col("id"))
    def run(oversample: Int, pct: Int) =
      Pq.ivfPqTopK(p, cents, books, codes, m = 2, queries = queries,
          k = 3, nProbe = 2, oversample = oversample, shortlistPct = pct)
        .collect().map(_.toSeq).sortBy(_.toString)
    // (a) ceil(30·10/100) = 3 <= k·oversample = 6: floor binds, identical
    run(oversample = 2, pct = 10) shouldBe run(oversample = 2, pct = 0)
    // (b) pct=100 ⇒ bound 30 covers the corpus: equals the exhaustive
    // shortlist (oversample 10: 3·10 >= N) at the SAME oversample=2
    val derived = run(oversample = 2, pct = 100)
    derived shouldBe run(oversample = 10, pct = 0)
    derived should not be run(oversample = 2, pct = 0) // the lever is live
    p.sparkSession.catalog.clearCache()
  }

  test("ivfPqTopKStored from derived lists+codes ≡ ivfPqTopK, row for row") {
    // The stored-artifact serving path (q179) must reproduce the
    // recomputing composition exactly when handed the artifacts the
    // latter derives internally: lists = the rn=1 coarse assignment,
    // codes = the trained-book encoding. Also covers the tie-break
    // parity of the query-only probe ranking vs the full corpus pass.
    val vs = (0L until 30L).map { i =>
      i -> Seq.tabulate(8)(j => ((i * 2654435761L + j * 40503L) % 1000L) - 500L)
    }
    val p = pts(vs: _*)
    val cents = Cluster.train(p, k = 3, iterations = 2)
    val books = Pq.trainCodebooks(p, m = 2, k = 4, iterations = 2)
    val codes = Pq.encode(p, books, m = 2)
    val lists = Cluster.assignQ(p, cents).select(col("id"), col("cluster_id"))
    val queries = p.filter(col("id") % 7 === 0).select(col("id"))
    val stored = Pq.ivfPqTopKStored(p, cents, books, codes, lists, m = 2,
        queries = queries, k = 3, nProbe = 2, oversample = 4)
      .collect().map(_.toSeq).sortBy(_.toString)
    val recomputed = Pq.ivfPqTopK(p, cents, books, codes, m = 2,
        queries = queries, k = 3, nProbe = 2, oversample = 4)
      .collect().map(_.toSeq).sortBy(_.toString)
    stored should not be empty
    stored shouldBe recomputed
    p.sparkSession.catalog.clearCache()
  }

  test("q117's one-task tier (assignQ lists + shortlistPct) ≡ ivfPqTopK, " +
    "incl. a pct-binding corpus") {
    // The r19 serving tier for the LIVE composition: serveStoredLocal
    // fed in-plan assignQ lists must equal ivfPqTopK row for row — at a
    // pct where the density term BINDS (pct=100 ⇒ bound N=30 > k·over=6)
    // so the kernel's new shortlist arm is exercised, and at pct=0 where
    // the k·oversample floor binds.
    val vs = (0L until 30L).map { i =>
      i -> Seq.tabulate(8)(j => ((i * 2654435761L + j * 40503L) % 1000L) - 500L)
    }
    val p = pts(vs: _*)
    val cents = Cluster.train(p, k = 3, iterations = 2)
    val books = Pq.trainCodebooks(p, m = 2, k = 4, iterations = 2)
    val codes = Pq.encode(p, books, m = 2)
    val queries = p.filter(col("id") % 7 === 0).select(col("id"))
    Seq(0, 100).foreach { pct =>
      val local = Pq.serveStoredLocal(p, cents, books, codes,
          Cluster.assignQ(p, cents), m = 2, queries = queries,
          k = 3, nProbe = 2, oversample = 2, shortlistPct = pct)
        .collect().map(_.toSeq).sortBy(_.toString)
      val dist = Pq.ivfPqTopK(p, cents, books, codes, m = 2,
          queries = queries, k = 3, nProbe = 2, oversample = 2,
          shortlistPct = pct)
        .collect().map(_.toSeq).sortBy(_.toString)
      withClue(s"pct=$pct: ") {
        local should not be empty
        local shouldBe dist
      }
    }
    p.sparkSession.catalog.clearCache()
  }

  test("q116's singleton-list local serve ≡ topKQ (PQ-only, no route)") {
    // The r19 q116 tier: one empty-vector centroid + every id in
    // cluster 0 + nProbe 1 makes serveStoredLocal's candidate set "all
    // ids minus self" — exactly topKQ's scope — and the ADC/shortlist/
    // re-rank arms are shared, so the outputs must match row for row.
    val vs = (0L until 30L).map { i =>
      i -> Seq.tabulate(8)(j => ((i * 2654435761L + j * 40503L) % 1000L) - 500L)
    }
    val p = pts(vs: _*)
    val books = Pq.trainCodebooks(p, m = 2, k = 4, iterations = 2)
    val codes = Pq.encode(p, books, m = 2)
    val queries = p.filter(col("id") % 7 === 0).select(col("id"))
    val spark = p.sparkSession
    val local = Pq.serveStoredLocal(p,
        spark.range(1).select(lit(0L).as("cluster_id"),
          array().cast("array<bigint>").as("cv")),
        books, codes, p.select(col("id"), lit(0L).as("cluster_id")),
        m = 2, queries = queries, k = 3, nProbe = 1, oversample = 4)
      .collect().map(_.toSeq).sortBy(_.toString)
    val dist = Pq.topKQ(p, books, codes, m = 2, queries = queries,
        k = 3, oversample = 4)
      .collect().map(_.toSeq).sortBy(_.toString)
    local should not be empty
    local shouldBe dist
    spark.catalog.clearCache()
  }

  test("out-of-range codebook groups drop identically on both serving tiers") {
    // A stored artifact violating the g ∈ [0, m) contract (corruption):
    // the distributed tier's subvector inner join silently drops such
    // rows (the query has exactly m subvectors), so the one-task tier
    // must drop them too — an unchecked copyOfRange there would
    // zero-pad past the query vector's end and score phantom distances
    // the distributed plan never computes (ADVICE r17).
    val vs = (0L until 30L).map { i =>
      i -> Seq.tabulate(8)(j => ((i * 2654435761L + j * 40503L) % 1000L) - 500L)
    }
    val p = pts(vs: _*)
    val cents = Cluster.train(p, k = 3, iterations = 2)
    val books = Pq.trainCodebooks(p, m = 2, k = 4, iterations = 2)
    val codes = Pq.encode(p, books, m = 2)
    val lists = Cluster.assignQ(p, cents).select(col("id"), col("cluster_id"))
    val queries = p.filter(col("id") % 7 === 0).select(col("id"))
    // Corrupt BOTH artifacts with g = 2 (= m) rows: g*sub lands exactly
    // at the vector end, where copyOfRange zero-pads instead of throwing.
    val badBooks = books.unionByName(books.limit(1)
      .select(lit(2).cast("int").as("g"), col("code_id"), col("cw")))
    val badCodes = codes.unionByName(codes.filter(col("g") === 0)
      .select(col("id"), lit(2).cast("int").as("g"), lit(0L).as("code_id")))
    val clean = Pq.ivfPqTopKStored(p, cents, books, codes, lists, m = 2,
        queries = queries, k = 3, nProbe = 2, oversample = 4)
      .collect().map(_.toSeq).sortBy(_.toString)
    val dist = Pq.ivfPqTopKStored(p, cents, badBooks, badCodes, lists, m = 2,
        queries = queries, k = 3, nProbe = 2, oversample = 4)
      .collect().map(_.toSeq).sortBy(_.toString)
    val local = Pq.serveStoredLocal(p, cents, badBooks, badCodes, lists, m = 2,
        queries = queries, k = 3, nProbe = 2, oversample = 4)
      .collect().map(_.toSeq).sortBy(_.toString)
    dist shouldBe clean
    local shouldBe dist
    p.sparkSession.catalog.clearCache()
  }
}
