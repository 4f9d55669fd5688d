package graft.ops

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.SparkSpec

class SimilaritySpec extends SparkSpec {

  private val vecs = df("id BIGINT, v ARRAY<FLOAT>", Seq(
    Row(0L, Seq(1.0f, 0.0f, 0.0f)),
    Row(1L, Seq(2.0f, 0.0f, 0.0f)),   // same direction as 0
    Row(2L, Seq(0.0f, 1.0f, 0.0f)),   // orthogonal to 0
    Row(3L, Seq(-1.0f, 0.0f, 0.0f)),  // opposite to 0
    Row(4L, Seq(1.0f, 1.0f, 0.0f))))

  test("cosine: parallel=1, orthogonal=0, opposite=-1") {
    val a = array(lit(1.0f), lit(0.0f))
    collectCol[Double](vecs.limit(1).select(
      Similarity.cosine(a, array(lit(3.0f), lit(0.0f))))) shouldBe Seq(1.0)
    collectCol[Double](vecs.limit(1).select(
      Similarity.cosine(a, array(lit(0.0f), lit(2.0f))))) shouldBe Seq(0.0)
    collectCol[Double](vecs.limit(1).select(
      Similarity.cosine(a, array(lit(-1.0f), lit(0.0f))))) shouldBe Seq(-1.0)
  }

  test("cosineNearDupPairs trips its O(N^2) misuse guard on an oversized frame") {
    val e = intercept[IllegalArgumentException] {
      Similarity.cosineNearDupPairs(vecs, "id", "v", 0.9, maxRows = 3L)
    }
    e.getMessage should include("maxRows")
    // under the bound it still runs
    Similarity.cosineNearDupPairs(vecs, "id", "v", 0.99, maxRows = 5L)
      .collect().map(r => (r.getLong(0), r.getLong(1))) shouldBe Array((0L, 1L))
  }

  test("bruteForceTopK ranks by cosine desc, excludes the query itself") {
    val out = Similarity.bruteForceTopK(vecs, "id", "v", col("id") === 0, 4)
      .orderBy("rank").collect()
    out.map(_.getLong(1)).take(2) shouldBe Array(1L, 4L) // parallel first, 45° second
    out.map(_.getLong(1)) should not contain 0L
    out.map(_.getInt(3)) shouldBe Array(1, 2, 3, 4)
  }

  test("ivfTopK: full probe coverage reproduces brute force exactly") {
    // centroidEvery=1 -> every vector is a centroid; nProbe >= #centroids
    // -> every list is probed -> the candidate set is all of N, so IVF
    // must equal the exact top-k including tie-ordering
    val ivf = Similarity.ivfTopK(vecs, "id", "v", col("id") === 0, k = 4,
      centroidEvery = 1, nProbe = 5).orderBy("rank").collect()
    val brute = Similarity.bruteForceTopK(vecs, "id", "v", col("id") === 0, 4)
      .orderBy("rank").collect()
    ivf.map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))) shouldBe
      brute.map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
  }

  test("ivfTopK: narrow probe only searches the probed lists") {
    // centroidEvery=2 -> centroids {0,2,4}. Assignments: 0,1 -> c0
    // (cos 1.0); 2 -> c2; 4 -> c4 (itself); 3 (-x) -> c2 (cos 0 beats
    // -1 and -0.7). With nProbe=1 the +x query probes only c0's list,
    // so candidates = {1}: the true nearest is found, the query itself
    // and unprobed lists (2, 3) are not.
    val out = Similarity.ivfTopK(vecs, "id", "v", col("id") === 0, k = 5,
      centroidEvery = 2, nProbe = 1).collect()
    out.foreach(_.getLong(0) shouldBe 0L)
    out.map(_.getLong(1)).toSet should contain(1L)     // true nearest found
    out.map(_.getLong(1)) should not contain 0L        // never the query
    out.map(_.getLong(1)).toSet should not contain 2L  // unprobed list skipped
  }

  test("ivfTopKFrac: the slice cap honors nProbeMin past the frac bound") {
    // r18 narrow assignment: the in-task ranking is SLICED at
    // greatest(nProbeMin, ceil(frac*C)) before the probe filter reads
    // it. With frac tiny and nProbeMin = 3 the filter wants rank 3 —
    // a cap that drops the greatest(min, ...) (slicing at
    // ceil(0.1*3) = 1) would clip the rank-3 list this query's only
    // far candidate lives in, and the outputs diverge from the fixed
    // nProbe = 3 formulation. Geometry: centroids {0, 2, 4}; query 1
    // ranks them c0 > c2 > c4, and id 5 (near c4's axis) is only
    // reachable through the rank-3 probe.
    val v6 = df("id BIGINT, v ARRAY<FLOAT>", Seq(
      Row(0L, Seq(1.0f, 0.0f, 0.0f)),
      Row(1L, Seq(1.0f, 0.05f, 0.0f)),
      Row(2L, Seq(0.9f, 0.44f, 0.0f)),
      Row(3L, Seq(0.0f, 1.0f, 0.0f)),
      Row(4L, Seq(0.0f, 0.0f, 1.0f)),
      Row(5L, Seq(0.1f, 0.05f, 1.0f))))
    def rows(d: org.apache.spark.sql.DataFrame) =
      d.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getInt(3))).sortBy(_._4).toSeq
    val frac = rows(Similarity.ivfTopKFrac(v6, "id", "v", col("id") === 1,
      k = 5, centroidEvery = 2, probeFrac = 0.1, nProbeMin = 3))
    val fixed = rows(Similarity.ivfTopK(v6, "id", "v", col("id") === 1,
      k = 5, centroidEvery = 2, nProbe = 3))
    frac.map(_._2) should contain(5L) // the rank-3-list candidate
    frac shouldBe fixed
    spark.catalog.clearCache()
  }

  /** Adversarial near-tie corpus for the r20 one-task live-IVF tier
    * (VERDICT r19 ask #6): exact duplicates (cosine ties that must
    * resolve by cand_id), scaled colinear vectors (equal cosines at
    * different norms), 1-ulp component perturbations (cosines differing
    * in the last bits — any fold-order or comparison divergence between
    * the tiers flips their rank order), a query equidistant between two
    * centroid directions (probe-selection tie), and an opposite-signed
    * vector. Ids chosen so the auto-√N stride (10 rows → stride 4)
    * yields centroids {0, 4, 8} spanning the tie clusters. */
  private val nearTie = df("id BIGINT, v ARRAY<FLOAT>", Seq(
    Row(0L, Seq(1.0f, 0.0f, 0.0f)),
    Row(1L, Seq(1.0f, 0.0f, 0.0f)),              // exact duplicate of 0
    Row(2L, Seq(2.0f, 0.0f, 0.0f)),              // colinear, scaled
    Row(3L, Seq(math.nextUp(1.0f), 1.0f, 0.0f)), // 1 ulp off the diagonal
    Row(4L, Seq(1.0f, 1.0f, 0.0f)),              // the diagonal centroid
    Row(5L, Seq(1.0f, math.nextUp(1.0f), 0.0f)), // 1 ulp the other side
    Row(6L, Seq(0.0f, 1.0f, 0.0f)),              // equidistant c0/c4 probe tie
    Row(7L, Seq(1.0f, 1.0f, 1.0f)),
    Row(8L, Seq(0.5f, 0.5f, 0.70710678f)),       // near-7 direction centroid
    Row(9L, Seq(-1.0f, 0.0f, 0.0f))))            // opposite to 0

  private def bits(d: org.apache.spark.sql.DataFrame) =
    d.collect().map(r => (r.getLong(0), r.getLong(1),
      java.lang.Double.doubleToLongBits(r.getDouble(2)), r.getInt(3)))
      .sortBy(t => (t._1, t._4)).toSeq

  test("ivfTopK one-task tier ≡ distributed chain, bit-exact, on near-tie vectors") {
    for (nProbe <- Seq(1, 2, 3); kk <- Seq(3, 5)) {
      val pred = col("id") % 2 === 0
      val local = Similarity.ivfTopKLocal(nearTie, "id", "v", pred,
        kk, 0, Left(nProbe))
      val dist = Similarity.ivfTopK(nearTie, "id", "v", pred,
        kk, 0, nProbe, maxLocalBytes = 0L)
      withClue(s"nProbe=$nProbe k=$kk: ") { bits(local) shouldBe bits(dist) }
      spark.catalog.clearCache()
    }
  }

  test("ivfTopK tier equality holds with an explicit centroid stride and dup centroids") {
    // centroidEvery=1: every vector (incl. the exact-duplicate pair) is
    // a centroid — centroid-rank ties must break by centroid_id in both
    // tiers for the list assignment itself, not just the final rank.
    val pred = col("id") >= 0 // every vector queries
    val local = Similarity.ivfTopKLocal(nearTie, "id", "v", pred, 4, 1, Left(2))
    val dist = Similarity.ivfTopK(nearTie, "id", "v", pred, 4, 1, 2,
      maxLocalBytes = 0L)
    bits(local) shouldBe bits(dist)
    spark.catalog.clearCache()
  }

  test("ivfTopKFrac one-task tier ≡ distributed chain (frac probe threshold)") {
    val pred = col("id") % 2 === 0
    val local = Similarity.ivfTopKLocal(nearTie, "id", "v", pred,
      5, 0, Right((0.34, 1)))
    val dist = Similarity.ivfTopKFrac(nearTie, "id", "v", pred,
      5, 0, probeFrac = 0.34, nProbeMin = 1, maxLocalBytes = 0L)
    bits(local) shouldBe bits(dist)
    spark.catalog.clearCache()
  }

  test("ivfNearDupPairs finds co-bucketed near-dups with exact cosines, bounded candidates") {
    // vecs 0 and 1 are parallel (cosine 1.0) and share centroid 0's list;
    // 2 is orthogonal to both — not a near-dup even when co-bucketed
    val out = Similarity.ivfNearDupPairs(vecs, "id", "v",
      minCosine = 0.9, centroidEvery = 2, assignProbe = 2).collect()
    out.map(r => (r.getLong(0), r.getLong(1))) should contain((0L, 1L))
    out.foreach(r => r.getDouble(2) should be >= 0.9)
    // ordering convention: id_a < id_b, no self-pairs
    out.foreach(r => r.getLong(0) should be < r.getLong(1))
  }

  test("projNearDupPairs: parallel vectors always co-bucket; precision is exact") {
    // Identical-direction vectors have IDENTICAL projections in every
    // table (signatures are a deterministic function of direction only up
    // to quantization), so (0,1) MUST collide in all 8 tables — recall 1
    // for exact-duplicate directions, with no randomness to flake.
    val out = Similarity.projNearDupPairs(vecs, "id", "v", minCosine = 0.9)
      .collect()
    out.map(r => (r.getLong(0), r.getLong(1))) should contain((0L, 1L))
    // every emitted pair is verified with the exact cosine: precision 1
    out.foreach(r => r.getDouble(2) should be >= 0.9)
    out.foreach(r => r.getLong(0) should be < r.getLong(1))
    // opposite-direction vector flips every sign bit: (0,3) never appears
    out.map(r => (r.getLong(0), r.getLong(1))) should not contain ((0L, 3L))
  }

  test("projNearDupPairs is deterministic across runs and input order") {
    val a = Similarity.projNearDupPairs(vecs, "id", "v", minCosine = 0.4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).sortBy(x => (x._1, x._2))
    val b = Similarity.projNearDupPairs(vecs.orderBy(col("id").desc), "id", "v", minCosine = 0.4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).sortBy(x => (x._1, x._2))
    a shouldBe b
    a.length should be >= 1 // (0,1) at least
  }

  test("lshTopK returns ranked bucket-mates with exact cosines, never the query") {
    val out = Similarity.lshTopK(vecs, "id", "v", col("id") === 0, 4, tables = 4, bits = 4)
      .collect()
    out.foreach { r =>
      r.getLong(0) shouldBe 0L
      r.getLong(1) should not be 0L
    }
    // any candidate it does return must carry the true cosine
    val brute = Similarity.bruteForceTopK(vecs, "id", "v", col("id") === 0, 4)
      .collect().map(r => r.getLong(1) -> r.getDouble(2)).toMap
    out.foreach(r => r.getDouble(2) shouldBe brute(r.getLong(1)))
  }

  test("projTopK: ranked bucket-mates, exact cosines, parallel vector caught") {
    val out = Similarity.projTopK(vecs, "id", "v", col("id") === 0, 4,
      tables = 4, bits = 4, flips = 1).collect()
    out.foreach { r =>
      r.getLong(0) shouldBe 0L
      r.getLong(1) should not be 0L
    }
    // parallel vectors produce identical sign patterns in every table —
    // id 1 is always a candidate, and its cosine is the exact 1.0
    assert(out.exists(r => r.getLong(1) == 1L && r.getDouble(2) == 1.0))
    val brute = Similarity.bruteForceTopK(vecs, "id", "v", col("id") === 0, 4)
      .collect().map(r => r.getLong(1) -> r.getDouble(2)).toMap
    out.foreach(r => r.getDouble(2) shouldBe brute(r.getLong(1)))
    // ranks are contiguous from 1 in cosine-desc order
    val ranks = out.sortBy(_.getInt(3)).map(_.getInt(3)).toSeq
    ranks shouldBe (1 to out.length)
    an[IllegalArgumentException] should be thrownBy
      Similarity.projTopK(vecs, "id", "v", col("id") === 0, 4,
        tables = 0, bits = 4, flips = 1)
  }
}
