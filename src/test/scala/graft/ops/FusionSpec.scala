package graft.ops

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

import graft.SparkSpec

class FusionSpec extends SparkSpec {

  private def ranking(rows: (Long, Long, Int)*) = {
    val schema = StructType(Seq(
      StructField("query_id", LongType), StructField("doc_id", LongType),
      StructField("rank", IntegerType)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(
        rows.map(r => Row(r._1, r._2, r._3)), 2), schema)
  }

  // D = lcm(61..70) — the exact-integer unit 1/(60+r) is scaled by
  private val D = (61 to 70).map(BigInt(_))
    .foldLeft(BigInt(1))((a, b) => a / a.gcd(b) * b).toLong
  private def u(rank: Int): Long = D / (60 + rank)

  test("rrf sums exact per-rank units and ranks by (score desc, doc_id)") {
    // query 0: doc 5 is lex#1 only, doc 7 is sem#1 only, doc 9 is
    // lex#2 AND sem#2 — the double-appearance must outrank both
    // singles (1/62 + 1/62 > 1/61), the canonical RRF behavior.
    val lex = ranking((0L, 5L, 1), (0L, 9L, 2))
    val sem = ranking((0L, 7L, 1), (0L, 9L, 2))
    val out = Fusion.rrf(Seq("lex" -> lex, "sem" -> sem), kRrf = 60,
        maxRank = 10, topN = 10)
      .collect()
      .map(r => (r.getLong(2), r.getInt(1), r.getLong(3),
        if (r.isNullAt(4)) None else Some(r.getInt(4)),
        if (r.isNullAt(5)) None else Some(r.getInt(5))))
      .sortBy(_._2)
    out.length shouldBe 3
    out(0) shouldBe ((9L, 1, u(2) + u(2), Some(2), Some(2)))
    // doc 5 and doc 7 tie at u(1): doc_id ascending breaks it
    out(1) shouldBe ((5L, 2, u(1), Some(1), None))
    out(2) shouldBe ((7L, 3, u(1), None, Some(1)))
  }

  test("ranks past maxRank are ignored and queries fuse independently") {
    val lex = ranking((0L, 1L, 1), (0L, 2L, 11), (1L, 3L, 1))
    val sem = ranking((1L, 3L, 4), (1L, 4L, 1))
    val out = Fusion.rrf(Seq("lex" -> lex, "sem" -> sem), kRrf = 60,
        maxRank = 10, topN = 10)
      .collect().map(r => (r.getLong(0), r.getLong(2)) -> r.getLong(3)).toMap
    out.keySet shouldBe Set((0L, 1L), (1L, 3L), (1L, 4L)) // rank 11 dropped
    out((1L, 3L)) shouldBe u(1) + u(4)
    out((1L, 4L)) shouldBe u(1)
  }

  test("overflow and name guards refuse unsound configurations") {
    val r = ranking((0L, 1L, 1))
    an[IllegalArgumentException] should be thrownBy
      Fusion.rrf(Seq("a" -> r, "a" -> r)) // duplicate names
    an[IllegalArgumentException] should be thrownBy
      Fusion.rrf(Seq("a" -> r), kRrf = 60, maxRank = 64) // lcm blows BIGINT
  }

  test("hybridServeLocal edge cases: hand-checkable corpus, missing probe vector, empty panel") {
    // Tiny hand-built artifacts: 3 docs, 2-term panel on one query,
    // 2 centroids, every number small enough to verify by eye.
    import spark.implicits._
    val post = Seq( // (term, doc, dl, tf)
      ("cat", 1L, 2L, 1L), ("dog", 1L, 2L, 1L),
      ("cat", 2L, 1L, 1L),
      ("dog", 3L, 1L, 1L)).toDF("term", "doc_id", "dl", "tf")
    val dfT = Seq(("cat", 2L), ("dog", 2L)).toDF("term", "df")
    val stats = Seq((3L, 1L)).toDF("_n", "_avg") // n=3, avgdl = 4 div 3 = 1
    val panel = Seq((0L, "cat"), (0L, "dog")).toDF("query_id", "term")
    // probe vector for query 0 + candidate vectors for docs 1..3
    val pts = Seq(
      (0L, Seq(0L, 0L)), (1L, Seq(1L, 0L)), (2L, Seq(5L, 0L)),
      (3L, Seq(0L, 9L))).toDF("id", "qv")
    val cents = Seq((10L, Seq(0L, 0L)), (11L, Seq(100L, 100L)))
      .toDF("cluster_id", "cv")
    val lists = Seq( // everything lives in cluster 10 except doc 3
      (0L, 10L), (1L, 10L), (2L, 10L), (3L, 11L)).toDF("id", "cluster_id")
    val out = Fusion.hybridServeLocal(post, dfT, stats, panel, pts, cents,
        lists, kLex = 10, topKSem = 10, nProbe = 1, kRrf = 60,
        maxRank = 10, topN = 10)
      .collect().map(r => r.getLong(2) ->
        (r.getInt(1), r.getLong(3),
          Option(r.get(4)), Option(r.get(5)))).toMap
    // lex: idf = 1e6*bitlen(4 div 3 = 1) = 1e6; doc1 scores cat+dog,
    // docs 2,3 one term each at dl=1 — doc1's sum wins rank 1
    // sem (nProbe=1 → cluster 10 only): doc1 dist 1, doc2 dist 25;
    // doc3 unreachable (cluster 11 not probed)
    out(1L)._1 shouldBe 1 // fused top: lex#1 + sem#1
    out(1L)._3 shouldBe Some(1) // lex_rank
    out(1L)._4 shouldBe Some(1) // sem_rank
    out(3L)._4 shouldBe None    // sem never surfaced doc 3
    out(2L)._4 shouldBe Some(2)
    // per-rank units are the exact integers rrf emits
    out(1L)._2 shouldBe u(1) + u(1)
    // MISSING PROBE VECTOR: a panel whose query id has no pts row
    // fuses from the lex leg alone (the distributed ivf probe finds
    // nothing for it either)
    val panel9 = Seq((9L, "cat")).toDF("query_id", "term")
    val out9 = Fusion.hybridServeLocal(post, dfT, stats, panel9, pts,
        cents, lists, kLex = 10, topKSem = 10, nProbe = 1, kRrf = 60,
        maxRank = 10, topN = 10)
      .collect().map(r => (r.getLong(0), r.getLong(2), Option(r.get(5))))
    out9.map(_._1).toSet shouldBe Set(9L)
    out9.foreach(_._3 shouldBe None) // no sem ranks anywhere
    // EMPTY PANEL: no probes, no lex terms → empty result, no crash
    val empty = Fusion.hybridServeLocal(post, dfT, stats,
      Seq.empty[(Long, String)].toDF("query_id", "term"), pts, cents,
      lists, kLex = 10, topKSem = 10, nProbe = 1, kRrf = 60,
      maxRank = 10, topN = 10)
    empty.count() shouldBe 0L
  }

  test("q170's one-task serving tier ≡ the distributed composition, row for row") {
    // maxLocalBytes = 0 forces the distributed chain (stored-index
    // probe + IVF stored-list search + rrf) on the same artifacts; the
    // tier replicates integer BM25, the Long sqdist argmin/top-k and
    // the exact-integer fusion in one task. Plan asserts keep the
    // divergence (and so the test) non-vacuous; PlanSpec pins both
    // shapes in detail.
    val dir = "/root/testdata/sf0.01"
    val localF = graft.Queries.q170HybridRrf(spark, dir)
    val distF = graft.Queries.q170HybridRrf(spark, dir, maxLocalBytes = 0L)
    localF.queryExecution.executedPlan.toString should include("MapPartitions")
    distF.queryExecution.executedPlan.toString should not include "MapPartitions"
    val local = localF.collect().map(_.toSeq).sortBy(_.toString)
    val dist = distF.collect().map(_.toSeq).sortBy(_.toString)
    local should not be empty
    local shouldBe dist
    spark.catalog.clearCache()
  }
}
