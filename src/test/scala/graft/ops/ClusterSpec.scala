package graft.ops

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.SparkSpec

class ClusterSpec extends SparkSpec {

  private def emb(vs: (Long, Seq[Float])*) =
    df("vec_id BIGINT, embedding ARRAY<FLOAT>", vs.map(v => Row(v._1, v._2)))

  /** Driver-side reference: same fixed-point recurrence, plain Scala. */
  private def refKMeans(vs: Seq[(Long, Seq[Float])], k: Int, iters: Int): Map[Long, Long] = {
    val pts = vs.map { case (id, v) =>
      id -> v.map(x => math.floor(x.toDouble * 1e6).toLong)
    }.toMap
    def d2(a: Seq[Long], b: Seq[Long]): Long =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    def assign(cents: Map[Long, Seq[Long]]): Map[Long, Long] =
      pts.map { case (id, qv) =>
        id -> cents.toSeq.map { case (cid, cv) => (d2(qv, cv), cid) }.min._2
      }
    var cents = pts.toSeq.sortBy(_._1).take(k)
      .map { case (id, qv) => id -> qv }.toMap
    for (_ <- 1 to iters) {
      val a = assign(cents)
      cents = a.groupBy(_._2).map { case (cid, members) =>
        val qs = members.keys.map(pts).toSeq
        cid -> qs.head.indices.map { i =>
          math.floor(qs.map(_(i)).sum.toDouble / qs.size.toDouble).toLong
        }
      }
    }
    assign(cents)
  }

  test("kMeans separates two obvious blobs and labels them by seed id") {
    // Two tight groups around (1,0) and (0,1); seeds are ids 0 and 1 — one
    // from each group — so the final labels are exactly the group split.
    val data = Seq(
      0L -> Seq(1.0f, 0.1f), 1L -> Seq(0.1f, 1.0f),
      2L -> Seq(0.9f, 0.0f), 3L -> Seq(0.0f, 0.9f),
      4L -> Seq(1.1f, 0.2f), 5L -> Seq(0.2f, 1.1f))
    val out = Cluster.kMeans(emb(data: _*), "vec_id", "embedding", k = 2, iterations = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    out shouldBe Map(0L -> 0L, 2L -> 0L, 4L -> 0L, 1L -> 1L, 3L -> 1L, 5L -> 1L)
  }

  test("kMeans matches the driver-side fixed-point reference on mixed-sign data") {
    // Deterministic pseudo-random floats including negatives — exercises
    // the floor-on-negative quantization and floor(s/n) centroid division.
    val data = (0L until 40L).map { i =>
      i -> (0 until 8).map(j => (((i * 37 + j * 11) % 19).toFloat - 9f) / 10f)
    }
    val out = Cluster.kMeans(emb(data: _*), "vec_id", "embedding", k = 4, iterations = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    out shouldBe refKMeans(data, k = 4, iters = 3)
  }

  test("kMeans is deterministic across partitionings (integer arithmetic)") {
    val data = (0L until 30L).map { i =>
      i -> (0 until 6).map(j => (((i * 13 + j * 7) % 23).toFloat - 11f) / 12f)
    }
    val one = emb(data: _*).repartition(1)
    val many = emb(data: _*).repartition(7)
    val r1 = Cluster.kMeans(one, "vec_id", "embedding", k = 3, iterations = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    val r7 = Cluster.kMeans(many, "vec_id", "embedding", k = 3, iterations = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    r1 shouldBe r7
  }

  test("kMeans dist column is the exact quantized squared distance") {
    val data = Seq(0L -> Seq(0.5f, 0.5f), 1L -> Seq(-0.5f, -0.5f))
    // k=2, seeds are the points themselves; after any iterations each point
    // is its own centroid → dist 0.
    val out = Cluster.kMeans(emb(data: _*), "vec_id", "embedding", k = 2, iterations = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    out shouldBe Map(0L -> 0L, 1L -> 0L)
  }

  test("sqDistQ (native graft_sqdist_q) matches the driver-side integer sum") {
    val out = emb(0L -> Seq(0.5f, -0.25f, 1.0f), 1L -> Seq(-0.5f, 0.25f, 0.0f))
      .select(Cluster.sqDistQ(
        Cluster.quantize(col("embedding")),
        Cluster.quantize(array(lit(0.1f), lit(0.1f), lit(0.1f)))).as("d"))
      .collect().map(_.getLong(0)).sorted
    def q(x: Float): Long = math.floor(x.toDouble * 1e6).toLong
    def d2(v: Seq[Float]): Long =
      v.map(x => { val d = q(x) - q(0.1f); d * d }).sum
    out shouldBe Array(d2(Seq(-0.5f, 0.25f, 0.0f)), d2(Seq(0.5f, -0.25f, 1.0f))).sorted
  }

  test("ivfSearchQ ranks within-blob neighbors first and never returns the query itself") {
    // Two blobs; queries are ids 0 and 1 (one per blob). With k=2 trained
    // clusters the lists are the blobs, so each query's top candidates are
    // its blob-mates ranked by exact distance.
    val data = Seq(
      0L -> Seq(1.0f, 0.1f), 1L -> Seq(0.1f, 1.0f),
      2L -> Seq(0.9f, 0.0f), 3L -> Seq(0.0f, 0.9f),
      4L -> Seq(1.1f, 0.2f), 5L -> Seq(0.2f, 1.1f))
    val out = Cluster.ivfSearchQ(emb(data: _*), "vec_id", "embedding",
        kClusters = 2, iterations = 2,
        queryPred = col("vec_id") <= 1, topK = 2, nProbe = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(3)))
    out.foreach { case (q, c, _) => q should not be c }
    // query 0's blob is {0,2,4}, query 1's is {1,3,5}
    out.filter(_._1 == 0L).map(_._2).toSet shouldBe Set(2L, 4L)
    out.filter(_._1 == 1L).map(_._2).toSet shouldBe Set(3L, 5L)
  }

  test("assignStreaming matches the batch kMeans assignment on the training set") {
    val data = (0L until 30L).map { i =>
      i -> (0 until 6).map(j => (((i * 13 + j * 7) % 23).toFloat - 11f) / 12f)
    }
    val e = emb(data: _*)
    val cents = Cluster.kMeansCentroids(e, "vec_id", "embedding", k = 3, iterations = 2)
    val streamed = Cluster.assignStreaming(e, "vec_id", "embedding", cents)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    val batch = Cluster.kMeans(e, "vec_id", "embedding", k = 3, iterations = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    streamed shouldBe batch
  }

  test("assignStreaming routes a MemoryStream identically to the batch form") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val data = (0L until 20L).map { i =>
      i -> (0 until 4).map(j => (((i * 19 + j * 5) % 17).toFloat - 8f) / 9f)
    }
    val e = emb(data: _*)
    val cents = Cluster.kMeansCentroids(e, "vec_id", "embedding", k = 2, iterations = 2)
    val ms = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, Seq[Float])]
    val q = Cluster.assignStreaming(
        ms.toDF().toDF("vec_id", "embedding")
          .select(col("vec_id"), col("embedding").cast("array<float>").as("embedding")),
        "vec_id", "embedding", cents)
      .writeStream.format("memory").queryName("route").outputMode("append").start()
    try {
      ms.addData(data: _*)
      q.processAllAvailable()
      val streamed = spark.table("route")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
      val batch = Cluster.assignStreaming(e, "vec_id", "embedding", cents)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
      streamed shouldBe batch
    } finally q.stop()
  }

  test("kMeans rejects iteration counts outside the unrolled-plan range") {
    val data = emb(0L -> Seq(0.1f, 0.2f))
    an[IllegalArgumentException] should be thrownBy
      Cluster.kMeans(data, "vec_id", "embedding", k = 1, iterations = 0)
    an[IllegalArgumentException] should be thrownBy
      Cluster.kMeans(data, "vec_id", "embedding", k = 1, iterations = 7)
  }

  private def qpts(vs: (Long, Seq[Float])*) =
    emb(vs: _*).select(col("vec_id").as("id"),
      Cluster.quantize(col("embedding")).as("qv"))

  private def blobPts = qpts((0L until 40L).map { i =>
    val base = if (i % 2 == 0) 0.9f else 0.1f
    (i, Seq(base + (i % 7) * 0.01f, 1.0f - base + (i % 5) * 0.01f))
  }: _*)

  test("ivfSearchStoredLists over assignQ lists equals the recomputing search") {
    val pts = blobPts
    val cents = Cluster.train(pts, k = 4, iterations = 2)
    val lists = Cluster.assignQ(pts, cents).select(col("id"), col("cluster_id"))
    val queries = pts.filter(col("id") % 10 === 0).select(col("id"))
    val stored = Cluster.ivfSearchStoredLists(pts, cents, lists, queries,
        topK = 3, nProbe = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getInt(3))).toSet
    val live = Cluster.ivfSearchQPts(pts, cents, queries, topK = 3, nProbe = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getInt(3))).toSet
    stored shouldBe live
  }

  test("ivfServeLocal (one-task tier) ≡ ivfSearchQPts, row for row") {
    // The r19 q103 serving tier: the tagged-union kernel fed assignQ
    // lists must reproduce the recomputing distributed search exactly —
    // probe tie-break, self-exclusion, (dist, cand_id) rank, panel
    // dedup (the duplicated query id below).
    val pts = blobPts
    val cents = Cluster.train(pts, k = 4, iterations = 2)
    val lists = Cluster.assignQ(pts, cents).select(col("id"), col("cluster_id"))
    val queries = pts.filter(col("id") % 10 === 0).select(col("id"))
      .unionByName(pts.filter(col("id") === 0L).select(col("id")))
    val local = Cluster.ivfServeLocal(pts, cents, lists, queries,
        topK = 3, nProbe = 2)
      .collect().map(_.toSeq).sortBy(_.toString)
    val live = Cluster.ivfSearchQPts(pts, cents, queries, topK = 3, nProbe = 2)
      .collect().map(_.toSeq).sortBy(_.toString)
    local should not be empty
    local shouldBe live
    pts.sparkSession.catalog.clearCache()
  }

  test("assignQ over an empty centroid frame is empty, never a sentinel row") {
    // The r18 fold assignment seeds its argmin with a
    // (Long.MaxValue, Long.MinValue) struct; an empty centroid array
    // must reproduce the old crossJoin semantics (no output rows), not
    // leak the seed as a phantom assignment.
    val pts = blobPts
    val cents = Cluster.train(pts, k = 4, iterations = 2).filter(lit(false))
    Cluster.assignQ(pts, cents).count() shouldBe 0L
  }

  test("rankCentroidsQ maxR cap is a strict prefix of the full ranking") {
    val pts = blobPts
    val cents = Cluster.train(pts, k = 4, iterations = 2)
    def rows(maxR: Int) = Cluster.rankCentroidsQ(pts, cents, maxR)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val full = rows(4)
    val capped = rows(2)
    capped shouldBe full.filter(_._3 <= 2)
    // and a cap past k returns everything, no phantom ranks
    rows(9) shouldBe full
  }

  test("incremental list maintenance (reuse + delta-assign) equals a fresh assignment") {
    val all = blobPts
    val cents = Cluster.train(all, k = 4, iterations = 2)
    val oldPts = all.filter(col("id") % 17 =!= 0)
    val newPts = all.filter(col("id") % 19 =!= 0)
    val prev = Cluster.assignQ(oldPts, cents).select(col("id"), col("cluster_id"))
    val maintained = prev
      .join(newPts.select(col("id")), Seq("id"), "left_semi")
      .unionByName(Cluster.assignQ(
          newPts.join(prev.select(col("id")), Seq("id"), "left_anti"), cents)
        .select(col("id"), col("cluster_id")))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val fresh = Cluster.assignQ(newPts, cents)
      .select(col("id"), col("cluster_id"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    maintained shouldBe fresh
  }

  test("list maintenance never re-ranks a retained id (poisoned stored row passes through)") {
    // The q159 delta-only claim, pinned where cpu/shuffle proxies can't
    // discriminate (see IncrementalIoSpec's q159 note): poison one
    // retained id's STORED cluster to a value a re-rank would correct.
    // Delta-only maintenance serves the stored row verbatim — only
    // ADDED ids pay the argmin — so the poison must survive; a
    // maintenance path that re-assigns retained vectors overwrites it
    // and fails here deterministically.
    val all = blobPts
    val cents = Cluster.train(all, k = 4, iterations = 2)
    val newPts = all.filter(col("id") % 19 =!= 0)
    val truth = Cluster.assignQ(newPts, cents)
      .select(col("id"), col("cluster_id"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val victim = truth.keys.min
    val wrong = cents.select(col("cluster_id")).collect().map(_.getLong(0))
      .find(_ != truth(victim)).get
    val prev = Cluster.assignQ(all, cents)
      .select(col("id"),
        when(col("id") === victim, lit(wrong))
          .otherwise(col("cluster_id")).as("cluster_id"))
    val maintained = prev
      .join(newPts.select(col("id")), Seq("id"), "left_semi")
      .unionByName(Cluster.assignQ(
          newPts.join(prev.select(col("id")), Seq("id"), "left_anti"), cents)
        .select(col("id"), col("cluster_id")))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    maintained(victim) shouldBe wrong          // stored row served verbatim
    (maintained - victim) shouldBe (truth - victim)
  }
}
