package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed Lloyd's k-means over embedding columns — the trained-centroid
  * counterpart of [[Similarity]]'s seed-centroid IVF quantizer (its doc
  * explicitly leaves the `cents` frame swappable for a trained one; this is
  * the trainer). In an LLM-data pipeline k-means is the workhorse for
  * semantic sharding, topic-balanced mixture construction, and
  * cluster-then-dedup (SemDeDup-style: near-dups are only searched inside a
  * cluster).
  *
  * All arithmetic is FIXED-POINT INTEGER, the same discipline as
  * [[Graph.pageRank]]: float centroid means are order-dependent under
  * distributed summation and could never hash-match another engine.
  * Components are quantized to 1e-6 units (`floor(x·1e6)` — floor, not
  * round/truncate, because floor is the one integer rounding every engine
  * defines identically for negatives), distances are exact BIGINT sums of squares,
  * and the centroid update divides exact integer sums with `floor(s/n)` in
  * DOUBLE (both operands are ≪ 2^53, so the quotient is the same IEEE
  * double on any engine and its floor is bit-identical).
  *
  * Scale shape per iteration: one broadcast N×k assignment pass (k is tiny;
  * the per-row argmin is a map-side-combined `min(struct)`, so the shuffle
  * carries N rows, not N×k), then a (cluster, dimension)-keyed aggregation
  * of k·d rows. No driver actions, no collect; the quantized points are
  * localCheckpoint'ed once and every iteration reads the stored blocks.
  */
object Cluster {

  /** Components are BIGINTs in units of 1e-6. */
  val QuantScale = 1000000L

  /** Quantize a float/double array column to scaled BIGINTs. */
  def quantize(vec: Column): Column =
    transform(vec, x => floor(x.cast("double") * lit(QuantScale.toDouble)).cast("long"))

  /** Exact squared L2 distance between two equal-length BIGINT arrays. */
  def sqDistQ(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)),
      lit(0L), (acc, v) => acc + v)

  /** Nearest-centroid assignment: (id, qv, cluster_id, dist). Centroids are
    * broadcast; the argmin is `min(struct(dist, cluster_id))` — lexicographic
    * struct ordering gives a deterministic smallest-centroid tie-break, and
    * min is partially aggregable so the shuffle is N rows. `first(qv)` is
    * safe: qv is functionally dependent on the grouping key. */
  private def assign(pts: DataFrame, cents: DataFrame): DataFrame =
    pts.crossJoin(broadcast(cents))
      .select(col("id"), col("qv"),
        struct(sqDistQ(col("qv"), col("cv")).as("d"), col("cluster_id").as("cid")).as("dc"))
      .groupBy(col("id"))
      .agg(min(col("dc")).as("m"), first(col("qv")).as("qv"))
      .select(col("id"), col("qv"), col("m.cid").as("cluster_id"), col("m.d").as("dist"))

  /** Fixed-iteration Lloyd's k-means. Returns the FINAL assignment
    * (`idCol`, cluster_id, dist) — cluster_id is the seed row's id, dist the
    * exact quantized squared distance to the trained centroid.
    *
    * Seeds are the k rows with the SMALLEST `idCol` values (orderBy+limit →
    * TakeOrderedAndProject, no global window) — deterministic and
    * scale-independent, the same no-RNG stance as the IVF quantizer's
    * every-k-th seeds. A cluster that loses all members simply drops out of
    * the update (k shrinks); with floor-stable arithmetic any other engine
    * running the same recurrence drops the same clusters.
    *
    * `iterations` counts assignment→update rounds; one more assignment
    * against the final centroids produces the output. Bounded at 6 because
    * the whole computation is ONE lazy unrolled plan (no driver actions) —
    * beyond that, checkpoint between rounds instead.
    */
  def kMeans(emb: DataFrame, idCol: String, vecCol: String,
             k: Int, iterations: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1; got $k")
    require(iterations >= 1 && iterations <= 6,
      s"iterations must be in [1,6] (fixed-point plans unroll per iteration); got $iterations")
    // Quantize once; every iteration (and the final assignment) re-reads
    // the stored blocks instead of re-running the scan + quantization.
    val pts = emb.select(col(idCol).as("id"), quantize(col(vecCol)).as("qv"))
      .localCheckpoint()
    var cents = pts.orderBy(col("id")).limit(k)
      .select(col("id").as("cluster_id"), col("qv").as("cv"))
    for (_ <- 1 to iterations) {
      val a = assign(pts, cents)
      cents = a
        .select(col("cluster_id"), posexplode(col("qv")).as(Seq("pos", "v")))
        .groupBy(col("cluster_id"), col("pos"))
        // floor(s/n) in DOUBLE: |s| ≤ |component|·N ≪ 2^53 and n ≤ N are
        // both exact doubles, so the IEEE quotient — and its floor — is
        // engine-independent. BIGINT `div` would truncate toward zero and
        // disagree with floor on negative sums.
        .agg((floor(sum(col("v")).cast("double") / count(lit(1)).cast("double")))
          .cast("long").as("cv1"))
        .groupBy(col("cluster_id"))
        .agg(transform(array_sort(collect_list(struct(col("pos"), col("cv1")))),
          s => s.getField("cv1")).as("cv"))
    }
    assign(pts, cents)
      .select(col("id").as(idCol), col("cluster_id"), col("dist"))
  }
}
