package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Count-Min Sketch frequency estimation + heavy hitters (Cormode &
  * Muthukrishnan 2005, public) — the bounded-memory frequency sketch
  * next to [[graft.functions.KmvDistinct]]'s cardinality sketch and the
  * MinHash/SimHash similarity sketches: [[Depth]] seeded hash rows of
  * 16^[[BucketHexChars]] counters each, so the ENTIRE sketch is at most
  * Depth·4096 integer cells no matter how large the corpus — it
  * broadcasts, it merges by cell-wise addition (integer sums, so
  * map-side combine IS the merge), and a point estimate reads Depth
  * cells. Estimates never undercount (each of a word's cells holds its
  * true count plus nonneg collision mass), so min-over-rows heavy-hitter
  * detection has perfect recall and only one-sided error.
  *
  * Portability: buckets are md5-prefix STRINGS seeded per row
  * (`md5(i || ':' || word)` — the portable-MinHash idiom), counters are
  * exact integer sums, and the estimate is an integer min — every step
  * replays bit-for-bit in another engine, so unlike a float sketch the
  * oracle hash-checks the whole pipeline.
  */
object Cms {

  /** Hash rows in the sketch. */
  val Depth = 4

  /** Bucket key width in md5 hex chars: 3 → 16³ = 4096 counters/row. */
  val BucketHexChars = 3

  private def bucketOf(i: Column, item: Column): Column =
    substring(md5(concat(i.cast("string"), lit(":"), item)), 1, BucketHexChars)

  /** Build the sketch over an item stream WITH multiplicity (one input
    * row = one increment): (i, bucket, cnt), at most Depth·4096 rows.
    * One explode (Depth rows per item) + one map-side-combined count —
    * the combine is the sketch MERGE, so partitions/streams union for
    * free. */
  def sketch(items: DataFrame, itemCol: String): DataFrame =
    items
      .select(explode(sequence(lit(0), lit(Depth - 1))).as("i"),
        col(itemCol).as("_it"))
      .select(col("i"), bucketOf(col("i"), col("_it")).as("bucket"))
      .groupBy(col("i"), col("bucket")).agg(count(lit(1)).as("cnt"))

  /** Point estimates for every item in `candidates` (one column,
    * distinct): (item, est) with est = min over the Depth rows —
    * ≥ the true count, always. The sketch side broadcasts (≤ Depth·4096
    * rows by construction). A bucket with no cell row means zero
    * increments ever hashed there, so the probe LEFT-joins and counts
    * the miss as 0 — an inner join would drop never-seen candidates
    * (contract: every candidate gets a row) and inflate estimates for
    * items with some-but-not-all empty buckets (true CMS estimate: 0). */
  def estimates(candidates: DataFrame, itemCol: String,
                cells: DataFrame): DataFrame =
    candidates
      .select(col(itemCol),
        explode(sequence(lit(0), lit(Depth - 1))).as("i"))
      .withColumn("bucket", bucketOf(col("i"), col(itemCol)))
      .join(broadcast(cells.select(col("i"), col("bucket"), col("cnt"))),
        Seq("i", "bucket"), "left")
      .groupBy(col(itemCol))
      .agg(min(coalesce(col("cnt"), lit(0L))).as("est"))
}
