package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.ops.LmScore

/** The incremental count-model family under STRUCTURED STREAMING — the
  * continuous-ingestion deployment of [[graft.ops.LmScore.maintainCounts]]
  * (q155) and its siblings: crawl change events arrive as a stream, each
  * micro-batch folds its delta into the stored model with the same
  * abelian-group maintenance kernel the batch family uses, and after n
  * micro-batches the store holds EXACTLY the full retrain over the
  * cumulative corpus.
  *
  * Two theorems carry the design, both inherited from the batch family
  * rather than re-proven per micro-batch:
  *
  *   - COMPOSITION: maintenance steps chain —
  *     maintain(maintain(m, d1), d2) = maintain(m, d1 ∪ d2) — because
  *     per-key sums commute and associate (see
  *     [[graft.ops.AdditiveCounts]]'s group-axioms scaladoc). So batch
  *     BOUNDARIES don't matter: any split of the change feed into
  *     micro-batches yields the same final model, and the q175 cell's
  *     DuckDB oracle (a full retrain over the final snapshot) certifies
  *     the whole chain with one hash.
  *   - ORDER-INDEPENDENCE, within AND across batches: the store carries
  *     SIGNED partial sums (only exact zeros drop — never the negative
  *     partials a reordered feed can create), so the fold is a plain
  *     group sum and ANY assignment of change events to micro-batches —
  *     including a file source breaking modification-time ties
  *     arbitrarily, or a feed that delivers a document's removal before
  *     the addition it supersedes — reaches the same final state. The
  *     batch family's per-step `cnt > 0` drop would clamp such a
  *     negative partial and lose information; here the positive-count
  *     MODEL view is taken once, at [[latestModel]]. (With an in-order
  *     feed every version's positive view equals the batch-maintained
  *     model, so nothing is given up.)
  *
  * EXACTLY-ONCE is the versioned-store pattern: micro-batch b reads model
  * version b and idempotently overwrites version b+1. Structured Streaming
  * replays a failed micro-batch under the SAME batchId, so a replay
  * re-reads the intact version b and rewrites version b+1 with identical
  * content — a torn write can never corrupt the lineage, and restarting
  * the query from its checkpoint resumes mid-chain. (The usual
  * foreachBatch hazard — appending to an unversioned sink — would
  * double-count a replayed batch; versioning by batchId is what makes the
  * group fold idempotent.)
  *
  * Scale shape: each micro-batch does ONE map-side-combined sum over
  * (stored model ∪ ±occurrence legs) — the q155 single-shuffle combine —
  * and never re-reads unchanged documents' text; the model store is a
  * parquet table per version (a deployment retires versions older than
  * its recovery horizon). Event rows carry the old/new text INLINE
  * ((doc_id, minus_text, plus_text) — a change feed, not a snapshot), so
  * the hot path has no side joins.
  */
object MaintainStream {

  /** Model-store layout: `v0` is the initial model; micro-batch b
    * rewrites `v{b+1}`. */
  def versionPath(storeDir: String, v: Long): String = s"$storeDir/v$v"

  /** Seed the store with the initial model as version 0. */
  def writeInit(initModel: DataFrame, storeDir: String): Unit =
    initModel.write.mode("overwrite").parquet(versionPath(storeDir, 0L))

  /** One micro-batch's maintenance fold — exposed (not inlined in the
    * foreachBatch closure) so specs can replay a batch under its own
    * batchId and assert the store is bit-identical (the exactly-once
    * contract made testable).
    *
    * `batch`: (doc_id LONG, minus_text STRING?, plus_text STRING?) — one
    * row per changed document, already filtered to the model's reference
    * predicate; a removed doc carries (old, null), an added doc
    * (null, new), a changed doc (old, new). */
  def applyBatch(batch: DataFrame, batchId: Long, storeDir: String): Unit = {
    val s = batch.sparkSession
    val prev = s.read.parquet(versionPath(storeDir, batchId))
    // The SIGNED fold (see the order-independence note above): one
    // map-side-combined sum over (stored sums ∪ ± occurrence legs),
    // dropping only exact zeros — [[AdditiveCounts.maintain]]'s shape
    // minus its per-step positive clamp, which would break
    // commutativity for a reordered feed's negative partials.
    prev.select(col("bigram"), col("cnt").as("d"))
      .unionByName(LmScore.bigrams(batch.filter(col("minus_text").isNotNull),
          "doc_id", "minus_text")
        .select(col("bigram"), lit(-1L).as("d")))
      .unionByName(LmScore.bigrams(batch.filter(col("plus_text").isNotNull),
          "doc_id", "plus_text")
        .select(col("bigram"), lit(1L).as("d")))
      .groupBy(col("bigram")).agg(sum(col("d")).as("cnt"))
      .filter(col("cnt") =!= 0)
      .write.mode("overwrite").parquet(versionPath(storeDir, batchId + 1))
  }

  /** Run the maintenance stream over a change feed until the source is
    * drained (Trigger.AvailableNow — the catch-up/backfill mode; a live
    * deployment would use a processing-time trigger on the same query).
    * [[writeInit]] must have seeded `storeDir` first. */
  def maintainCountsStream(deltaEvents: DataFrame, storeDir: String,
                           checkpointDir: String): StreamingQuery =
    deltaEvents.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch((batch: DataFrame, batchId: Long) =>
        applyBatch(batch, batchId, storeDir))
      .start()

  /** The highest version's positive-count MODEL view (the signed
    * partial sums are the store's internal representation — see the
    * order-independence note; a consumer never sees a non-positive
    * count, exactly as the batch family's maintain guarantees). */
  def latestModel(s: SparkSession, storeDir: String): DataFrame = {
    val p = new Path(storeDir)
    val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
    require(fs.exists(p), s"empty model store at $storeDir — writeInit first")
    val vs = fs.listStatus(p).toSeq.map(_.getPath.getName)
      .filter(_.matches("v\\d+")).map(_.drop(1).toLong)
    require(vs.nonEmpty, s"empty model store at $storeDir — writeInit first")
    s.read.parquet(versionPath(storeDir, vs.max))
      .filter(col("cnt") > 0)
  }
}
