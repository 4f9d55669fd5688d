package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data Selection via Importance Resampling (DSIR, Xie et al. 2023,
  * public): score every raw document by how much more likely its
  * hashed-n-gram features are under a TARGET distribution (a small
  * high-quality / in-domain set) than under the RAW distribution, then
  * select per-source top documents by that importance weight. This is
  * the data-selection step between quality FILTERING
  * ([[QualityFilter]] — absolute per-doc gates) and mixture RESAMPLING
  * (q142 — per-source rates): it ranks individual documents by target
  * affinity.
  *
  * Portability contract (same as [[LmScore]]): a float
  * log-probability-ratio sum is order-dependent under distributed
  * aggregation and can never hash-match another engine, so each feature
  * occurrence contributes the BIT LENGTH of its smoothed bucket count —
  * `length(bin(cnt + 1))` = floor(log2(cnt+1)) + 1, exact in every
  * engine — and the document's importance weight is the exact integer
  * `Σ bitlen(target_cnt+1) − Σ bitlen(raw_cnt+1)`, a monotone proxy for
  * `Σ log p_target(f) − log p_raw(f)` with add-one smoothing.
  *
  * Scale shape — the reason DSIR hashes features at all: the model is
  * NOT a vocabulary (unbounded, like [[LmScore]]'s bigram table, which
  * must hash-partition-join) but a FIXED 4096-bucket histogram, so both
  * models broadcast at any corpus size, and scoring is one corpus pass
  * with two broadcast joins + one map-side-combined aggregation. The
  * bucket is the first [[BucketHexChars]] hex chars of the feature's
  * md5 — a string key another engine reproduces verbatim (the portable
  * MinHash idiom; no hex→int conversion to get wrong).
  */
object Dsir {

  /** Bucket key width in md5 hex chars: 3 → 16³ = 4096 buckets. */
  val BucketHexChars = 3

  /** Hashed feature stream WITH multiplicity (DSIR scores occurrence
    * counts, not presence): lowercased word unigrams + adjacent bigrams
    * of `textCol`, each mapped to its md5-prefix bucket. Empty/blank
    * features (empty text splits to [""]) are dropped on both engines. */
  private[ops] def features(df: DataFrame, idCol: String, textCol: String,
                            passthrough: Seq[String] = Nil): DataFrame = {
    // Materialize the split ONCE in a projection below the explode: the
    // feature expression references the words array five times (unigram
    // list + two slices + two sizes), and inlined into Generate each
    // reference re-splits the text per row. CollapseProject keeps the
    // alias because it is non-cheap and multiply-referenced.
    val ws = col("_ws")
    val bi = zip_with(
      slice(ws, lit(1), size(ws) - 1), slice(ws, lit(2), size(ws) - 1),
      (a, b) => concat_ws(" ", a, b))
    val extra = passthrough.map(col)
    df.select(col(idCol).cast("long").as("doc_id") +:
        TextStats.words(lower(col(textCol))).as("_ws") +: extra: _*)
      .select(col("doc_id") +: explode(concat(ws, bi)).as("f") +: extra: _*)
      .filter(length(trim(col("f"))) > 0)
      .select(col("doc_id") +:
        substring(md5(col("f")), 1, BucketHexChars).as("bucket") +: extra: _*)
  }

  /** Train a bucket-count model over the docs matching `pred`:
    * (bucket, cnt). ≤ 4096 rows by construction — a build-once stored
    * artifact that stays broadcastable forever. */
  def trainBucketCounts(docs: DataFrame, idCol: String, textCol: String,
                        pred: Column): DataFrame =
    features(docs.filter(pred), idCol, textCol)
      .groupBy(col("bucket")).agg(count(lit(1)).as("cnt"))

  /** INCREMENTAL bucket-model maintenance across corpus snapshots —
    * [[LmScore.maintainCounts]]'s abelian-group argument applied to the
    * DSIR histograms: the new snapshot's model is exactly
    * prev − features(removed/changed docs' OLD text) +
    * features(added/changed docs' NEW text), zero-count buckets
    * dropped; unchanged text never re-read or re-hashed. Same domain
    * rule on the split predicate as there: it must be stable for
    * content-unchanged docs across snapshots (the %-of-id split is).
    * `delta` is [[SnapshotDelta.diffHashed]] output; `oldDocs`/`newDocs`
    * are the snapshots ALREADY FILTERED by the model's split. */
  def maintainBucketCounts(prevModel: DataFrame, oldDocs: DataFrame,
                           newDocs: DataFrame, idCol: String,
                           textCol: String, delta: DataFrame): DataFrame = {
    val del = delta.select(col("doc_id").as(idCol), col("status"))
    AdditiveCounts.maintain(prevModel, "bucket",
      features(
        oldDocs.join(del.filter(col("status").isin("removed", "changed"))
          .select(col(idCol)), Seq(idCol), "left_semi"),
        idCol, textCol),
      features(
        newDocs.join(del.filter(col("status").isin("added", "changed"))
          .select(col(idCol)), Seq(idCol), "left_semi"),
        idCol, textCol))
  }

  /** [[maintainBucketCounts]] for BOTH split models in one pass: the
    * target/raw splits partition the SAME documents, so maintaining
    * them separately scans the delta's text (and the corpus parquet
    * behind it) twice and pays two combine shuffles for streams one
    * `(model, bucket)` aggregation covers. Each leg extracts features
    * once over ALL delta docs and tags rows by the split predicate;
    * the stored models union in tagged, and ONE map-side-combined sum
    * yields both maintained histograms: (model∈{target,raw}, bucket,
    * cnt). Result is row-identical to running [[maintainBucketCounts]]
    * per split (DsirSpec asserts it). */
  def maintainSplitModels(prevTarget: DataFrame, prevRaw: DataFrame,
                          oldDocs: DataFrame, newDocs: DataFrame,
                          idCol: String, textCol: String,
                          delta: DataFrame, targetPred: Column): DataFrame = {
    val del = delta.select(col("doc_id").as(idCol), col("status"))
    val tag = when(targetPred, "target").otherwise("raw")
    def leg(docs: DataFrame, statuses: Seq[String], d: Long): DataFrame =
      features(
        docs.withColumn("_model", tag)
          .join(del.filter(col("status").isin(statuses: _*))
            .select(col(idCol)), Seq(idCol), "left_semi"),
        idCol, textCol, passthrough = Seq("_model"))
        .select(col("_model").as("model"), col("bucket"), lit(d).as("d"))
    prevTarget.select(lit("target").as("model"), col("bucket"), col("cnt").as("d"))
      .unionByName(prevRaw.select(lit("raw").as("model"), col("bucket"), col("cnt").as("d")))
      .unionByName(leg(oldDocs, Seq("removed", "changed"), -1L))
      .unionByName(leg(newDocs, Seq("added", "changed"), 1L))
      .groupBy(col("model"), col("bucket")).agg(sum(col("d")).as("cnt"))
      .filter(col("cnt") > 0)
  }

  /** Signed split-model feature legs for a streaming micro-batch
    * ([[graft.streaming.MaintainStream]]'s generic keyed fold — the
    * DSIR instantiation of the versioned exactly-once store):
    * [[maintainSplitModels]]'s ± legs in change-feed form — one
    * (model ∈ {target, raw}, bucket, d = ±1) row per removed/added
    * feature occurrence, both split histograms maintained by ONE fold.
    * Same domain rule as the batch maintainers: `targetPred` must be
    * stable for content-unchanged docs across snapshots (the %-of-id
    * splits are). A removed doc carries (old, null), an added doc
    * (null, new), a changed doc (old, new). */
  def signedSplitLegs(batch: DataFrame, idCol: String, minusCol: String,
                      plusCol: String, targetPred: Column): DataFrame = {
    val tag = when(targetPred, "target").otherwise("raw")
    def leg(textCol: String, d: Long): DataFrame =
      features(batch.filter(col(textCol).isNotNull).withColumn("_model", tag),
        idCol, textCol, passthrough = Seq("_model"))
        .select(col("_model").as("model"), col("bucket"), lit(d).as("d"))
    leg(minusCol, -1L).unionByName(leg(plusCol, 1L))
  }

  /** The q182 CHAIN tier: [[maintainSplitModels]] generalized to a
    * CONSECUTIVE crawl chain (the [[LmScore.maintainCountsChainLocal]]
    * treatment at the selection-model layer) — n−1 fused target+raw
    * maintenance steps folded in ONE task. Statuses re-derive per doc
    * from content hashes in-task; the in-task feature stream replicates
    * [[features]] bit-for-bit (lowercase → Spark-trim split → unigrams
    * + adjacent space-joined bigrams, trim-empty features dropped,
    * md5-prefix buckets); signed partials carry across steps and
    * non-positives drop once at the end (equivalent to the per-step
    * clamp for true snapshot deltas). `targetPred` rides the tagged
    * union as a per-doc boolean — same stability contract as the batch
    * maintainers. Output: (model ∈ {target, raw}, bucket, cnt). */
  def maintainSplitChainLocal(prevTarget: DataFrame, prevRaw: DataFrame,
                              snapshots: Seq[DataFrame],
                              idCol: String, textCol: String,
                              targetPred: Column): DataFrame = {
    require(snapshots.size >= 2, "maintainSplitChainLocal needs >= 2 snapshots")
    val spark = prevTarget.sparkSession
    import spark.implicits._
    val nullL = lit(null).cast("long")
    val nullS = lit(null).cast("string")
    val nSnaps = snapshots.size
    def modelRows(m: DataFrame, tag: String): DataFrame =
      m.select(lit(-1).as("_snap"), lit(tag).as("_m"),
        col("bucket").as("_b"), col("cnt").cast("long").as("_cnt"),
        nullL.as("_id"), nullS.as("_s"), lit(false).as("_t"))
    val snapRows = snapshots.zipWithIndex.map { case (df, k) =>
      df.select(lit(k).as("_snap"), nullS.as("_m"), nullS.as("_b"),
        nullL.as("_cnt"), col(idCol).cast("long").as("_id"),
        col(textCol).as("_s"), coalesce(targetPred, lit(false)).as("_t"))
    }.reduce(_ unionByName _)
    val hexChars = BucketHexChars
    modelRows(prevTarget, "target").unionByName(modelRows(prevRaw, "raw"))
      .unionByName(snapRows).coalesce(1).mapPartitions { it =>
      import scala.collection.mutable
      val model = mutable.HashMap.empty[(String, String), Long]
      val snaps = Array.fill(nSnaps)(mutable.HashMap.empty[Long, String])
      val isTarget = mutable.HashMap.empty[Long, Boolean]
      it.foreach { row =>
        val tag = row.getInt(0)
        if (tag < 0) model.update((row.getString(1), row.getString(2)),
          row.getLong(3))
        else {
          snaps(tag).update(row.getLong(4),
            if (row.isNullAt(5)) "" else row.getString(5))
          isTarget.update(row.getLong(4), row.getBoolean(6))
        }
      }
      // features() bit-for-bit: unigrams + adjacent bigrams of the
      // lowercased Spark-split word array, trim-empty features dropped.
      // Buckets memoized per DISTINCT feature (the Cms-tier cache): the
      // fold hashes every occurrence otherwise and feature streams
      // repeat heavily — the cache turns ~10^6 digests into
      // feature-vocabulary-many.
      val bucketCache = mutable.HashMap.empty[String, String]
      def bucketOf(f: String): String =
        bucketCache.getOrElseUpdate(f,
          LocalText.md5Hex(f).substring(0, hexChars))
      def bucketsOf(text: String): Array[String] = {
        val ws = LocalText.words(text.toLowerCase())
        val feats = ws.iterator ++
          ws.iterator.zip(ws.iterator.drop(1)).map { case (a, b) => a + " " + b }
        feats.filter(f => LocalText.trimSpaces(f).nonEmpty)
          .map(bucketOf).toArray
      }
      def fold(id: Long, text: String, sign: Long): Unit = {
        val m = if (isTarget.getOrElse(id, false)) "target" else "raw"
        bucketsOf(text).foreach { b =>
          model.update((m, b), model.getOrElse((m, b), 0L) + sign)
        }
      }
      var k = 0
      while (k < nSnaps - 1) {
        val old = snaps(k); val neu = snaps(k + 1)
        neu.foreach { case (id, t) =>
          old.get(id) match {
            case None => fold(id, t, 1L) // added
            case Some(ot) =>
              // Raw equality short-circuits the hash (the
              // AdditiveCounts.maintainChainLocal discipline): equal
              // strings have equal content hashes by definition, so the
              // UNCHANGED majority pays one string compare per step and
              // only raw-differing pairs ever pay an md5.
              if (ot != t &&
                  LocalText.contentHash(ot) != LocalText.contentHash(t)) {
                fold(id, ot, -1L); fold(id, t, 1L) // changed
              }
          }
        }
        old.foreach { case (id, t) =>
          if (!neu.contains(id)) fold(id, t, -1L) } // removed
        k += 1
      }
      model.iterator.filter(_._2 > 0L)
        .map { case ((m, b), c) => (m, b, c) }
    }.toDF("model", "bucket", "cnt")
  }

  /** Integer importance weight of EVERY document against the (stored)
    * target and raw bucket models: (doc_id, n_feats, target_bits,
    * raw_bits, importance). Buckets absent from a model count 0
    * (smoothed to bitlen(1) = 1). Documents with no features score 0.
    * Both model joins broadcast (≤ 4096 rows). */
  def importance(docs: DataFrame, idCol: String, textCol: String,
                 targetModel: DataFrame, rawModel: DataFrame): DataFrame = {
    val t = broadcast(targetModel.select(col("bucket"), col("cnt").as("_tc")))
    val r = broadcast(rawModel.select(col("bucket"), col("cnt").as("_rc")))
    val per = features(docs, idCol, textCol)
      .join(t, Seq("bucket"), "left")
      .join(r, Seq("bucket"), "left")
      .groupBy(col("doc_id"))
      .agg(
        count(lit(1)).as("n_feats"),
        sum(length(bin(coalesce(col("_tc"), lit(0L)) + 1)).cast("long"))
          .as("target_bits"),
        sum(length(bin(coalesce(col("_rc"), lit(0L)) + 1)).cast("long"))
          .as("raw_bits"))
    docs.select(col(idCol).cast("long").as("doc_id"))
      .join(per, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_feats"), lit(0L)).as("n_feats"),
        coalesce(col("target_bits"), lit(0L)).as("target_bits"),
        coalesce(col("raw_bits"), lit(0L)).as("raw_bits"),
        (coalesce(col("target_bits"), lit(0L)) -
          coalesce(col("raw_bits"), lit(0L))).as("importance"))
  }
}
