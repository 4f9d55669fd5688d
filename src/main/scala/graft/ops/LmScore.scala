package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** N-gram language-model quality scoring — the CCNet/KenLM step of a
  * real curation pipeline (score every document against an LM trained
  * on a clean reference corpus; low-likelihood docs are filtered or
  * down-mixed), in the one formulation another engine can replay
  * bit-for-bit: INTEGER LOG2-COUNT scoring. A float log-probability
  * sum is order-dependent under distributed aggregation and could
  * never hash-match; instead each document bigram found in the
  * reference model contributes the BIT LENGTH of its reference count
  * (= floor(log2(cnt)) + 1 — `length(bin(cnt))`, exact in both
  * engines), unseen bigrams contribute 0. The total is a monotone
  * integer proxy for Σ log2 count(w_{i-1} w_i) — the unnormalized
  * log-likelihood under a count LM — and the reported `lm_score` is
  * the single division total_bits/n_bigrams (one double op on exact
  * integers, bit-identical everywhere).
  *
  * Scale shape: the model is a BUILD-ONCE artifact (bigram → count
  * over the reference subset — the BPE-merge train-once/serve-many
  * contract; at 100 TB it is far too big to broadcast, so scoring is
  * a hash-partitioned equi-join on the bigram), and the per-doc
  * aggregation is map-side combined. One corpus pass to score.
  */
object LmScore {

  /** Lowercased adjacent word pairs of `textCol`: (id, bigram). */
  private[graft] def bigrams(df: DataFrame, idCol: String,
                             textCol: String): DataFrame = {
    val ws = TextStats.words(lower(col(textCol)))
    df.select(col(idCol).cast("long").as("doc_id"),
        explode(zip_with(
          slice(ws, lit(1), size(ws) - 1), slice(ws, lit(2), size(ws) - 1),
          (a, b) => concat_ws(" ", a, b))).as("bigram"))
  }

  /** The reference count model: (bigram, cnt) over `refPred` docs. */
  def trainCounts(docs: DataFrame, idCol: String, textCol: String,
                  refPred: Column): DataFrame =
    bigrams(docs.filter(refPred), idCol, textCol)
      .groupBy(col("bigram")).agg(count(lit(1)).as("cnt"))

  /** INCREMENTAL count-model maintenance across corpus snapshots — the
    * q145/q148/q153 pattern applied to the reference LM artifact, and
    * the easiest member of the incremental family to prove: a count
    * model is an ABELIAN-GROUP aggregate (per-bigram sums commute and
    * have inverses), so the new model is EXACTLY
    *
    *   prev  −  bigrams(removed ∪ changed docs' OLD text)
    *         +  bigrams(added ∪ changed docs' NEW text),
    *
    * with rows whose count reaches zero dropped (a full retrain never
    * emits them). Unchanged documents' text is never re-read or
    * re-tokenized — at 100 TB a crawl-over-crawl retrain re-reads the
    * corpus; this pass reads the delta. One shuffle on the bigram
    * combines all three legs (union → map-side-combined sum).
    *
    * `delta` is [[SnapshotDelta.diffHashed]] output (doc_id, status).
    * `oldDocs`/`newDocs` are the two snapshots ALREADY FILTERED by the
    * model's reference predicate. Domain requirement: the predicate
    * must be stable for content-unchanged docs across snapshots (e.g.
    * a language tag) — a doc that flips predicate with identical text
    * reads 'unchanged' in the hash delta and would be missed; a
    * predicate over the text itself is safe because any flip implies
    * 'changed'. */
  def maintainCounts(prevModel: DataFrame, oldDocs: DataFrame,
                     newDocs: DataFrame, idCol: String, textCol: String,
                     delta: DataFrame): DataFrame = {
    val del = delta.select(col("doc_id").as(idCol), col("status"))
    // Single-shuffle combine via [[AdditiveCounts.maintain]] — see its
    // scaladoc for the group-axioms proof and the measured cost of
    // pre-aggregating the legs separately.
    AdditiveCounts.maintain(prevModel, "bigram",
      bigrams(
        oldDocs.join(del.filter(col("status").isin("removed", "changed"))
          .select(col(idCol)), Seq(idCol), "left_semi"),
        idCol, textCol),
      bigrams(
        newDocs.join(del.filter(col("status").isin("added", "changed"))
          .select(col(idCol)), Seq(idCol), "left_semi"),
        idCol, textCol))
  }

  /** [[maintainCounts]]'s guarded ONE-TASK multi-step tier — the
    * q153/q145/q176 treatment for the CHAINED maintenance cell (q175):
    * each distributed step is a hash-diff join plus a model-sized
    * combine, so a three-step chain is ~15 delta-sized stages of pure
    * scheduling latency at serving scale (measured ~3.5 s at sf0.1
    * against a 0.05 s twin — stage floor, not data). The model and each
    * step's (old, new) reference-predicate-filtered snapshots ride a
    * tagged union (no driver collect) into one `mapPartitions` task
    * that folds every step's delta into a count map:
    *
    *   - statuses re-derive per step from [[LocalText.contentHash]]
    *     equality (exactly the stored-hash comparison the distributed
    *     [[graft.ops.SnapshotDelta.diffHashed]] makes — a doc's status
    *     is a pure function of its own old/new text);
    *   - bigrams replicate [[bigrams]] bit-for-bit (lower → Spark-trim →
    *     split, adjacent pairs joined by one space);
    *   - zero/negative counts carry ACROSS steps in the map and are
    *     dropped once at the end — equivalent to the distributed
    *     per-step `cnt > 0` filter because with true snapshot deltas
    *     the running per-bigram sum always equals the intermediate
    *     corpus's true count (never negative), and a key at zero that
    *     reappears later re-counts identically either way.
    *
    * Same contract as [[maintainCounts]]: the reference predicate must
    * be stable for content-unchanged docs. `snapshots` is the
    * CONSECUTIVE crawl chain (first = the stored model's snapshot, each
    * later one folds as a step against its predecessor) — one tagged
    * branch per snapshot, so each is scanned exactly once. Callers
    * guard fail-CLOSED on Catalyst size stats (see the q175 cell). */
  def maintainCountsChainLocal(prevModel: DataFrame,
                               snapshots: Seq[DataFrame],
                               idCol: String, textCol: String): DataFrame = {
    require(snapshots.size >= 2, "maintainCountsChainLocal needs >= 2 snapshots")
    val spark = prevModel.sparkSession
    import spark.implicits._
    val nullL = lit(null).cast("long")
    val nSnaps = snapshots.size
    val modelRows = prevModel.select(lit(-1).as("_snap"), nullL.as("_id"),
      col("bigram").as("_s"), col("cnt").cast("long").as("_cnt"))
    val snapRows = snapshots.zipWithIndex.map { case (df, i) =>
      df.select(lit(i).as("_snap"), col(idCol).cast("long").as("_id"),
        col(textCol).as("_s"), nullL.as("_cnt"))
    }.reduce(_ unionByName _)
    modelRows.unionByName(snapRows).coalesce(1).mapPartitions { it =>
      import scala.collection.mutable
      val model = mutable.HashMap.empty[String, Long]
      val snaps = Array.fill(nSnaps)(mutable.HashMap.empty[Long, String])
      it.foreach { row =>
        val tag = row.getInt(0)
        if (tag < 0) model.update(row.getString(2), row.getLong(3))
        else snaps(tag).update(row.getLong(1),
          if (row.isNullAt(2)) "" else row.getString(2))
      }
      def addBigrams(text: String, sign: Long): Unit = {
        val ws = LocalText.words(text.toLowerCase())
        var i = 0
        while (i < ws.length - 1) {
          val bg = ws(i) + " " + ws(i + 1)
          model.update(bg, model.getOrElse(bg, 0L) + sign)
          i += 1
        }
      }
      var k = 0
      while (k < nSnaps - 1) {
        val old = snaps(k); val neu = snaps(k + 1)
        neu.foreach { case (id, t) =>
          old.get(id) match {
            case None => addBigrams(t, 1L) // added
            case Some(ot) =>
              // Raw equality short-circuits the hash (the
              // AdditiveCounts.maintainChainLocal discipline): equal
              // strings have equal content hashes by definition, so the
              // UNCHANGED majority pays one string compare per step and
              // only raw-differing pairs ever pay an md5.
              if (ot != t &&
                  LocalText.contentHash(ot) != LocalText.contentHash(t)) {
                addBigrams(ot, -1L); addBigrams(t, 1L) // changed
              }
          }
        }
        old.foreach { case (id, t) =>
          if (!neu.contains(id)) addBigrams(t, -1L) } // removed
        k += 1
      }
      model.iterator.filter(_._2 > 0L)
    }.toDF("bigram", "cnt")
  }

  /** Score EVERY document against the (possibly stored) count model:
    * (doc_id, n_bigrams, n_hits, total_bits, lm_score). Documents with
    * fewer than two words score 0 over 0 bigrams. */
  def score(docs: DataFrame, idCol: String, textCol: String,
            model: DataFrame): DataFrame = {
    val scored = bigrams(docs, idCol, textCol)
      .join(model, Seq("bigram"), "left")
      .groupBy(col("doc_id"))
      .agg(
        count(lit(1)).as("n_bigrams"),
        count(col("cnt")).as("n_hits"),
        coalesce(sum(length(bin(col("cnt"))).cast("long")), lit(0L))
          .as("total_bits"))
    docs.select(col(idCol).cast("long").as("doc_id"))
      .join(scored, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        coalesce(col("n_hits"), lit(0L)).as("n_hits"),
        coalesce(col("total_bits"), lit(0L)).as("total_bits"),
        when(coalesce(col("n_bigrams"), lit(0L)) > 0,
          col("total_bits").cast("double") / col("n_bigrams").cast("double"))
          .otherwise(lit(0.0)).as("lm_score"))
  }
}
