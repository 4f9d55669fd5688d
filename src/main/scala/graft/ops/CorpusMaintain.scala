package graft.ops

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** ONE-JOB incremental corpus-build maintenance for one-task corpora —
  * the q148/q153 treatment applied to the manifest layer (the last
  * latency-floor cell): the distributed incremental chain (hash-diff
  * join, stored-manifest reuse joins, global canonical recompute,
  * delta-only decontamination + LM gate, five-way assembly) is ~30 AQE
  * stages — pure per-stage scheduling latency when the corpus is
  * megabytes. This tier runs the IDENTICAL maintenance in ONE task.
  *
  * Inputs arrive as a single tagged union (per-doc rows ∪ eval window
  * keys ∪ LM model rows) so no driver-side collect ever happens — the
  * lookup tables ride the same coalesced frame into the task. The
  * in-memory replica reproduces, bit-for-bit:
  *
  *   - the snapshot diff: stored fingerprint vs md5(normalized text)
  *     ([[LocalText.contentHash]] — Spark trim/lower/ws semantics);
  *   - reuse: an unchanged doc takes its stored manifest row verbatim
  *     (and an unchanged doc absent from the stored manifest stays
  *     absent); changed/added docs re-run the quality band;
  *   - the GLOBAL canonical recompute: min doc id per content hash
  *     over stored (unchanged, prev-quality) + recomputed (delta,
  *     quality) hashes — never the text;
  *   - stages 3–4 for delta survivors AND promoted docs only
  *     (canonical stolen/vacated — the q145 flip cases): 8-token
  *     window probe against the eval-key set with ALL occurrences cut
  *     via the merged-interval sweep ([[ExactSpans.keptIdx]]'s gap
  *     semantics), the ≤`dropPct`% keep rule, and the bigram LM
  *     hit-rate gate against the stored count model;
  *   - the assembly CASE logic (reuse vs recompute vs short-circuit)
  *     and the shard assignment.
  *
  * Callers guard on Catalyst size stats and fail CLOSED to the
  * distributed chain; IncrementalBuildSpec asserts this tier equals
  * the distributed full rebuild row-for-row, and the q145 oracle's
  * full-rebuild replay certifies it cross-engine every round. */
object CorpusMaintain {

  // format: off
  /** See object scaladoc. `newDocs` = (doc_id, text) TRAINING docs of
    * the new snapshot (eval excluded by the caller); `prevHashes` =
    * (doc_id, content_hash) over ALL old docs; `prevBuild` = the stored
    * previous manifest incl. its content_hash; `evalKeys` = (key)
    * distinct `spanLen`-token windows; `lmModel` = (bigram, cnt). */
  // format: on
  def manifestLocal(newDocs: DataFrame, prevHashes: DataFrame,
                    prevBuild: DataFrame, evalKeys: DataFrame,
                    lmModel: DataFrame, spanLen: Int, dropPct: Int,
                    wcLo: Long, wcHi: Long, shards: Int): DataFrame = {
    val spark = newDocs.sparkSession
    import spark.implicits._
    val nullS = lit(null).cast("string")
    val nullB = lit(null).cast("boolean")
    val nullL = lit(null).cast("long")
    val docRows = newDocs
      .select(col("doc_id").cast("long").as("doc_id"), col("text"))
      .join(prevHashes.select(col("doc_id").cast("long").as("doc_id"),
        col("content_hash").as("_ph")), Seq("doc_id"), "left")
      .join(prevBuild.select(col("doc_id").cast("long").as("doc_id"),
        col("pass_quality").as("_pq"), col("pass_exact").as("_pe"),
        col("pass_decon").as("_pd"), col("pass_lm").as("_pl"),
        col("final_text").as("_pf"), col("content_hash").as("_bh")),
        Seq("doc_id"), "left")
      .select(lit("d").as("_t"), col("doc_id"), col("text"), col("_ph"),
        col("_pq"), col("_pe"), col("_pd"), col("_pl"), col("_pf"),
        col("_bh"), nullS.as("_k"), nullL.as("_cnt"))
    val keyRows = evalKeys.select(lit("k").as("_t"), nullL.as("doc_id"),
      nullS.as("text"), nullS.as("_ph"), nullB.as("_pq"), nullB.as("_pe"),
      nullB.as("_pd"), nullB.as("_pl"), nullS.as("_pf"), nullS.as("_bh"),
      col("key").as("_k"), nullL.as("_cnt"))
    val modelRows = lmModel.select(lit("m").as("_t"), nullL.as("doc_id"),
      nullS.as("text"), nullS.as("_ph"), nullB.as("_pq"), nullB.as("_pe"),
      nullB.as("_pd"), nullB.as("_pl"), nullS.as("_pf"), nullS.as("_bh"),
      col("bigram").as("_k"), col("cnt").cast("long").as("_cnt"))

    docRows.unionByName(keyRows).unionByName(modelRows)
      .coalesce(1).mapPartitions { it =>
        val evalSet = new java.util.HashSet[String]()
        val model = new java.util.HashSet[String]() // presence is all the gate reads
        final case class Doc(id: Long, text: String, prevHash: String,
                             hasPrev: Boolean, pq: Boolean, pe: Boolean,
                             pd: Boolean, pl: Boolean, pf: String,
                             bh: String)
        val docs = scala.collection.mutable.ArrayBuffer.empty[Doc]
        it.foreach { row =>
          row.getString(0) match {
            case "k" => evalSet.add(row.getString(10))
            case "m" => model.add(row.getString(10))
            case _ =>
              docs += Doc(row.getLong(1),
                if (row.isNullAt(2)) "" else row.getString(2),
                if (row.isNullAt(3)) null else row.getString(3),
                hasPrev = !row.isNullAt(9) || !row.isNullAt(4),
                pq = !row.isNullAt(4) && row.getBoolean(4),
                pe = !row.isNullAt(5) && row.getBoolean(5),
                pd = !row.isNullAt(6) && row.getBoolean(6),
                pl = !row.isNullAt(7) && row.getBoolean(7),
                pf = if (row.isNullAt(8)) null else row.getString(8),
                bh = if (row.isNullAt(9)) null else row.getString(9))
          }
        }
        // diff + stage 1 + hash collection for the global canon
        val canonMin = new java.util.HashMap[String, java.lang.Long]()
        def canonAdd(h: String, id: Long): Unit = {
          val cur = canonMin.get(h)
          if (cur == null || id < cur) canonMin.put(h, id)
        }
        // dQuality: Some(q) for delta docs (recomputed), None = unchanged
        val state = docs.map { d =>
          val newHash = LocalText.contentHash(d.text)
          val unchanged = d.prevHash != null && d.prevHash == newHash
          if (unchanged) {
            if (d.hasPrev && d.pq && d.bh != null) canonAdd(d.bh, d.id)
            (d, None: Option[Boolean], if (d.hasPrev && d.pq) d.bh else null)
          } else {
            val wc = LocalText.words(d.text).length.toLong
            val q = wc >= wcLo && wc <= wcHi
            if (q) canonAdd(newHash, d.id)
            (d, Some(q), if (q) newHash else null)
          }
        }
        // stages 3-4 for delta survivors + promoted unchanged docs
        def decon(text: String): (Boolean, String) = {
          val ws = LocalText.words(text.toLowerCase())
          val n = ws.length
          // marked 0-based starts of eval-matching windows
          val starts = scala.collection.mutable.ArrayBuffer.empty[Int]
          if (n >= spanLen) {
            val sb = new java.lang.StringBuilder()
            var p = 0
            while (p <= n - spanLen) {
              sb.setLength(0)
              var j = 0
              while (j < spanLen) {
                if (j > 0) sb.append(' ')
                sb.append(ws(p + j)); j += 1
              }
              if (evalSet.contains(sb.toString)) starts += p
              p += 1
            }
          }
          // covered = union of [s+1, s+spanLen] (1-based inclusive) —
          // O(n + spans·L), trivially equal to keptIdx's gap sweep
          val covered = new Array[Boolean](n + 1)
          starts.foreach { s =>
            var t = s + 1; val e = math.min(s + spanLen, n)
            while (t <= e) { covered(t) = true; t += 1 }
          }
          val kept = scala.collection.mutable.ArrayBuffer.empty[Int]
          var tok = 1
          while (tok <= n) { if (!covered(tok)) kept += tok; tok += 1 }
          val nRemoved = n - kept.length
          // Long arithmetic like the distributed rewrite's n_removed/
          // n_tokens columns — Int*100 would wrap on a >21M-token doc
          val keep = nRemoved.toLong * 100 <= n.toLong * dropPct
          val text2 =
            if (!keep) ""
            else kept.map(t => ws(t - 1)).mkString(" ")
          (keep, text2)
        }
        def lmPass(deconText: String): Boolean = {
          val ws = LocalText.words(deconText.toLowerCase())
          if (ws.length < 2) return false
          val nb = ws.length - 1
          var hits = 0L
          var i = 0
          while (i < nb) {
            if (model.contains(ws(i) + " " + ws(i + 1))) hits += 1
            i += 1
          }
          hits * 2 >= nb && nb > 0
        }
        val out = scala.collection.mutable.ArrayBuffer
          .empty[(Long, Boolean, Boolean, Boolean, Boolean, Boolean, String, Int)]
        state.foreach { case (d, dQuality, hash) =>
          val isDelta = dQuality.isDefined
          if (isDelta || d.hasPrev) { // unchanged-without-prev stays absent
            val passQuality = dQuality.getOrElse(d.pq)
            val passExact = hash != null && canonMin.get(hash).longValue == d.id
            val recomputed = isDelta || (passExact && !d.pe)
            var passDecon = false
            var passLm = false
            var finalText = ""
            if (passQuality && passExact) {
              if (recomputed) {
                val (dd, dtext) = decon(d.text)
                passDecon = dd
                if (dd) passLm = lmPass(dtext)
                finalText = if (dd && passLm) dtext else ""
              } else {
                passDecon = d.pd
                passLm = d.pl
                finalText =
                  if (d.pd && d.pl && d.pf != null) d.pf else ""
              }
            }
            val keep = passQuality && passExact && passDecon && passLm
            val shard = if (keep) (d.id % shards).toInt else -1
            out += ((d.id, passQuality, passExact, passDecon, passLm,
              keep, if (keep) finalText else "", shard))
          }
        }
        out.iterator
      }
      .toDF("doc_id", "pass_quality", "pass_exact", "pass_decon",
        "pass_lm", "keep", "final_text", "shard")
  }
}
