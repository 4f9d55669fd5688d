package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

/** SCALE-REGIME correctness dump (VERDICT r17 "what's missing" #2): the
  * incremental-maintenance family, hash-checked at the 10× corpus. The
  * sf1 growth gate ([[Bench]]'s scale block) TIMES these cells at 10×
  * data but nothing hash-matches there, and maintenance behavior is
  * density-dependent (the q176 L=4 closure phenomenon) — a closure bug
  * that only manifests at higher window density would pass every
  * sf0.001/sf0.01/sf0.1 differential. This main synthesizes the same
  * deterministic 10× corpus the growth gate measures
  * ([[ScaleCorpus.ensure]] — word-suffix-salted documents, rotated
  * embeddings), runs each incremental cell against it, and dumps
  * results + oracle SQL exactly like [[Verify]]; `tools/check_scale.py`
  * then replays the oracles in DuckDB over the SAME 10× parquet and
  * hash-compares → `SCALECHECK_r{N}.json`.
  *
  * Usage: VerifyScale <sf0.1-dir> <outDir> [queryPrefixes]
  */
object VerifyScale {

  /** The incremental/maintenance cells whose batch≡incremental oracles
    * are worth re-proving at 10× density (VERDICT r17 names the first
    * twelve; the q181–q184 chains share the same machinery), plus —
    * since the round-18 narrow-assignment reshape — the ANN family
    * whose physical paths changed wholesale (fold argmin, bounded
    * in-task ranking, carried vectors, no pair distinct): tie-break
    * and cap arithmetic are exactly the kind of logic whose bugs are
    * density-dependent (more centroids at 10× ⇒ more near-ties, a
    * frac-path cap that rounds differently, a slice bound that clips
    * a rank the filter wanted), so each reshaped cell's full-replay
    * oracle is re-proved at the 10× corpus too.
    *
    * COVERAGE CAVEAT (r18 self-review): [[ScaleCorpus]] salts copied
    * words with a `_k` suffix, which the all-lowercase 12-gram window
    * filter rejects — so for the window-unit cells (q173, q184) this
    * gate re-proves the maintenance arithmetic over 10× the DOCUMENTS,
    * but the qualifying-window population (and hence window DENSITY)
    * is unchanged from 1×. The density-dependent closure class is
    * still covered for the span family by q176, whose window keys
    * tokenize without the alpha filter and do grow here (its 10×
    * oracle is a minutes-long recompute); a q173-family density regime
    * would need salted words that stay all-lowercase — noted rather
    * than silently claimed. */
  val ScaleChecked: Seq[String] = Seq(
    "q145_incremental_corpus", "q148_incremental_minhash",
    "q153_incremental_clusters", "q155_incremental_lm",
    "q159_incremental_ivf", "q160_incremental_dsir",
    "q171_incremental_bm25", "q173_vocab_maintain",
    "q174_incremental_semdedup", "q176_incremental_span_dedup",
    "q179_incremental_ivfpq", "q180_incremental_cms",
    "q181_stream_cms_chain", "q182_stream_dsir_chain",
    "q183_stream_bm25df_chain", "q184_stream_bpe_units_chain",
    // r18 ANN-reshape regression set (run with prefix filters to scope).
    // q83e is deliberately ABSENT: running it here caught two things.
    // (1) A real panel bug — exactTopKL2's ground-truth panel lacked
    // q117's base-corpus standing-panel cap, so at 10× the gate divided
    // a 40-query serving result by a 400-query reference (fixed: the
    // cap now matches, oracle mirrored). (2) With the panels aligned,
    // q117's recall genuinely falls below the 0.3 floor at 10× — the
    // ADC shortlist is k·oversample = 320 rows/query BY DESIGN (the
    // corpus-independent rerank is the 100 TB serving shape), so its
    // share of the probed candidates drops 10× and the deliberately
    // low-resolution 3-bit codebooks can't rank the true neighbors
    // into it. That is the documented property of the tiny
    // oracle-replayable model (q117's comment: production holds recall
    // with 8-bit codebooks, not a corpus-proportional shortlist), the
    // same decay q83d's frac-probing fix addressed for the ROUTER —
    // and q83d passes here, confirming the scale-stable half. q117's
    // full hash match above pins the 10× DERIVATION; the gate's floor
    // stays calibrated to the serving regime (≤ sf0.1).
    "q52_ann_ivf_topk", "q83d_ivf_recall",
    "q101_kmeans_cluster", "q102_semantic_dedup", "q103_trained_ivf_topk",
    "q116_pq_topk", "q117_ivfpq_topk")

  def main(args: Array[String]): Unit = {
    val (sfDir, outDir) = (args(0), args(1))
    val only: String => Boolean = args.lift(2) match {
      case Some(pfx) =>
        val ps = pfx.split(",").toSeq; name => ps.exists(name.startsWith)
      case None => _ => true
    }
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      // sized to the 10x data (the growth gate's setting), not the
      // small-cell tuning
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.codegen.cache.maxEntries", "10000")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val scaleDir = ScaleCorpus.ensure(spark, sfDir, copies = 10)
    println(s"[verify-scale] corpus: $scaleDir")
    new java.io.File(outDir).mkdirs()
    ScaleChecked.filter(only).foreach { name =>
      val t0 = System.nanoTime()
      try {
        SparkEntry.queries(name)(spark, scaleDir).coalesce(1)
          .write.mode("overwrite").parquet(s"$outDir/$name")
        println(f"[verify-scale] $name: ${(System.nanoTime() - t0) / 1e9}%.1f s")
      } catch { case e: Throwable =>
        System.err.println(s"[verify-scale] $name failed: ${e.getMessage}")
      }
      spark.catalog.clearCache()
    }
    val json = SparkEntry.oracleSql.view
      .filterKeys(k => ScaleChecked.contains(k) && only(k)).toMap
      .map { case (k, v) => s"${Verify.q(k)}: ${Verify.q(v)}" }
      .mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    Files.writeString(Paths.get(s"$outDir/scale_dir.txt"), scaleDir)
    spark.stop()
  }
}
