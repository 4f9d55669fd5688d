package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Deterministic corpus-curation sampling — train/val/test assignment and
  * stratified subsampling for the LLM-data-pipeline extension (SURVEY §7.5).
  *
  * The hash basis is md5 of the key (engine-portable; xxhash64 is
  * Spark-only), folded to a uniform bucket with plain ascii/modulo
  * arithmetic so any engine — including the DuckDB oracle — reproduces the
  * assignment bit-for-bit. Determinism is the point: re-running the
  * pipeline, or computing the split on a different engine, must put every
  * document in the same fold; `rand()`-based sampling can't promise that
  * and silently leaks val/test into train on reruns.
  *
  * All pure `Column` composition: narrow, shuffle-free, codegen'd.
  */
object Sampling {

  /** Uniform pseudo-random bucket in [0, buckets) from the key: first two
    * hex chars of md5, combined with ascii arithmetic (portable — no
    * hex-to-int builtin shared across engines). Two hex chars = 256
    * distinct states, so `buckets` must stay ≤ 256 for uniformity-ish;
    * 100 (percent granularity) is the intended use. */
  def hashBucket(key: Column, buckets: Int = 100): Column = {
    require(buckets > 0 && buckets <= 256, s"buckets must be in [1,256]; got $buckets")
    val h = md5(key.cast("string"))
    (ascii(substring(h, 1, 1)) * 31 + ascii(substring(h, 2, 1))) % buckets
  }

  /** Deterministic fold assignment: 'train'/'val'/'test' by hash bucket —
    * same document, same fold, on every engine and every rerun. */
  def split(key: Column, trainPct: Int = 80, valPct: Int = 10): Column = {
    require(trainPct > 0 && valPct >= 0 && trainPct + valPct <= 100,
      s"invalid split percentages: train=$trainPct val=$valPct")
    val b = hashBucket(key)
    when(b < trainPct, lit("train"))
      .when(b < trainPct + valPct, lit("val"))
      .otherwise(lit("test"))
  }

  /** Deterministic ~pct% keep-filter, independent of the fold split (uses
    * a salted key so sampling and splitting don't correlate). Use per
    * stratum for stratified subsampling:
    * `docs.filter(Sampling.keep(concat(col("lang"), col("doc_id")), 10))`. */
  def keep(key: Column, pct: Int): Column = {
    require(pct >= 0 && pct <= 100, s"pct must be in [0,100]; got $pct")
    hashBucket(concat(lit("smp:"), key.cast("string"))) < pct
  }
}
