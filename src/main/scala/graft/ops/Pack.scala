package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Training-batch assembly operators for the LLM-data-pipeline extension
  * (SURVEY §7.5; BASELINE.json north star) — sequence packing and mixture
  * resampling, the two steps between a curated corpus and a token stream.
  *
  * Both are deterministic (md5-bucket arithmetic via [[Sampling.hashBucket]],
  * no RNG state), so a rerun — or the DuckDB oracle — reproduces every
  * assignment bit-for-bit.
  */
object Pack {

  /** Greedy sequential sequence packing: documents are packed in id order
    * into fixed token-budget training sequences; a document is assigned to
    * the sequence where its running offset starts (the standard
    * approximate-packing rule — no document splitting, sequences may
    * overflow by at most one document's tokens).
    *
    * Scale design: packing is sharded by a hash of the id into `shards`
    * independent streams, so the running-sum window partitions by shard —
    * parallel across the cluster, never a single global sort. At 100 TB,
    * `shards` ≈ number of desired output files; each shard's window is one
    * sorted partition. (A single global packing order would serialize the
    * corpus through one task — that formulation is wrong at scale, so it
    * is deliberately not offered.)
    *
    * Output: one row per document with its shard, token count, sequence id
    * within the shard, and starting offset within the sequence.
    */
  def packSequences(docs: DataFrame, idCol: String, textCol: String,
                    budget: Int, shards: Int): DataFrame = {
    require(budget > 0, s"budget must be positive; got $budget")
    val w = Window.partitionBy(col("shard")).orderBy(col(idCol))
    docs
      .select(col(idCol),
        Sampling.hashBucket(col(idCol), shards).cast("int").as("shard"),
        TextStats.wordCount(col(textCol)).as("n_tokens"))
      .withColumn("_start",
        sum(col("n_tokens").cast("long")).over(w) - col("n_tokens"))
      .withColumn("seq_id", floor(col("_start") / budget))
      .withColumn("seq_offset", col("_start") - col("seq_id") * budget)
      .select(col(idCol), col("shard"), col("n_tokens"),
        col("seq_id"), col("seq_offset"))
  }

  /** [[packSequences]] over PRE-COMPUTED token counts — the form a real
    * pipeline runs once a tokenizer exists: `counts` carries one row per
    * document with the ACTUAL token count (e.g. [[Bpe.encode]]'s
    * n_bpe_tokens) instead of the whitespace proxy. Same sharded
    * running-sum shape; n_tokens is BIGINT here (real tokenizers
    * overflow INT at long-document scale). */
  def packSequencesBy(counts: DataFrame, idCol: String, tokenCol: String,
                      budget: Int, shards: Int): DataFrame = {
    require(budget > 0, s"budget must be positive; got $budget")
    val w = Window.partitionBy(col("shard")).orderBy(col(idCol))
    counts
      .select(col(idCol),
        Sampling.hashBucket(col(idCol), shards).cast("int").as("shard"),
        col(tokenCol).cast("long").as("n_tokens"))
      .withColumn("_start",
        sum(col("n_tokens")).over(w) - col("n_tokens"))
      .withColumn("seq_id", floor(col("_start") / budget))
      .withColumn("seq_offset", col("_start") - col("seq_id") * budget)
      .select(col(idCol), col("shard"), col("n_tokens"),
        col("seq_id"), col("seq_offset"))
  }

  /** Deterministic weighted mixture resampling: each document is emitted
    * `weight/100` times (epochs), plus one more with probability
    * `(weight mod 100)/100` decided by its hash bucket — the standard
    * up/down-sampling step that turns per-source mixture weights (250 =
    * 2.5 epochs, 25 = keep 25%) into a concrete training multiset.
    *
    * Narrow map + explode: no shuffle, no RNG — the fractional keep is the
    * same md5-bucket rule as [[Sampling.keep]], so reruns and other
    * engines reproduce the exact multiset. Output has one row per
    * (document, epoch) with epoch in [1, n_copies].
    */
  def mixtureResample(docs: DataFrame, idCol: String,
                      weightCol: org.apache.spark.sql.Column): DataFrame = {
    val frac = weightCol % 100
    val nCopies = (weightCol / 100).cast("int") +
      when(Sampling.hashBucket(concat(lit("mix:"), col(idCol).cast("string"))) < frac, 1)
        .otherwise(0)
    docs
      .withColumn("weight", weightCol.cast("int"))
      .withColumn("n_copies", nCopies)
      .filter(col("n_copies") >= 1)
      .withColumn("epoch", explode(sequence(lit(1), col("n_copies"))))
      .drop("n_copies")
  }
}
