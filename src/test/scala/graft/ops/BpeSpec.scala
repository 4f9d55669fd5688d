package graft.ops

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

import graft.SparkSpec

class BpeSpec extends SparkSpec {

  private def docs(texts: String*) = {
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(
        texts.zipWithIndex.map { case (t, i) => Row(i.toLong, t) }, 2), schema)
  }

  test("train reproduces the hand-computed merge sequence and segmentations") {
    // corpus: the x2, then x1
    //   round 1: pairs t-h:3, h-e:3, e-n:1 -> tie 3, pair-asc picks "h e"
    //   round 2: t-he:3, he-n:1          -> "t he" -> "the"
    //   round 3: the-n:1                 -> "the n" -> "then"
    val out = Bpe.train(docs("the then", "the"), "text", rounds = 3, topWords = 5)
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2),
        r.getLong(3), r.getInt(4)))
    val merges = out.filter(_._1 == "merge").sortBy(_._5)
    merges.map(m => (m._5, m._2, m._3, m._4)).toSeq shouldBe Seq(
      (1, "h e", "he", 3L), (2, "t he", "the", 3L), (3, "the n", "then", 1L))
    val words = out.filter(_._1 == "word").map(w => w._2 -> w._3).toMap
    words shouldBe Map("the" -> "the", "then" -> "then")
  }

  test("merges never cross symbol boundaries (the naive string-replace bug)") {
    // corpus: "xa b" tokens 'xa' and 'b' never exist... build words where a
    // learned pair's TEXT occurs inside a larger symbol: words "ab" (x3)
    // and "cab" (x2). Round 1 pairs: a-b:5, c-a:2 -> "a b" -> "ab".
    // In "c a b" only positions (2,3) match; the rewrite must give
    // "c ab" — a substring replace on "c a b" would also work here, so
    // round 2 is the discriminator: pairs now c-ab:2 -> merge "c ab" ->
    // "cab"; a boundary-crossing implementation would have corrupted the
    // symbol stream and disagree.
    val out = Bpe.train(docs("ab ab ab cab cab"), "text", rounds = 2, topWords = 5)
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2),
        r.getLong(3), r.getInt(4)))
    val merges = out.filter(_._1 == "merge").sortBy(_._5)
    merges.map(m => (m._5, m._2, m._3, m._4)).toSeq shouldBe Seq(
      (1, "a b", "ab", 5L), (2, "c ab", "cab", 2L))
    val words = out.filter(_._1 == "word").map(w => w._2 -> w._3).toMap
    words shouldBe Map("ab" -> "ab", "cab" -> "cab")
  }

  test("self-pairs are excluded from selection; distinct-pair runs merge all at once") {
    // "aaaa" would make a-a dominate; with self-pairs excluded the top
    // pair must be a distinct one, and "abab" merges BOTH occurrences of
    // (a, b) in one round.
    val out = Bpe.train(docs("abab abab aaaa"), "text", rounds = 1, topWords = 5)
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2),
        r.getLong(3), r.getInt(4)))
    val m = out.filter(_._1 == "merge").head
    (m._2, m._3) shouldBe ("a b", "ab")
    val words = out.filter(_._1 == "word").map(w => w._2 -> w._3).toMap
    words("abab") shouldBe "ab ab" // both matches merged in one round
    words("aaaa") shouldBe "a a a a" // untouched: self-pair never selected
  }

  test("divergence vs HF/SentencePiece pinned: run-only corpus learns no merges") {
    // HuggingFace tokenizers / SentencePiece WOULD merge (a,a)->"aa"
    // here; this trainer's self-pair exclusion means the corpus has no
    // selectable pair at all. The round must be a graceful no-op (empty
    // top frame must NOT annihilate the vocabulary via the join) and
    // every later round likewise.
    val out = Bpe.train(docs("aaaa aa bbb"), "text", rounds = 3, topWords = 5)
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2),
        r.getLong(3), r.getInt(4)))
    out.filter(_._1 == "merge") shouldBe empty
    val words = out.filter(_._1 == "word").map(w => w._2 -> w._3).toMap
    words shouldBe Map("aaaa" -> "a a a a", "aa" -> "a a", "bbb" -> "b b b")
  }

  test("encode applies trained merges in rank order; untrained words stay chars") {
    import org.apache.spark.sql.functions.col
    val corpus = docs("the then", "the")
    val merges = Bpe.train(corpus, "text", rounds = 3, topWords = 1)
      .filter(col("kind") === "merge")
    // merges: (1) h e -> he, (2) t he -> the, (3) the n -> then
    val out = Bpe.encode(docs("the then zebra"), "doc_id", "text", merges, nMerges = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    out.toSeq shouldBe Seq((0L, 3L, 7L, "the | then | z e b r a"))
    // requesting more merges than were trained is a graceful no-op
    val out4 = Bpe.encode(docs("the then zebra"), "doc_id", "text", merges, nMerges = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    out4.toSeq shouldBe out.toSeq
  }

  test("encode keeps word order and skips non-latin tokens") {
    import org.apache.spark.sql.functions.col
    val merges = Bpe.train(docs("ab ab"), "text", rounds = 1, topWords = 1)
      .filter(col("kind") === "merge") // (a b) -> ab
    val out = Bpe.encode(docs("cd 42 ab x9 ab"), "doc_id", "text", merges, nMerges = 1)
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getString(3)))
    out.toSeq shouldBe Seq((3L, 4L, "c d | ab | ab"))
  }

  test("encodeWith falls back to character segmentation for OOV words") {
    import org.apache.spark.sql.functions.col
    // vocab snapshot built from corpus A ("ab ab" -> merge (a,b)->ab);
    // corpus B carries "cd", absent from the snapshot — it must appear
    // as its character segmentation and COUNT, never silently drop
    val corpusA = docs("ab ab")
    val merges = Bpe.train(corpusA, "text", rounds = 1, topWords = 1)
      .filter(col("kind") === "merge")
    val vocab = Bpe.encodeVocab(corpusA, "text", merges, nMerges = 1)
    val out = Bpe.encodeWith(docs("ab cd"), "doc_id", "text", vocab)
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getString(3)))
    out.toSeq shouldBe Seq((2L, 3L, "ab | c d"))
  }

  // a corpus rich enough to sustain 32+ merges: ten repeated multi-char
  // words, ~45 learnable pairs before exhaustion
  private def richDocs = docs(
    "alpha beta gamma delta epsilon zeta theta iota kappa lambda " +
      "alpha beta gamma delta epsilon alpha beta gamma alpha beta alpha",
    "lambda kappa iota theta zeta epsilon delta gamma beta alpha " +
      "lambda kappa iota theta lambda kappa lambda")

  test("iterative trainer is bit-identical to the unrolled plan on a shared budget") {
    val wf = Bpe.wordFreq(richDocs, "text")
    // maxLocalWords = 0 pins the UNROLLED plan (the r18 small-budget
    // one-task tier would otherwise take this small vocabulary).
    val unrolled = Bpe.trainFromWordFreq(wf, rounds = 5, topWords = 100,
        maxLocalWords = 0L)
      .collect().map(_.toSeq).sortBy(_.toString)
    val iterative = Bpe.trainIterative(wf, rounds = 5, topWords = 100)
      .collect().map(_.toSeq).sortBy(_.toString)
    iterative shouldBe unrolled
    spark.catalog.clearCache()
  }

  test("small-budget one-task tier is bit-identical to the unrolled plan") {
    // The r18 tier (q129 straddle protection): Catalyst-stats-guarded
    // trainLocal at rounds <= UnrollLimit must reproduce the unrolled
    // in-plan training row for row — merges, exhaustion, word report.
    // The word-freq table rides PARQUET like the deployed artifact
    // (Queries.bpeWordFreq): a live aggregation's Catalyst stats read
    // 8 EiB (fail-closed → unrolled) and the tier under test would
    // never run — this test originally compared unrolled against
    // unrolled until the guard assertion below caught it.
    val wfDir = java.nio.file.Files
      .createTempDirectory("bpe_tier_wf").toString
    Bpe.wordFreq(richDocs, "text").write.mode("overwrite").parquet(wfDir)
    val wf = spark.read.parquet(wfDir)
    // NOT vacuous: the guard must actually fire on this frame — if the
    // stats estimate ever drifts past the tier bound, the default call
    // below would silently take the unrolled path and the equality
    // would hold forever for the wrong reason. Fail loudly instead.
    val st = wf.queryExecution.optimizedPlan.stats
    assert(st.sizeInBytes <= BigInt(8L << 20) &&
        st.rowCount.forall(_ <= BigInt(200000L)),
      s"tier guard no longer fires on the test frame (stats: $st) — " +
        "the equality below would be vacuous")
    val local = Bpe.trainFromWordFreq(wf, rounds = 3, topWords = 100)
      .collect().map(_.toSeq).sortBy(_.toString)
    val unrolled = Bpe.trainFromWordFreq(wf, rounds = 3, topWords = 100,
        maxLocalWords = 0L)
      .collect().map(_.toSeq).sortBy(_.toString)
    local should not be empty
    local shouldBe unrolled
    spark.catalog.clearCache()
  }

  test("one-task trainer tier is bit-identical to the iterative loop at depth") {
    // Same budget, both shapes: the in-memory tier (default guards) vs
    // the distributed loop (maxLocalWords = 0 forces it) — the pair
    // counts, the (cnt desc, pair asc) tie-break, the simultaneous a≠b
    // rewrite, exhaustion behavior and the top-word report must all
    // coincide row-for-row.
    val wf = Bpe.wordFreq(richDocs, "text")
    val local = Bpe.trainFromWordFreq(wf, rounds = 40, topWords = 100)
      .collect().map(_.toSeq).sortBy(_.toString)
    val dist = Bpe.trainFromWordFreq(wf, rounds = 40, topWords = 100,
        maxLocalWords = 0L)
      .collect().map(_.toSeq).sortBy(_.toString)
    local shouldBe dist
    spark.catalog.clearCache()
  }

  test("tier equality holds for supplementary-plane words (code-point split)") {
    // ADVICE r14 #1's hazard pinned: the distributed tier's
    // split(word, '') splits at CODE POINTS, so the one-task tier must
    // too — a UTF-16 code-unit split would give '𝕒𝕓𝕒𝕓' six initial
    // symbols (surrogate halves) instead of four and train different
    // merges. Words chosen so surrogate-pair symbols actually win
    // merges, and a private-use BMP char (U+E000 — BELOW '𝕒' in UTF-8
    // order but ABOVE it in UTF-16 code-unit order, the documented
    // utf8Less hazard zone) rides along to keep the tie-break honest.
    import spark.implicits._
    val wf = Seq(
      ("𝕒𝕓𝕒𝕓", 5L),
      ("𝕒𝕓x", 4L),
      ("𝕒𝕒", 3L),
      ("plain", 2L)).toDF("word", "n")
    val local = Bpe.trainFromWordFreq(wf, rounds = 8, topWords = 10)
      .collect().map(_.toSeq).sortBy(_.toString)
    val dist = Bpe.trainFromWordFreq(wf, rounds = 8, topWords = 10,
        maxLocalWords = 0L)
      .collect().map(_.toSeq).sortBy(_.toString)
    local should not be empty
    local shouldBe dist
    spark.catalog.clearCache()
  }

  test("a 32-merge budget trains end-to-end and extends the unrolled prefix") {
    // BPE is greedy: the first 6 merges of a 32-round run must equal the
    // 6-round unrolled training exactly (prefix property), and the run
    // must deliver all 32 rounds (the corpus sustains them).
    val wf = Bpe.wordFreq(richDocs, "text")
    val out32 = Bpe.trainFromWordFreq(wf, rounds = 32, topWords = 100)
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2),
        r.getLong(3), r.getInt(4)))
    val merges32 = out32.filter(_._1 == "merge").sortBy(_._5)
    merges32.map(_._5).toSeq shouldBe (1 to 32)
    val merges6 = Bpe.trainFromWordFreq(wf, rounds = 6, topWords = 1,
        maxLocalWords = 0L) // pin the unrolled prefix reference
      .collect().filter(_.getString(0) == "merge")
      .map(r => (r.getInt(4), r.getString(1), r.getString(2), r.getLong(3)))
      .sortBy(_._1)
    merges32.take(6).map(m => (m._5, m._2, m._3, m._4)).toSeq shouldBe
      merges6.toSeq
    // every ten-word symbol fully merged well before round 32: the top
    // words' final segmentations must be single symbols
    val words = out32.filter(_._1 == "word").map(w => w._2 -> w._3).toMap
    words("alpha") shouldBe "alpha"
    words("lambda") shouldBe "lambda"
    spark.catalog.clearCache()
  }

  test("encodeVocab at a 32-merge budget reproduces the trainer's segmentations") {
    import org.apache.spark.sql.functions.col
    val wf = Bpe.wordFreq(richDocs, "text")
    val trained = Bpe.trainFromWordFreq(wf, rounds = 32, topWords = 100)
    val trainSegs = trained.filter(col("kind") === "word")
      .collect().map(r => r.getString(1) -> r.getString(2)).toMap
    val merges = trained.filter(col("kind") === "merge")
    val vocabSegs = Bpe.encodeVocab(richDocs, "text", merges, nMerges = 32)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    vocabSegs shouldBe trainSegs
    spark.catalog.clearCache()
  }

  test("q163's unit table sustains the full 512-merge budget (never vacuous)") {
    // The corpus's word vocabulary is ~31 words (plain word-BPE
    // exhausts at ~67 merges); the boundary-marked 4-gram units exist
    // exactly so the deep budget is real. A shrink in mergeable
    // material would silently hollow out the q163 cell — pin it.
    import org.apache.spark.sql.functions._
    val out = graft.Queries.q163BpeTrain512(spark, "/root/testdata/sf0.001")
      .filter(col("kind") === "merge")
      .agg(count(lit(1)).as("m"), max(col("ord")).as("mo")).head
    out.getLong(0) shouldBe 512L
    out.getInt(1) shouldBe 512
    spark.catalog.clearCache()
  }

  test("q169's unit table sustains the full 8192-merge budget (never vacuous)") {
    // q163's 4-gram/4096 table exhausts near ~4k merges on this
    // corpus; the 12-gram/2048 table was measured to sustain 8192 at
    // every SF — pin it so a unit-derivation change can't hollow out
    // the production-depth cell.
    import org.apache.spark.sql.functions._
    val out = graft.Queries.q169BpeTrain8k(spark, "/root/testdata/sf0.001")
      .filter(col("kind") === "merge")
      .agg(count(lit(1)).as("m"), max(col("ord")).as("mo")).head
    out.getLong(0) shouldBe 8192L
    out.getInt(1) shouldBe 8192
    spark.catalog.clearCache()
  }

  test("rounds beyond pair exhaustion are a no-op, not an empty result") {
    // one real merge exists (t,o); rounds 2..4 find nothing — the word
    // rows and the single merge row must survive all four rounds.
    val out = Bpe.train(docs("to to"), "text", rounds = 4, topWords = 5)
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2),
        r.getLong(3), r.getInt(4)))
    val merges = out.filter(_._1 == "merge").sortBy(_._5)
    merges.map(m => (m._5, m._2, m._3, m._4)).toSeq shouldBe Seq(
      (1, "t o", "to", 2L))
    val words = out.filter(_._1 == "word").map(w => w._2 -> w._3).toMap
    words shouldBe Map("to" -> "to")
  }
}
