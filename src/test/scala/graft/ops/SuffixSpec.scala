package graft.ops

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

import graft.SparkSpec

class SuffixSpec extends SparkSpec {

  private def docs(texts: String*) = {
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(
        texts.zipWithIndex.map { case (t, i) => Row(i.toLong, t) }, 2), schema)
  }

  /** Every semantic case runs through BOTH tiers — the one-task
    * suffix-sort fast path (default guards) and the distributed prefix
    * doubling (forced with maxLocalPositions = 0) — and the tiers must
    * agree with each other as well as with the expectation. */
  private def spans(d: org.apache.spark.sql.DataFrame, minLen: Int) = {
    def run(local: Long) =
      Suffix.maximalSpansExact(d, "doc_id", "text", minLen,
          maxLocalPositions = local)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getString(3))).toSet
    val fast = run(2000000L)
    val dist = run(0L)
    withClue("local-tier vs distributed-tier divergence: ") {
      fast shouldBe dist
    }
    fast
  }

  test("a single cross-document duplicate reports one exact span per side") {
    val out = spans(docs("q w e r t y", "z q w e r x"), minLen = 2)
    out shouldBe Set(
      (0L, 0L, 4L, "q w e r"),
      (1L, 1L, 4L, "q w e r"))
    spark.catalog.clearCache()
  }

  test("the weld case splits: two partners each covering half yield two spans, not one") {
    // doc0 "a b c d": "a b c" occurs in doc1, "b c d" in doc2, but
    // "a b c d" occurs nowhere else. The round-12 envelope welded
    // doc0's two runs into one 4-token span; exact reporting must give
    // the two true maximal spans.
    val out = spans(docs("a b c d", "x a b c y", "z b c d w"), minLen = 3)
    out shouldBe Set(
      (0L, 0L, 3L, "a b c"),
      (0L, 1L, 3L, "b c d"),
      (1L, 1L, 3L, "a b c"),
      (2L, 1L, 3L, "b c d"))
    spark.catalog.clearCache()
  }

  test("overlapping same-document occurrences count (run-of-equal-tokens case)") {
    // "a a a a a": the 4-gram starting at 0 recurs (overlapping) at 1,
    // so both position-0 and position-1 spans are maximal (neither
    // contains the other) and both must be reported.
    val out = spans(docs("a a a a a"), minLen = 2)
    out shouldBe Set(
      (0L, 0L, 4L, "a a a a"),
      (0L, 1L, 4L, "a a a a"))
    spark.catalog.clearCache()
  }

  test("span-free corpora report nothing") {
    spans(docs("p q r s", "t u v w"), minLen = 2) shouldBe Set.empty
    spark.catalog.clearCache()
  }

  test("where no weld exists, the exact inventory equals the envelope inventory") {
    val d = docs("q w e r t y", "z q w e r x", "m n o p")
    val exact = spans(d, minLen = 2)
    val envelope = ExactSpans.maximalSpans(d, "doc_id", "text", minLen = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getString(3))).toSet
    exact shouldBe envelope
    spark.catalog.clearCache()
  }

  test("longestDupPrefix keeps rows for corpora with no suffix-order successor") {
    // A one-position corpus has no (seq, seq+1) adjacency pair at all;
    // the contract ("rows for every in-domain position") still demands
    // the (doc_id, 0, 1, f=0) row.
    for (local <- Seq(2000000L, 0L)) {
      val got = Suffix.longestDupPrefix(docs("solo"), "doc_id", "text",
          maxLocalPositions = local)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      withClue(s"maxLocalPositions=$local: ") {
        got.toSet shouldBe Set((0L, 0L, 1L, 0L))
      }
    }
    spark.catalog.clearCache()
  }

  test("longestDupPrefix matches an all-lengths brute force on random corpora") {
    val rnd = new scala.util.Random(42)
    for (trial <- 1 to 3) {
      val alphabet = Vector("a", "b", "c", "d")
      val texts = (0 until 5).map { _ =>
        (0 until (6 + rnd.nextInt(8)))
          .map(_ => alphabet(rnd.nextInt(alphabet.size))).mkString(" ")
      }
      val toks = texts.map(_.split(" ").toVector)
      // brute force: count every m-gram across the corpus, all m
      val counts = scala.collection.mutable.Map[String, Int]()
      for (ws <- toks; p <- ws.indices; m <- 1 to (ws.size - p))
        counts.updateWith(ws.slice(p, p + m).mkString(" ")) {
          c => Some(c.getOrElse(0) + 1)
        }
      val expected = (for {
        (ws, d) <- toks.zipWithIndex
        p <- ws.indices
      } yield {
        val f = (1 to (ws.size - p)).reverse
          .find(m => counts(ws.slice(p, p + m).mkString(" ")) >= 2)
          .getOrElse(0)
        (d.toLong, p.toLong) -> f.toLong
      }).toMap
      val got = Suffix.longestDupPrefix(docs(texts: _*), "doc_id", "text")
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(3))
        .toMap
      withClue(s"trial $trial corpus=$texts: ") { got shouldBe expected }
      val gotDist = Suffix.longestDupPrefix(docs(texts: _*), "doc_id",
          "text", maxLocalPositions = 0L)
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(3))
        .toMap
      withClue(s"trial $trial distributed tier, corpus=$texts: ") {
        gotDist shouldBe expected
      }
      spark.catalog.clearCache()
    }
  }
}
