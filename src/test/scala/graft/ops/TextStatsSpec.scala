package graft.ops

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.SparkSpec

class TextStatsSpec extends SparkSpec {

  test("normalize: lowercase, trim, collapse whitespace") {
    collectCol[String](strDf("t", Seq("  The\t QUICK   fox "))
      .select(TextStats.normalize(col("t")))) shouldBe Seq("the quick fox")
  }

  test("word/char counts and avg word length") {
    val d = strDf("t", Seq("ab cde f"))
    collectCol[Int](d.select(TextStats.wordCount(col("t")))) shouldBe Seq(3)
    collectCol[Int](d.select(TextStats.charCount(col("t")))) shouldBe Seq(8)
    collectCol[Double](d.select(TextStats.avgWordLen(col("t")))) shouldBe Seq(2.0)
  }

  test("punctuation and stopword ratios") {
    val d = strDf("t", Seq("the cat, the hat!"))
    collectCol[Double](d.select(TextStats.punctRatio(col("t")))).head shouldBe (2.0 / 17.0)
    // words: the cat, the hat! → stopword tokens: the, the (punct glued to others)
    collectCol[Double](d.select(TextStats.stopwordRatio(col("t")))).head shouldBe 0.5
  }

  test("tokenEstimate: ceil(run/4) over word, digit, punct runs") {
    // "hello world 42!" → [hello][world][4][2][!] → 2+2+1+1+1 = 7
    collectCol[Long](strDf("t", Seq("hello world 42!"))
      .select(TextStats.tokenEstimate(col("t")))) shouldBe Seq(7L)
  }

  test("langId picks the marker-dominant language, priority breaks ties") {
    val d = strDf("t", Seq(
      "the cat sat of the mat and a dog is here",
      "el gato de la casa y el perro que ladra",
      "der Hund und die Katze ist das Tier",
      "le chat et les chiens est des animaux",
      "xyzzy plugh"))
    collectCol[String](d.select(TextStats.langId(col("t")))) shouldBe
      Seq("en", "es", "de", "fr", "und")
  }

  test("langScoresById path predicts identically to the HOF langId on random text") {
    import org.apache.spark.sql.Row
    val vocab = Seq("the", "a", "of", "and", "is", "el", "la", "de", "que", "y",
      "der", "die", "und", "ist", "das", "le", "les", "et", "est", "des",
      "cat", "perro", "hund", "chat", "xyzzy", "")
    val r = new scala.util.Random(13)
    val rows = (1 to 300).map { i =>
      Row(i.toLong, (0 until r.nextInt(20)).map(_ => vocab(r.nextInt(vocab.size)))
        .mkString(" "))
    }
    val d = df("doc_id BIGINT, t STRING", rows)
    val viaHof = d.select(col("doc_id"), TextStats.langId(col("t")).as("p"))
      .collect().map(x => x.getLong(0) -> x.getString(1)).toMap
    val viaAgg = TextStats.langScoresById(d, Seq("doc_id"), "t")
      .select(col("doc_id"), TextStats.langIdFromScores.as("p"))
      .collect().map(x => x.getLong(0) -> x.getString(1)).toMap
    viaAgg shouldBe viaHof
  }

  test("rollingHash: known Rabin-Karp left-fold value") {
    // 'abc' → ((0*31+97)*31+98)*31+99 = 96354
    collectCol[Long](strDf("t", Seq("abc"))
      .select(TextStats.rollingHash(col("t")))) shouldBe Seq(96354L)
  }

  test("repetitionRatio: 0 for short/unique text, high for looping text") {
    val d = strDf("t", Seq(
      "ab",                       // too short for a 3-gram → 0
      "one two three four five",  // all 3-grams unique → 0
      "spam spam spam spam spam spam")) // one distinct 3-gram of 4 → 0.75
    collectCol[Double](d.select(TextStats.repetitionRatio(col("t")))) shouldBe
      Seq(0.0, 0.0, 0.75)
  }

  test("contentHash is normalization-invariant") {
    val out = collectCol[String](strDf("t", Seq("A  b", "a b"))
      .select(TextStats.contentHash(col("t"))))
    out(0) shouldBe out(1)
  }

  test("property: qualityScore stays within [0,1] for any non-empty text") {
    val gen = Gen.nonEmptyListOf(
      Gen.oneOf(Gen.alphaNumStr.suchThat(_.nonEmpty), Gen.const("the"), Gen.const("!!!")))
      .map(_.mkString(" "))
    val prop = Prop.forAll(gen) { text =>
      val q = collectCol[Double](strDf("t", Seq(text))
        .select(TextStats.qualityScore(col("t")))).head
      q >= 0.0 && q <= 1.0
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(10), prop)
    assert(res.passed, res.status.toString)
  }
}
