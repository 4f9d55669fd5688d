package graft.ops

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpec

class LmScoreSpec extends SparkSpec {

  private def docs(rows: (Long, String)*) = {
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType)))
    spark.createDataFrame(spark.sparkContext.parallelize(
      rows.map { case (i, t) => Row(i, t) }, 2), schema)
  }

  test("bit-length weights, misses, and the averaged score are exact") {
    val d = docs(
      1L -> "a b a b",  // reference: bigrams "a b" x2, "b a" x1
      2L -> "a b c",    // reference: "a b", "b c" -> counts a_b=3, b_a=1, b_c=1
      20L -> "a b c d", // scored: bits(3)=2 + bits(1)=1 + miss 0 = 3 over 3
      21L -> "x")       // no bigrams
    val model = LmScore.trainCounts(d, "doc_id", "text", col("doc_id") < 10)
    val out = LmScore.score(d, "doc_id", "text", model)
      .collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))))
      .toMap
    out(20L) shouldBe ((3L, 2L, 3L, 1.0))
    out(21L) shouldBe ((0L, 0L, 0L, 0.0))
    // reference docs score against their own counts too
    out(2L) shouldBe ((2L, 2L, 3L, 1.5))
  }

  private def statusDelta(rows: (Long, String)*) =
    docs(rows.map { case (i, _) => (i, "") }: _*)
      .select(col("doc_id"))
      .join(
        docs(rows: _*).select(col("doc_id"), col("text").as("status")),
        Seq("doc_id"))
      .select(col("doc_id"), col("status"))

  test("maintainCounts equals a full retrain across add, remove, change, and count-to-zero") {
    val old = docs(
      1L -> "a b a b",   // unchanged
      2L -> "a b c",     // changed: old text contributes -("a b","b c")
      3L -> "z z",       // removed: "z z" count drops to ZERO -> row must vanish
      4L -> "a b")       // unchanged
    val neu = docs(
      1L -> "a b a b",
      2L -> "c d",       // new text of the changed doc
      4L -> "a b",
      5L -> "b c b c")   // added
    val delta = statusDelta(1L -> "unchanged", 2L -> "changed",
      3L -> "removed", 4L -> "unchanged", 5L -> "added")
    val prev = LmScore.trainCounts(old, "doc_id", "text", lit(true))
    val inc = LmScore.maintainCounts(prev, old, neu, "doc_id", "text", delta)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val fresh = LmScore.trainCounts(neu, "doc_id", "text", lit(true))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    inc shouldBe fresh
    // the zero-count row really vanished (not emitted as cnt=0)
    inc.contains("z z") shouldBe false
    inc("b c") shouldBe 2L // changed doc's old "b c" removed, added doc's x2
  }

  test("property: maintainCounts equals a fresh retrain on random snapshot deltas") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    val word = Gen.oneOf("a", "b", "c", "d", "e")
    val text = Gen.chooseNum(0, 6).flatMap(n => Gen.listOfN(n, word)).map(_.mkString(" "))
    val corpus = Gen.chooseNum(2, 8).flatMap { n =>
      Gen.listOfN(n, text).map(_.zipWithIndex.map { case (t, i) => (i.toLong, t) })
    }
    // random fate per doc: keep / change / remove, plus random additions
    val scenario = for {
      old <- corpus
      fates <- Gen.listOfN(old.size, Gen.oneOf("unchanged", "changed", "removed"))
      nAdd <- Gen.chooseNum(0, 3)
      added <- Gen.listOfN(nAdd, text)
    } yield (old, fates, added.zipWithIndex.map { case (t, i) => (100L + i, t) })
    val prop = Prop.forAll(scenario) { case (old, fates, added) =>
      val changedTexts = old.zip(fates).map {
        case ((id, t), "changed") => (id, t + " z")
        case ((id, t), _) => (id, t)
      }
      val neu = changedTexts.zip(fates).collect {
        case ((id, t), f) if f != "removed" => (id, t)
      } ++ added
      val delta = old.zip(fates).map { case ((id, _), f) => (id, f) } ++
        added.map { case (id, _) => (id, "added") }
      val prev = LmScore.trainCounts(docs(old: _*), "doc_id", "text", lit(true))
      val inc = LmScore.maintainCounts(prev, docs(old: _*), docs(neu: _*),
          "doc_id", "text",
          df("doc_id BIGINT, status STRING", delta.map(d => Row(d._1, d._2))))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val fresh = LmScore.trainCounts(docs(neu: _*), "doc_id", "text", lit(true))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      inc == fresh
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(8), prop)
    assert(res.passed, res.status.toString)
  }

  test("maintainCounts with an empty delta is the previous model verbatim") {
    val old = docs(1L -> "a b c", 2L -> "a b")
    val delta = statusDelta(1L -> "unchanged", 2L -> "unchanged")
    val prev = LmScore.trainCounts(old, "doc_id", "text", lit(true))
    val inc = LmScore.maintainCounts(prev, old, old, "doc_id", "text", delta)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    inc shouldBe prev.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
  }
}
