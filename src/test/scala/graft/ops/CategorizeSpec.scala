package graft.ops

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.SparkSpec

class CategorizeSpec extends SparkSpec {

  private val branches = Seq(
    Seq("%recruit%") -> "Recruitment Issues",
    Seq("%safety%", "%adverse%") -> "Safety",
    Seq("%fund%", "%budget%") -> "Funding")

  test("ilike is case-insensitive on both column and pattern (P7)") {
    val d = strDf("c", Seq("Healthy Volunteers", "unhealthy", "other"))
    collectCol[Boolean](d.select(Categorize.ilike(col("c"), "%Healthy%"))) shouldBe
      Seq(true, true, false)
  }

  test("ilikeAny ORs patterns (P8)") {
    val d = strDf("c", Seq("slow recruitment", "ADVERSE event", "no match"))
    collectCol[Boolean](
      d.select(Categorize.ilikeAny(col("c"), Seq("%recruit%", "%adverse%")))) shouldBe
      Seq(true, true, false)
  }

  test("categorize: first-match-wins branch ORDER is semantics (P8 quirk)") {
    // Mentions both recruitment and safety → first branch must win.
    val d = strDf("c", Seq("recruitment halted for safety concerns"))
    collectCol[String](
      d.select(Categorize.categorize(col("c"), branches, "Other"))) shouldBe
      Seq("Recruitment Issues")
  }

  test("categorize: null input falls to default, never null (totality)") {
    val d = strDf("c", Seq(null, "xyz"))
    collectCol[String](
      d.select(Categorize.categorize(col("c"), branches, "Other"))) shouldBe
      Seq("Other", "Other")
  }

  test("property: every input lands in exactly one known category") {
    val labels = branches.map(_._2).toSet + "Other"
    val prop = Prop.forAll(Gen.nonEmptyListOf(Gen.asciiPrintableStr)) { texts =>
      val out = collectCol[String](
        strDf("c", texts)
          .select(Categorize.categorize(col("c"), branches, "Other")))
      out.forall(labels.contains) && out.size == texts.size
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(10), prop)
    assert(res.passed, res.status.toString)
  }
}
