package graft.ops

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.SparkSpec

class DurationSpec extends SparkSpec {

  private def parse(values: String*): Seq[Any] =
    collectCol[Any](strDf("c", values)
      .select(Duration.durationDaysCapped(col("c"))))

  test("unit conversion: days/weeks/months/years (F7-F9)") {
    parse("10 Days", "4 Weeks", "6 Months", "2 Years") shouldBe Seq(10, 28, 180, 730)
  }

  test("fractional values floor after multiply (F9 cast policy)") {
    parse("1.5 Years", "2.5 Weeks") shouldBe Seq(547, 17)
  }

  test("unparseable/empty/null → null, flag 'Not specified'") {
    parse("garbage", "", null) shouldBe Seq(null, null, null)
    collectCol[String](strDf("c", Seq("garbage", null))
      .select(Duration.durationFlag(col("c")))) shouldBe
      Seq("Not specified", "Not specified")
  }

  test("multi-dot artifacts are rejected, not mis-cast") {
    parse("1.2.3 Years") shouldBe Seq(null)
  }

  test("INT-overflow free-text is capped, not thrown (ANSI survival)") {
    // 99999999999 * 365 overflows INT; the long-domain cap must absorb it.
    parse("99999999999 Years") shouldBe Seq(Duration.CapDays)
    collectCol[String](strDf("c", Seq("99999999999 Years"))
      .select(Duration.durationFlag(col("c")))) shouldBe Seq("Capped")
  }

  test("property: capped value is min(n, cap) for any positive day count") {
    val prop = Prop.forAll(Gen.chooseNum(1, 1000000)) { n =>
      parse(s"$n Days").head == math.min(n, Duration.CapDays)
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(10), prop)
    assert(res.passed, res.status.toString)
  }
}
