package graft.ops

import org.apache.spark.sql.Row

import graft.SparkSpec

class PercentilesSpec extends SparkSpec {

  private def run(p: Double, rows: Seq[Row]) =
    Percentiles.percentileDisc(
      df("g STRING, v INT", rows), "v", p, Seq("g"), "cap")
      .collect().map(r => r.getString(0) -> Option(r.get(1))).toMap

  test("PERCENTILE_DISC definition: smallest v with cume_dist >= p (A8)") {
    val rows = Seq(1, 2, 3, 4).map(v => Row("a", v))
    run(0.25, rows)("a") shouldBe Some(1)
    run(0.5, rows)("a") shouldBe Some(2)
    run(0.51, rows)("a") shouldBe Some(3)
    run(0.997, rows)("a") shouldBe Some(4)
    run(1.0, rows)("a") shouldBe Some(4)
  }

  test("duplicate values weight the distribution") {
    val rows = Seq(1, 1, 1, 10).map(v => Row("a", v))
    run(0.75, rows)("a") shouldBe Some(1)
    run(0.76, rows)("a") shouldBe Some(10)
  }

  test("all-null group is KEPT with null result (SQL semantics)") {
    val rows = Seq(Row("a", 5), Row("b", null), Row("b", null))
    val out = run(0.5, rows)
    out("a") shouldBe Some(5)
    out("b") shouldBe None
  }

  test("nulls within a mixed group are ignored, not counted") {
    val rows = Seq(Row("a", 1), Row("a", null), Row("a", 3))
    run(0.5, rows)("a") shouldBe Some(1)
  }
}
