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

  test("continuous path agrees with the histogram path on unique doubles") {
    val rng = new scala.util.Random(7)
    val rows = (1 to 500).map(i =>
      Row(if (i % 3 == 0) "x" else "y", rng.nextDouble() * 1000)) :+ Row("z", null)
    val d = df("g STRING, v DOUBLE", rows)
    for (p <- Seq(0.25, 0.5, 0.9, 0.997)) {
      val exact = Percentiles.percentileDisc(d, "v", p, Seq("g"), "c")
        .collect().map(r => r.getString(0) -> Option(r.get(1))).toMap
      val cont = Percentiles.percentileDiscContinuous(d, "v", p, Seq("g"), "c")
        .collect().map(r => r.getString(0) -> Option(r.get(1))).toMap
      cont shouldBe exact
      cont("z") shouldBe None // all-null group kept as null
    }
  }

  test("two-level path agrees with both other paths across p and widths") {
    val rng = new scala.util.Random(11)
    val rows = (1 to 500).map(i =>
      Row(if (i % 3 == 0) "x" else "y", rng.nextDouble() * 1000)) :+ Row("z", null)
    val d = df("g STRING, v DOUBLE", rows)
    for (p <- Seq(0.25, 0.5, 0.9, 0.997); w <- Seq(1.0, 37.0, 1000.0, 1e9)) {
      val exact = Percentiles.percentileDisc(d, "v", p, Seq("g"), "c")
        .collect().map(r => r.getString(0) -> Option(r.get(1))).toMap
      val two = Percentiles.percentileDiscTwoLevel(d, "v", p, Seq("g"), "c", w)
        .collect().map(r => r.getString(0) -> Option(r.get(1))).toMap
      two shouldBe exact
      two("z") shouldBe None // all-null group kept as null
    }
  }

  test("one-pass path agrees with both other paths across p and widths") {
    val rng = new scala.util.Random(13)
    val rows = (1 to 500).map(i =>
      Row(if (i % 3 == 0) "x" else "y", rng.nextDouble() * 1000)) :+ Row("z", null)
    val d = df("g STRING, v DOUBLE", rows)
    for (p <- Seq(0.0, 0.25, 0.5, 0.9, 0.997, 1.0); w <- Seq(1.0, 37.0, 1000.0, 1e9)) {
      val exact = Percentiles.percentileDisc(d, "v", p, Seq("g"), "c")
        .collect().map(r => r.getString(0) -> Option(r.get(1))).toMap
      val one = Percentiles.percentileDiscOnePass(d, "v", p, Seq("g"), "c", w)
        .collect().map(r => r.getString(0) -> Option(r.get(1))).toMap
      one shouldBe exact
      one("z") shouldBe None // all-null group kept as null
    }
  }

  test("one-pass path: bucket-boundary duplicates, negatives, mixed nulls") {
    val rows = (Seq.fill(40)(5.0) ++ Seq.fill(40)(7.0) ++ Seq(1.0, 9.0)).map(v => Row("a", v))
    val d = df("g STRING, v DOUBLE", rows)
    Percentiles.percentileDiscOnePass(d, "v", 0.5, Seq("g"), "c", 2.0)
      .collect().head.getDouble(1) shouldBe 5.0 // rank 41 of 82: last of 5-run
    Percentiles.percentileDiscOnePass(d, "v", 42.0 / 82.0, Seq("g"), "c", 2.0)
      .collect().head.getDouble(1) shouldBe 7.0 // rank 42: first of 7-run
    val neg = Seq(-9.5, -7.0, -0.5, 3.0).map(v => Row("a", v))
    Percentiles.percentileDiscOnePass(
      df("g STRING, v DOUBLE", neg), "v", 0.5, Seq("g"), "c", 2.0)
      .collect().head.getDouble(1) shouldBe -7.0
    // nulls inside a mixed group are ignored, not counted toward k
    val mixed = Seq(Row("a", 1.0), Row("a", null), Row("a", 3.0))
    Percentiles.percentileDiscOnePass(
      df("g STRING, v DOUBLE", mixed), "v", 0.5, Seq("g"), "c", 2.0)
      .collect().head.getDouble(1) shouldBe 1.0
  }

  test("two-level path: duplicates spanning a bucket boundary and exact-edge ranks") {
    // ranks: k lands exactly on the last row of a bucket (before < k =
    // before+cnt) and on the first of the next — both edges must pick
    // correctly with width 2 splitting the 5.0-run from the 7.0-run.
    val rows = (Seq.fill(40)(5.0) ++ Seq.fill(40)(7.0) ++ Seq(1.0, 9.0)).map(v => Row("a", v))
    val d = df("g STRING, v DOUBLE", rows)
    Percentiles.percentileDiscTwoLevel(d, "v", 0.5, Seq("g"), "c", 2.0)
      .collect().head.getDouble(1) shouldBe 5.0 // rank 41 of 82: last of 5-run
    Percentiles.percentileDiscTwoLevel(d, "v", 42.0 / 82.0, Seq("g"), "c", 2.0)
      .collect().head.getDouble(1) shouldBe 7.0 // rank 42: first of 7-run
    // negative values: floor-bucketing must stay monotone below zero
    val neg = Seq(-9.5, -7.0, -0.5, 3.0).map(v => Row("a", v))
    Percentiles.percentileDiscTwoLevel(
      df("g STRING, v DOUBLE", neg), "v", 0.5, Seq("g"), "c", 2.0)
      .collect().head.getDouble(1) shouldBe -7.0
    // p = 0 is the minimum (SQL PERCENTILE_DISC(0)), not a dropped group
    Percentiles.percentileDiscTwoLevel(
      df("g STRING, v DOUBLE", neg), "v", 0.0, Seq("g"), "c", 2.0)
      .collect().head.getDouble(1) shouldBe -9.5
  }

  test("continuous path handles duplicates at the bracket boundary") {
    val rows = (Seq.fill(40)(5.0) ++ Seq.fill(40)(7.0) ++ Seq(1.0, 9.0)).map(v => Row("a", v))
    val out = Percentiles.percentileDiscContinuous(
      df("g STRING, v DOUBLE", rows), "v", 0.5, Seq("g"), "c")
      .collect().head
    out.getDouble(1) shouldBe 5.0 // rank 41 of 82 → still in the 5.0 run
  }

  private def wrun(pct: Int, rows: (Long, String, Long, Long)*) =
    Percentiles.weightedPercentileByKey(
      df("id BIGINT, k STRING, v BIGINT, w BIGINT",
        rows.map(r => Row(r._1, r._2, r._3, r._4))),
      "k", "v", "id", "w", pct)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

  test("weightedPercentileByKey: a dominant weight owns the median") {
    // values 1..4, but value 4 holds 70% of the weight → weighted
    // median is 4 while the unweighted median is 2
    val rows = Seq((1L, "a", 1L, 10L), (2L, "a", 2L, 10L),
      (3L, "a", 3L, 10L), (4L, "a", 4L, 70L))
    wrun(50, rows: _*) shouldBe Map("a" -> 4L)
    // p90 also 4; p10 falls in value 1's interval
    wrun(90, rows: _*) shouldBe Map("a" -> 4L)
    wrun(10, rows: _*) shouldBe Map("a" -> 1L)
  }

  test("weightedPercentileByKey: unit weights reduce to the discrete percentile") {
    val rows = (1L to 4L).map(v => (v, "a", v, 1L))
    wrun(25, rows: _*) shouldBe Map("a" -> 1L)
    wrun(50, rows: _*) shouldBe Map("a" -> 2L)
    wrun(51, rows: _*) shouldBe Map("a" -> 3L)
    wrun(100, rows: _*) shouldBe Map("a" -> 4L)
  }

  test("weightedPercentileByKey: exactly one row per key, zero-weight rows never picked") {
    val rows = Seq((1L, "a", 5L, 3L), (2L, "a", 7L, 0L), (3L, "b", 9L, 2L))
    val out = wrun(50, rows: _*)
    out shouldBe Map("a" -> 5L, "b" -> 9L)
  }

  test("property: weighted percentile matches a driver-side reference") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    val scenario = for {
      n <- Gen.chooseNum(1, 25)
      rows <- Gen.listOfN(n, for {
        v <- Gen.chooseNum(1L, 9L); w <- Gen.chooseNum(1L, 50L)
      } yield (v, w))
      pct <- Gen.chooseNum(1, 100)
    } yield (rows.zipWithIndex.map { case ((v, w), i) => (i.toLong, v, w) }, pct)
    val prop = Prop.forAll(scenario) { case (rows, pct) =>
      val sorted = rows.sortBy { case (id, v, _) => (v, id) }
      val total = sorted.map(_._3).sum
      val t = (total * pct + 99) / 100
      var acc = 0L
      val expect = sorted.find { case (_, _, w) => acc += w; acc >= t }.get._2
      wrun(pct, rows.map { case (id, v, w) => (id, "g", v, w) }: _*) ==
        Map("g" -> expect)
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(8), prop)
    assert(res.passed, res.status.toString)
  }
}
