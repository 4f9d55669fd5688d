package graft.ops

import org.apache.spark.sql.Row

import graft.SparkSpec

class SkewSpec extends SparkSpec {

  // 90% of large-side rows share one hot key.
  private val large = df("k INT, v INT",
    (1 to 1000).map(i => Row(if (i <= 900) 1 else i, i)))
  private val small = df("k INT, name STRING",
    (1 to 100).map(i => Row(i, s"dim_$i")))

  test("saltedJoin result equals the unsalted join (inner)") {
    val plain = large.join(small, Seq("k"))
      .select("k", "v", "name").collect().map(_.toSeq).sorted(RowOrd)
    val salted = Skew.saltedJoin(large, small, "k", salt = 8)
      .select("k", "v", "name").collect().map(_.toSeq).sorted(RowOrd)
    salted shouldBe plain
  }

  test("saltedJoin result equals the unsalted join (left, unmatched keys kept)") {
    val bigger = df("k INT, v INT", (1 to 50).map(i => Row(i + 90, i))) // 91..140, 101+ unmatched
    val plain = bigger.join(small, Seq("k"), "left")
      .select("k", "v", "name").collect().map(_.toSeq).sorted(RowOrd)
    val salted = Skew.saltedJoin(bigger, small, "k", salt = 4, joinType = "left")
      .select("k", "v", "name").collect().map(_.toSeq).sorted(RowOrd)
    salted shouldBe plain
  }

  test("saltedJoin rejects right/full joins (unmatched small rows would fan out ×salt)") {
    an[IllegalArgumentException] should be thrownBy
      Skew.saltedJoin(large, small, "k", salt = 4, joinType = "right")
    an[IllegalArgumentException] should be thrownBy
      Skew.saltedJoin(large, small, "k", salt = 4, joinType = "full_outer")
    noException should be thrownBy
      Skew.saltedJoin(large, small, "k", salt = 4, joinType = "left_semi")
  }

  private object RowOrd extends Ordering[Seq[Any]] {
    def compare(a: Seq[Any], b: Seq[Any]): Int =
      a.mkString("|").compareTo(b.mkString("|"))
  }
}
