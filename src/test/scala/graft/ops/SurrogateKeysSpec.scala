package graft.ops

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.SparkSpec

class SurrogateKeysSpec extends SparkSpec {

  private def names(n: Int) =
    df("name STRING", scala.util.Random.shuffle((1 to n).toList).map(i => Row(f"n$i%05d")))

  test("rowNumberKey: dense 1..N in order (W1)") {
    val keyed = SurrogateKeys.rowNumberKey(names(50), "k", Seq("name"))
    collectCol[Int](keyed.orderBy("name").select("k")) shouldBe (1 to 50)
  }

  test("denseRankKey: identical result to global row_number, distributed") {
    val d = names(500).repartition(7)
    val dist = SurrogateKeys.denseRankKey(d, "k", Seq("name"))
      .select(col("name"), col("k"))
    val global = SurrogateKeys.rowNumberKey(d, "k", Seq("name"))
      .select(col("name"), col("k").cast("long"))
    dist.exceptAll(global).count() shouldBe 0
    global.exceptAll(dist).count() shouldBe 0
  }

  test("denseRankKey: keys are dense 1..N (no gaps, no dups)") {
    val keyed = SurrogateKeys.denseRankKey(names(200), "k", Seq("name"))
    collectCol[Long](keyed.orderBy("k").select("k")) shouldBe (1L to 200L)
  }
}
