package graft.ops

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Surrogate-key generation — `aact_gold_layer.sql:27,66,138,161`:
  * `ROW_NUMBER() OVER (ORDER BY k)` keys every dimension.
  *
  * Scale note (SURVEY §2.5 W1): a global un-partitioned window collapses to a
  * single task. That is fine for dimensions (small after `distinct`), and
  * [[rowNumberKey]] reproduces the reference exactly. For fact-scale keying at
  * 100 TB use [[zipWithIndexKey]]: sort once, then per-partition offsets via
  * `zipWithIndex` — dense, deterministic, fully distributed (what
  * `monotonically_increasing_id` is NOT: its ids are neither dense nor
  * aligned with the sort order).
  */
object SurrogateKeys {

  /** Reference-exact dimension keying (small inputs only). */
  def rowNumberKey(df: DataFrame, keyCol: String, orderCols: Seq[String]): DataFrame =
    df.withColumn(keyCol, row_number().over(Window.orderBy(orderCols.map(col): _*)))

  /** Scale-safe dense sequential keying: total-order sort (range-partitioned
    * exchange) + per-partition index with partition-size offsets. */
  def zipWithIndexKey(df: DataFrame, keyCol: String, orderCols: Seq[String]): DataFrame = {
    val sorted = df.orderBy(orderCols.map(col): _*)
    val outSchema = StructType(sorted.schema.fields :+ StructField(keyCol, LongType, nullable = false))
    val rdd = sorted.rdd.zipWithIndex.map { case (r, i) => Row.fromSeq(r.toSeq :+ (i + 1L)) }
    sorted.sparkSession.createDataFrame(rdd, outSchema)
  }
}
