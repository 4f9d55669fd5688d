package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew mitigation (SURVEY §4 "salting for skew") — for joins where one key
  * dominates and a single reducer would receive a whole key's rows.
  *
  * AQE's skew-join split (`spark.sql.adaptive.skewJoin`) handles moderate
  * skew at runtime and should be the first resort. Explicit salting is for
  * the pathological case AQE can't fix: it splits each hot key into `salt`
  * sub-keys on the large side and replicates the matching small-side rows
  * once per sub-key, so the hot key's rows spread over `salt` reducers.
  * Cost: small side grows ×salt — only worth it when small really is small.
  */
object Skew {

  /** Equi-join `large ⋈ small` on `key`, salted `salt` ways. Result equals
    * the unsalted join (verified by tests); row→salt assignment just has to
    * spread rows, not be reproducible across runs. */
  def saltedJoin(large: DataFrame, small: DataFrame, key: String,
                 salt: Int, joinType: String = "inner"): DataFrame = {
    require(salt > 1, "salt must be > 1")
    val salted = large.withColumn("_salt",
      pmod(monotonically_increasing_id(), lit(salt.toLong)).cast("int"))
    val replicated = small.withColumn("_salt",
      explode(sequence(lit(0), lit(salt - 1))))
    salted.join(replicated, Seq(key, "_salt"), joinType).drop("_salt")
  }
}
