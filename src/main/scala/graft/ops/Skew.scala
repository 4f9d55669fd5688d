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

  /** Join types for which salting preserves the unsalted-join result: the
    * small side is replicated once per salt value, so any join type that
    * emits UNMATCHED small-side rows (right/full) would emit each of them
    * `salt` times instead of once. */
  private val SaltableJoinTypes =
    Set("inner", "left", "leftouter", "leftsemi", "leftanti")

  /** Equi-join `large ⋈ small` on `key`, salted `salt` ways. Result equals
    * the unsalted join (verified by tests); row→salt assignment just has to
    * spread rows, not be reproducible across runs.
    *
    * Only inner/left/left_semi/left_anti are accepted: for right/full joins
    * the replicated small side would surface unmatched rows `salt` times. */
  def saltedJoin(large: DataFrame, small: DataFrame, key: String,
                 salt: Int, joinType: String = "inner"): DataFrame = {
    require(salt > 1, "salt must be > 1")
    require(SaltableJoinTypes(joinType.toLowerCase.replace("_", "")),
      s"saltedJoin is only result-preserving for inner/left/left_semi/left_anti; got '$joinType'")
    val salted = large.withColumn("_salt",
      pmod(monotonically_increasing_id(), lit(salt.toLong)).cast("int"))
    val replicated = small.withColumn("_salt",
      explode(sequence(lit(0), lit(salt - 1))))
    salted.join(replicated, Seq(key, "_salt"), joinType).drop("_salt")
  }
}
