package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Free-text duration parsing — `aact_silver_layer.sql:366-406`:
  * `target_duration` strings like "4 Weeks" / "1.5 Years" are regexp-stripped
  * to a number, unit-multiplied to days (year=365, month=30, week=7), capped
  * at 30 years (10950 days) with a provenance flag.
  *
  * Cross-engine cast policy (SURVEY §2.8 F9): PG errors on `'1.5'::INT`,
  * DuckDB ROUNDS (`'1.9'::INT = 2`), Spark ANSI truncates. We therefore never
  * cast string→int: we regex-guard, cast to DOUBLE, and apply an explicit
  * `floor` — identical semantics on any engine.
  */
object Duration {

  val CapDays = 10950 // 30 years — aact_silver_layer.sql:380-381

  /** Numeric part: strip non-[0-9.] then cast-if-well-formed (guards against
    * "" and multi-dot artifacts, which would throw under ANSI mode). */
  def numericPart(c: Column): Column = {
    val stripped = regexp_replace(c, "[^0-9.]", "")
    when(stripped.rlike("^[0-9]+(\\.[0-9]+)?$"), stripped.cast("double"))
  }

  /** Unit multiplier to days, case-insensitive, first-match-wins
    * (`aact_silver_layer.sql:375-378,385-388`). */
  def unitMultiplier(c: Column): Column =
    when(lower(c).like("%year%"), lit(365.0))
      .when(lower(c).like("%month%"), lit(30.0))
      .when(lower(c).like("%week%"), lit(7.0))
      .otherwise(lit(1.0))

  /** Parsed duration in whole days (uncapped); null when unparseable.
    * LongType on purpose: `floor(double)` is a LONG in Spark, and keeping it
    * long until after the cap means a free-text "99999999999 Years" cannot
    * overflow INT (which would throw under Spark 4's ANSI default — one bad
    * row killing a 100 TB job). */
  def durationDays(c: Column): Column =
    floor(numericPart(c) * unitMultiplier(c))

  /** Capped duration (`aact_silver_layer.sql:380-381`); INT cast only after
    * the cap bounds the value. */
  def durationDaysCapped(c: Column, capDays: Int = CapDays): Column = {
    val d = durationDays(c)
    when(d > capDays, lit(capDays)).otherwise(d).cast("int")
  }

  /** Provenance flag (`aact_silver_layer.sql:394-406`). */
  def durationFlag(c: Column, capDays: Int = CapDays): Column = {
    val d = durationDays(c)
    when(d.isNull, lit("Not specified"))
      .when(d > capDays, lit("Capped"))
      .otherwise(lit("Original"))
  }
}
