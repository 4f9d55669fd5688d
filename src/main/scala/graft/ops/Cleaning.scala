package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Null/outlier-policy combinators — the reference silver layer's core
  * business (`aact_silver_layer.sql:18-360`).
  *
  * Everything here is pure `Column` composition (no UDFs), so Catalyst
  * constant-folds, null-propagates and whole-stage-codegens the result; at
  * 100 TB these are narrow, shuffle-free map stages.
  */
object Cleaning {

  /** Null → sentinel string (`aact_silver_layer.sql:109-193`: 'Unknown',
    * '[Not Defined]', 'Not specified', ...). */
  def fillSentinel(c: Column, sentinel: String): Column =
    coalesce(c, lit(sentinel))

  /** Postgres text-boolean 't'/'f' → 'Yes'/'No'/'Unknown'
    * (`aact_silver_layer.sql:238-283,348-360`). */
  def boolTfToYesNo(c: Column): Column =
    when(c === "t", lit("Yes")).when(c === "f", lit("No")).otherwise(lit("Unknown"))

  /** Outlier cap with null→0 (`aact_silver_layer.sql:162-165`: enrollment
    * capped at the 99.7th-percentile per study_type). */
  def capped(c: Column, cap: Column): Column =
    when(c.isNull, lit(0)).when(c > cap, cap).otherwise(c)

  /** Companion provenance flag for [[capped]]
    * (`aact_silver_layer.sql:394-406` target_duration_flag pattern). */
  def cappedFlag(c: Column, cap: Column): Column =
    when(c.isNull, lit("Missing")).when(c > cap, lit("Capped")).otherwise(lit("Original"))

  /** Future-or-missing date imputed from a fallback, as-of-date
    * parameterized for reproducibility (`aact_silver_layer.sql:47-59` uses
    * CURRENT_DATE; we take `asOf` so correctness runs are deterministic). */
  def imputeFutureDate(d: Column, fallback: Column, asOf: Column): Column =
    when(d.isNull || d > asOf, fallback).otherwise(d)

  /** Companion 'Imputed'/'Actual' flag (`aact_silver_layer.sql:47-59`). */
  def imputeFlag(d: Column, asOf: Column): Column =
    when(d.isNull || d > asOf, lit("Imputed")).otherwise(lit("Actual"))
}
