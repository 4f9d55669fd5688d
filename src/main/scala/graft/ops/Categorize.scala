package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Multi-pattern categorizers — the reference's `ILIKE ANY (ARRAY[...])`
  * idiom (`aact_silver_layer.sql:195-213` why_stopped_category, 16 branches;
  * `:456-497` therapeutic_area, 12 branches).
  *
  * Branch ORDER is semantics: a value matching several branches takes the
  * first (a why_stopped mentioning both "recruitment" and "safety" is
  * 'Recruitment Issues'). Built as a single `when`-chain `Column`, not a
  * UDF, so the whole categorizer stays inside whole-stage codegen.
  */
object Categorize {

  /** `col ILIKE ANY (ARRAY[p1, p2, ...])` — OR-chain of case-insensitive
    * LIKEs (`aact_silver_layer.sql:195-210`). */
  def ilikeAny(c: Column, patterns: Seq[String]): Column =
    patterns.map(p => lower(c).like(p.toLowerCase)).reduce(_ || _)

  /** `col ILIKE pattern` (`aact_silver_layer.sql:375-378`). */
  def ilike(c: Column, pattern: String): Column =
    lower(c).like(pattern.toLowerCase)

  /** Ordered first-match-wins categorizer: one searched CASE with an
    * ilikeAny predicate per branch (`aact_silver_layer.sql:194-213,454-500`). */
  def categorize(c: Column, branches: Seq[(Seq[String], String)], default: String): Column = {
    require(branches.nonEmpty, "categorize needs at least one branch")
    val head = when(ilikeAny(c, branches.head._1), lit(branches.head._2))
    branches.tail
      .foldLeft(head) { case (acc, (pats, label)) => acc.when(ilikeAny(c, pats), lit(label)) }
      .otherwise(lit(default))
  }
}
