package graft.linkage

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import graft.expr.JaroWinkler.jaro_winkler

/** Comparator-expression builders: each comparator maps a record pair
  * (with `_left`/`_right` suffixed columns) to a discrete agreement
  * level, or NULL when the comparison is inapplicable.
  *
  * The reference's extensibility model is expressions-as-data — quoted
  * dplyr expressions spliced into queries (reference: R/linking.R:65-74,
  * R/comparators.R:4-23). The Spark-native equivalent is the `Column`
  * algebra: a comparator is a named `Column`, and free-form comparators
  * are just user-supplied `Column`s (= `add_expression_comparators`).
  *
  * Ordering note: comparators are kept as an ordered `Seq` (not a Map)
  * so comparison-vector column order is deterministic.
  */
final case class Comparator(name: String, expr: Column)

object Comparators {

  /** Exact-agreement comparator (reference: R/comparators.R:18-23):
    * `if_else(x_left == x_right, "agree", "disagree")`. Spark's
    * `when` has identical 3-valued semantics to R `if_else` here:
    * NULL on either side → NULL level.
    */
  def exact(vars: Seq[String]): Seq[Comparator] =
    vars.map { v =>
      Comparator(v,
        when(col(Suffix.addSuffix(v, "_left")) === col(Suffix.addSuffix(v, "_right")), "agree")
          .when(col(Suffix.addSuffix(v, "_left")) =!= col(Suffix.addSuffix(v, "_right")), "disagree"))
    }

  /** 4-level banded Jaro–Winkler comparator
    * (reference: R/comparators.R:4-14), thresholds == 1 / > 0.9 /
    * > 0.85 / else, with the reference's level labels. NULL inputs
    * give NULL similarity, every `when` condition is NULL (treated as
    * false), and the unconditional `otherwise` fires → "no agreement" —
    * exactly what R `case_when`'s `TRUE ~` branch and SQL CASE's ELSE
    * do, so oracle parity holds for NULL names.
    */
  def jaroWinkler(
      vars: Seq[String],
      strong: Double = 0.9,
      weak: Double = 0.85): Seq[Comparator] =
    vars.map { v =>
      // Fused band expression: ONE similarity evaluation per row (a
      // when-chain over a jaro_winkler column evaluates it per branch).
      // coalesce maps NULL inputs to "no agreement", matching the CASE
      // ELSE / R case_when TRUE~ fall-through.
      val band = graft.expr.JaroWinkler.jaro_winkler_band(
        col(Suffix.addSuffix(v, "_left")), col(Suffix.addSuffix(v, "_right")), strong, weak)
      Comparator(v, coalesce(band, lit("no agreement")))
    }

  /** Free-form comparator — the user supplies any `Column` producing a
    * level label (reference: `add_expression_comparators`,
    * R/linking.R:65-67).
    */
  def expression(name: String, expr: Column): Comparator = Comparator(name, expr)

  /** Evaluate all comparators over an assembled pair table, keeping
    * optional id columns — the reference's `do_comparisons` =
    * `transmute(joined, !!!exprs)` (R/linking.R:72-74).
    */
  def doComparisons(
      pairs: org.apache.spark.sql.DataFrame,
      comparators: Seq[Comparator],
      keep: Seq[String] = Nil): org.apache.spark.sql.DataFrame = {
    val cols = keep.map(col) ++ comparators.map(c => c.expr.as(c.name))
    pairs.select(cols: _*)
  }
}
