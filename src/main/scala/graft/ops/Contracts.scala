package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data contracts — the gate a pipeline puts between "bytes arrived"
  * and "rows entered the corpus": named row-level rules, violating
  * rows QUARANTINED to a side table (never silently dropped — the
  * quarantine is what the data owner debugs from), clean rows passed
  * through. Complements [[graft.etl.Etl.writeAudited]] (which certifies
  * what was written) by certifying what was ACCEPTED.
  *
  * A rule that evaluates to NULL counts as a VIOLATION — in a
  * three-valued world, "I could not prove this row is fine" must not
  * admit the row (the same conservative default as NA-safe `%in%`
  * blocking, SparkEntry q_na_safe_in).
  *
  * The violation label is a deterministic comma-join in RULE ORDER, so
  * quarantine groups are stable and engine-portable (`concat_ws` skips
  * the NULLs of passing rules on both engines). Map-only codegen
  * `when` chain — one projection, no shuffle; the clean/quarantine
  * split shares it.
  */
object Contracts {

  /** `violated_rules` label: comma-joined names of failed-or-NULL
    * rules, '' when the row passes everything.
    */
  def violations(rules: Seq[(String, Column)]): Column = {
    require(rules.nonEmpty, "need at least one rule")
    rules.foreach { case (n, _) =>
      require(n.nonEmpty && !n.contains(","), s"rule names must be non-empty and comma-free: '$n'")
    }
    concat_ws(",", rules.map { case (name, ok) =>
      when(!coalesce(ok, lit(false)), lit(name))
    }: _*)
  }

  /** The input plus a `violated_rules` column. */
  def applyContract(df: DataFrame, rules: Seq[(String, Column)]): DataFrame =
    df.withColumn("violated_rules", violations(rules))

  /** Rows passing every rule (the corpus side). */
  def clean(df: DataFrame, rules: Seq[(String, Column)]): DataFrame =
    applyContract(df, rules).filter(col("violated_rules") === "").drop("violated_rules")

  /** Rows failing at least one rule, labeled (the debug side). */
  def quarantine(df: DataFrame, rules: Seq[(String, Column)]): DataFrame =
    applyContract(df, rules).filter(col("violated_rules") =!= "")

  /** DuckDB mirror of [[violations]] over (name, SQL-predicate) pairs. */
  def violationsSql(rules: Seq[(String, String)]): String =
    "concat_ws(','," + rules.map { case (name, pred) =>
      s" CASE WHEN NOT COALESCE($pred, false) THEN '$name' END"
    }.mkString(",") + ")"
}
