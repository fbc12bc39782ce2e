package graft.linkage

import org.apache.spark.sql.DataFrame

/** Column-suffix utilities for `_left`/`_right` disambiguation.
  *
  * Semantics follow the reference's `add_suffix`/`add_suffix_char`
  * (reference: R/utils.R:11-18, R/utils.R:24-27): append the suffix to
  * every column name, idempotently — a column already ending in the
  * suffix is left untouched, so double application is a no-op.
  */
object Suffix {

  /** Suffix one name, idempotently (reference: R/utils.R:24-27). */
  def addSuffix(name: String, suffix: String): String =
    if (name.endsWith(suffix)) name else name + suffix

  /** Suffix a list of names, idempotently. */
  def addSuffix(names: Seq[String], suffix: String): Seq[String] =
    names.map(addSuffix(_, suffix))

  /** Suffix every column of a DataFrame, idempotently
    * (reference: R/utils.R:11-18). Pure rename — a metadata-only
    * Project, no shuffle, no data movement.
    */
  def addSuffix(df: DataFrame, suffix: String): DataFrame =
    df.toDF(df.columns.map(addSuffix(_, suffix)).toIndexedSeq: _*)
}
