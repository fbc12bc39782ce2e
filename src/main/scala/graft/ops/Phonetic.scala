package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Phonetic encoding for linkage blocking — the classic recall move
  * when names are typed by humans: block on a sound-alike code instead
  * of (or alongside) exact prefixes, so 'SMITH'/'SMYTH' and
  * 'ROBERT'/'RUPERT' land in the same candidate bucket
  * (cf. reference blocking passes, linking.R:14-38, which block on
  * exact name fields; a soundex pass is the standard complement).
  *
  * American Soundex, the simplified SQL variant (H/W treated as vowel
  * separators — the rule set virtually every database implements):
  * first letter + first three consonant-class digits, adjacent same
  * codes collapsed BEFORE vowel removal so vowel-separated repeats
  * survive ('ROBERT' → R163, 'PFISTER' → P236, 'TYMCZAK' → T522).
  * Non-letters are stripped; no letters at all → NULL.
  *
  * Pure string/regex/translate Column program — map-only, codegen,
  * mirrored step-for-step in DuckDB SQL by [[soundexSql]] (the only
  * engine divergence is regexp_replace's default scope: Spark is
  * global, DuckDB needs the explicit 'g' flag).
  */
object Phonetic {

  private val Alphabet = "ABCDEFGHIJKLMNOPQRSTUVWXYZ"
  private val Codes    = "01230120022455012623010202"

  /** Soundex code of `s` (NULL when `s` has no letters). */
  def soundex(s: Column): Column = {
    val letters = regexp_replace(upper(s), "[^A-Z]", "")
    val digits = translate(letters, Alphabet, Codes)
    val collapsed = (1 to 6).foldLeft(digits) { (c, d) =>
      regexp_replace(c, s"$d+", s"$d")
    }
    val rest = collapsed.substr(lit(2), length(collapsed))
    val no0 = regexp_replace(rest, "0", "")
    when(letters === "", lit(null).cast("string"))
      .otherwise(concat(substring(letters, 1, 1), substring(concat(no0, lit("000")), 1, 3)))
  }

  /** DuckDB mirror of [[soundex]] over the SQL fragment `e`. */
  def soundexSql(e: String): String = {
    val letters = s"regexp_replace(upper($e), '[^A-Z]', '', 'g')"
    val digits = s"translate($letters, '$Alphabet', '$Codes')"
    val collapsed = (1 to 6).foldLeft(digits) { (c, d) =>
      s"regexp_replace($c, '$d+', '$d', 'g')"
    }
    val no0 = s"replace(substr($collapsed, 2), '0', '')"
    s"""CASE WHEN $letters = '' THEN NULL
       |     ELSE substr($letters, 1, 1) || substr($no0 || '000', 1, 3) END""".stripMargin
  }
}
