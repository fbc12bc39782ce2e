package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.types.IntegerType

import graft.expr._

/** SQL-surface registration for the engine's custom Catalyst
  * expressions, so `spark.sql("SELECT jaro_winkler_similarity(a, b)")`
  * works exactly like the reference's DuckDB SQL surface
  * (`jaro_winkler_similarity` is a DuckDB built-in the reference calls
  * from comparators.R:7-12 — a user switching engines keeps their SQL).
  *
  * Two entry points, same function table:
  *
  *   - `spark.sql.extensions=graft.GraftExtensions` at session build
  *     (the standard [[SparkSessionExtensions]] plugin path), or
  *   - [[GraftFunctions.register]] on an already-running session
  *     (session-scoped temp functions — no config needed).
  *
  * All functions dispatch to codegen'd expressions (no UDFs): the SQL
  * spelling and the Column/DataFrame spelling compile to identical
  * plans.
  */
object GraftFunctions {

  private def info(name: String, clazz: Class[_]): ExpressionInfo =
    new ExpressionInfo(clazz.getCanonicalName, name)

  private def litInt(e: Expression, fn: String, arg: String): Int = e match {
    case Literal(v: Int, IntegerType) => v
    case other => throw new IllegalArgumentException(
      s"$fn: $arg must be an integer literal, got $other")
  }

  private def arity(fn: String, args: Seq[Expression], n: Int): Unit =
    require(args.length == n, s"$fn expects $n arguments, got ${args.length}")

  /** (identifier, info, builder) triples for every exported function. */
  val all: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("jaro_winkler_similarity"),
      info("jaro_winkler_similarity", classOf[JaroWinklerSimilarity]),
      (args: Seq[Expression]) => {
        arity("jaro_winkler_similarity", args, 2)
        JaroWinklerSimilarity(args(0), args(1))
      }),
    (FunctionIdentifier("damerau_levenshtein"),
      info("damerau_levenshtein", classOf[DamerauLevenshteinExpr]),
      (args: Seq[Expression]) => {
        arity("damerau_levenshtein", args, 2)
        DamerauLevenshteinExpr(args(0), args(1))
      }),
    (FunctionIdentifier("dot_product"),
      info("dot_product", classOf[DotProduct]),
      (args: Seq[Expression]) => {
        arity("dot_product", args, 2)
        DotProduct(args(0), args(1))
      }),
    (FunctionIdentifier("top_token_count"),
      info("top_token_count", classOf[TopTokenCountExpr]),
      (args: Seq[Expression]) => {
        arity("top_token_count", args, 1)
        TopTokenCountExpr(args(0))
      }),
    (FunctionIdentifier("token_fingerprint"),
      info("token_fingerprint", classOf[TokenFingerprintExpr]),
      (args: Seq[Expression]) => {
        arity("token_fingerprint", args, 1)
        TokenFingerprintExpr(args(0))
      }),
    (FunctionIdentifier("word_shingles"),
      info("word_shingles", classOf[ShinglesExpr]),
      (args: Seq[Expression]) => {
        arity("word_shingles", args, 2)
        ShinglesExpr(args(0), litInt(args(1), "word_shingles", "n"))
      }),
    (FunctionIdentifier("shingle_hashes"),
      info("shingle_hashes", classOf[ShingleHashesExpr]),
      (args: Seq[Expression]) => {
        arity("shingle_hashes", args, 1)
        ShingleHashesExpr(args(0))
      }),
    (FunctionIdentifier("minhash_signature"),
      info("minhash_signature", classOf[MinHashSignatureExpr]),
      (args: Seq[Expression]) => {
        arity("minhash_signature", args, 2)
        MinHashSignatureExpr(args(0), litInt(args(1), "minhash_signature", "k"))
      }),
    (FunctionIdentifier("nfc_normalize"),
      info("nfc_normalize", classOf[NfcNormalizeExpr]),
      (args: Seq[Expression]) => {
        arity("nfc_normalize", args, 1)
        NfcNormalizeExpr(args(0))
      }),
    (FunctionIdentifier("strip_accents"),
      info("strip_accents", classOf[StripAccentsExpr]),
      (args: Seq[Expression]) => {
        arity("strip_accents", args, 1)
        StripAccentsExpr(args(0))
      }))

  /** Register every function on a live session (temp-function scope —
    * survives for the session, no extensions config required).
    */
  def register(spark: SparkSession): Unit =
    all.foreach { case (id, inf, builder) =>
      spark.sessionState.functionRegistry.registerFunction(id, inf, builder)
    }
}

/** `spark.sql.extensions` plugin: registers the [[GraftFunctions]]
  * table at session build, the standard deployment path for a cluster
  * (`--conf spark.sql.extensions=graft.GraftExtensions`).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftFunctions.all.foreach(ext.injectFunction)
}
