package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}

/** Content-defined-chunking boundary kernel — the O(n·window) hot
  * loop of [[graft.ops.TextAnalysis.cdcChunks]] as ONE codegen'd
  * pass. The declarative form (`filter(sequence(...), p =>
  * aggregate(zip_with(slice(...)))) `) is semantically identical but
  * runs in Catalyst's INTERPRETED higher-order-function evaluator:
  * every position allocates a slice, a zipped array, and an
  * aggregation closure — measured at ~15 s/query over sf0.1
  * (5k docs), ~90% of it allocation. This kernel computes the same
  * rolling polynomial hash incrementally:
  * {{{ H(p) = Σ_{k=0..w−1} h[p−w+k]·31^k
  *     H(p+1) = (H(p) − h[p−w]) / 31 + h[p]·31^{w−1} }}}
  * The division is EXACT: after subtracting the 31⁰ term every
  * remaining term carries a factor 31. No overflow: h < 10⁶ and
  * w ≤ 8 keep H < 2.9·10¹⁶. Output = the 1-based END positions whose
  * hash ≡ 0 (mod divisor) — byte-identical to the declarative form
  * (asserted against a direct slice-product reimplementation in
  * OpsSpec), so the DuckDB oracle is untouched.
  */
object CdcExprs {

  /** One-pass boundary scan; see object doc for the identity. */
  def cdcBounds(hs: ArrayData, window: Int, divisor: Int): ArrayData = {
    val a = hs.toLongArray()
    val n = a.length
    if (n < window) return new GenericArrayData(Array.emptyIntArray)
    val out = new java.util.ArrayList[Int]()
    var top = 1L
    var k = 0
    while (k < window - 1) { top *= 31L; k += 1 }
    var h = 0L
    var pw = 1L
    k = 0
    while (k < window) { h += a(k) * pw; pw *= 31L; k += 1 }
    if (h % divisor == 0) out.add(window)
    var p = window
    while (p < n) {
      h = (h - a(p - window)) / 31L + a(p) * top
      p += 1
      if (h % divisor == 0) out.add(p)
    }
    val arr = new Array[Int](out.size)
    var i = 0
    while (i < arr.length) { arr(i) = out.get(i); i += 1 }
    new GenericArrayData(arr)
  }

  /** Column face of [[CdcBoundsExpr]]. */
  def cdcBoundsCol(hashes: Column, window: Int, divisor: Int): Column =
    Bridge.column(CdcBoundsExpr(Bridge.expression(hashes), window, divisor))
}

/** `cdc_bounds(array<long>, window, divisor)` — codegen'd rolling
  * content-defined boundary positions (1-based ends).
  */
case class CdcBoundsExpr(child: Expression, window: Int, divisor: Int)
    extends UnaryExpression with ExpectsInputTypes {
  require(window >= 1, s"window must be >= 1, got $window")
  // No-overflow envelope: the rolling sum H = Σ_{j<w} h[j]·31^j with
  // h < 10⁶ is bounded by 10⁶·(31^w−1)/30 — 2.9·10¹⁶ at w = 8,
  // 8.8·10¹⁷ at w = 9, but 2.7·10¹⁹ > 2⁶³ at w = 10. Plain JVM long
  // arithmetic here wraps SILENTLY (unlike ANSI Column math), so an
  // unguarded larger window would produce boundaries diverging from
  // the declarative form and the oracle instead of failing loudly;
  // enforce the documented w ≤ 8 envelope (300× headroom).
  require(window <= 8,
    s"window must be <= 8 (rolling-hash no-overflow envelope), got $window")
  require(divisor >= 2, s"divisor must be >= 2, got $divisor")

  override def inputTypes: Seq[DataType] = Seq(ArrayType(LongType))
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "cdc_bounds"

  override protected def nullSafeEval(v: Any): Any =
    CdcExprs.cdcBounds(v.asInstanceOf[ArrayData], window, divisor)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, v =>
      s"graft.expr.CdcExprs.cdcBounds($v, $window, $divisor)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
