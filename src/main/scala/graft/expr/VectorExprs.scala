package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, LongType}

/** Codegen'd vector kernels for the similarity operators.
  *
  * The Column-algebra forms (`aggregate(zip_with(...))`) are
  * INTERPRETED — Spark's higher-order functions never enter
  * whole-stage codegen, so every dot product walks the array through
  * a lambda interpreter. These expressions compute the SAME
  * left-to-right IEEE fold (bit-identical results, verified by
  * property tests against the HOF forms and by the DuckDB oracle,
  * whose `list_reduce` mirror also folds sequentially) inside
  * generated code.
  *
  * Element nulls are NOT handled (embedding vectors are dense arrays
  * by construction); a null ARRAY on either side yields NULL like any
  * binary expression.
  */
object VectorExprs {

  /** Left-to-right Σ double(aᵢ)·double(bᵢ) over min(|a|,|b|). */
  def dot(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var s = 0.0
    var i = 0
    while (i < n) {
      s += a.getFloat(i).toDouble * b.getFloat(i).toDouble
      i += 1
    }
    s
  }

  private val P = 2147483647L

  /** Fused random-hyperplane bucket: all `planes` sign bits in ONE
    * pass over the vector. Each plane's projection accumulates in
    * index order independently, so per-plane results are bit-identical
    * to the per-plane HOF fold in [[graft.ops.Similarity.lshBucket]].
    */
  def lshBucket(a: ArrayData, planes: Int, seed: Long): Long = {
    val n = a.numElements()
    var result = 0L
    var p = 0
    while (p < planes) {
      val salt = seed + p * 10007L
      var acc = 0.0
      var i = 0
      while (i < n) {
        val j = (i + 1).toLong + salt // 1-based index, matching sequence(1, n)
        val comp = (((j * j) % P) * 48271L + j) % P / P.toDouble - 0.5
        acc += a.getFloat(i).toDouble * comp
        i += 1
      }
      if (acc > 0) result |= (1L << p)
      p += 1
    }
    result
  }

  /** Column entry point: codegen'd dot product over float arrays. */
  def dot_product(left: Column, right: Column): Column =
    Bridge.column(DotProduct(Bridge.expression(left), Bridge.expression(right)))

  /** Column entry point: codegen'd fused LSH bucket id. */
  def lsh_bucket(vec: Column, planes: Int, seed: Long): Column =
    Bridge.column(LshBucketExpr(Bridge.expression(vec), planes, seed))
}

/** Codegen'd dot product: `array<float> × array<float> → double`. */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] = Seq(ArrayType(FloatType), ArrayType(FloatType))
  override def dataType: DataType = DoubleType
  override def prettyName: String = "dot_product"

  override protected def nullSafeEval(l: Any, r: Any): Any =
    VectorExprs.dot(l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.expr.VectorExprs.dot($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Codegen'd fused hyperplane-LSH bucket id: `array<float> → bigint`,
  * one array pass for all `planes` sign bits.
  */
case class LshBucketExpr(child: Expression, planes: Int, seed: Long)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] = Seq(ArrayType(FloatType))
  override def dataType: DataType = LongType
  override def prettyName: String = "lsh_bucket"

  override protected def nullSafeEval(v: Any): Any =
    VectorExprs.lshBucket(v.asInstanceOf[ArrayData], planes, seed)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, v => s"graft.expr.VectorExprs.lshBucket($v, $planes, ${seed}L)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
