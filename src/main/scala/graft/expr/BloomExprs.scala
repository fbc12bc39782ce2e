package graft.expr

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types.{BooleanType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.BloomFilter

/** Codegen'd Bloom-filter membership probe: `bigint|string → boolean`,
  * NULL keys probe to `false` (a NULL never joins, so the semi-join
  * this guards would drop the row anyway — same observable behavior
  * as the Scala-UDF probe it replaces, minus the per-row boxing and
  * the whole-stage-codegen break on the probe side of a join built
  * specifically for huge probe sides).
  *
  * The filter rides into generated code as a plan reference object —
  * exactly how Spark's own injected runtime bloom filters ship
  * (`BloomFilterMightContain` embeds the serialized filter in the plan
  * as a scalar-subquery result); the task binary is broadcast once per
  * stage, so executors deserialize one copy, not one per task. String
  * keys probe `mightContainBinary` over the UTF-8 bytes — the same
  * encoding `BloomFilter.putString` inserts, so no false negatives.
  */
case class BloomMightContain(child: Expression, filter: BloomFilter)
    extends UnaryExpression {

  override def dataType: DataType = BooleanType
  override def nullable: Boolean = false
  override def prettyName: String = "bloom_might_contain"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType | StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"bloom_might_contain needs a BIGINT or STRING key, got ${other.catalogString}")
  }

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) false
    else child.dataType match {
      case LongType => filter.mightContainLong(v.asInstanceOf[Long])
      case StringType => filter.mightContainBinary(v.asInstanceOf[UTF8String].getBytes)
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bfRef = ctx.addReferenceObj("bloomFilter", filter, classOf[BloomFilter].getName)
    val childGen = child.genCode(ctx)
    val probe = child.dataType match {
      case LongType => s"$bfRef.mightContainLong(${childGen.value})"
      case StringType => s"$bfRef.mightContainBinary(${childGen.value}.getBytes())"
    }
    ev.copy(
      code = code"""
        ${childGen.code}
        boolean ${ev.value} = false;
        if (!${childGen.isNull}) {
          ${ev.value} = $probe;
        }
      """,
      isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
