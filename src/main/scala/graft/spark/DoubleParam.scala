package graft.spark

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.LeafExpression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Double twin of [[LongParam]]: evaluates like a double literal but
  * reaches generated code through the codegen `references` array instead
  * of being inlined into the source text.
  *
  * Motivation (same as LongParam's wave counter): `Similarity.ivfTopK`
  * re-plans its assignment expression once per Lloyd iteration with the
  * freshly-trained centroids. The centroid COMPONENT arrays already ride
  * the references array (array literals are never inlined), but each
  * centroid's norm was a primitive `lit(normC)` — inlined into the
  * generated Java, so every iteration's source text was new and Janino
  * recompiled the whole assignment pipeline per iteration (measured 19
  * compiles / ~1.7 s across one 2-iteration fit; repeated per fit, and
  * at scale each recompile is pure driver-serial time between cluster
  * jobs). With the norm in `references`, iterations 2..n and the final
  * assignment reuse iteration 1's classes.
  *
  * Deliberately non-foldable — constant folding would collapse it back
  * into an inlined literal. It only ever appears in projection
  * arithmetic, so the lost foldability costs nothing.
  */
case class DoubleParam(value: Double) extends LeafExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = false
  override def foldable: Boolean = false
  override def eval(input: InternalRow): Any = value

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("doubleParam", Double.box(value), "java.lang.Double")
    ev.copy(code = code"final double ${ev.value} = $ref;", isNull = FalseLiteral)
  }
}

object DoubleParam {
  /** Column of a stable-codegen double parameter. */
  def col(value: Double): Column =
    org.apache.spark.sql.zenospark.Bridge.column(new DoubleParam(value))
}
