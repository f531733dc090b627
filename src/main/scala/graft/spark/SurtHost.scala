package graft.spark

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** SURT-style host reversal as a native codegen expression:
  * www.google.com → com.google.www (reference:
  * internal/pkg/postprocessor/domainscrawl/reversehost.go:11-55).
  */
case class SurtHost(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true

  override protected def nullSafeEval(input: Any): Any =
    SurtHost.reverse(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.spark.SurtHost.reverse($c)")

  override protected def withNewChildInternal(newChild: Expression): SurtHost =
    copy(child = newChild)
}

object SurtHost {
  /** Reference-faithful reversal (ports split and re-appended, IP literals
    * unchanged, trailing dot trimmed, lowercased) — single implementation
    * shared with graft.canon.Canon.reverseHost.
    */
  def reverse(host: UTF8String): UTF8String =
    UTF8String.fromString(graft.canon.Canon.reverseHost(host.toString))

  def apply(c: Column): Column =
    org.apache.spark.sql.zenospark.Bridge.column(
      SurtHost(org.apache.spark.sql.zenospark.Bridge.expression(c)))
}
