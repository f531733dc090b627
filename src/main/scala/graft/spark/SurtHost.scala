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
  /** Reverse dot-separated labels over UTF8String bytes. */
  def reverse(host: UTF8String): UTF8String = {
    val s = host.toString
    val parts = s.split('.')
    if (parts.length <= 1) host
    else {
      val sb = new java.lang.StringBuilder(s.length)
      var i = parts.length - 1
      while (i >= 0) {
        sb.append(parts(i))
        if (i > 0) sb.append('.')
        i -= 1
      }
      UTF8String.fromString(sb.toString)
    }
  }

  def apply(c: Column): Column =
    org.apache.spark.sql.zenospark.Bridge.column(
      SurtHost(org.apache.spark.sql.zenospark.Bridge.expression(c)))
}
