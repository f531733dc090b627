package graft.spark

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression for the FNV-1a 64-bit seen-set hash — the
  * hottest scalar in the wave (runs once per claimed row and once per
  * candidate URL). A codegen'd Expression stays inside whole-stage codegen
  * (no UDF serialization boundary, null handling for free) and operates on
  * UTF8String bytes directly — zero String allocation.
  *
  * Semantics identical to graft.canon.Canon.fnv64a (Go hash/fnv parity,
  * reference: internal/pkg/preprocessor/seencheck/seencheck.go:76-89);
  * parity asserted in Fnv64aSpec.
  */
case class Fnv64a(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true

  override protected def nullSafeEval(input: Any): Any = {
    val utf8 = input.asInstanceOf[UTF8String]
    Fnv64a.hashBytes(utf8.getBytes)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.spark.Fnv64a.hashBytes($c.getBytes())")

  override protected def withNewChildInternal(newChild: Expression): Fnv64a =
    copy(child = newChild)
}

object Fnv64a {
  /** FNV-1a 64 over raw bytes (called from generated code — keep public). */
  def hashBytes(bytes: Array[Byte]): Long = {
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < bytes.length) {
      h ^= (bytes(i) & 0xffL)
      h *= 0x100000001b3L
      i += 1
    }
    h
  }

  /** Column wrapper (Spark 4 Column wraps ColumnNode, not Expression). */
  def apply(c: Column): Column =
    org.apache.spark.sql.zenospark.Bridge.column(
      Fnv64a(org.apache.spark.sql.zenospark.Bridge.expression(c)))
}
