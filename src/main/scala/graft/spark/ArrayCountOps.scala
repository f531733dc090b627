package graft.spark

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native codegen counting/quantization passes over array columns —
  * replacements for `size(filter(arr, pred))` / `transform(arr, f)`
  * shapes on hot paths (higher-order functions are CodegenFallback: an
  * interpreted expression tree per element). Each mirrors its built-in
  * chain's value semantics exactly, including the null rules:
  * `filter` drops elements whose predicate is null (null struct / null
  * field), `size(null array)` is null (legacy sizeOfNull off), and
  * `transform` maps null elements to null results.
  */
object ArrayCountOps {

  /** Count of struct elements whose `kind` field equals the constant
    * (called from generated code). Mirrors
    * size(filter(links, l => l.getField("kind") === k)).
    */
  def countKind(a: ArrayData, ordinal: Int, fields: Int, kind: UTF8String): Int = {
    val n = a.numElements()
    var cnt = 0
    var i = 0
    while (i < n) {
      if (!a.isNullAt(i)) {
        val row = a.getStruct(i, fields)
        if (!row.isNullAt(ordinal) && row.getUTF8String(ordinal).equals(kind)) cnt += 1
      }
      i += 1
    }
    cnt
  }

  /** Count of string elements ∈ the stop set (called from generated
    * code). Mirrors size(filter(toks, t => t===s1 || … || t===sn)):
    * null elements compare null and are dropped.
    */
  def countIn(a: ArrayData, stops: java.util.HashSet[UTF8String]): Int = {
    val n = a.numElements()
    var cnt = 0
    var i = 0
    while (i < n) {
      if (!a.isNullAt(i) && stops.contains(a.getUTF8String(i))) cnt += 1
      i += 1
    }
    cnt
  }

  /** ×1000 HALF_UP quantization of a float/double array to longs (called
    * from generated code). Mirrors
    * transform(arr, x => round(x.cast(double) * 1000).cast(long)) —
    * Spark's Round(double) goes through BigDecimal HALF_UP (see
    * VectorOps.quantDotF); null elements stay null.
    */
  def quantizeF(a: ArrayData): ArrayData = {
    val n = a.numElements()
    val out = new Array[Any](n)
    var i = 0
    while (i < n) {
      if (!a.isNullAt(i))
        out(i) = java.math.BigDecimal.valueOf(a.getFloat(i).toDouble * 1000.0)
          .setScale(0, java.math.RoundingMode.HALF_UP).doubleValue().toLong
      i += 1
    }
    new GenericArrayData(out)
  }

  def quantizeD(a: ArrayData): ArrayData = {
    val n = a.numElements()
    val out = new Array[Any](n)
    var i = 0
    while (i < n) {
      if (!a.isNullAt(i))
        out(i) = java.math.BigDecimal.valueOf(a.getDouble(i) * 1000.0)
          .setScale(0, java.math.RoundingMode.HALF_UP).doubleValue().toLong
      i += 1
    }
    new GenericArrayData(out)
  }
}

/** Count of array<struct> elements whose string field `fieldName` equals
  * `kind` — the native twin of size(filter(arr, _.getField(f) === kind)).
  */
case class LinkKindCount(child: Expression, fieldName: String, kind: String)
    extends UnaryExpression {
  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true

  private def structType: StructType =
    child.dataType.asInstanceOf[ArrayType].elementType.asInstanceOf[StructType]
  private def ordinal: Int = structType.fieldIndex(fieldName)
  private def nFields: Int = structType.size
  @transient private lazy val kindU = UTF8String.fromString(kind)

  override protected def nullSafeEval(input: Any): Any =
    ArrayCountOps.countKind(input.asInstanceOf[ArrayData], ordinal, nFields, kindU)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val kref = ctx.addReferenceObj("kind", kindU,
      "org.apache.spark.unsafe.types.UTF8String")
    defineCodeGen(ctx, ev, c =>
      s"graft.spark.ArrayCountOps.countKind($c, $ordinal, $nFields, $kref)")
  }

  override protected def withNewChildInternal(newChild: Expression): LinkKindCount =
    copy(child = newChild)
}

object LinkKindCount {
  def col(links: Column, kind: String): Column =
    org.apache.spark.sql.zenospark.Bridge.column(
      LinkKindCount(org.apache.spark.sql.zenospark.Bridge.expression(links),
        "kind", kind))
}

/** Count of string-array elements ∈ a constant stop set — the native twin
  * of size(filter(toks, t => stops.map(t === _).reduce(_ || _))).
  */
case class StopHits(child: Expression, stops: Seq[String]) extends UnaryExpression {
  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true

  @transient private lazy val stopSet: java.util.HashSet[UTF8String] = {
    val s = new java.util.HashSet[UTF8String]()
    stops.foreach(x => s.add(UTF8String.fromString(x)))
    s
  }

  override protected def nullSafeEval(input: Any): Any =
    ArrayCountOps.countIn(input.asInstanceOf[ArrayData], stopSet)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val sref = ctx.addReferenceObj("stops", stopSet, "java.util.HashSet")
    defineCodeGen(ctx, ev, c => s"graft.spark.ArrayCountOps.countIn($c, $sref)")
  }

  override protected def withNewChildInternal(newChild: Expression): StopHits =
    copy(child = newChild)
}

object StopHits {
  def col(tokens: Column, stops: Seq[String]): Column =
    org.apache.spark.sql.zenospark.Bridge.column(
      StopHits(org.apache.spark.sql.zenospark.Bridge.expression(tokens), stops))
}

/** ×1000 HALF_UP quantization of a numeric array to longs — the native
  * twin of transform(arr, x => round(x.cast(double)*1000).cast(long)).
  */
case class QuantizeVec(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType,
    child.dataType.asInstanceOf[ArrayType].containsNull)
  override def nullable: Boolean = true

  private def isFloat =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override protected def nullSafeEval(input: Any): Any = {
    val a = input.asInstanceOf[ArrayData]
    if (isFloat) ArrayCountOps.quantizeF(a) else ArrayCountOps.quantizeD(a)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val fn = if (isFloat) "quantizeF" else "quantizeD"
    defineCodeGen(ctx, ev, c => s"graft.spark.ArrayCountOps.$fn($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): QuantizeVec =
    copy(child = newChild)
}

object QuantizeVec {
  def col(vec: Column): Column =
    org.apache.spark.sql.zenospark.Bridge.column(
      QuantizeVec(org.apache.spark.sql.zenospark.Bridge.expression(vec)))
}
