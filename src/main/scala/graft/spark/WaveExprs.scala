package graft.spark

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types.{BooleanType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native codegen expressions for the three small per-candidate scalar
  * UDFs of the wave disposition chain (F4/F5 filter, J7 robots, the F6
  * path extraction). Each candidate row paid a ScalaUDF boundary per
  * call — every UTF8String argument eagerly converted to a java String,
  * the result converted back — for logic that is a byte scan or a
  * substring/prefix probe. These expressions run the identical logic
  * directly on UTF8String bytes (all compared patterns are themselves
  * valid UTF-8, so byte-level contains/prefix/scan ≡ the former String
  * semantics), with the non-null-intolerant null contracts of the UDF
  * bodies preserved (null href → excluded, null host → allow / "",
  * null path → "/"). The big canonicalizer/extractor UDFs stay UDFs
  * (SURVEY's adjudicated design — 480 lines of URL semantics).
  */
object WaveExprs {

  /** Path of a canonical URL: substring from the first '/' after "://"
    * to '?' or end; "" when there is no scheme or no path. Byte-level
    * twin of the former String indexOf/substring chain (called from
    * generated code).
    */
  def pathOf(href: UTF8String): UTF8String = {
    if (href == null) return UTF8String.EMPTY_UTF8
    val b = href.getBytes
    val n = b.length
    var sep = -1
    var i = 0
    while (sep < 0 && i + 2 < n) {
      if (b(i) == ':' && b(i + 1) == '/' && b(i + 2) == '/') sep = i
      i += 1
    }
    if (sep < 0) return UTF8String.EMPTY_UTF8
    var s = sep + 3
    while (s < n && b(s) != '/') s += 1
    if (s >= n) return UTF8String.EMPTY_UTF8
    var e = s
    while (e < n && b(e) != '?') e += 1
    UTF8String.fromBytes(b, s, e - s)
  }

  /** Pre-converted include/exclude pattern lists (built once driver-side,
    * shipped through the codegen references array).
    */
  final class CompiledFilters(
      includeHosts: Seq[String], includeStrings: Seq[String],
      excludeHosts: Seq[String], excludeStrings: Seq[String],
      regexSrc: Seq[String]) extends Serializable {
    val incH: Array[UTF8String] = includeHosts.map(UTF8String.fromString).toArray
    val incS: Array[UTF8String] = includeStrings.map(UTF8String.fromString).toArray
    val excH: Array[UTF8String] = excludeHosts.map(UTF8String.fromString).toArray
    val excS: Array[UTF8String] = excludeStrings.map(UTF8String.fromString).toArray
    val regexes: Array[scala.util.matching.Regex] = regexSrc.map(_.r).toArray
  }

  private def containsAny(s: UTF8String, subs: Array[UTF8String]): Boolean = {
    var i = 0
    while (i < subs.length) {
      if (s.contains(subs(i))) return true
      i += 1
    }
    false
  }

  /** F4/F5 include/exclude test — byte-level twin of Filters.test with
    * the UDF wrapper's null contract (null href → false, null host → "")
    * (called from generated code).
    */
  def filterTest(href: UTF8String, host0: UTF8String, f: CompiledFilters): Boolean = {
    if (href == null) return false
    val host = if (host0 == null) UTF8String.EMPTY_UTF8 else host0
    if (f.incH.nonEmpty || f.incS.nonEmpty) {
      if (!containsAny(host, f.incH) && !containsAny(href, f.incS)) return false
    }
    if (containsAny(host, f.excH)) return false
    if (containsAny(href, f.excS)) return false
    if (f.regexes.nonEmpty) {
      val s = href.toString
      var i = 0
      while (i < f.regexes.length) {
        if (f.regexes(i).findFirstIn(s).isDefined) return false
        i += 1
      }
    }
    true
  }

  /** Robots rule set keyed by host (built once driver-side; rule arrays
    * parallel: prefix bytes + allow flags, reference order preserved).
    */
  final class CompiledRobots(rules: Map[String, Seq[(String, Boolean)]])
      extends Serializable {
    val byHost: java.util.HashMap[UTF8String, (Array[UTF8String], Array[Boolean])] = {
      val m = new java.util.HashMap[UTF8String, (Array[UTF8String], Array[Boolean])]()
      rules.foreach { case (h, rs) =>
        m.put(UTF8String.fromString(h),
          (rs.map(r => UTF8String.fromString(r._1)).toArray, rs.map(_._2).toArray))
      }
      m
    }
  }

  private val Slash = UTF8String.fromString("/")

  /** J7 longest-prefix robots decision — twin of Udfs.robotsAllow's
    * single-pass scan with its null contract (null host → true, null
    * path → "/"); allow beats disallow on equal prefix length (called
    * from generated code).
    */
  def robotsAllow(host: UTF8String, path0: UTF8String, r: CompiledRobots): Boolean = {
    if (host == null) return true
    val rules = r.byHost.get(host)
    if (rules == null) return true
    val p = if (path0 == null) Slash else path0
    val (prefixes, allows) = rules
    var bestLen = -1
    var bestAllow = true
    var i = 0
    while (i < prefixes.length) {
      val prefix = prefixes(i)
      if (p.startsWith(prefix) &&
          (prefix.numBytes > bestLen ||
            (prefix.numBytes == bestLen && allows(i) && !bestAllow))) {
        bestLen = prefix.numBytes
        bestAllow = allows(i)
      }
      i += 1
    }
    bestLen < 0 || bestAllow
  }
}

/** Path extraction (F6/J7 input) — NOT null-intolerant: null href → "",
  * exactly like the former UDF body.
  */
case class PathOf(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullable: Boolean = false

  override def eval(input: InternalRow): Any =
    WaveExprs.pathOf(child.eval(input).asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    ev.copy(code = code"""
      ${c.code}
      final org.apache.spark.unsafe.types.UTF8String ${ev.value} =
        graft.spark.WaveExprs.pathOf(${c.isNull} ? null : ${c.value});""",
      isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): PathOf =
    copy(child = newChild)
}

object PathOf {
  def col(href: Column): Column =
    org.apache.spark.sql.zenospark.Bridge.column(
      PathOf(org.apache.spark.sql.zenospark.Bridge.expression(href)))
}

/** F4/F5 include/exclude — NOT null-intolerant: null href → false. */
case class FilterTest(left: Expression, right: Expression,
                      includeHosts: Seq[String], includeStrings: Seq[String],
                      excludeHosts: Seq[String], excludeStrings: Seq[String],
                      regexes: Seq[String]) extends BinaryExpression {
  override def dataType: DataType = BooleanType
  override def nullable: Boolean = false

  @transient private lazy val compiled = new WaveExprs.CompiledFilters(
    includeHosts, includeStrings, excludeHosts, excludeStrings, regexes)

  override def eval(input: InternalRow): Any =
    WaveExprs.filterTest(left.eval(input).asInstanceOf[UTF8String],
      right.eval(input).asInstanceOf[UTF8String], compiled)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val h = left.genCode(ctx)
    val o = right.genCode(ctx)
    val ref = ctx.addReferenceObj("filters", compiled,
      "graft.spark.WaveExprs.CompiledFilters")
    ev.copy(code = code"""
      ${h.code}
      ${o.code}
      final boolean ${ev.value} = graft.spark.WaveExprs.filterTest(
        ${h.isNull} ? null : ${h.value}, ${o.isNull} ? null : ${o.value}, $ref);""",
      isNull = FalseLiteral)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): FilterTest =
    copy(left = newLeft, right = newRight)
}

/** J7 robots decision — NOT null-intolerant: null host → true. */
case class RobotsAllow(left: Expression, right: Expression,
                       rules: Map[String, Seq[(String, Boolean)]])
    extends BinaryExpression {
  override def dataType: DataType = BooleanType
  override def nullable: Boolean = false

  @transient private lazy val compiled = new WaveExprs.CompiledRobots(rules)

  override def eval(input: InternalRow): Any =
    WaveExprs.robotsAllow(left.eval(input).asInstanceOf[UTF8String],
      right.eval(input).asInstanceOf[UTF8String], compiled)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val h = left.genCode(ctx)
    val p = right.genCode(ctx)
    val ref = ctx.addReferenceObj("robots", compiled,
      "graft.spark.WaveExprs.CompiledRobots")
    ev.copy(code = code"""
      ${h.code}
      ${p.code}
      final boolean ${ev.value} = graft.spark.WaveExprs.robotsAllow(
        ${h.isNull} ? null : ${h.value}, ${p.isNull} ? null : ${p.value}, $ref);""",
      isNull = FalseLiteral)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): RobotsAllow =
    copy(left = newLeft, right = newRight)
}
