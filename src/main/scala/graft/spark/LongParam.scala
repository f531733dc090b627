package graft.spark

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.LeafExpression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types.{DataType, LongType}

/** A plan parameter: evaluates like a long literal but reaches generated
  * code through the codegen `references` array instead of being inlined
  * into the source text. A plain `lit(wave)` embeds the value in the
  * generated Java source, so every wave of the crawl loop produces
  * textually-new sources and the whole-stage-codegen cache (keyed on
  * source text) misses — measured 227 Janino recompiles / ~1.3 s of pure
  * driver-serial per 2-wave crawl at 4 cores, repeated at every wave for
  * the lifetime of a crawl. Routing the value through `references` keeps
  * the source text identical across waves, so the warmup wave's compiled
  * classes are reused verbatim.
  *
  * Deliberately non-foldable: constant folding would collapse it back
  * into an inlined literal. The value never participates in partition
  * pruning or parquet pushdown on the hot path (it appears in projections
  * and in a filter over the small host-state side), so the lost
  * foldability costs nothing at scale.
  */
case class LongParam(value: Long) extends LeafExpression {
  override def dataType: DataType = LongType
  override def nullable: Boolean = false
  override def foldable: Boolean = false
  override def eval(input: InternalRow): Any = value

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("longParam", Long.box(value), "java.lang.Long")
    ev.copy(code = code"final long ${ev.value} = $ref;", isNull = FalseLiteral)
  }
}

object LongParam {
  /** Column of a stable-codegen long parameter. */
  def col(value: Long): Column =
    org.apache.spark.sql.zenospark.Bridge.column(new LongParam(value))
}
