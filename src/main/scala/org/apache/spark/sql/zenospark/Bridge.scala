package org.apache.spark.sql.zenospark

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ⇄ Expression bridge. Spark 4's public Column wraps a ColumnNode;
  * converting to/from Catalyst Expressions is private[sql], so extensions
  * that define native Expressions (graft.spark.Fnv64a) go through this
  * in-package accessor — the standard pattern for Catalyst extensions.
  */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
