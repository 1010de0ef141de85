/* Bridge into Spark's sql-private Column<->Expression converters — the
 * standard pattern OSS Spark extensions use to expose custom Catalyst
 * expressions as Columns.
 */
package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

object GraftColumnBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
