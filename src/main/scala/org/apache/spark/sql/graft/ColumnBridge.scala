/* Lives under org.apache.spark.sql so it can reach the private[sql]
 * Column ↔ catalyst Expression converters that Spark 4 hid when Column
 * became backend-agnostic. This is the only file outside the graft
 * namespace; everything else goes through this bridge. */
package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
