package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge to the classic Column <-> Catalyst Expression converters,
  * which are `private[sql]` since the Spark 4 Column/ColumnNode split.
  * Lives in `org.apache.spark.sql` solely to re-export the two
  * conversions graft's native expressions need when no SparkSession is
  * in scope to go through the function registry (e.g.
  * [[graft.encode.SqlDml.value]] wrapping a column in a
  * RuntimeReplaceable). Nothing else belongs here.
  */
object GraftColumnBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
