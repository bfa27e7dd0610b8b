package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier

/** SparkSessionExtensions entry point: registers graft's native functions
  * for any session built with
  * `spark.sql.extensions=graft.functions.GraftExtensions` (or
  * `.withExtensions(new GraftExtensions)`).
  *
  * Extension-point usage is deliberately minimal (SURVEY §4 conclusion):
  * the reference's rewrites all map onto built-in operators, so the only
  * custom expressions are the byte-parity hot-path functions.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier(RowKeyExpression.name),
      RowKeyExpression.info,
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        RowKeyExpression(exprs)))
  }
}
