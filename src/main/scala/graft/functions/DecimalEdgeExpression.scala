package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Cast, Expression, RuntimeReplaceable}
import org.apache.spark.sql.types.{DecimalType, DoubleType, StringType}

/** Type-dispatched string rendering for SQL DML VALUES: decimals pass
  * through the FLOAT64 encoder edge first, everything else renders
  * directly.
  *
  * The reference renders every numeric through float64 before statement
  * text (encoder/sql.go via the common-format row, whose schema maps
  * decimal to double at schema/mysql_avro_schema_converter.go), and this
  * repo's encoder-edge contract does the same for CF JSON / Avro /
  * MsgPack. `SqlDml.value` receives an UNRESOLVED Column, so the dispatch
  * cannot happen at Column-build time — a [[RuntimeReplaceable]] defers
  * it to analysis, when the child's type is known: `decimal(p,s)` becomes
  * `CAST(CAST(x AS DOUBLE) AS STRING)` (the lossy edge, e.g. `1.10` →
  * `1.1`), every other type keeps the plain `CAST(x AS STRING)` the DML
  * path always used. Replaced before optimization, so it adds zero
  * runtime machinery of its own.
  */
case class DecimalEdgeString(child: Expression) extends RuntimeReplaceable {

  override lazy val replacement: Expression = child.dataType match {
    case _: DecimalType => Cast(Cast(child, DoubleType), StringType)
    case _ => Cast(child, StringType)
  }

  override def children: Seq[Expression] = Seq(child)

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}
