package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression for the length-prefixed row key (E7).
  *
  * Semantics: for PK values (v1..vn), emit
  * `len(str(v1)) + str(v1) + … + len(str(vn)) + str(vn)` where len is the
  * UTF-8 BYTE length (Go `len()`) — byte-parity with the reference's
  * `GetRowKey` (/root/reference/encoder/encoder.go:101-116).
  *
  * Exists alongside the composed-builtins version (`graft.core.RowKey`) as
  * the (b)-tier extension path: a single generated-code expression
  * (`doGenCode`) instead of 4n chained concat/length/cast nodes — one
  * StringBuilder pass per row, stays inside whole-stage codegen. Children
  * must already be strings (cast upstream), keeping the expression's
  * codegen free of per-type dispatch.
  */
case class RowKeyExpression(children: Seq[Expression]) extends Expression {

  override def dataType: DataType = StringType
  override def nullable: Boolean = children.exists(_.nullable)
  override def foldable: Boolean = children.forall(_.foldable)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    if (children.isEmpty)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        "graft_row_key needs at least one PK column")
    else if (!children.forall(_.dataType == StringType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"graft_row_key expects string inputs, got ${children.map(_.dataType.simpleString)}")
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
  }

  override def eval(input: InternalRow): Any = {
    val sb = new java.lang.StringBuilder()
    var i = 0
    while (i < children.length) {
      val v = children(i).eval(input)
      if (v == null) return null
      val u = v.asInstanceOf[UTF8String]
      sb.append(u.numBytes).append(u.toString)
      i += 1
    }
    UTF8String.fromString(sb.toString)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val childGens = children.map(_.genCode(ctx))
    val sb = ctx.freshName("sb")
    val parts = childGens.map { cg =>
      code"""
        ${cg.code}
        if (${cg.isNull}) {
          ${ev.isNull} = true;
        } else if (!${ev.isNull}) {
          $sb.append(${cg.value}.numBytes()).append(${cg.value}.toString());
        }
      """
    }
    ev.copy(code =
      code"""
        boolean ${ev.isNull} = false;
        UTF8String ${ev.value} = null;
        java.lang.StringBuilder $sb = new java.lang.StringBuilder();
        ${parts.reduce(_ + _)}
        if (!${ev.isNull}) {
          ${ev.value} = UTF8String.fromString($sb.toString());
        }
      """)
  }

  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(children = newChildren)
}

object RowKeyExpression {
  val name = "graft_row_key"

  val info = new ExpressionInfo(classOf[RowKeyExpression].getName, name,
    "graft_row_key(pk1, pk2, ...) - length-prefixed primary-key row key")

  /** Register in a session's function registry for SQL + expr() use. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      name, exprs => RowKeyExpression(exprs), "built-in")
}
