package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native MinHash signature: the full k-shingle / rotation-family
  * signature of a document in ONE expression evaluation.
  *
  * Computes exactly what the composed pipeline
  * (`Dedup.shingles` → md5 → 8 rotated mins, and the DuckDB oracle SQL)
  * computes — hash function `s` orders shingles by the md5 hex string
  * rotated left by 4*s chars — but per ROW instead of per exploded
  * shingle-row: no n× row materialization, no aggregation shuffle. A
  * document's signature never leaves the task that read it; at 100 TB the
  * signature stage becomes embarrassingly parallel scan work.
  *
  * `CodegenFallback` is deliberate: the per-row digest loop dominates, and
  * keeping the expression out of generated code costs one virtual call per
  * row. MessageDigest is allocated per-thread.
  */
case class MinHashSignature(child: Expression, k: Int, numHashes: Int)
    extends UnaryExpression with CodegenFallback {

  require(numHashes <= 8, "rotation family uses 4-char steps over 32 hex chars")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = child.nullable

  @transient private lazy val digests = ThreadLocal.withInitial(
    new java.util.function.Supplier[MessageDigest] {
      override def get(): MessageDigest = MessageDigest.getInstance("MD5")
    })

  private val hexChars = "0123456789abcdef".toCharArray

  override def nullSafeEval(input: Any): Any = {
    val text = input.asInstanceOf[UTF8String].toString
    val md = digests.get()
    val mins = Array.fill[String](numHashes)(null)
    val n = math.max(text.length - (k - 1), 1)
    val hex = new Array[Char](32)
    var pos = 0
    while (pos < n) {
      val shingle = text.substring(pos, math.min(pos + k, text.length))
      md.reset()
      val d = md.digest(shingle.getBytes("UTF-8"))
      var i = 0
      while (i < 16) {
        hex(i * 2) = hexChars((d(i) >> 4) & 0xf)
        hex(i * 2 + 1) = hexChars(d(i) & 0xf)
        i += 1
      }
      val h = new String(hex)
      var s = 0
      while (s < numHashes) {
        val rot = if (s == 0) h else h.substring(4 * s) + h.substring(0, 4 * s)
        if (mins(s) == null || rot.compareTo(mins(s)) < 0) mins(s) = rot
        s += 1
      }
      pos += 1
    }
    new GenericArrayData(mins.map(UTF8String.fromString(_)).asInstanceOf[Array[Any]])
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MinHashSignature {
  /** Column API: minhash signature array for a text column. */
  def signature(text: org.apache.spark.sql.Column, k: Int, numHashes: Int)
               (implicit spark: org.apache.spark.sql.SparkSession): org.apache.spark.sql.Column = {
    // register-and-call keeps us on the public Column surface (Spark 4's
    // Column wraps ColumnNodes, not Expressions)
    val fname = s"graft_minhash_${k}_$numHashes"
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      fname, exprs => MinHashSignature(exprs.head, k, numHashes), "built-in")
    org.apache.spark.sql.functions.call_function(fname, text)
  }
}
