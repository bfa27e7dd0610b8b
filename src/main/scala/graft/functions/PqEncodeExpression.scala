package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType}

/** Native PQ encoder: all `numSub` nearest-centroid codes of a quantized
  * vector in ONE expression evaluation.
  *
  * Bit-identical to the composed form (explode subvectors → argmin via
  * `array_min(transform(zip_with...))` → collect_list): integer L2,
  * ties to the lowest centroid id. The composed form walks an
  * interpreted lambda tree per (subspace × centroid × dim) element —
  * k=32, numSub=8, subDim=8 is 2,048 interpreted steps per row — and
  * needs a shuffle to reassemble the per-sub codes; this is one tight
  * primitive loop per row and encode becomes a NARROW scan.
  *
  * The codebooks ride in the expression (kilobytes — task-serialized
  * like any literal).
  */
case class PqEncode(child: Expression, books: Seq[Seq[Seq[Long]]])
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  @transient private lazy val flat: Array[Long] = {
    val numSub = books.length
    val k = books.head.length
    val subDim = books.head.head.length
    val a = new Array[Long](numSub * k * subDim)
    var i = 0
    for (s <- 0 until numSub; c <- 0 until k; d <- 0 until subDim) {
      a(i) = books(s)(c)(d); i += 1
    }
    a
  }

  // nullSafeEval can return null (bad dims / null element) even when the
  // child column is declared non-nullable
  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any = {
    val q = input.asInstanceOf[ArrayData]
    val numSub = books.length
    val k = books.head.length
    val subDim = books.head.head.length
    // Parity with QDot's null algebra: a dimension-mismatched vector or a
    // null element yields NULL — never codes. UnsafeArrayData.getLong is
    // assert-only out of range, so without this gate a short vector would
    // silently encode from garbage offsets.
    if (q.numElements() != numSub * subDim) return null
    var j = 0
    while (j < q.numElements()) {
      if (q.isNullAt(j)) return null
      j += 1
    }
    val codes = new Array[Int](numSub)
    var s = 0
    while (s < numSub) {
      var best = Long.MaxValue
      var bestC = 0
      var c = 0
      while (c < k) {
        var d2 = 0L
        var d = 0
        val base = (s * k + c) * subDim
        while (d < subDim) {
          val diff = q.getLong(s * subDim + d) - flat(base + d)
          d2 += diff * diff
          d += 1
        }
        if (d2 < best) { best = d2; bestC = c } // strict <: ties keep lowest cid
        c += 1
      }
      codes(s) = bestC
      s += 1
    }
    new GenericArrayData(codes)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
