package graft.core

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Row-key extraction: length-prefixed concatenation of primary-key column
  * values.
  *
  * Semantics from the reference's `GetRowKey`
  * (/root/reference/encoder/encoder.go:101-116): each PK value is rendered
  * as a string and prefixed with the decimal UTF-8 BYTE length of that
  * string (Go `len()` counts bytes, not characters — 'é' has prefix 2),
  * e.g. PK (1, 22) -> "11" + "222" read as len("1")+"1", len("22")+"22" =
  * "11222". Kafka partitions by this key (/root/reference/pipe/kafka.go:627),
  * so the expression must be deterministic and cheap — it stays inside
  * whole-stage codegen because it is pure builtin functions.
  */
object RowKey {

  /** Length-prefixed row key over the given PK columns. */
  def rowKey(pkCols: Seq[Column]): Column = {
    val parts = pkCols.flatMap { c =>
      val s = c.cast("string")
      Seq(octet_length(s).cast("string"), s)
    }
    concat(parts: _*).as("row_key")
  }

  /** Partition key: stable bucket for a numeric key (Kafka-partitioning
    * analogue; file/SQL pipes collapse to a constant —
    * /root/reference/pipe/file.go:768-773). `pmod` keeps the result
    * non-negative for any integral input.
    */
  def partitionKey(key: Column, numPartitions: Int): Column =
    pmod(key, lit(numPartitions))
}
