package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Scan-edge value normalization (E8 + SURVEY §7.3 hard part 4).
  *
  * MySQL quirks the reference fixes up per row
  * (/root/reference/encoder/json.go:157-236, snapshot/mysql.go:210-255):
  *  - zero-dates (`0000-00-00 …`) are unrepresentable as instants — the
  *    reference decodes them to Go's zero time; Avro encodes them as null
  *    (encoder/avro.go:149-155). We map them to null + a flag column so
  *    downstream can distinguish "null" from "zero".
  *  - `timestamp` is session-zone-relative, `datetime` is wall-clock: the
  *    session is pinned to UTC and datetime maps to TimestampNTZ
  *    (core.Schema), so both are unambiguous.
  *  - tinyint(1) → boolean, text/json → string, binary → bytes: applied
  *    from the mapped schema via casts.
  */
object Normalize {

  /** MySQL zero-date strings (DATE or DATETIME rendering). */
  def isZeroDate(c: Column): Column =
    c.cast("string").startsWith("0000-00-00")

  /** Null out zero-dates; optionally record the zero-ness in a flag.
    * The flag computes BEFORE the value is replaced.
    */
  def zeroDateToNull(df: DataFrame, column: String, flag: Boolean = true): DataFrame = {
    val flagged =
      if (flag) df.withColumn(s"${column}_was_zero", isZeroDate(col(column)))
      else df
    flagged.withColumn(column,
      when(isZeroDate(col(column)), lit(null)).otherwise(col(column)))
  }

  /** Cast raw (string-typed) source columns to the mapped schema types —
    * the batch form of the reference's driverType→GoType fixups.
    */
  def castToSchema(df: DataFrame, target: StructType): DataFrame =
    target.fields.foldLeft(df) { (acc, f) =>
      if (acc.columns.contains(f.name)) {
        val c = col(f.name)
        val casted = f.dataType match {
          case BooleanType => (c === "1" || c === "true" || c.cast("int") === 1)
          case t @ (TimestampType | TimestampNTZType) =>
            when(isZeroDate(c), lit(null)).otherwise(c.cast(t))
          case t => c.cast(t)
        }
        acc.withColumn(f.name, casted)
      } else acc
    }
}
