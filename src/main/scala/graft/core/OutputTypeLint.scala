package graft.core

import org.apache.spark.sql.types._

/** Gated-output schema lint (r15 verdict task 2).
  *
  * The driver's correctness harness canonicalizes each query's parquet
  * output and its DuckDB oracle result independently; r15 proved those two
  * paths are NOT byte-equivalent on every Spark type — `q_ks_drift`'s raw
  * DECIMAL(38,0) column hashed differently across harnesses despite
  * bit-identical values. This lint rejects, AT VERIFY TIME, any gated
  * output schema containing a type outside the set the driver gate has
  * actually proven over shipped rounds, so a novel type can never reach
  * the driver untested again.
  *
  * Proven set (r1–r15 green history): BIGINT, INT, STRING, DATE, BINARY,
  * BOOLEAN, DOUBLE (catalog doubles are quantized/rounded upstream —
  * exactness is the query's contract, the lint only pins the type).
  * SMALLINT/TINYINT are included as strict INT subranges with identical
  * rendering. Everything else — DECIMAL, TIMESTAMP, FLOAT, ARRAY, MAP,
  * STRUCT, INTERVAL — must be cast to a proven type (digits-only STRING
  * for exact big numerics, BIGINT for integral, quantized DOUBLE) before
  * the gated select.
  */
object OutputTypeLint {
  /** Typed rejection so Verify can distinguish a lint violation (must fail
    * the whole run, exit nonzero) from an ordinary query error (logged,
    * row absent, driver reports per-query). */
  final class Violation(msg: String) extends IllegalStateException(msg)

  private val proven: Set[DataType] =
    Set(LongType, IntegerType, ShortType, ByteType, StringType, DateType,
      BinaryType, BooleanType, DoubleType)

  /** Field names whose type is outside the proven set (empty = clean). */
  def violations(schema: StructType): Seq[String] =
    schema.fields.toSeq.collect {
      case f if !proven.contains(f.dataType) =>
        s"${f.name}: ${f.dataType.sql}"
    }

  /** Throw if the schema carries an unproven gated-output type. */
  def check(query: String, schema: StructType): Unit = {
    val v = violations(schema)
    if (v.nonEmpty) throw new Violation(
      s"[output-type-lint] $query emits unproven gated-output type(s) " +
        s"${v.mkString("[", ", ", "]")}; allowed: BIGINT, INT, SMALLINT, " +
        "TINYINT, STRING, DATE, BINARY, BOOLEAN, quantized DOUBLE. " +
        "Cast exact big numerics to digits-only STRING (see q_ks_drift, " +
        "r15) before the gated select.")
  }
}
