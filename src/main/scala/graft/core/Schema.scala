package graft.core

import org.apache.spark.sql.types._

/** MySQL ⇄ Spark schema mapping (SURVEY §1.2).
  *
  * The reference infers schemas dynamically from `information_schema`
  * (/root/reference/schema/table_schema.go:118-133) and scans values into
  * Go driver types (/root/reference/util/util.go:223-245). This module is
  * the Spark-side equivalent: a `TableSchema` of MySQL column specs mapped
  * to a `StructType`, with PK/ordinal/source-type carried in field
  * metadata so downstream operators (row-key extraction, PK-protected
  * projection, sink DDL) don't need a side channel.
  *
  * Parity notes (intentional, documented divergences kept in metadata):
  *  - `decimal`/`numeric` → DecimalType(p,s) INTERNALLY (exact money
  *    arithmetic through the whole plan); the reference's lossy float64
  *    read (util/util.go:234) is reproduced at the ENCODER EDGE only —
  *    CF JSON / Avro / MsgPack each cast decimal → double when
  *    rendering, so wire output stays byte-compatible while no
  *    precision is lost before the sink (DecimalEdgeSpec). The mapped
  *    decimal(p,s) is also recorded in metadata as `improvedType`;
  *    `exactDecimals = false` recovers the reference's lossy scan type
  *    for consumers that need the double END TO END.
  *  - `timestamp` → TimestampType (UTC session), `datetime` →
  *    TimestampNTZType (the reference forces datetime to UTC —
  *    encoder/json.go:176-200).
  */
object Schema {

  final case class ColumnSchema(
      name: String,
      ordinal: Int,
      isNullable: Boolean,
      dataType: String, // MySQL data_type, lowercase, e.g. "bigint"
      columnType: String = "", // full column_type, e.g. "tinyint(1)"
      numericPrecision: Int = 0,
      numericScale: Int = 0,
      key: String = "") { // "PRI" for primary-key members
    def isPrimaryKey: Boolean = key.equalsIgnoreCase("PRI")
  }

  final case class TableSchema(db: String, table: String, columns: Seq[ColumnSchema]) {
    def primaryKey: Seq[ColumnSchema] =
      columns.filter(_.isPrimaryKey).sortBy(_.ordinal)
    /** Tables without a PK are refused (changelog/mysql.go:224-227). */
    def hasPrimaryKey: Boolean = primaryKey.nonEmpty
  }

  /** MySQL data type → Spark type (util/util.go:223-245 semantics).
    *
    * `exactDecimals = true` (default) carries decimals as
    * `DecimalType(p, s)` through the internal plan; the reference's lossy
    * float64 read (util/util.go:234) happens at the encoder edge, so wire
    * output still matches. `false` reproduces the lossy scan type itself
    * for consumers that want the reference's double end-to-end.
    */
  def sparkType(c: ColumnSchema, exactDecimals: Boolean = true): DataType = c.dataType match {
    case "tinyint" if c.columnType.startsWith("tinyint(1)") => BooleanType
    case "int" | "integer" | "tinyint" | "smallint" | "mediumint" | "year" => IntegerType
    case "bigint" | "bit" => LongType
    case "float" => FloatType
    case "decimal" | "numeric" if exactDecimals =>
      DecimalType(math.max(1, math.min(38, c.numericPrecision)),
        math.max(0, math.min(37, c.numericScale)))
    case "double" | "decimal" | "numeric" => DoubleType // parity: decimals read as doubles
    case "char" | "varchar" | "text" | "tinytext" | "mediumtext" | "longtext" |
         "json" | "enum" | "set" | "date" | "time" => StringType
    case "timestamp" => TimestampType
    case "datetime" => TimestampNTZType
    case "blob" | "tinyblob" | "mediumblob" | "longblob" | "binary" | "varbinary" => BinaryType
    case other => throw new IllegalArgumentException(s"unsupported MySQL type: $other")
  }

  def toStructType(ts: TableSchema, exactDecimals: Boolean = true): StructType = StructType(
    ts.columns.sortBy(_.ordinal).map { c =>
      val mb = new MetadataBuilder()
        .putString("mysqlType", c.dataType)
        .putLong("ordinal", c.ordinal.toLong)
        .putBoolean("isPrimaryKey", c.isPrimaryKey)
      if (c.dataType == "decimal" || c.dataType == "numeric")
        mb.putString("improvedType", s"decimal(${c.numericPrecision},${c.numericScale})")
      StructField(c.name, sparkType(c, exactDecimals), c.isNullable, mb.build())
    })

  /** Rebuild the MySQL-side TableSchema from a mapped StructType (the
    * metadata carries mysqlType/ordinal/PK; decimal precision+scale from
    * `improvedType`; `tinyint` mapped to Boolean implies `tinyint(1)`).
    * Inverse of [[toStructType]] for control-plane schema mutation.
    */
  def fromStructType(db: String, table: String, st: StructType): TableSchema = {
    val DecimalRe = """decimal\((\d+),(\d+)\)""".r
    TableSchema(db, table, st.fields.toSeq.map { f =>
      val m = f.metadata
      val mysqlType = if (m.contains("mysqlType")) m.getString("mysqlType") else "text"
      val (p, s) =
        if (m.contains("improvedType")) m.getString("improvedType") match {
          case DecimalRe(a, b) => (a.toInt, b.toInt)
          case _ => (0, 0)
        } else (0, 0)
      ColumnSchema(f.name,
        ordinal = if (m.contains("ordinal")) m.getLong("ordinal").toInt else st.fieldIndex(f.name) + 1,
        isNullable = f.nullable,
        dataType = mysqlType,
        columnType = if (mysqlType == "tinyint" && f.dataType == BooleanType) "tinyint(1)" else "",
        numericPrecision = p, numericScale = s,
        key = if (m.contains("isPrimaryKey") && m.getBoolean("isPrimaryKey")) "PRI" else "")
    })
  }

  /** Primary-key column names recoverable from a mapped StructType. */
  def pkColumns(st: StructType): Seq[String] =
    st.fields.filter(f => f.metadata.contains("isPrimaryKey") &&
      f.metadata.getBoolean("isPrimaryKey")).map(_.name).toSeq

  /** Spark type → sink DDL type (encoder/sql.go:197-213 shape). */
  def sqlType(dt: DataType): String = dt match {
    case BooleanType => "BOOLEAN"
    case IntegerType => "INT"
    case LongType => "BIGINT"
    case FloatType => "FLOAT"
    case DoubleType => "DOUBLE"
    case d: DecimalType => s"DECIMAL(${d.precision},${d.scale})"
    case TimestampType | TimestampNTZType => "TIMESTAMP"
    case BinaryType => "BLOB"
    case _ => "TEXT"
  }
}
