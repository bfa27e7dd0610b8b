package graft.encode

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Spark-side Common Format JSON decode (the reference's DecodeEvent /
  * fixFieldTypes — /root/reference/encoder/json.go:157-236).
  *
  * `from_json` parses the envelope; Field values land as strings (Spark's
  * JSON parser stringifies non-string scalars for StringType targets),
  * and the type fixups from the reference become explicit casts applied
  * from the registered schema:
  *  - numeric strings cast back to int/long/double,
  *  - base64 strings to binary (`unbase64`),
  *  - RFC3339 strings to timestamps.
  */
object CfDecode {

  /** CF event envelope schema (dynamic payload as Name/Value strings). */
  val cfSchema: StructType = StructType(Seq(
    StructField("Type", StringType),
    StructField("Key", ArrayType(StringType)),
    StructField("SeqNo", LongType),
    StructField("Timestamp", LongType),
    StructField("Fields", ArrayType(StructType(Seq(
      StructField("Name", StringType),
      StructField("Value", StringType)))))))

  /** Parse a CF JSON string column into the envelope struct. */
  def parse(json: Column): Column = from_json(json, cfSchema)

  /** Extract one field's value by name from a parsed envelope. */
  def fieldValue(parsed: Column, name: String): Column =
    element_at(
      map_from_entries(transform(parsed.getField("Fields"),
        f => struct(f.getField("Name"), f.getField("Value")))),
      name)

  /** Type fixup (decode side of E8): cast a string field value back to the
    * schema type; binary via base64, timestamps via RFC3339.
    */
  def fixType(value: Column, dt: DataType): Column = dt match {
    case BinaryType => unbase64(value)
    // timestamps: Spark's cast parses ISO-8601 incl. 'Z' and any
    // fractional-second width (the RFC3339Nano trimming on encode)
    case _ => value.cast(dt)
  }

  /** Decode a CF JSON column into typed columns per the registered schema:
    * envelope metadata + one column per payload field.
    */
  def decodeRows(json: Column, payload: StructType): Seq[Column] = {
    val parsed = parse(json)
    Seq(
      parsed.getField("Type").as("op"),
      parsed.getField("Key").as("key"),
      parsed.getField("SeqNo").as("seqno"),
      parsed.getField("Timestamp").as("ts")) ++
      payload.fields.map(f => fixType(fieldValue(parsed, f.name), f.dataType).as(f.name))
  }
}
