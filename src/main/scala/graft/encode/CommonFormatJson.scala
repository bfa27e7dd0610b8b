package graft.encode

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Common Format JSON encoder.
  *
  * Wire shape from the reference (/root/reference/types/format.go:26-46,
  * doc/commonformat.md:1-40):
  *   {"Type":"insert|delete|schema","Key":[…],"SeqNo":N,"Timestamp":T,
  *    "Fields":[{"Name":…,"Value":…},…]}
  * Delete events carry no Fields payload beyond the key
  * (/root/reference/encoder/json.go:93-107); updates arrive already split
  * into delete+insert pairs upstream (graft.changelog.Changelog).
  *
  * Spark-first: the event is a typed struct column and `to_json` renders it
  * at the sink edge only — upstream operators keep typed columns so
  * Catalyst can prune/push. `to_json` preserves struct field order, giving
  * a deterministic field sequence (Type, Key, SeqNo, Timestamp, Fields)
  * matching the reference's marshaled order.
  */
object CommonFormatJson {

  /** One CF field entry. Values are rendered as strings — the reference's
    * dynamically-typed `Fields.Value` collapses to strings at the JSON
    * edge for everything non-numeric we emit here.
    */
  def field(name: String, value: Column): Column =
    struct(lit(name).as("Name"), value.cast("string").as("Value"))

  /** Full CF event as a typed struct (pre-serialization form). */
  def event(opType: Column, key: Seq[Column], seqNo: Column, timestamp: Column,
            fields: Seq[(String, Column)]): Column =
    struct(
      opType.cast("string").as("Type"),
      array(key.map(_.cast("string")): _*).as("Key"),
      seqNo.cast("long").as("SeqNo"),
      timestamp.cast("long").as("Timestamp"),
      array(fields.map { case (n, v) => field(n, v) }: _*).as("Fields"))

  /** Serialize to the CF JSON wire string. */
  def toJsonString(eventStruct: Column): Column = to_json(eventStruct)

  /** Convenience: insert event JSON for a row. */
  def insertJson(key: Seq[Column], seqNo: Column, timestamp: Column,
                 fields: Seq[(String, Column)]): Column =
    toJsonString(event(lit("insert"), key, seqNo, timestamp, fields))
}
