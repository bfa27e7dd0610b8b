package graft.encode

import java.io.ByteArrayOutputStream

import scala.jdk.CollectionConverters._

import org.apache.avro.{Schema => ASchema, SchemaBuilder}
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.avro.io.{DecoderFactory, EncoderFactory}
import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Avro binary encoder (E2).
  *
  * The container ships avro core (no spark-avro connector), so the
  * row→record conversion runs in `mapPartitions` with a per-partition
  * writer — the schema and writer are built once per partition, not per
  * row, and the stage stays fully distributed.
  *
  * Reference semantics (/root/reference/encoder/avro.go,
  * /root/reference/schema/mysql_avro_schema_converter.go:106-130):
  *  - every field is nullable (union [type, "null"]);
  *  - three metadata fields appended: `ref_key` (long = seqno), `row_key`
  *    (bytes = PK concat), `is_deleted` (boolean);
  *  - delete events carry only key + is_deleted (encoder/avro.go:326-359);
  *  - timestamps encode as epoch-millis long (encoder/avro.go:283).
  */
object AvroCodec {

  val MetadataFields: Seq[String] = Seq("ref_key", "row_key", "is_deleted")

  def avroSchema(st: StructType, name: String, namespace: String): ASchema = {
    var fields = SchemaBuilder.record(name).namespace(namespace).fields()
    def nullable(t: ASchema): ASchema = ASchema.createUnion(java.util.List.of(t, ASchema.create(ASchema.Type.NULL)))
    st.fields.foreach { f =>
      val base = f.dataType match {
        case BooleanType => ASchema.create(ASchema.Type.BOOLEAN)
        case IntegerType | ShortType | ByteType => ASchema.create(ASchema.Type.INT)
        case LongType => ASchema.create(ASchema.Type.LONG)
        case FloatType => ASchema.create(ASchema.Type.FLOAT)
        case DoubleType => ASchema.create(ASchema.Type.DOUBLE)
        case StringType => ASchema.create(ASchema.Type.STRING)
        case BinaryType => ASchema.create(ASchema.Type.BYTES)
        case TimestampType | TimestampNTZType => ASchema.create(ASchema.Type.LONG) // epoch ms
        case DateType => ASchema.create(ASchema.Type.STRING)
        case other => throw new IllegalArgumentException(s"no avro mapping for $other")
      }
      fields = fields.name(f.name).`type`(nullable(base)).withDefault(null)
    }
    fields = fields.name("ref_key").`type`(nullable(ASchema.create(ASchema.Type.LONG))).withDefault(null)
    fields = fields.name("row_key").`type`(nullable(ASchema.create(ASchema.Type.BYTES))).withDefault(null)
    fields = fields.name("is_deleted").`type`(nullable(ASchema.create(ASchema.Type.BOOLEAN))).withDefault(null)
    fields.endRecord()
  }

  private def toAvroValue(v: Any): Any = v match {
    case null => null
    case t: java.sql.Timestamp => t.getTime
    case t: java.time.Instant => t.toEpochMilli
    case t: java.time.LocalDateTime => t.toInstant(java.time.ZoneOffset.UTC).toEpochMilli
    case d: java.sql.Date => d.toString
    case d: java.time.LocalDate => d.toString
    case b: Array[Byte] => java.nio.ByteBuffer.wrap(b)
    case other => other
  }

  /** Encode rows to Avro binary. Expects payload columns matching `st`,
    * plus `seqno` (long), `row_key` (string/binary) and `op` columns; for
    * deletes only key metadata is emitted.
    */
  def encode(df: DataFrame, st: StructType, name: String, namespace: String): Dataset[Array[Byte]] = {
    val schemaJson = avroSchema(st, name, namespace).toString
    val payloadCols = st.fields.map(_.name).toSeq
    implicit val enc = org.apache.spark.sql.Encoders.BINARY
    val input = df.select(
      (payloadCols.map(col) :+ col("seqno") :+ col("row_key").cast("binary") :+
        (col("op") === "delete").as("_is_del")): _*)
    input.mapPartitions { it =>
      val schema = new ASchema.Parser().parse(schemaJson)
      val writer = new GenericDatumWriter[GenericRecord](schema)
      val factory = EncoderFactory.get()
      it.map { row =>
        val rec = new GenericData.Record(schema)
        val isDel = row.getBoolean(row.length - 1)
        if (!isDel) {
          payloadCols.indices.foreach { i =>
            rec.put(payloadCols(i), toAvroValue(row.get(i)))
          }
        }
        rec.put("ref_key", row.getLong(payloadCols.length))
        rec.put("row_key", java.nio.ByteBuffer.wrap(row.getAs[Array[Byte]](payloadCols.length + 1)))
        rec.put("is_deleted", java.lang.Boolean.valueOf(isDel))
        val out = new ByteArrayOutputStream()
        val e = factory.binaryEncoder(out, null)
        writer.write(rec, e)
        e.flush()
        out.toByteArray
      }
    }
  }

  /** Decode Avro binary back to GenericRecords (test round-trips). */
  def decode(bytes: Array[Byte], schema: ASchema): GenericRecord = {
    val reader = new GenericDatumReader[GenericRecord](schema)
    reader.read(null, DecoderFactory.get().binaryDecoder(bytes, null))
  }
}
