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
        // reference parity: DECIMAL maps to Avro double on the wire
        // (schema/mysql_avro_schema_converter.go:37-77) — the internal
        // plan carries the exact DecimalType; the loss happens here, at
        // the encoder edge only
        case _: DecimalType => ASchema.create(ASchema.Type.DOUBLE)
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
    // epoch-0 is the twin of Go's zero time.Time sentinel: the reference
    // encodes zero-valued MySQL datetimes as null, any other timestamp as
    // epoch-millis (encoder/avro.go:149-155, :283)
    case t: java.sql.Timestamp => if (t.getTime == 0L) null else t.getTime
    case t: java.time.Instant => if (t.toEpochMilli == 0L) null else t.toEpochMilli
    case t: java.time.LocalDateTime =>
      val ms = t.toInstant(java.time.ZoneOffset.UTC).toEpochMilli
      if (ms == 0L) null else ms
    case d: java.sql.Date => d.toString
    case d: java.time.LocalDate => d.toString
    case b: Array[Byte] => java.nio.ByteBuffer.wrap(b)
    // avroSchema maps ShortType/ByteType to Avro INT — widen here, or
    // GenericData's union resolution rejects the Short/Byte instance
    case s: java.lang.Short => s.intValue
    case b: java.lang.Byte => b.intValue
    // DECIMAL → double at the wire edge (util/util.go:234 reads decimals
    // as float64; the Avro schema above declares DOUBLE)
    case d: java.math.BigDecimal => d.doubleValue()
    case other => other
  }

  /** Encode rows to Avro binary. Expects payload columns matching `st`,
    * plus `seqno` (long), `row_key` (string/binary) and `op` columns.
    * Delete events carry the PRIMARY-KEY payload columns (`keyCols`) plus
    * the metadata trio only — non-key fields stay null, mirroring
    * `convertRowToAvroFormat`'s Delete branch (fillAvroKey without
    * fillAvroFields, encoder/avro.go:326-359).
    */
  def encode(df: DataFrame, st: StructType, name: String, namespace: String,
             keyCols: Seq[String] = Seq.empty): Dataset[Array[Byte]] = {
    val schemaJson = avroSchema(st, name, namespace).toString
    val payloadCols = st.fields.map(_.name).toSeq
    val keyIdx = payloadCols.zipWithIndex.filter(kv => keyCols.contains(kv._1)).map(_._2)
    // a typo'd key column would otherwise silently emit deletes with
    // all-null primary keys
    require(keyIdx.length == keyCols.length,
      s"keyCols ${keyCols.filterNot(payloadCols.contains)} not in payload schema")
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
        val fill = if (isDel) keyIdx else payloadCols.indices
        fill.foreach { i =>
          rec.put(payloadCols(i), toAvroValue(row.get(i)))
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

  /** Distributed decode: Avro binary back to typed columns, one
    * per-partition reader (schema parsed once per partition, not per
    * record). Column types surface as their WIRE types — timestamp
    * payload fields come back as epoch-ms LongType (encoder/avro.go:283),
    * dates as strings, `row_key` as its UTF-8 string form — so the result
    * is directly comparable against a SQL oracle without re-inventing the
    * encoder's mappings in reverse.
    */
  def decodeRows(bytes: Dataset[Array[Byte]], st: StructType, name: String,
                 namespace: String): DataFrame = {
    val schemaJson = avroSchema(st, name, namespace).toString
    val wireFields = st.fields.map { f =>
      f.dataType match {
        case TimestampType | TimestampNTZType => StructField(f.name, LongType)
        case DateType => StructField(f.name, StringType)
        case ShortType | ByteType => StructField(f.name, IntegerType)
        case _: DecimalType => StructField(f.name, DoubleType) // wire type
        case other => StructField(f.name, other)
      }
    }
    val outSchema = StructType(wireFields.toSeq ++ Seq(
      StructField("ref_key", LongType),
      StructField("row_key", StringType),
      StructField("is_deleted", BooleanType)))
    implicit val enc = org.apache.spark.sql.Encoders.row(outSchema)
    val names = st.fields.map(_.name).toSeq
    bytes.mapPartitions { it =>
      val schema = new ASchema.Parser().parse(schemaJson)
      val reader = new GenericDatumReader[GenericRecord](schema)
      def fromAvro(v: Any): Any = v match {
        case null => null
        case u: org.apache.avro.util.Utf8 => u.toString
        case bb: java.nio.ByteBuffer =>
          val a = new Array[Byte](bb.remaining()); bb.duplicate().get(a); a
        case x => x
      }
      it.map { b =>
        val rec = reader.read(null, DecoderFactory.get().binaryDecoder(b, null))
        val payload = names.map(n => fromAvro(rec.get(n)))
        val rowKey = new String(
          fromAvro(rec.get("row_key")).asInstanceOf[Array[Byte]],
          java.nio.charset.StandardCharsets.UTF_8)
        Row.fromSeq(payload ++ Seq(
          rec.get("ref_key").asInstanceOf[Long], rowKey,
          rec.get("is_deleted").asInstanceOf[Boolean]))
      }
    }
  }
}
