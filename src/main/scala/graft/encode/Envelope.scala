package graft.encode

import java.util.Base64

import com.fasterxml.jackson.core.{JsonFactory, JsonToken}

/** Event envelope for the buffer-pipe topology (E5).
  *
  * The reference prepends a CF-shaped header to an already-encoded payload
  * so the buffer stage can route without re-decoding
  * (/root/reference/encoder/encoder.go:137-161): Type carries the payload's
  * output format, Key the row key (base64 — Go json.Marshal of []byte),
  * SeqNo and a nanosecond timestamp; Fields is null. `unwrap` JSON-decodes
  * exactly the first object and returns the remaining bytes as the payload
  * (/root/reference/encoder/json.go:378-416).
  *
  * In the pure-Spark topology typed columns travel through the plan and
  * this layer is unnecessary; it exists for wire-compat when interposing
  * on the reference's Kafka buffer topics.
  */
object Envelope {

  final case class CfHeader(eventType: String, key: Seq[String], seqNo: Long, timestamp: Long)

  private val jsonFactory = new JsonFactory()

  /** Header JSON exactly as Go's json.Marshal renders the reference
    * struct: field order Type,Key,SeqNo,Timestamp,Fields; []byte key
    * base64-encoded; Fields null.
    */
  def wrap(outputFormat: String, key: String, payload: Array[Byte], seqNo: Long,
           timestampNanos: Long): Array[Byte] = {
    val keyB64 = Base64.getEncoder.encodeToString(key.getBytes("UTF-8"))
    val header =
      s"""{"Type":"$outputFormat","Key":["$keyB64"],"SeqNo":$seqNo,"Timestamp":$timestampNanos,"Fields":null}"""
    val hb = header.getBytes("UTF-8")
    val out = new Array[Byte](hb.length + payload.length)
    System.arraycopy(hb, 0, out, 0, hb.length)
    System.arraycopy(payload, 0, out, hb.length, payload.length)
    out
  }

  /** Split header and payload: parse exactly one JSON object, return the
    * rest untouched. Key values are base64-decoded back to the original
    * row key (json.go:390-399).
    */
  def unwrap(data: Array[Byte]): (CfHeader, Array[Byte]) = {
    val parser = jsonFactory.createParser(data)
    var eventType = ""
    var seqNo = 0L
    var timestamp = 0L
    val keys = scala.collection.mutable.ArrayBuffer.empty[String]

    require(parser.nextToken() == JsonToken.START_OBJECT, "envelope must start with an object")
    var depth = 1
    while (depth > 0) {
      val tok = parser.nextToken()
      tok match {
        case JsonToken.START_OBJECT | JsonToken.START_ARRAY => depth += 1
        case JsonToken.END_OBJECT | JsonToken.END_ARRAY => depth -= 1
        case JsonToken.FIELD_NAME if depth == 1 =>
          parser.currentName() match {
            case "Type" => parser.nextToken(); eventType = parser.getText
            case "SeqNo" => parser.nextToken(); seqNo = parser.getLongValue
            case "Timestamp" => parser.nextToken(); timestamp = parser.getLongValue
            case "Key" =>
              require(parser.nextToken() == JsonToken.START_ARRAY, "Key must be an array")
              depth += 1
              var t = parser.nextToken()
              while (t != JsonToken.END_ARRAY) {
                val s = parser.getText
                keys += (try new String(Base64.getDecoder.decode(s), "UTF-8")
                  catch { case _: IllegalArgumentException => s })
                t = parser.nextToken()
              }
              depth -= 1
            case _ => // Fields:null etc — value consumed by the loop
          }
        case _ => ()
      }
    }
    val headerEnd = parser.currentLocation().getByteOffset.toInt
    parser.close()
    (CfHeader(eventType, keys.toSeq, seqNo, timestamp),
      java.util.Arrays.copyOfRange(data, headerEnd, data.length))
  }
}
