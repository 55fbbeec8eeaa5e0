package graft.parse

import java.io.ByteArrayOutputStream

/** Minimal protobuf wire-format codec for the OTLP logs ingest arm —
  * the reference's protobuf branch of doc-processing
  * (quickwit-indexing/src/actors/doc_processor.rs:154-161 dispatches
  * `SourceInputFormat::OtlpLogsProtobuf` to a prost decode of
  * `ExportLogsServiceRequest`, then explodes 1 request → N log docs,
  * quickwit-opentelemetry/src/otlp/logs.rs).
  *
  * Field numbers follow the PUBLIC opentelemetry-proto schema
  * (opentelemetry/proto/logs/v1/logs.proto, collector/logs/v1):
  *   ExportLogsServiceRequest { repeated ResourceLogs resource_logs = 1 }
  *   ResourceLogs  { Resource resource = 1; repeated ScopeLogs scope_logs = 2 }
  *   Resource      { repeated KeyValue attributes = 1 }
  *   ScopeLogs     { repeated LogRecord log_records = 2 }
  *   LogRecord     { fixed64 time_unix_nano = 1;
  *                   SeverityNumber severity_number = 2 (varint);
  *                   string severity_text = 3; AnyValue body = 5;
  *                   repeated KeyValue attributes = 6 }
  *   KeyValue      { string key = 1; AnyValue value = 2 }
  *   AnyValue      { oneof { string string_value = 1; bool bool_value = 2;
  *                           int64 int_value = 3; double double_value = 4 } }
  *
  * Hand-rolled on purpose: no protobuf runtime exists offline, and the
  * wire format (varint / fixed64 / length-delimited) is a public, stable
  * spec. The decoder skips unknown fields by wire type, so payloads from
  * real OTLP exporters (which carry trace ids, dropped counts, scopes…)
  * decode to the subset we model. Proto3 absent fields decode to the
  * declared defaults (absent body → None).
  */
object OtlpProto {

  final case class LogRecord(
      timeUnixNano: Long,
      severityNumber: Int,
      severityText: String,
      body: Option[String],
      attributes: Seq[(String, String)])

  final case class LogsRequest(
      resourceAttributes: Seq[(String, String)],
      records: Seq[LogRecord])

  // ---- writer ----------------------------------------------------------

  private def writeVarint(out: ByteArrayOutputStream, value: Long): Unit = {
    var v = value
    while ((v & ~0x7FL) != 0L) {
      out.write(((v & 0x7F) | 0x80).toInt)
      v >>>= 7
    }
    out.write(v.toInt)
  }

  private def writeTag(out: ByteArrayOutputStream, field: Int, wire: Int): Unit =
    writeVarint(out, ((field.toLong << 3) | wire))

  private def writeLenDelim(out: ByteArrayOutputStream, field: Int, bytes: Array[Byte]): Unit = {
    writeTag(out, field, 2)
    writeVarint(out, bytes.length.toLong)
    out.write(bytes)
  }

  private def writeString(out: ByteArrayOutputStream, field: Int, s: String): Unit =
    writeLenDelim(out, field, s.getBytes("UTF-8"))

  private def writeFixed64(out: ByteArrayOutputStream, field: Int, v: Long): Unit = {
    writeTag(out, field, 1)
    var i = 0
    while (i < 8) { out.write(((v >>> (8 * i)) & 0xFF).toInt); i += 1 }
  }

  private def anyString(s: String): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    writeString(out, 1, s) // AnyValue.string_value
    out.toByteArray
  }

  private def keyValue(k: String, v: String): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    writeString(out, 1, k)
    writeLenDelim(out, 2, anyString(v))
    out.toByteArray
  }

  private def logRecord(r: LogRecord): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    // proto3 default elision: zero time / severity write nothing
    if (r.timeUnixNano != 0L) writeFixed64(out, 1, r.timeUnixNano)
    if (r.severityNumber != 0) { writeTag(out, 2, 0); writeVarint(out, r.severityNumber.toLong) }
    if (r.severityText.nonEmpty) writeString(out, 3, r.severityText)
    r.body.foreach(b => writeLenDelim(out, 5, anyString(b)))
    r.attributes.foreach { case (k, v) => writeLenDelim(out, 6, keyValue(k, v)) }
    out.toByteArray
  }

  /** Encode one ExportLogsServiceRequest with a single ResourceLogs /
    * ScopeLogs envelope — the shape every OTLP exporter emits per batch. */
  def encode(req: LogsRequest): Array[Byte] = {
    val resource = new ByteArrayOutputStream()
    req.resourceAttributes.foreach { case (k, v) => writeLenDelim(resource, 1, keyValue(k, v)) }
    val scopeLogs = new ByteArrayOutputStream()
    req.records.foreach(r => writeLenDelim(scopeLogs, 2, logRecord(r)))
    val resourceLogs = new ByteArrayOutputStream()
    writeLenDelim(resourceLogs, 1, resource.toByteArray)
    writeLenDelim(resourceLogs, 2, scopeLogs.toByteArray)
    val out = new ByteArrayOutputStream()
    writeLenDelim(out, 1, resourceLogs.toByteArray)
    out.toByteArray
  }

  // ---- reader ----------------------------------------------------------

  /** A bounded view over `bytes[pos, end)`. EVERY read checks the region
    * bound — a corrupt or truncated length prefix must surface as a decode
    * error, never as silently-wrong values read from sibling bytes. */
  private final class Reader(bytes: Array[Byte], var pos: Int, val end: Int) {
    def hasMore: Boolean = pos < end
    private def need(n: Int): Unit =
      if (pos + n > end) throw new IllegalArgumentException(
        s"truncated message: need $n bytes at $pos, region ends at $end")
    def varint(): Long = {
      var shift = 0; var v = 0L
      while (true) {
        need(1)
        val b = bytes(pos); pos += 1
        v |= (b & 0x7FL) << shift
        if ((b & 0x80) == 0) return v
        shift += 7
        if (shift > 63) throw new IllegalArgumentException("varint too long")
      }
      v
    }
    def fixed64(): Long = {
      need(8)
      var v = 0L; var i = 0
      while (i < 8) { v |= (bytes(pos + i).toLong & 0xFF) << (8 * i); i += 1 }
      pos += 8; v
    }
    def lenDelim(): Reader = {
      val len = varint().toInt
      need(len)
      val r = new Reader(bytes, pos, pos + len)
      pos += len
      r
    }
    def stringValue(): String = {
      val len = varint().toInt
      need(len)
      val s = new String(bytes, pos, len, "UTF-8")
      pos += len; s
    }
    /** Skip one field value by wire type — unknown-field tolerance. */
    def skip(wire: Int): Unit = wire match {
      case 0 => varint(); ()
      case 1 => need(8); pos += 8
      case 2 => val len = varint().toInt; need(len); pos += len
      case 5 => need(4); pos += 4
      case w => throw new IllegalArgumentException(s"unsupported wire type $w")
    }
  }

  private def readAnyString(r: Reader): Option[String] = {
    var out: Option[String] = None
    while (r.hasMore) {
      val tag = r.varint(); val field = (tag >>> 3).toInt; val wire = (tag & 7).toInt
      if (field == 1 && wire == 2) out = Some(r.stringValue()) else r.skip(wire)
    }
    out
  }

  private def readKeyValue(r: Reader): (String, String) = {
    var k = ""; var v = ""
    while (r.hasMore) {
      val tag = r.varint(); val field = (tag >>> 3).toInt; val wire = (tag & 7).toInt
      (field, wire) match {
        case (1, 2) => k = r.stringValue()
        case (2, 2) => v = readAnyString(r.lenDelim()).getOrElse("")
        case _      => r.skip(wire)
      }
    }
    (k, v)
  }

  private def readLogRecord(r: Reader): LogRecord = {
    var time = 0L; var sevNum = 0; var sevText = ""; var body: Option[String] = None
    val attrs = Seq.newBuilder[(String, String)]
    while (r.hasMore) {
      val tag = r.varint(); val field = (tag >>> 3).toInt; val wire = (tag & 7).toInt
      (field, wire) match {
        case (1, 1) => time = r.fixed64()
        case (2, 0) => sevNum = r.varint().toInt
        case (3, 2) => sevText = r.stringValue()
        case (5, 2) => body = readAnyString(r.lenDelim())
        case (6, 2) => attrs += readKeyValue(r.lenDelim())
        case _      => r.skip(wire)
      }
    }
    LogRecord(time, sevNum, sevText, body, attrs.result())
  }

  def decode(bytes: Array[Byte]): LogsRequest = {
    val resAttrs = Seq.newBuilder[(String, String)]
    val records = Seq.newBuilder[LogRecord]
    val root = new Reader(bytes, 0, bytes.length)
    while (root.hasMore) {
      val tag = root.varint(); val field = (tag >>> 3).toInt; val wire = (tag & 7).toInt
      if (field == 1 && wire == 2) { // ResourceLogs
        val rl = root.lenDelim()
        while (rl.hasMore) {
          val t2 = rl.varint(); val f2 = (t2 >>> 3).toInt; val w2 = (t2 & 7).toInt
          (f2, w2) match {
            case (1, 2) => // Resource
              val res = rl.lenDelim()
              while (res.hasMore) {
                val t3 = res.varint(); val f3 = (t3 >>> 3).toInt; val w3 = (t3 & 7).toInt
                if (f3 == 1 && w3 == 2) resAttrs += readKeyValue(res.lenDelim())
                else res.skip(w3)
              }
            case (2, 2) => // ScopeLogs
              val sl = rl.lenDelim()
              while (sl.hasMore) {
                val t3 = sl.varint(); val f3 = (t3 >>> 3).toInt; val w3 = (t3 & 7).toInt
                if (f3 == 2 && w3 == 2) records += readLogRecord(sl.lenDelim())
                else sl.skip(w3)
              }
            case _ => rl.skip(w2)
          }
        }
      } else root.skip(wire)
    }
    LogsRequest(resAttrs.result(), records.result())
  }
}
