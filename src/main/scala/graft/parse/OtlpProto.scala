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
    /** Read a length prefix and validate it fits the region. A varint that
      * truncates negative through `.toInt` (>= 2^31) would otherwise move the
      * cursor BACKWARD in lenDelim — an infinite decode loop, not an error. */
    private def lenPrefix(): Int = {
      val raw = varint()
      if (raw < 0L || raw > (end - pos).toLong) throw new IllegalArgumentException(
        s"truncated message: length $raw at $pos, region ends at $end")
      raw.toInt
    }
    def lenDelim(): Reader = {
      val len = lenPrefix()
      val r = new Reader(bytes, pos, pos + len)
      pos += len
      r
    }
    def stringValue(): String = {
      val len = lenPrefix()
      val s = new String(bytes, pos, len, "UTF-8")
      pos += len; s
    }
    /** Read one length-delimited field as a raw byte blob (proto `bytes`). */
    def rawBytes(): Array[Byte] = {
      val len = lenPrefix()
      val b = java.util.Arrays.copyOfRange(bytes, pos, pos + len)
      pos += len; b
    }
    /** Skip one field value by wire type — unknown-field tolerance. */
    def skip(wire: Int): Unit = wire match {
      case 0 => varint(); ()
      case 1 => need(8); pos += 8
      case 2 => val len = lenPrefix(); pos += len
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

  // ---- trace arm --------------------------------------------------------
  // The reference's flagship protobuf input is SPANS, not logs:
  // doc_processor.rs:135,154-161 dispatches
  // `SourceInputFormat::OtlpTraceProtobuf` to `parse_otlp_spans_protobuf`
  // (quickwit-opentelemetry/src/otlp/traces.rs:240-330 Span::from_otlp).
  // Field numbers follow the public opentelemetry-proto trace schema
  // (opentelemetry/proto/trace/v1/trace.proto):
  //   ExportTraceServiceRequest { repeated ResourceSpans resource_spans = 1 }
  //   ResourceSpans { Resource resource = 1; repeated ScopeSpans scope_spans = 2 }
  //   ScopeSpans    { InstrumentationScope scope = 1; repeated Span spans = 2 }
  //   Span { bytes trace_id = 1; bytes span_id = 2; string trace_state = 3;
  //          bytes parent_span_id = 4; string name = 5; SpanKind kind = 6 (varint);
  //          fixed64 start_time_unix_nano = 7; fixed64 end_time_unix_nano = 8;
  //          repeated KeyValue attributes = 9;
  //          repeated Event events = 11; repeated Link links = 13;
  //          Status status = 15 }
  //   Span.Event { fixed64 time_unix_nano = 1; string name = 2;
  //                repeated KeyValue attributes = 3 }
  //   Span.Link  { bytes trace_id = 1; bytes span_id = 2 }
  //   Status { string message = 2; StatusCode code = 3 (varint: 0 unset,
  //            1 ok, 2 error) }

  final case class SpanEvent(timeUnixNano: Long, name: String,
                             attributes: Seq[(String, String)])
  final case class SpanLink(traceId: Array[Byte], spanId: Array[Byte])
  final case class Span(
      traceId: Array[Byte],          // exactly 16 bytes (trace_id.rs:83-95)
      spanId: Array[Byte],           // exactly 8 bytes (span_id.rs)
      parentSpanId: Option[Array[Byte]], // absent when empty (traces.rs:252-256)
      traceState: Option[String],
      name: String,                  // "" decodes to "unknown" (traces.rs:257-261)
      kind: Int,
      startUnixNano: Long,
      endUnixNano: Long,
      attributes: Seq[(String, String)],
      events: Seq[SpanEvent],
      links: Seq[SpanLink],
      statusCode: Int,               // 0 unset / 1 ok / 2 error
      statusMessage: String)
  final case class TraceRequest(
      resourceAttributes: Seq[(String, String)], // incl. service.name
      spans: Seq[Span])

  private def spanEvent(e: SpanEvent): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    if (e.timeUnixNano != 0L) writeFixed64(out, 1, e.timeUnixNano)
    if (e.name.nonEmpty) writeString(out, 2, e.name)
    e.attributes.foreach { case (k, v) => writeLenDelim(out, 3, keyValue(k, v)) }
    out.toByteArray
  }

  private def spanLink(l: SpanLink): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    writeLenDelim(out, 1, l.traceId)
    writeLenDelim(out, 2, l.spanId)
    out.toByteArray
  }

  private def spanBytes(s: Span): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    writeLenDelim(out, 1, s.traceId)
    writeLenDelim(out, 2, s.spanId)
    s.traceState.foreach(t => writeString(out, 3, t))
    s.parentSpanId.foreach(p => writeLenDelim(out, 4, p))
    if (s.name.nonEmpty) writeString(out, 5, s.name)
    if (s.kind != 0) { writeTag(out, 6, 0); writeVarint(out, s.kind.toLong) }
    if (s.startUnixNano != 0L) writeFixed64(out, 7, s.startUnixNano)
    if (s.endUnixNano != 0L) writeFixed64(out, 8, s.endUnixNano)
    s.attributes.foreach { case (k, v) => writeLenDelim(out, 9, keyValue(k, v)) }
    s.events.foreach(e => writeLenDelim(out, 11, spanEvent(e)))
    s.links.foreach(l => writeLenDelim(out, 13, spanLink(l)))
    if (s.statusCode != 0 || s.statusMessage.nonEmpty) {
      val st = new ByteArrayOutputStream()
      if (s.statusMessage.nonEmpty) writeString(st, 2, s.statusMessage)
      if (s.statusCode != 0) { writeTag(st, 3, 0); writeVarint(st, s.statusCode.toLong) }
      writeLenDelim(out, 15, st.toByteArray)
    }
    out.toByteArray
  }

  /** Encode one ExportTraceServiceRequest with a single ResourceSpans /
    * ScopeSpans envelope per call — the per-batch shape OTLP trace
    * exporters ship (one resource = one service). */
  def encodeTrace(req: TraceRequest): Array[Byte] = {
    val resource = new ByteArrayOutputStream()
    req.resourceAttributes.foreach { case (k, v) => writeLenDelim(resource, 1, keyValue(k, v)) }
    val scopeSpans = new ByteArrayOutputStream()
    req.spans.foreach(s => writeLenDelim(scopeSpans, 2, spanBytes(s)))
    val resourceSpans = new ByteArrayOutputStream()
    writeLenDelim(resourceSpans, 1, resource.toByteArray)
    writeLenDelim(resourceSpans, 2, scopeSpans.toByteArray)
    val out = new ByteArrayOutputStream()
    writeLenDelim(out, 1, resourceSpans.toByteArray)
    out.toByteArray
  }

  /** Concatenate multiple per-service requests into one request carrying
    * several ResourceSpans — valid protobuf because repeated message fields
    * concatenate on the wire. */
  def concatTraceRequests(reqs: Seq[Array[Byte]]): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    reqs.foreach(out.write)
    out.toByteArray
  }

  private def readSpanEvent(r: Reader): SpanEvent = {
    var time = 0L; var name = ""
    val attrs = Seq.newBuilder[(String, String)]
    while (r.hasMore) {
      val tag = r.varint(); val field = (tag >>> 3).toInt; val wire = (tag & 7).toInt
      (field, wire) match {
        case (1, 1) => time = r.fixed64()
        case (2, 2) => name = r.stringValue()
        case (3, 2) => attrs += readKeyValue(r.lenDelim())
        case _      => r.skip(wire)
      }
    }
    SpanEvent(time, name, attrs.result())
  }

  private def readSpanLink(r: Reader): SpanLink = {
    var tid: Array[Byte] = Array.emptyByteArray
    var sid: Array[Byte] = Array.emptyByteArray
    while (r.hasMore) {
      val tag = r.varint(); val field = (tag >>> 3).toInt; val wire = (tag & 7).toInt
      (field, wire) match {
        case (1, 2) => tid = r.rawBytes()
        case (2, 2) => sid = r.rawBytes()
        case _      => r.skip(wire)
      }
    }
    if (tid.length != 16) throw new IllegalArgumentException(
      s"trace ID must be 16 bytes long, got ${tid.length}")
    if (sid.length != 8) throw new IllegalArgumentException(
      s"span ID must be 8 bytes long, got ${sid.length}")
    SpanLink(tid, sid)
  }

  private def readSpan(r: Reader): Span = {
    var tid: Array[Byte] = Array.emptyByteArray
    var sid: Array[Byte] = Array.emptyByteArray
    var parent: Option[Array[Byte]] = None
    var traceState: Option[String] = None
    var name = ""; var kind = 0
    var start = 0L; var end = 0L
    var statusCode = 0; var statusMessage = ""
    val attrs = Seq.newBuilder[(String, String)]
    val events = Seq.newBuilder[SpanEvent]
    val links = Seq.newBuilder[SpanLink]
    while (r.hasMore) {
      val tag = r.varint(); val field = (tag >>> 3).toInt; val wire = (tag & 7).toInt
      (field, wire) match {
        case (1, 2)  => tid = r.rawBytes()
        case (2, 2)  => sid = r.rawBytes()
        case (3, 2)  => val ts = r.stringValue(); traceState = if (ts.isEmpty) None else Some(ts)
        case (4, 2)  => val p = r.rawBytes(); parent = if (p.isEmpty) None else Some(p)
        case (5, 2)  => name = r.stringValue()
        case (6, 0)  => kind = r.varint().toInt
        case (7, 1)  => start = r.fixed64()
        case (8, 1)  => end = r.fixed64()
        case (9, 2)  => attrs += readKeyValue(r.lenDelim())
        case (11, 2) => events += readSpanEvent(r.lenDelim())
        case (13, 2) => links += readSpanLink(r.lenDelim())
        case (15, 2) =>
          val st = r.lenDelim()
          while (st.hasMore) {
            val t2 = st.varint(); val f2 = (t2 >>> 3).toInt; val w2 = (t2 & 7).toInt
            (f2, w2) match {
              case (2, 2) => statusMessage = st.stringValue()
              case (3, 0) => statusCode = st.varint().toInt
              case _      => st.skip(w2)
            }
          }
        case _ => r.skip(wire)
      }
    }
    // TraceId/SpanId::try_from validation (traces.rs:250-251)
    if (tid.length != 16) throw new IllegalArgumentException(
      s"trace ID must be 16 bytes long, got ${tid.length}")
    if (sid.length != 8) throw new IllegalArgumentException(
      s"span ID must be 8 bytes long, got ${sid.length}")
    parent.foreach { p =>
      if (p.length != 8) throw new IllegalArgumentException(
        s"span ID must be 8 bytes long, got ${p.length}")
    }
    // "" → "unknown" (Span::from_otlp, traces.rs:257-261)
    Span(tid, sid, parent, traceState, if (name.isEmpty) "unknown" else name,
      kind, start, end, attrs.result(), events.result(), links.result(),
      statusCode, statusMessage)
  }

  /** Decode an ExportTraceServiceRequest. Spans from different
    * ResourceSpans keep their own resource attributes — the returned list
    * pairs each resource's attributes with its spans, mirroring the 1
    * request → N docs explosion (doc_processor.rs:154-161). */
  def decodeTrace(bytes: Array[Byte]): Seq[TraceRequest] = {
    val out = Seq.newBuilder[TraceRequest]
    val root = new Reader(bytes, 0, bytes.length)
    while (root.hasMore) {
      val tag = root.varint(); val field = (tag >>> 3).toInt; val wire = (tag & 7).toInt
      if (field == 1 && wire == 2) { // ResourceSpans
        val rs = root.lenDelim()
        val resAttrs = Seq.newBuilder[(String, String)]
        val spans = Seq.newBuilder[Span]
        while (rs.hasMore) {
          val t2 = rs.varint(); val f2 = (t2 >>> 3).toInt; val w2 = (t2 & 7).toInt
          (f2, w2) match {
            case (1, 2) => // Resource
              val res = rs.lenDelim()
              while (res.hasMore) {
                val t3 = res.varint(); val f3 = (t3 >>> 3).toInt; val w3 = (t3 & 7).toInt
                if (f3 == 1 && w3 == 2) resAttrs += readKeyValue(res.lenDelim())
                else res.skip(w3)
              }
            case (2, 2) => // ScopeSpans
              val ss = rs.lenDelim()
              while (ss.hasMore) {
                val t3 = ss.varint(); val f3 = (t3 >>> 3).toInt; val w3 = (t3 & 7).toInt
                if (f3 == 2 && w3 == 2) spans += readSpan(ss.lenDelim())
                else ss.skip(w3)
              }
            case _ => rs.skip(w2)
          }
        }
        out += TraceRequest(resAttrs.result(), spans.result())
      } else root.skip(wire)
    }
    out.result()
  }
}
