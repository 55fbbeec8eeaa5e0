package graft.parse

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => ScTest}
import OtlpProto._

/** OTLP logs protobuf codec: golden wire bytes, round-trip property,
  * unknown-field tolerance, proto3 default elision
  * (doc_processor.rs:154-161; opentelemetry-proto logs.proto). */
class OtlpProtoSpec extends AnyFunSuite {

  /** length-delimited field assembled from the wire spec, not the codec:
    * tag byte + single-byte length + payload (all test messages < 128 B). */
  private def ld(tag: Int, payloadHex: String): String = {
    require(payloadHex.length % 2 == 0 && payloadHex.length / 2 < 128)
    f"$tag%02x${payloadHex.length / 2}%02x$payloadHex"
  }

  test("golden wire bytes for a minimal request (independently assembled)") {
    // one resource attr ("svc" -> "a"); one record: time=1, sev=9,
    // text "INFO", body "hi", no attributes
    val req = LogsRequest(Seq("svc" -> "a"), Seq(
      LogRecord(1L, 9, "INFO", Some("hi"), Nil)))
    val got = encode(req).map(b => f"${b & 0xff}%02x").mkString

    val kv = ld(0x0a, "737663") + ld(0x12, ld(0x0a, "61")) // "svc" -> AnyValue("a")
    val resource = ld(0x0a, kv)
    val record = "090100000000000000" + "1009" +            // fixed64 time, varint sev
      ld(0x1a, "494e464f") + ld(0x2a, ld(0x0a, "6869"))     // "INFO", body AnyValue("hi")
    val scopeLogs = ld(0x12, record)
    val resourceLogs = ld(0x0a, resource) + ld(0x12, scopeLogs)
    assert(got === ld(0x0a, resourceLogs))
    assert(decode(encode(req)) === req)
  }

  test("round-trip property over arbitrary requests") {
    val str = Gen.alphaNumStr.map(_.take(12))
    val rec = for {
      t <- Gen.chooseNum(0L, Long.MaxValue)
      sev <- Gen.chooseNum(0, 24)
      st <- str
      body <- Gen.option(str)
      attrs <- Gen.listOfN(2, Gen.zip(Gen.alphaStr.suchThat(_.nonEmpty).map(_.take(6)), str))
    } yield LogRecord(t, sev, st, body, attrs)
    val reqGen = for {
      ra <- Gen.listOfN(2, Gen.zip(Gen.const("res"), str))
      rs <- Gen.listOf(rec).map(_.take(8))
    } yield LogsRequest(ra, rs)
    val prop = Prop.forAll(reqGen) { r => decode(encode(r)) == r }
    val res = ScTest.check(ScTest.Parameters.default.withMinSuccessfulTests(200), prop)
    assert(res.passed, res.status.toString)
  }

  test("unknown fields are skipped by wire type (real-exporter tolerance)") {
    // a record carrying unknown varint/fixed64/bytes fields before the body
    val record =
      "382a" +                      // field 7 varint 42
      "41" + "11" * 8 +             // field 8 fixed64
      ld(0x4a, "6162") +            // field 9 bytes "ab"
      ld(0x2a, ld(0x0a, "6869"))    // body AnyValue("hi")
    val root = ld(0x0a, ld(0x12, ld(0x12, record)))
    val bytes = root.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray
    assert(decode(bytes) === LogsRequest(Nil,
      Seq(LogRecord(0L, 0, "", Some("hi"), Nil))))
  }

  test("truncated/corrupt length prefixes throw instead of decoding sibling bytes") {
    val good = encode(LogsRequest(Seq("k" -> "v"),
      Seq(LogRecord(7L, 9, "INFO", Some("hello"), Seq("a" -> "b")))))
    // chopping the tail off mid-message must never decode silently
    (1 until good.length).foreach { keep =>
      val t = good.take(keep)
      val r = try { decode(t); None } catch {
        case e: IllegalArgumentException => Some(e)
        case e: ArrayIndexOutOfBoundsException =>
          fail(s"unbounded read at keep=$keep: $e")
      }
      // either a clean decode error or (for cuts landing on a field
      // boundary of the outermost envelope) a shorter-but-valid prefix —
      // never an exception class that implies reading past the region
      r.foreach(e => assert(e.getMessage != null))
    }
    // an inner length prefix LARGER than its region: garbage-free failure
    val inflated = good.clone()
    inflated(1) = (inflated(1) + 40).toByte // ResourceLogs length lies
    intercept[IllegalArgumentException](decode(inflated))
  }

  test("proto3 defaults: zero/empty fields elided and restored") {
    val r = LogsRequest(Nil, Seq(LogRecord(0L, 0, "", None, Nil)))
    assert(decode(encode(r)) === r)
  }

  test("a length prefix >= 2^31 is a decode error, not a backward cursor") {
    // varint 0xFF 0xFF 0xFF 0xFF 0x0F = 2^32-1: `.toInt` truncates to -1,
    // which before the fix moved `pos` BACKWARD in lenDelim (infinite
    // decode loop on the ingest path) / SIOOBE in stringValue
    val evil = Array(0x0a, 0xff, 0xff, 0xff, 0xff, 0x0f).map(_.toByte)
    val e = intercept[IllegalArgumentException](decode(evil))
    assert(e.getMessage.contains("truncated"))
    intercept[IllegalArgumentException](decodeTrace(evil))
  }

  // ---- trace arm (doc_processor.rs:135,154-161; traces.rs:240-330) ------

  private def tid(b: Int) = Array.fill(16)(b.toByte)
  private def sid(b: Int) = Array.fill(8)(b.toByte)

  /** Array-safe comparable projection (case classes with Array fields
    * compare by reference). */
  private def norm(r: TraceRequest): (Seq[(String, String)], Seq[Product]) =
    (r.resourceAttributes, r.spans.map { s =>
      (s.traceId.toSeq, s.spanId.toSeq, s.parentSpanId.map(_.toSeq),
        s.traceState, s.name, s.kind, s.startUnixNano, s.endUnixNano,
        s.attributes, s.events,
        s.links.map(l => (l.traceId.toSeq, l.spanId.toSeq)),
        s.statusCode, s.statusMessage)
    })

  test("trace golden wire bytes for a minimal span (independently assembled)") {
    val span = Span(tid(1), sid(2), parentSpanId = Some(sid(3)),
      traceState = None, name = "op", kind = 2,
      startUnixNano = 1L, endUnixNano = 2L,
      attributes = Nil, events = Nil, links = Nil,
      statusCode = 2, statusMessage = "err")
    val req = TraceRequest(Seq("service.name" -> "svc"), Seq(span))
    val got = encodeTrace(req).map(b => f"${b & 0xff}%02x").mkString

    val kv = ld(0x0a, "736572766963652e6e616d65") + ld(0x12, ld(0x0a, "737663"))
    val resource = ld(0x0a, kv)
    val spanHex =
      ld(0x0a, "01" * 16) + ld(0x12, "02" * 8) +          // trace_id, span_id
      ld(0x22, "03" * 8) +                                 // parent_span_id
      ld(0x2a, "6f70") +                                   // name "op"
      "3002" +                                             // kind varint 2
      "390100000000000000" + "410200000000000000" +        // start/end fixed64
      ld(0x7a, ld(0x12, "657272") + "1802")                // Status{message,code=2}
    val scopeSpans = ld(0x12, spanHex)
    val resourceSpans = ld(0x0a, resource) + ld(0x12, scopeSpans)
    assert(got === ld(0x0a, resourceSpans))
    assert(decodeTrace(encodeTrace(req)).map(norm) === Seq(norm(req)))
  }

  test("trace round-trip: events, links, trace_state, multi-resource concat") {
    val spanA = Span(tid(1), sid(2), None, Some("st=1"), "opA", 1,
      100L, 250L, Seq("k" -> "7"),
      events = Seq(SpanEvent(101L, "ev0", Seq("i" -> "0")),
                   SpanEvent(102L, "ev1", Nil)),
      links = Seq(SpanLink(tid(1), sid(9))),
      statusCode = 1, statusMessage = "")
    val spanB = Span(tid(1), sid(4), Some(sid(2)), None, "opB", 3,
      200L, 300L, Nil, Nil, Nil, 2, "span failed")
    val reqA = TraceRequest(Seq("service.name" -> "a", "env" -> "prod"), Seq(spanA))
    val reqB = TraceRequest(Seq("service.name" -> "b"), Seq(spanB))
    val wire = concatTraceRequests(Seq(encodeTrace(reqA), encodeTrace(reqB)))
    // repeated message fields concatenate on the wire: one request with
    // two ResourceSpans decodes to both resources, attributes intact
    assert(decodeTrace(wire).map(norm) === Seq(norm(reqA), norm(reqB)))
  }

  test("trace id length validation mirrors TryFrom{Trace,Span}IdError") {
    def reqWith(t: Array[Byte], s: Array[Byte], p: Option[Array[Byte]] = None) =
      encodeTrace(TraceRequest(Nil, Seq(Span(t, s, p, None, "op", 1,
        1L, 2L, Nil, Nil, Nil, 0, ""))))
    val e1 = intercept[IllegalArgumentException](decodeTrace(reqWith(Array.fill(15)(1.toByte), sid(2))))
    assert(e1.getMessage === "trace ID must be 16 bytes long, got 15")
    val e2 = intercept[IllegalArgumentException](decodeTrace(reqWith(tid(1), Array.fill(9)(2.toByte))))
    assert(e2.getMessage === "span ID must be 8 bytes long, got 9")
    val e3 = intercept[IllegalArgumentException](decodeTrace(reqWith(tid(1), sid(2), Some(Array.fill(4)(3.toByte)))))
    assert(e3.getMessage === "span ID must be 8 bytes long, got 4")
    // link ids validate too (traces.rs:633-634)
    val bad = encodeTrace(TraceRequest(Nil, Seq(Span(tid(1), sid(2), None, None,
      "op", 1, 1L, 2L, Nil, Nil, Seq(SpanLink(Array.fill(2)(1.toByte), sid(2))), 0, ""))))
    intercept[IllegalArgumentException](decodeTrace(bad))
  }

  test("empty span name decodes to \"unknown\" (Span::from_otlp)") {
    val req = TraceRequest(Nil, Seq(Span(tid(1), sid(2), None, None, "", 0,
      0L, 0L, Nil, Nil, Nil, 0, "")))
    assert(decodeTrace(encodeTrace(req)).head.spans.head.name === "unknown")
  }

  test("trace unknown fields skipped: dropped_*_count, scope, schema_url") {
    // span with dropped_attributes_count=10 (field 10 varint), wrapped in a
    // ScopeSpans that also carries a scope (field 1) and schema_url (field 3)
    val spanHex = ld(0x0a, "01" * 16) + ld(0x12, "02" * 8) + "500a"
    val scopeSpans = ld(0x0a, ld(0x0a, "6c6962")) + ld(0x12, spanHex) + ld(0x1a, "75726c")
    val resourceSpans = ld(0x12, scopeSpans)
    val root = ld(0x0a, resourceSpans)
    val bytes = root.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray
    val reqs = decodeTrace(bytes)
    assert(reqs.size === 1 && reqs.head.spans.size === 1)
    assert(reqs.head.spans.head.traceId.toSeq === tid(1).toSeq)
  }
}
