package graft.parse

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Runs the reference's ACTUAL shipped OTEL logs index config through the
  * r3 config compiler: the `doc_mapping` below is the JSON rendition of
  * `quickwit-opentelemetry/src/otlp/logs.rs:50-135` (OTEL_LOGS_INDEX_CONFIG,
  * field-for-field, option-for-option), and `default_search_fields:
  * [body.message]` comes from its `search_settings`. Pins that the whole
  * compile → parse → back-project path handles a real production config:
  * strict mode, unix_timestamp datetime, raw-tokenizer text, u64 counters,
  * json payload fields, and HEX-format bytes for trace/span ids. */
class OtelConfigSpec extends SparkTestBase {
  import spark.implicits._

  private val otelLogsDocMapping =
    """{
      |  "mode": "strict",
      |  "field_mappings": [
      |    {"name": "timestamp_nanos", "type": "datetime", "input_formats": ["unix_timestamp"],
      |     "output_format": "unix_timestamp_nanos", "indexed": false, "fast": true},
      |    {"name": "observed_timestamp_nanos", "type": "datetime", "input_formats": ["unix_timestamp"],
      |     "output_format": "unix_timestamp_nanos"},
      |    {"name": "service_name", "type": "text", "tokenizer": "raw", "fast": true},
      |    {"name": "severity_text", "type": "text", "tokenizer": "raw", "fast": true},
      |    {"name": "severity_number", "type": "u64", "fast": true},
      |    {"name": "body", "type": "json", "tokenizer": "default"},
      |    {"name": "attributes", "type": "json", "tokenizer": "raw", "fast": true},
      |    {"name": "dropped_attributes_count", "type": "u64", "indexed": false},
      |    {"name": "trace_id", "type": "bytes", "input_format": "hex", "output_format": "hex"},
      |    {"name": "span_id", "type": "bytes", "input_format": "hex", "output_format": "hex"},
      |    {"name": "trace_flags", "type": "u64", "indexed": false},
      |    {"name": "resource_attributes", "type": "json", "tokenizer": "raw", "fast": true},
      |    {"name": "resource_dropped_attributes_count", "type": "u64", "indexed": false},
      |    {"name": "scope_name", "type": "text", "indexed": false},
      |    {"name": "scope_version", "type": "text", "indexed": false},
      |    {"name": "scope_attributes", "type": "json", "indexed": false},
      |    {"name": "scope_dropped_attributes_count", "type": "u64", "indexed": false}
      |  ],
      |  "timestamp_field": "timestamp_nanos"
      |}""".stripMargin

  test("the OTEL logs doc_mapping compiles: strict mode, hex bytes, body.message search field") {
    val idx = MappingConfig.compileIndex(otelLogsDocMapping,
      defaultSearchFields = Seq("body.message"))
    assert(idx.mapping.mode == MappingTree.Strict)
    assert(idx.timestampField.contains("timestamp_nanos"))
    val traceId = MappingConfig.findMapping(idx.mapping.fieldMappings, "trace_id")
      .collect { case l: MappingTree.Leaf => l.typ }
    assert(traceId.contains(MappingTree.TBytes(hexInput = true, hexOutput = true)))
    // `body.message` resolves through the `body` json leaf (tantivy
    // find_field_with_default longest-prefix rule); a non-existent prefix
    // under strict mode still fails
    val err = intercept[IllegalArgumentException](
      MappingConfig.compileIndex(otelLogsDocMapping, Seq("nosuch.message")))
    assert(err.getMessage.contains("Unknown default search field: `nosuch.message`"))
    // scope_name is not indexed → invalid as a search default
    assert(intercept[IllegalArgumentException](
      MappingConfig.compileIndex(otelLogsDocMapping, Seq("scope_name")))
      .getMessage.contains("is not indexed"))
  }

  test("an OTLP log record parses: unix ts, u64, json payloads, HEX trace/span ids") {
    val idx = MappingConfig.compileIndex(otelLogsDocMapping, Seq("body.message"))
    val doc =
      """{"timestamp_nanos": 1704067200, "observed_timestamp_nanos": 1704067205,
        | "service_name": "quickwit", "severity_text": "INFO", "severity_number": 9,
        | "body": {"message": "shard started"}, "attributes": {"k": "v"},
        | "dropped_attributes_count": 0,
        | "trace_id": "0102030405060708090a0b0c0d0e0f10", "span_id": "01020304050607ff",
        | "trace_flags": 1, "resource_attributes": {"host": "node-1"},
        | "scope_name": "qw-indexer"}""".stripMargin.replace("\n", "")
    val r = MappingTree.parse(Seq(doc).toDF("json"), col("json"), idx.mapping).collect()(0)
    assert(r.getAs[String]("parse_error_kind") == null)
    assert(r.getAs[java.sql.Timestamp]("timestamp_nanos").toInstant.toString
      == "2024-01-01T00:00:00Z")
    assert(r.getAs[String]("service_name") == "quickwit")
    assert(r.getAs[java.math.BigDecimal]("severity_number").longValueExact == 9L)
    assert(r.getAs[String]("body") == """{"message":"shard started"}""")
    assert(r.getAs[Array[Byte]]("trace_id").toSeq ==
      Seq(1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15, 16).map(_.toByte))
    assert(r.getAs[Array[Byte]]("span_id").toSeq ==
      Seq[Int](1, 2, 3, 4, 5, 6, 7, 0xff).map(_.toByte))
    // odd-length / non-hex ids are value errors (hex::decode contract)
    val bad = MappingTree.parse(Seq("""{"trace_id":"0102f"}""").toDF("json"),
      col("json"), idx.mapping).collect()(0)
    assert(bad.getAs[String]("parse_error_kind") == "value_error")
    // strict mode rejects the unmapped field OTLP would never send
    val unknown = MappingTree.parse(Seq("""{"nope":1}""").toDF("json"),
      col("json"), idx.mapping).collect()(0)
    assert(unknown.getAs[String]("parse_error_kind") == "no_such_field")
  }

  test("back-projection renders trace/span ids as lowercase hex (BinaryFormat::format_to_json)") {
    val idx = MappingConfig.compileIndex(otelLogsDocMapping, Seq("body.message"))
    val doc = """{"service_name":"s","trace_id":"0a0bff10"}"""
    val parsed = MappingTree.parse(Seq(doc).toDF("json"), col("json"), idx.mapping)
    val json = parsed.select(MappingTree.docToJson(idx.mapping).as("j"))
      .collect()(0).getString(0)
    assert(json.contains(""""trace_id":"0a0bff10""""), json)
  }
}
