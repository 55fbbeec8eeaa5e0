package graft.parse

import org.scalatest.funsuite.AnyFunSuite

/** Index-config `doc_mapping` parsing pinned against the reference's
  * field_mapping_entry.rs serde tests and
  * default_doc_mapper/mod.rs:49-102 name validation. */
class MappingConfigSpec extends AnyFunSuite {
  import MappingTree._

  private def err(json: String): String =
    intercept[IllegalArgumentException](MappingConfig.fromJson(json)).getMessage

  private def one(entry: String): String =
    s"""{"field_mappings": [$entry]}"""

  test("full config: every type id, array<>, nesting, options") {
    val m = MappingConfig.fromJson(
      """{"mode": "strict", "store_source": true, "field_mappings": [
        |  {"name": "title", "type": "text"},
        |  {"name": "count", "type": "u64", "coerce": false},
        |  {"name": "score", "type": "f64"},
        |  {"name": "flag", "type": "bool"},
        |  {"name": "host", "type": "ip"},
        |  {"name": "payload", "type": "bytes"},
        |  {"name": "attrs", "type": "json"},
        |  {"name": "tags", "type": "array<i64>"},
        |  {"name": "created", "type": "datetime", "input_formats": ["unix_timestamp"]},
        |  {"name": "resource", "type": "object", "field_mappings": [
        |    {"name": "service", "type": "text"}]}
        |]}""".stripMargin)
    assert(m.mode == Strict)
    assert(m.storeSource)
    assert(m.fieldMappings == Seq(
      Leaf("title", TText),
      Leaf("count", TU64, coerce = false),
      Leaf("score", TF64),
      Leaf("flag", TBool),
      Leaf("host", TIpAddr),
      Leaf("payload", TBytes()),
      Leaf("attrs", TJson),
      Leaf("tags", TI64, multi = true),
      Leaf("created", TDateTime(Seq("unix_timestamp"))),
      Node("resource", Seq(Leaf("service", TText)))))
  }

  test("defaults: dynamic mode, coerce true, rfc3339+unix datetime formats") {
    val m = MappingConfig.fromJson(one("""{"name": "ts", "type": "datetime"}"""))
    assert(m.mode == Dynamic)
    assert(!m.storeSource)
    assert(m.fieldMappings == Seq(Leaf("ts", TDateTime(Seq("rfc3339", "unix_timestamp")))))
    assert(MappingConfig.fromJson(one("""{"name": "n", "type": "i64"}"""))
      .fieldMappings.head.asInstanceOf[Leaf].coerce)
  }

  test("unknown type: the reference's exact error (field_mapping_entry.rs:1094)") {
    assert(err(one("""{"name": "my_field_name", "type": "my custom type"}""")) ==
      "field `my_field_name` has an unknown type: `my custom type`")
  }

  test("reserved / malformed field names (default_doc_mapper/mod.rs:61-102)") {
    assert(err(one("""{"name": "_source", "type": "text"}""")).startsWith(
      "field name `_source` is reserved."))
    assert(err(one("""{"name": ".dotted", "type": "text"}""")) ==
      "field name `.dotted` must not start with a dot `.`")
    assert(err(one("""{"name": "9lives", "type": "text"}""")).contains(
      "must start with an uppercase or lowercase ASCII letter"))
    assert(err(one("""{"name": "a b", "type": "text"}""")).contains(
      "contains illegal characters"))
    // dots INSIDE a name are legal (server.status style)
    assert(MappingConfig.fromJson(one("""{"name": "server.status", "type": "text"}"""))
      .fieldMappings == Seq(Leaf("server.status", TText)))
  }

  test("object must have at least one child; fast array<bytes> rejected") {
    assert(err(one("""{"name": "o", "type": "object", "field_mappings": []}""")) ==
      "object type must have at least one field mapping")
    assert(err(one("""{"name": "b", "type": "array<bytes>", "fast": true}""")) ==
      "fast field is not allowed for array<bytes>")
    // non-fast array<bytes> is fine
    assert(MappingConfig.fromJson(one("""{"name": "b", "type": "array<bytes>"}"""))
      .fieldMappings == Seq(Leaf("b", TBytes(), multi = true)))
  }

  test("tokenizers section: the reference's own serde cases (tokenizer_entry.rs:153-240)") {
    import graft.functions.TokenizerRegistry._
    val entries = MappingConfig.tokenizersFromJson(
      """{"tokenizers": [
        |  {"name": "my_tokenizer", "type": "ngram", "min_gram": 1, "max_gram": 3,
        |   "filters": ["remove_long", "lower_caser", "ascii_folding"]},
        |  {"name": "my_regex", "type": "regex", "pattern": "(my_pattern)"}]}""".stripMargin)
    assert(entries == Seq(
      TokenizerEntry("my_tokenizer", TokenizerConfig(Ngram(1, 3, prefixOnly = false),
        Seq(RemoveLong, LowerCaser, AsciiFolding))),
      TokenizerEntry("my_regex", TokenizerConfig(Regex("(my_pattern)")))))
    // deny_unknown_fields on the options (tokenizer_entry.rs:194-217)
    val e = intercept[IllegalArgumentException](MappingConfig.tokenizersFromJson(
      """{"tokenizers": [{"name": "t", "type": "ngram", "min_gram": 1,
        |"max_gram": 3, "abc": 123}]}""".stripMargin))
    assert(e.getMessage.contains("unknown field `abc`"))
    // unknown filter / type variants
    assert(intercept[IllegalArgumentException](MappingConfig.tokenizersFromJson(
      """{"tokenizers": [{"name": "t", "type": "simple", "filters": ["nope"]}]}"""))
      .getMessage.contains("unknown variant `nope`"))
    assert(intercept[IllegalArgumentException](MappingConfig.tokenizersFromJson(
      """{"tokenizers": [{"name": "t", "type": "fancy"}]}"""))
      .getMessage.contains("unknown variant `fancy`"))
    // missing tokenizers key → empty, registry still resolves built-ins
    assert(MappingConfig.tokenizersFromJson("{}").isEmpty)
  }

  test("config-compiled mapping is structurally identical to the hand-built one") {
    val cfg = MappingConfig.fromJson(
      """{"mode": "dynamic", "field_mappings": [
        |  {"name": "conv_id", "type": "text"},
        |  {"name": "turn", "type": "i64"},
        |  {"name": "meta", "type": "object", "field_mappings": [
        |    {"name": "role", "type": "text"},
        |    {"name": "score", "type": "i64"},
        |    {"name": "tags", "type": "array<i64>"}]},
        |  {"name": "ts", "type": "datetime", "input_formats": ["unix_timestamp"]}]}""".stripMargin)
    val hand = DocMapping(Seq(
      Leaf("conv_id", TText),
      Leaf("turn", TI64),
      Node("meta", Seq(
        Leaf("role", TText),
        Leaf("score", TI64),
        Leaf("tags", TI64, multi = true))),
      Leaf("ts", TDateTime(Seq("unix_timestamp")))), mode = Dynamic)
    assert(cfg == hand)
  }
}
