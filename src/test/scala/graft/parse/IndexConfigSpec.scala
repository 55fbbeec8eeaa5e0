package graft.parse

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Index-level doc-mapper builder validation (MappingConfig.compileIndex),
  * pinned against the reference builder's own test corpus:
  * default_mapper.rs:115-140 (validate_timestamp_field, tests :905-1125),
  * :275-320 (validate_tag), :164-210 (custom tokenizers), :213-229
  * (default search fields), :241-248 (partition-key tag promotion). */
class IndexConfigSpec extends SparkTestBase {
  import MappingTree._

  private def cfg(docMapping: String, searchFields: Seq[String] = Nil) =
    MappingConfig.compileIndex(docMapping, searchFields)

  private def err(docMapping: String, searchFields: Seq[String] = Nil): String =
    intercept[IllegalArgumentException](cfg(docMapping, searchFields)).getMessage

  private val TsOk =
    """{"name": "timestamp", "type": "datetime", "fast": true}"""

  // ---- timestamp field ----------------------------------------------------

  test("timestamp: happy path, incl. a nested dotted path") {
    val m = cfg(s"""{"timestamp_field": "timestamp", "field_mappings": [$TsOk]}""")
    assert(m.timestampField.contains("timestamp"))
    val nested = cfg(
      """{"timestamp_field": "meta.created", "field_mappings": [
        |  {"name": "meta", "type": "object", "field_mappings": [
        |    {"name": "created", "type": "datetime", "fast": true}]}]}""".stripMargin)
    assert(nested.timestampField.contains("meta.created"))
  }

  test("timestamp: golden error strings (default_mapper.rs:905-1125)") {
    def tsErr(tsField: String, mapping: String = TsOk): String =
      err(s"""{"timestamp_field": "$tsField", "field_mappings": [$mapping]}""")
    assert(tsErr(".my.timestamp") ==
      "timestamp field `.my.timestamp` should not start with a `.`")
    assert(tsErr("\\\\.my\\\\.timestamp") == // JSON \\. = literal backslash-dot
      "timestamp field `\\.my\\.timestamp` should not start with a `.`")
    assert(tsErr("my.timestamp.") ==
      "timestamp field `my.timestamp.` should not end with a `.`")
    assert(tsErr("my\\\\.timestamp\\\\.") ==
      "timestamp field `my\\.timestamp\\.` should not end with a `.`")
    assert(tsErr("other") ==
      "could not find timestamp field `other` in field mappings")
    assert(tsErr("timestamp", """{"name": "timestamp", "type": "text"}""") ==
      "timestamp field `timestamp` should be a datetime field")
    assert(tsErr("timestamp", """{"name": "timestamp", "type": "datetime"}""") ==
      "timestamp field `timestamp` should be a fast field")
    assert(tsErr("timestamp",
      """{"name": "timestamp", "type": "array<datetime>", "fast": true}""") ==
      "timestamp field `timestamp` should be single-valued")
  }

  // ---- tag fields ---------------------------------------------------------

  private def tagCfg(tag: String, mapping: String): String =
    s"""{"tag_fields": ["$tag"], "field_mappings": [$mapping]}"""

  test("tags: raw text, u64, i64 accepted; set is sorted") {
    val m = cfg("""{"tag_fields": ["zeta", "alpha", "num"], "field_mappings": [
        |  {"name": "zeta", "type": "text", "tokenizer": "raw"},
        |  {"name": "alpha", "type": "text", "tokenizer": "raw"},
        |  {"name": "num", "type": "u64"}]}""".stripMargin)
    assert(m.tagFields == Seq("alpha", "num", "zeta")) // BTreeSet order
  }

  test("tags: golden error strings (validate_tag)") {
    assert(err("""{"tag_fields": [".bad"], "field_mappings": [{"name": "bad", "type": "text"}]}""")
      == "tag field `.bad` should not start with a `.`")
    assert(tagErr("owner", """{"name": "other", "type": "text", "tokenizer": "raw"}""")
      == "unknown tag field: `owner`")
    assert(tagErr("title", """{"name": "title", "type": "text"}""")
      == "tags collection is only allowed on text fields with the `raw` tokenizer")
    // an unindexed raw-text field has no tokenizer at all — same error
    assert(tagErr("title", """{"name": "title", "type": "text", "tokenizer": "raw", "indexed": false}""")
      == "tags collection is only allowed on text fields with the `raw` tokenizer")
    assert(tagErr("score", """{"name": "score", "type": "f64"}""")
      == "tags collection is not allowed on `f64` fields")
    assert(tagErr("flag", """{"name": "flag", "type": "bool"}""")
      == "tags collection is not allowed on `bool` fields")
    assert(tagErr("ts", """{"name": "ts", "type": "datetime"}""")
      == "tags collection is not allowed on `date` fields")
    assert(tagErr("n", """{"name": "n", "type": "i64", "indexed": false}""")
      == "tag fields are required to be indexed. (`n` is not configured as indexed)")
  }
  private def tagErr(tag: String, mapping: String): String = err(tagCfg(tag, mapping))

  // ---- partition key ------------------------------------------------------

  test("partition key: parsed; tag-eligible fields are promoted to tags") {
    val m = cfg("""{"partition_key": "hash_mod((tenant_id,app), 50)",
        |  "max_num_partitions": 100, "field_mappings": [
        |  {"name": "tenant_id", "type": "text", "tokenizer": "raw"},
        |  {"name": "app", "type": "text"}]}""".stripMargin)
    // tenant_id is raw text (tag-eligible) → promoted; app uses the default
    // tokenizer → silently NOT promoted (reference: only `validate_tag`-ok
    // fields join the tag set, default_mapper.rs:243-248)
    assert(m.tagFields == Seq("tenant_id"))
    assert(m.partitionKey.map(_.fieldNames).contains(Seq("tenant_id", "app")))
    assert(m.maxNumPartitions == 100)
  }

  test("partition key: defaults — none parsed, cap 200") {
    val m = cfg("""{"field_mappings": [{"name": "a", "type": "text"}]}""")
    assert(m.partitionKey.isEmpty)
    assert(m.maxNumPartitions == 200)
    assert(err("""{"max_num_partitions": 0, "field_mappings": [{"name": "a", "type": "text"}]}""")
      == "invalid value: integer `0`, expected a nonzero u32")
  }

  // ---- tokenizers ---------------------------------------------------------

  test("tokenizers: duplicate + builtin-collision + unknown-reference errors") {
    val base = """"field_mappings": [{"name": "t", "type": "text"}]"""
    assert(err(s"""{"tokenizers": [
        |  {"name": "my_tok", "type": "simple"},
        |  {"name": "my_tok", "type": "regex", "pattern": "a"}], $base}""".stripMargin)
      == "duplicated custom tokenizer: `my_tok`")
    assert(err(s"""{"tokenizers": [{"name": "default", "type": "simple"}], $base}""")
      == "custom tokenizer name `default` should be different from built-in tokenizer's names")
    assert(err("""{"field_mappings": [{"name": "t", "type": "text", "tokenizer": "nope"}]}""")
      == "unknown tokenizer `nope` for field `t`")
    // a custom tokenizer referenced by a field is fine; unindexed text skips
    cfg("""{"tokenizers": [{"name": "tri", "type": "ngram", "min_gram": 3, "max_gram": 3}],
        |  "field_mappings": [{"name": "t", "type": "text", "tokenizer": "tri"},
        |                     {"name": "u", "type": "text", "tokenizer": "nope", "indexed": false}]}""".stripMargin)
  }

  // ---- default search fields ---------------------------------------------

  test("default search fields: duplicate / unknown / unindexed; dynamic resolves unknowns") {
    val strict = """{"mode": "strict", "field_mappings": [
        |  {"name": "body", "type": "text"},
        |  {"name": "hidden", "type": "text", "indexed": false}]}""".stripMargin
    assert(err(strict, Seq("body", "body")) == "duplicated default search field: `body`")
    assert(err(strict, Seq("nope")) == "Unknown default search field: `nope`")
    assert(err(strict, Seq("hidden")) == "default search field `hidden` is not indexed")
    assert(cfg(strict, Seq("body")).defaultSearchFields == Seq("body"))
    // dynamic mode: unknown fields resolve to the dynamic field (no error)
    val dyn = """{"mode": "dynamic", "field_mappings": [{"name": "body", "type": "text"}]}"""
    assert(cfg(dyn, Seq("nope")).defaultSearchFields == Seq("nope"))
    // the bare ROOT of a json field 400s EVEN IN DYNAMIC MODE — it is
    // mapped, so it can never be a dynamic field, and a json root is not
    // a value (default_search_fields scenario 0002 failing2)
    val withJson = """{"mode": "dynamic", "field_mappings": [{"name": "inner_json", "type": "json"}]}"""
    assert(err(withJson, Seq("inner_json")) == "Unknown default search field: `inner_json`")
    // …but a PATH INSIDE it resolves through the json prefix
    assert(cfg(withJson, Seq("inner_json.somefieldinjson")).defaultSearchFields
      == Seq("inner_json.somefieldinjson"))
  }

  // ---- end-to-end: config drives parse + route ----------------------------

  test("applyIndexConfig: parse then partition-route per the config") {
    import spark.implicits._
    val docs = (0 until 100)
      .map(i => s"""{"tenant":"t${i % 7}","n":$i}""")
      .toDF("doc")
    val idx = cfg("""{"mode": "lenient",
        |  "partition_key": "hash_mod(tenant, 4)",
        |  "field_mappings": [
        |    {"name": "tenant", "type": "text", "tokenizer": "raw"},
        |    {"name": "n", "type": "i64"}]}""".stripMargin)
    val out = MappingConfig.applyIndexConfig(docs, col("doc"), idx)
    assert(out.count() == 100)
    val pids = out.select("partition_id").distinct().as[Long].collect().toSet
    assert(pids.forall(p => p >= 0 && p < 4))
    // same tenant ⇒ same partition
    assert(out.groupBy("tenant").agg(countDistinct("partition_id").as("d"))
      .filter(col("d") > 1).count() == 0)
    // no partition key ⇒ no routing column
    val idx2 = cfg("""{"mode": "lenient", "field_mappings": [{"name": "n", "type": "i64"}]}""")
    assert(!MappingConfig.applyIndexConfig(docs, col("doc"), idx2)
      .columns.contains("partition_id"))
  }
}
