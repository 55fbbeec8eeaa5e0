package graft.parse

import graft.SparkTestBase
import graft.parse.MappingTree._
import org.apache.spark.sql.functions._

/** The reference's default_search_fields scenarios ported verbatim
  * (rest-api-tests/scenarii/default_search_fields/0001, 0002): default
  * search fields may bind a mapped text leaf, a path inside a mapped
  * `json` leaf, or a dynamic-captured field; invalid bindings reproduce
  * the exact 400 messages. */
class DefaultSearchFieldsSpec extends SparkTestBase {

  private val mapping = DocMapping(Seq(
    Leaf("id", TU64),
    Leaf("inner_json", TJson),
    Leaf("regular_field", TText)), mode = Dynamic)

  private val defaultFields =
    Seq("regular_field", "some_dynamic_field", "inner_json.somefieldinjson")

  private lazy val parsed = {
    import spark.implicits._
    val docs = Seq(
      """{"id": 1, "some_dynamic_field": "hello"}""",
      """{"id": 2, "inner_json": {"somefieldinjson": "allo"}}""",
      """{"id": 3, "regular_field": "bonjour"}""")
      .toDF("raw")
    MappingTree.parse(docs, col("raw"), mapping)
  }

  test("scenario 0001: each query finds exactly its doc across all three binding kinds") {
    def hits(q: String): Seq[Long] =
      parsed.filter(defaultFieldsMatch(mapping, defaultFields, q))
        .select(col("id").cast("long")).collect().map(_.getLong(0)).toSeq
    assert(hits("hello") === Seq(1L))   // dynamic-captured field
    assert(hits("allo") === Seq(2L))    // path inside the mapped json leaf
    assert(hits("bonjour") === Seq(3L)) // mapped text leaf
    assert(hits("nothing") === Nil)
  }

  test("scenario 0002: invalid default-field bindings reproduce the exact messages") {
    // non-dynamic mode, unmapped field
    val lenient = DocMapping(Nil, mode = Lenient)
    val e1 = intercept[IllegalArgumentException] {
      resolveSearchField(lenient, "regular_field")
    }
    assert(e1.getMessage === "Unknown default search field: `regular_field`")
    // the bare ROOT of a json leaf is not a value
    val e2 = intercept[IllegalArgumentException] {
      resolveSearchField(mapping, "inner_json")
    }
    assert(e2.getMessage === "Unknown default search field: `inner_json`")
    // dynamic capture not indexed
    val unindexed = DocMapping(Nil, mode = Dynamic, dynamicIndexed = false)
    val e3 = intercept[IllegalArgumentException] {
      resolveSearchField(unindexed, "some_field")
    }
    assert(e3.getMessage === "default search field `some_field` is not indexed")
  }

  test("one walk for config AND runtime: node fallbacks, escaped dots, indexed") {
    // an unmapped child of a mapped Node falls through to the dynamic
    // capture at RUNTIME exactly as config validation allows it
    import spark.implicits._
    val m = DocMapping(Seq(
      Node("obj", Seq(Leaf("a", TText))),
      Leaf("server.status", TText), // literally-dotted name
      Leaf("hidden", TText, indexed = false)), mode = Dynamic)
    val docs = Seq("""{"obj": {"a": "mapped", "x": "hello"}, "server.status": "up"}""")
      .toDF("raw")
    val p = MappingTree.parse(docs, col("raw"), m)
    assert(p.filter(defaultFieldsMatch(m, Seq("obj.x"), "hello")).count() === 1L)
    // escape-aware split: `server\.status` binds the literally-dotted leaf
    assert(p.filter(defaultFieldsMatch(m, Seq("server\\.status"), "up")).count() === 1L)
    // mapped-but-unindexed leaves refuse at the runtime walk too
    val e = intercept[IllegalArgumentException](resolveSearchField(m, "hidden"))
    assert(e.getMessage === "default search field `hidden` is not indexed")
    // punctuated queries tokenize like the field values
    val m2 = DocMapping(Seq(Leaf("t", TText)))
    val p2 = Seq("""{"t": "hello-world"}""").toDF("raw")
    assert(MappingTree.parse(p2, col("raw"), m2)
      .filter(defaultFieldsMatch(m2, Seq("t"), "hello-world")).count() === 1L)
  }

  test("multi-token queries AND across tokens, OR across fields") {
    import spark.implicits._
    val docs = Seq(
      """{"id": 1, "regular_field": "hello world"}""",
      """{"id": 2, "regular_field": "hello", "extra": "world"}""",
      """{"id": 3, "regular_field": "hello"}""").toDF("raw")
    val m = DocMapping(Seq(Leaf("id", TU64), Leaf("regular_field", TText)),
      mode = Dynamic)
    val p = MappingTree.parse(docs, col("raw"), m)
    val got = p.filter(defaultFieldsMatch(m, Seq("regular_field", "extra"), "hello world"))
      .select(col("id").cast("long")).collect().map(_.getLong(0)).toSet
    // doc 1: both tokens in one field; doc 2: one token per field (OR
    // across fields, AND across tokens); doc 3: "world" missing anywhere
    assert(got === Set(1L, 2L))
  }

  test("user-supplied queries never crash: punctuation-only matches nothing, overlong tokens drop") {
    import spark.implicits._
    val docs = Seq(
      """{"id": 1, "regular_field": "hello world"}""").toDF("raw")
    val m = DocMapping(Seq(Leaf("id", TU64), Leaf("regular_field", TText)),
      mode = Dynamic)
    val p = MappingTree.parse(docs, col("raw"), m)
    def n(q: String): Long =
      p.filter(defaultFieldsMatch(m, Seq("regular_field"), q)).count()
    // punctuation-only input tokenizes to nothing → matches NOTHING (it
    // must not throw: the query string is user input)
    assert(n("!!! ... ???") === 0L)
    assert(n("") === 0L)
    // a >255-char token is dropped by the field-side default tokenizer, so
    // the query side drops it too — the remaining token still matches
    // (keeping it would make the clause unmatchable instead of absent)
    val long = "x" * 300
    assert(n(s"hello $long") === 1L)
    assert(n(long) === 0L) // ONLY an overlong token → empty set → no match
  }
}
