package graft.queryast

import org.scalatest.funsuite.AnyFunSuite
import QueryAst._

/** ES query DSL → QueryAst golden tests (reference DSL surface:
  * quickwit-query/src/elastic_query_dsl; docs/reference/es_compatible_api.md). */
class EsDslSpec extends AnyFunSuite {

  private def p(json: String) = EsDsl.parse(json, Seq("text"))

  test("match_all / match_none") {
    assert(p("""{"match_all": {}}""") === MatchAll)
    assert(p("""{"match_none": {}}""") === MatchNone)
  }

  test("term: object and bare-value forms") {
    assert(p("""{"term": {"lang": {"value": "de"}}}""") === Term("lang", "de"))
    assert(p("""{"term": {"lang": "de"}}""") === Term("lang", "de"))
    assert(p("""{"term": {"code": 42}}""") === Term("code", "42"))
  }

  test("terms set") {
    assert(p("""{"terms": {"lang": ["de", "fr"]}}""") === TermSet("lang", Seq("de", "fr")))
  }

  test("exists") {
    assert(p("""{"exists": {"field": "tool"}}""") === Exists("tool"))
  }

  test("range with mixed bounds") {
    assert(p("""{"range": {"v": {"gte": 10, "lt": 20}}}""") ===
      Range("v", gte = Some(10.0), lt = Some(20.0)))
  }

  test("match: bare, object, operator and") {
    assert(p("""{"match": {"text": "quick fox"}}""") ===
      FullText("text", "quick fox", ModeOr))
    assert(p("""{"match": {"text": {"query": "quick fox", "operator": "and"}}}""") ===
      FullText("text", "quick fox", ModeAnd))
  }

  test("match_phrase with slop; match_bool_prefix") {
    assert(p("""{"match_phrase": {"text": "quick fox"}}""") ===
      FullText("text", "quick fox", ModePhrase(0)))
    assert(p("""{"match_phrase": {"text": {"query": "quick fox", "slop": 2}}}""") ===
      FullText("text", "quick fox", ModePhrase(2)))
    assert(p("""{"match_bool_prefix": {"text": {"query": "quick bro"}}}""") ===
      BoolPrefix("text", "quick bro", andOperator = false))
    assert(p("""{"match_bool_prefix": {"text": {"query": "quick bro", "operator": "and"}}}""") ===
      BoolPrefix("text", "quick bro", andOperator = true))
    assert(p("""{"match_bool_prefix": {"text": "quick bro"}}""") ===
      BoolPrefix("text", "quick bro", andOperator = false))
    assert(p("""{"match_phrase_prefix": {"text": {"query": "quick bro"}}}""") ===
      PhrasePrefix("text", "quick bro"))
  }

  test("multi_match across fields") {
    assert(p("""{"multi_match": {"query": "fox", "fields": ["title", "body"]}}""") ===
      Bool(should = Seq(FullText("title", "fox", ModeOr), FullText("body", "fox", ModeOr))))
  }

  test("multi_match types: phrase / phrase_prefix / operator / lenient (multi_match.rs:36-144)") {
    // 0016-misc-query.yaml shapes: lenient accepted and ignored
    assert(p("""{"multi_match": {"query": "to be", "type": "phrase", "lenient": true,
               | "fields": ["m", "d"]}}""".stripMargin) ===
      Bool(should = Seq(FullText("m", "to be", ModePhrase(0)),
        FullText("d", "to be", ModePhrase(0)))))
    assert(p("""{"multi_match": {"query": "to b", "type": "phrase_prefix", "fields": ["m"]}}""") ===
      PhrasePrefix("m", "to b"))
    assert(p("""{"multi_match": {"query": "a b", "operator": "and", "fields": ["m"]}}""") ===
      FullText("m", "a b", ModeAnd))
    assert(p("""{"multi_match": {"query": "a b", "type": "phrase", "slop": 2.0, "fields": ["m"]}}""") ===
      FullText("m", "a b", ModePhrase(2)))
    // single (non-array) field — OneOrMany PreferMany
    assert(p("""{"multi_match": {"query": "x", "fields": "m"}}""") === FullText("m", "x", ModeOr))
    // field boosting / wildcards rejected with the reference's message
    val e1 = intercept[IllegalArgumentException] {
      p("""{"multi_match": {"query": "x", "fields": ["m^3"]}}""") }
    assert(e1.getMessage.contains("does not support field boosting"))
    val e2 = intercept[IllegalArgumentException] {
      p("""{"multi_match": {"query": "x", "fields": ["m*"]}}""") }
    assert(e2.getMessage.contains("does not support wildcards"))
  }

  test("wildcard") {
    assert(p("""{"wildcard": {"source": {"value": "src1*"}}}""") === Wildcard("source", "src1*"))
  }

  test("bool with array and single-object clauses") {
    assert(p(
      """{"bool": {
        |  "must": [{"term": {"a": "1"}}, {"term": {"b": "2"}}],
        |  "must_not": {"exists": {"field": "c"}},
        |  "filter": [{"range": {"v": {"gte": 5}}}],
        |  "should": [{"term": {"d": "4"}}]
        |}}""".stripMargin) ===
      Bool(
        must = Seq(Term("a", "1"), Term("b", "2")),
        mustNot = Seq(Exists("c")),
        should = Seq(Term("d", "4")),
        filterQ = Seq(Range("v", gte = Some(5.0)))))
  }

  test("query_string delegates to the query-language parser") {
    assert(p("""{"query_string": {"query": "lang:de AND fox", "default_field": "body"}}""") ===
      Bool(must = Seq(Term("lang", "de"), Term("body", "fox"))))
  }

  test("unsupported kind rejected") {
    intercept[IllegalArgumentException](p("""{"fuzzy": {"text": "foo"}}"""))
  }

  test("typo'd parameter key is a parse error, not a silent stringify (ADVICE r1)") {
    intercept[IllegalArgumentException](p("""{"term": {"f": {"vale": "x"}}}"""))
    intercept[IllegalArgumentException](p("""{"wildcard": {"f": {"pattern": "x*"}}}"""))
    // the correct object form still parses
    assert(p("""{"term": {"f": {"value": "x"}}}""") === Term("f", "x"))
  }
}
