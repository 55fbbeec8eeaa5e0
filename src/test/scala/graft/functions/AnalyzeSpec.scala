package graft.functions

import graft.SparkTestBase
import graft.util.Json

/** `POST /analyze` compute (tokenizer_entry.rs analyze_text + the REST
  * handler's own golden, index_api/rest_handler.rs:1872-1915). */
class AnalyzeSpec extends SparkTestBase {
  import TokenizerRegistry._

  private def run(json: String): Seq[Map[String, Any]] =
    Json.parse(Analyze.analyzeJson(json, spark))
      .asInstanceOf[Seq[Any]].map(_.asInstanceOf[Map[String, Any]])

  test("the reference handler's golden: ngram 3..3 'Hel' + lower_caser") {
    val got = run(
      """{"type": "ngram", "min_gram": 3, "max_gram": 3, "text": "Hel",
        | "filters": ["lower_caser"]}""".stripMargin)
    assert(got === Seq(Map(
      "offset_from" -> 0.0, "offset_to" -> 3.0, "position" -> 0.0,
      "position_length" -> 1.0, "text" -> "hel")))
  }

  test("simple: non-alphanumeric split, incrementing positions, BYTE offsets") {
    val got = run("""{"type": "simple", "text": "héllo,  wörld42"}""")
    // é and ö are two UTF-8 bytes: héllo spans [0,6); ", " is bytes 6-8,
    // so wörld42 spans [9,17)
    assert(got.map(m => (m("text"), m("position"), m("offset_from"), m("offset_to"))) ===
      Seq(("héllo", 0.0, 0.0, 6.0), ("wörld42", 1.0, 9.0, 17.0)))
  }

  test("ngram: per-start grams min..max, all at position 0; prefix_only keeps start 0") {
    val got = run("""{"type": "ngram", "min_gram": 2, "max_gram": 3, "text": "abcd"}""")
    assert(got.map(_("text")) === Seq("ab", "abc", "bc", "bcd", "cd"))
    assert(got.map(_("position")).distinct === Seq(0.0))
    assert(got.map(m => (m("offset_from"), m("offset_to"))) ===
      Seq((0.0, 2.0), (0.0, 3.0), (1.0, 3.0), (1.0, 4.0), (2.0, 4.0)))
    val pre = run(
      """{"type": "ngram", "min_gram": 2, "max_gram": 3, "prefix_only": true,
        | "text": "abcd"}""".stripMargin)
    assert(pre.map(_("text")) === Seq("ab", "abc"))
  }

  test("regex: matches in order with offsets") {
    val got = run("""{"type": "regex", "pattern": "[a-z]+", "text": "ab1cd22ef"}""")
    assert(got.map(m => (m("text"), m("position"), m("offset_from"), m("offset_to"))) ===
      Seq(("ab", 0.0, 0.0, 2.0), ("cd", 1.0, 3.0, 5.0), ("ef", 2.0, 7.0, 9.0)))
  }

  test("filters: remove_long drops >=255-byte tokens; ascii_folding folds accents") {
    val long = "a" * 255
    val got = run(s"""{"type": "simple", "text": "$long keep",
                     | "filters": ["remove_long"]}""".stripMargin)
    assert(got.map(_("text")) === Seq("keep"))
    val folded = run("""{"type": "simple", "text": "Crème Brûlée",
                       | "filters": ["ascii_folding", "lower_caser"]}""".stripMargin)
    assert(folded.map(_("text")) === Seq("creme", "brulee"))
  }

  test("source_code and multilang reuse the registry segmentation, offsets recovered") {
    val code = run("""{"type": "source_code", "text": "PigCafeFactory2"}""")
    assert(code.map(_("text")) === Seq("Pig", "Cafe", "Factory", "2"))
    assert(code.map(m => (m("offset_from"), m("offset_to"))) ===
      Seq((0.0, 3.0), (3.0, 7.0), (7.0, 14.0), (14.0, 15.0)))
    assert(code.map(_("position")) === Seq(0.0, 1.0, 2.0, 3.0))
  }

  test("multilang: prefixed input tokenizes the BODY — offsets are body-relative") {
    // the reference's MultiLangTokenizer strips the language prefix before
    // tokenizing, so offsets start at 0 in the body, not at byte 4
    val got = run("""{"type": "multilang", "text": "ENG:Hello World"}""")
    assert(got.map(m => (m("text"), m("offset_from"), m("offset_to"))) ===
      Seq(("Hello", 0.0, 5.0), ("World", 6.0, 11.0)))
  }

  test("multilang: un-fused Korean conjugations never crash — offsets stay monotone") {
    // korSegment's lexicon rewrites produce tokens with no verbatim source
    // span (합니다 → 하/ㅂ니다); analyze must answer a monotone approximation
    val got = run("""{"type": "multilang", "text": "KOR:한국어를 공부합니다"}""")
    assert(got.nonEmpty)
    val spans = got.map(m =>
      (m("offset_from").asInstanceOf[Double], m("offset_to").asInstanceOf[Double]))
    assert(spans.sliding(2).forall {
      case Seq((_, e1), (s2, _)) => s2 >= e1
      case _ => true
    })
    assert(spans.forall { case (s, e) => s >= 0 && e <= byteLenOf("한국어를 공부합니다") })
  }

  private def byteLenOf(s: String): Int =
    s.getBytes(java.nio.charset.StandardCharsets.UTF_8).length

  test("config errors reuse the tokenizer-entry parser") {
    assert(intercept[IllegalArgumentException] {
      Analyze.analyzeJson("""{"type": "nope", "text": "x"}""", spark)
    }.getMessage.startsWith("unknown variant `nope`"))
    assert(intercept[IllegalArgumentException] {
      Analyze.analyzeJson("""{"type": "simple", "text": "x", "abc": 1}""", spark)
    }.getMessage === "unknown field `abc`")
    assert(intercept[IllegalArgumentException] {
      Analyze.analyzeJson("""{"type": "simple"}""", spark)
    }.getMessage === "missing field `text`")
  }
}
