package graft.functions

import org.scalatest.funsuite.AnyFunSuite

/** Pins PorterStemmer against the worked examples of the published
  * algorithm (Porter 1980, public domain) — the same algorithm tantivy's
  * Stemmer(Language::English) implements for the reference's en_stem
  * (quickwit-query/src/tokenizers/mod.rs:60-66). */
class PorterStemmerSpec extends AnyFunSuite {

  // single source of truth shared with the t_en_stem oracle dictionary
  private val paperExamples: Seq[(String, String)] = PorterVocab.pairs

  test("published Porter example vocabulary stems exactly") {
    val bad = paperExamples.collect {
      case (in, want) if PorterStemmer.stem(in) != want =>
        s"$in: got ${PorterStemmer.stem(in)}, want $want"
    }
    assert(bad.isEmpty, bad.mkString("; "))
  }

  test("short words and nulls pass through") {
    assert(PorterStemmer.stem("by") === "by")
    assert(PorterStemmer.stem("a") === "a")
    assert(PorterStemmer.stem(null) === null)
  }

  test("idempotent on already-stemmed common words") {
    for (w <- Seq("run", "stori", "cat", "oper", "relat"))
      assert(PorterStemmer.stem(w) === w, w)
  }
}
