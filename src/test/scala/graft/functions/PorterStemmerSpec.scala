package graft.functions

import org.scalatest.funsuite.AnyFunSuite

/** Pins PorterStemmer against the worked examples of the published
  * algorithm (Porter 1980, public domain) — the same algorithm tantivy's
  * Stemmer(Language::English) implements for the reference's en_stem
  * (quickwit-query/src/tokenizers/mod.rs:60-66). */
class PorterStemmerSpec extends AnyFunSuite {

  private val paperExamples: Seq[(String, String)] = Seq(
    // step 1a
    "caresses" -> "caress", "ponies" -> "poni", "ties" -> "ti",
    "caress" -> "caress", "cats" -> "cat",
    // step 1b (+ cleanup)
    "feed" -> "feed", "agreed" -> "agre", "plastered" -> "plaster",
    "bled" -> "bled", "motoring" -> "motor", "sing" -> "sing",
    "conflated" -> "conflat", "troubled" -> "troubl", "sized" -> "size",
    "hopping" -> "hop", "tanned" -> "tan", "falling" -> "fall",
    "hissing" -> "hiss", "fizzed" -> "fizz", "failing" -> "fail",
    "filing" -> "file",
    // step 1c
    "happy" -> "happi", "sky" -> "sky",
    // step 2
    "relational" -> "relat", "conditional" -> "condit", "rational" -> "ration",
    "valenci" -> "valenc", "hesitanci" -> "hesit", "digitizer" -> "digit",
    "conformabli" -> "conform", "radicalli" -> "radic",
    "differentli" -> "differ", "vileli" -> "vile", "analogousli" -> "analog",
    "vietnamization" -> "vietnam", "predication" -> "predic",
    "operator" -> "oper", "feudalism" -> "feudal",
    "decisiveness" -> "decis", "hopefulness" -> "hope",
    "callousness" -> "callous", "formaliti" -> "formal",
    "sensitiviti" -> "sensit", "sensibiliti" -> "sensibl",
    // step 3
    "triplicate" -> "triplic", "formative" -> "form", "formalize" -> "formal",
    "electriciti" -> "electr", "electrical" -> "electr", "hopeful" -> "hope",
    "goodness" -> "good",
    // step 4
    "revival" -> "reviv", "allowance" -> "allow", "inference" -> "infer",
    "airliner" -> "airlin", "gyroscopic" -> "gyroscop",
    "adjustable" -> "adjust", "defensible" -> "defens", "irritant" -> "irrit",
    "replacement" -> "replac", "adjustment" -> "adjust",
    "dependent" -> "depend", "adoption" -> "adopt", "homologou" -> "homolog",
    "communism" -> "commun", "activate" -> "activ",
    "angulariti" -> "angular", "homologous" -> "homolog",
    "effective" -> "effect", "bowdlerize" -> "bowdler",
    // step 5
    "probate" -> "probat", "rate" -> "rate", "cease" -> "ceas",
    "controll" -> "control", "roll" -> "roll")

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
