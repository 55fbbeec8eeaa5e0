package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** whichlang-style language detection, as codegen'd column expressions.
  *
  * The reference's multilang tokenizer calls the embedded whichlang
  * classifier (quickwit-query/src/tokenizers/multilang.rs:65-150,
  * `whichlang::detect_language`) and returns one of 16 languages. This is a
  * compact dependency-free reimplementation of the same DECISION SHAPE:
  *  - non-latin scripts are decided by Unicode block (kana → jpn, hangul →
  *    kor, han → cmn, cyrillic → rus, arabic → ara, devanagari → hin) —
  *    same outcome whichlang reaches through its script pre-pass;
  *  - latin-script text is scored against embedded per-language profiles
  *    (top function words from public frequency lists + discriminative
  *    diacritics, weight 2) — one `regexp_count` scan per language, argmax,
  *    ties by code, `eng` when nothing scores.
  * Documented divergence: whichlang scores learned trigram weights over 16
  * languages; these hand-curated profiles cover {eng, fra, deu, spa, ita,
  * por} + the 6 script-decided languages, and accuracy is pinned on a
  * mixed-language corpus in LangDetectSpec rather than on whichlang's test
  * set.
  */
object LangDetect {

  /** (language code, function-word alternation, diacritic class or ""). */
  val LatinProfiles: Seq[(String, String, String)] = Seq(
    ("deu", "der|die|das|und|ist|nicht|ein|eine|mit|zu|den|von|sich|auf|als|auch|werden|bei|einer|wir", "[äöüß]"),
    ("eng", "the|and|of|to|in|is|that|it|was|for|with|on|this|not|are|be|have|from|they|you", ""),
    ("fra", "le|la|les|des|et|est|un|une|qui|dans|pour|pas|vous|je|ne|ce|sur|plus|mais|nous", "[àâçéèêëîïôùûœ]"),
    ("ita", "il|di|che|per|non|sono|con|del|si|da|come|anche|più|questo|alla|gli|nel|della", "[àèéìòù]"),
    ("por", "os|as|do|da|em|um|uma|não|para|com|no|na|se|mais|foi|como|dos|pelo|são", "[ãõ]"),
    ("spa", "el|los|las|y|es|en|que|un|una|no|se|por|con|para|su|al|lo|como|más|pero", "[ñ¿¡í]"))

  private def scriptCase(body: Column): Column =
    when(body.rlike("[\\x{3040}-\\x{30FF}]"), "jpn")
      .when(body.rlike("[\\x{AC00}-\\x{D7AF}\\x{1100}-\\x{11FF}]"), "kor")
      .when(body.rlike("[\\x{3400}-\\x{9FFF}\\x{20000}-\\x{2CEAF}]"), "cmn")
      .when(body.rlike("[\\x{0400}-\\x{04FF}]"), "rus")
      .when(body.rlike("[\\x{0600}-\\x{06FF}]"), "ara")
      .when(body.rlike("[\\x{0900}-\\x{097F}]"), "hin")

  private def latinCase(body: Column): Column = {
    // normalize: letters only, single spaces, padded — so every function
    // word match is " word" with a following space (the lookahead keeps
    // adjacent stopwords countable: " le la " matches both)
    val norm = concat(lit(" "),
      lower(regexp_replace(coalesce(body, lit("")), "[^\\p{L}]+", " ")), lit(" "))
    val scored = LatinProfiles.map { case (lang, words, diacritics) =>
      val wordHits = regexp_count(norm, lit(s" (?:$words)(?= )"))
      val diaHits =
        if (diacritics.isEmpty) lit(0) else regexp_count(norm, lit(diacritics)) * 2
      struct((wordHits + diaHits).as("score"), lit(lang).as("lang"))
    }
    val best = sort_array(array(scored: _*), asc = false).getItem(0)
    when(best.getField("score") > 0, best.getField("lang")).otherwise(lit("eng"))
  }

  /** Detect the language of `text`, returning whichlang's 3-letter code. */
  def detectLanguage(text: Column): Column = {
    val body = coalesce(text, lit(""))
    coalesce(scriptCase(body), latinCase(body))
  }
}
