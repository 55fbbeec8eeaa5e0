package graft.operators

import graft.functions.Tokenizers
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis operators for a training-data pipeline: language ID,
  * quality scoring, token counting, document fingerprinting. All pure
  * column expressions — narrow, codegen'd, scale-free. */
object TextAnalysis {

  /** Tiny per-language stopword profiles for the n-gram/stopword heuristic
    * language ID. Deterministic and dependency-free; accuracy is what a
    * stopword profile gives (fine for bucketing training data by language). */
  val StopwordProfiles: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "and", "of", "to", "in", "is", "that", "it", "was", "for"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "ein", "mit", "auf", "zu"),
    "fr" -> Seq("le", "la", "les", "et", "est", "pas", "une", "pour", "dans", "que"),
    "es" -> Seq("el", "la", "los", "y", "es", "no", "una", "por", "con", "para"))

  /** Language-ID: score = |tokens ∩ profile| per language; argmax, ties by
    * language code; "und" (undetermined) when no stopword hits at all. */
  def langId(text: Column): Column = {
    val toks = Tokenizers.default(text)
    val scored = StopwordProfiles.toSeq.sortBy(_._1).map { case (lang, words) =>
      val hits = size(array_intersect(toks, array(words.map(lit): _*)))
      struct(hits.as("score"), lit(lang).as("lang"))
    }
    val best = sort_array(array(scored: _*), asc = false).getItem(0)
    when(best.getField("score") > 0, best.getField("lang")).otherwise(lit("und"))
  }

  /** Quality features: length, token count, mean token length, stopword
    * ratio, punctuation ratio, uppercase ratio, digit ratio — the standard
    * cheap pre-training filters. */
  def qualityFeatures(text: Column): Column = {
    val t = coalesce(text, lit(""))
    val toks = Tokenizers.default(t)
    val nChars = length(t).cast("double")
    val nTok = size(toks).cast("double")
    val punct = (nChars - length(regexp_replace(t, "[\\p{Punct}]", ""))).cast("double")
    val upper = (nChars - length(regexp_replace(t, "[A-Z]", ""))).cast("double")
    val digit = (nChars - length(regexp_replace(t, "[0-9]", ""))).cast("double")
    val allStop = array_distinct(flatten(array(
      StopwordProfiles.toSeq.sortBy(_._1).map { case (_, ws) => array(ws.map(lit): _*) }: _*)))
    val stopHits = size(array_intersect(toks, allStop)).cast("double")
    struct(
      nChars.cast("long").as("n_chars"),
      nTok.cast("long").as("n_tokens"),
      when(nTok > 0, round(nChars / nTok, 4)).otherwise(lit(0.0)).as("chars_per_token"),
      when(nTok > 0, round(stopHits / nTok, 4)).otherwise(lit(0.0)).as("stopword_ratio"),
      when(nChars > 0, round(punct / nChars, 4)).otherwise(lit(0.0)).as("punct_ratio"),
      when(nChars > 0, round(upper / nChars, 4)).otherwise(lit(0.0)).as("upper_ratio"),
      when(nChars > 0, round(digit / nChars, 4)).otherwise(lit(0.0)).as("digit_ratio"))
  }

  /** Composite quality score in [0,1] from the features — a simple
    * documented rubric (length band + stopword presence − punct/digit
    * noise), NOT a learned model. */
  def qualityScore(text: Column): Column = {
    val f = qualityFeatures(text)
    val lenScore = least(f.getField("n_tokens").cast("double") / 100.0, lit(1.0))
    val stopScore = least(f.getField("stopword_ratio") * 4.0, lit(1.0))
    val noise = greatest(f.getField("punct_ratio"), f.getField("digit_ratio"))
    round(greatest(lit(0.0), least(lit(1.0),
      lenScore * 0.4 + stopScore * 0.4 + (lit(1.0) - noise * 2.0) * 0.2)), 4)
  }

  /** Whitespace token count. */
  def wsTokenCount(text: Column): Column = size(Tokenizers.whitespace(text))

  /** BPE-ish subword count: pieces are maximal letter runs, maximal digit
    * runs, and individual punctuation chars; each run costs ⌈len/4⌉ subwords
    * — a cheap deterministic token-budget estimator (≈ chars/4 for prose).
    * Run-extraction form (no regex lookarounds) so an ANSI-SQL oracle can
    * mirror it exactly. */
  def bpeishTokenCount(text: Column): Column = {
    val t = coalesce(text, lit(""))
    def runCost(pattern: String): Column =
      aggregate(regexp_extract_all(t, lit(pattern), lit(0)), lit(0L),
        (acc, r) => acc + ceil(length(r).cast("double") / 4.0).cast("long"))
    val punct = (length(t) - length(regexp_replace(t, "[\\p{Punct}]", ""))).cast("long")
    runCost("[A-Za-z]+") + runCost("[0-9]+") + punct
  }

  /** Document fingerprint: order-sensitive rolling hash over the token
    * stream (xxhash64 chaining: acc' = xxhash64(acc, token)) — equal texts ⇒
    * equal fingerprints, permutations differ (unlike simhash). Chaining
    * avoids ANSI-mode overflow that wrap-multiply hashes would hit. */
  def fingerprint(text: Column): Column =
    aggregate(Tokenizers.default(text), lit(1469598103934665603L),
      (acc, t) => xxhash64(acc, t))
}
