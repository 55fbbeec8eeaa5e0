package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Training-data quality + repetition filters in the Gopher / C4 style
  * (Rae et al. 2021 appendix A.1.1 "Repetition removal" and A.1.2 "Quality
  * filtering"; Raffel et al. 2020 §2.2) — the document-level gate a
  * large-scale LLM ingest pipeline runs between parse and dedup.
  *
  * Everything here is a pure column expression (whole-stage codegen, no
  * UDFs, no shuffle) except [[topBigramCover]], whose "most frequent
  * n-gram per document" is a genuine distributed aggregation — explode to
  * (doc, gram), count, max — that shuffles only (doc_id, gram, count)
  * triples, never document text.
  *
  * Thresholds are the published Gopher numbers; the rule BOOLEANS are
  * emitted individually so a pipeline can re-weight them without
  * re-scanning.
  */
object QualityFilters {

  /** Gopher's required-stopword list (A.1.2): a doc must contain ≥2. */
  val GopherStopwords: Seq[String] =
    Seq("the", "be", "to", "of", "and", "that", "have", "with")

  /** Whitespace words of a document (empty-token-free). */
  def words(text: Column): Column =
    filter(split(coalesce(text, lit("")), "\\s+"), w => w =!= "")

  /** Newline-separated lines of a document. */
  def lines(text: Column): Column = split(coalesce(text, lit("")), "\n")

  // ---- repetition signals (Gopher A.1.1) ---------------------------------

  /** Fraction of lines that are repeats of an earlier line:
    * (n_lines - n_distinct_lines) / n_lines. */
  def duplicateLineFraction(ls: Column): Column = {
    val n = size(ls).cast("double")
    when(n === 0.0, 0.0).otherwise((n - size(array_distinct(ls)).cast("double")) / n)
  }

  /** Fraction of CHARACTERS sitting in repeated lines: total line chars
    * minus each distinct line counted once, over total line chars. */
  def duplicateLineCharFraction(ls: Column): Column = {
    def chars(arr: Column): Column =
      aggregate(arr, lit(0L), (acc, x) => acc + length(x).cast("long"))
    val total = chars(ls).cast("double")
    when(total === 0.0, 0.0)
      .otherwise((total - chars(array_distinct(ls)).cast("double")) / total)
  }

  /** Word 2-grams of a document ("w1 w2" strings); empty below 2 words. */
  def bigrams(text: Column): Column = {
    val ws = words(text)
    when(size(ws) < 2, array().cast("array<string>"))
      .otherwise(transform(sequence(lit(0), size(ws) - 2),
        i => concat_ws(" ", element_at(ws, i + 1), element_at(ws, i + 2))))
  }

  /** Per-document top-2-gram coverage (Gopher's top-n-gram char fraction,
    * n=2): for each doc, the maximum over its 2-grams of
    * `occurrences × gram_length` — the characters covered by the heaviest
    * 2-gram — plus the doc's total length for the caller to form the
    * fraction. Deterministic (a scalar max, no most-frequent tie-break).
    * Input must have (docId, text); output (docId, covered_chars, n_chars).
    */
  def topBigramCover(df: DataFrame, docId: String, text: String): DataFrame = {
    // Entirely per-document, so NO shuffle: sort the doc's bigram array and
    // fold over it counting equal-neighbor runs, keeping max(run × len).
    // The previous form exploded every bigram through two full shuffles —
    // at scale that moved ~2 string grams per word across the cluster for
    // what is a per-row scalar. State: (prev gram, run length, best cover).
    val gs = array_sort(bigrams(col(text)))
    val folded = aggregate(
      gs,
      struct(lit("").as("prev"), lit(0L).as("run"), lit(0L).as("best")),
      (st, g) => {
        val run = when(g === st.getField("prev"), st.getField("run") + 1L)
          .otherwise(lit(1L))
        struct(g.as("prev"), run.as("run"),
          greatest(st.getField("best"), run * length(g).cast("long")).as("best"))
      },
      st => st.getField("best"))
    df.select(col(docId), folded.as("covered_chars"),
      length(col(text)).cast("long").as("n_chars"))
      .filter(col("covered_chars") > 0L) // <2-word docs have no bigrams (as before)
  }

  // ---- Gopher word-level quality rules (A.1.2) ---------------------------

  /** The per-document Gopher rule struct: raw features + one boolean per
    * published rule + the conjunction `keep`. */
  def gopherRules(text: Column): Column = {
    val t = coalesce(text, lit(""))
    val ws = words(t)
    val nWords = size(ws).cast("long")
    val nWordsD = nWords.cast("double")
    val meanLen = when(nWords === 0, 0.0)
      .otherwise(aggregate(ws, lit(0L), (acc, w) => acc + length(w).cast("long"))
        .cast("double") / nWordsD)
    // symbols-to-words: '#' occurrences + '...' occurrences per word
    val nSymbols = (regexp_count(t, lit("#")) + regexp_count(t, lit("\\.\\.\\."))).cast("double")
    val symbolRatio = when(nWords === 0, 0.0).otherwise(nSymbols / nWordsD)
    val alphaFrac = when(nWords === 0, 0.0)
      .otherwise(size(filter(ws, w => w.rlike("[A-Za-z]"))).cast("double") / nWordsD)
    val stopHits = size(array_intersect(ws, array(GopherStopwords.map(lit): _*))).cast("long")
    val ls = lines(t)
    val nLines = size(ls).cast("double")
    val bulletFrac = when(nLines === 0.0, 0.0)
      .otherwise(size(filter(ls, l => l.rlike("^\\s*[-*•]"))).cast("double") / nLines)
    val ellipsisFrac = when(nLines === 0.0, 0.0)
      .otherwise(size(filter(ls, l => l.rlike("(\\.\\.\\.|…)\\s*$"))).cast("double") / nLines)

    val okWords = nWords >= 50 && nWords <= 100000
    val okMeanLen = meanLen >= 3.0 && meanLen <= 10.0
    val okSymbols = symbolRatio <= 0.1
    val okBullets = bulletFrac <= 0.9
    val okEllipsis = ellipsisFrac <= 0.3
    val okAlpha = alphaFrac >= 0.8
    val okStops = stopHits >= 2
    struct(
      nWords.as("word_count"),
      meanLen.as("mean_word_len"),
      symbolRatio.as("symbol_ratio"),
      alphaFrac.as("alpha_word_frac"),
      stopHits.as("stop_hits"),
      bulletFrac.as("bullet_line_frac"),
      ellipsisFrac.as("ellipsis_line_frac"),
      okWords.as("ok_word_count"),
      okMeanLen.as("ok_mean_word_len"),
      okSymbols.as("ok_symbol_ratio"),
      okBullets.as("ok_bullet_lines"),
      okEllipsis.as("ok_ellipsis_lines"),
      okAlpha.as("ok_alpha_words"),
      okStops.as("ok_stopwords"),
      (okWords && okMeanLen && okSymbols && okBullets && okEllipsis &&
        okAlpha && okStops).as("keep"))
  }

  // ---- C4 line/page cleaning (Raffel et al. 2020 §2.2) -------------------

  /** C4's per-line retention rule: a line survives iff it ends in a
    * terminal punctuation mark (period / exclamation / question / closing
    * quote), carries at least 3 words, and does not mention "javascript"
    * (the browser-requirement boilerplate rule). */
  def c4LineKeep(l: Column): Column =
    rtrim(l).rlike("[.!?\"]$") &&
      size(filter(split(l, "\\s+"), w => w =!= "")) >= 3 &&
      !contains(lower(l), lit("javascript"))

  /** C4's page gate over a newline-joined page: drop pages mentioning
    * "lorem ipsum" or containing a curly brace (code), and keep only pages
    * whose retained lines carry at least 5 sentences (terminal marks).
    * Returns counters + the cleaned page (retained lines re-joined) — all
    * pure column expressions, whole-stage codegen, no shuffle. */
  def c4Clean(page: Column): Column = {
    val p = coalesce(page, lit(""))
    val ls = split(p, "\n")
    val kept = filter(ls, c4LineKeep(_))
    val sentences = aggregate(kept, lit(0L),
      (acc, l) => acc + regexp_count(l, lit("[.!?]")).cast("long"))
    val keepPage = !contains(lower(p), lit("lorem ipsum")) &&
      !contains(p, lit("{")) && sentences >= 5L
    struct(
      size(ls).cast("long").as("n_lines"),
      size(kept).cast("long").as("n_kept_lines"),
      sentences.as("n_sentences"),
      keepPage.as("keep_page"),
      concat_ws("\n", kept).as("cleaned"))
  }

  // ---- PII redaction ------------------------------------------------------

  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val Ipv4Re = "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b"
  val PhoneRe = "\\b[0-9]{3}[-. ][0-9]{3}[-. ][0-9]{4}\\b"

  /** Replace emails / IPv4s / phone-shaped digit runs with typed tags.
    * Order matters: emails first (an email's host part must not be eaten
    * by the IP rule), then IPs, then phones. */
  def redactPii(text: Column): Column = {
    val t = coalesce(text, lit(""))
    val noEmail = regexp_replace(t, EmailRe, "<EMAIL>")
    val noIp = regexp_replace(noEmail, Ipv4Re, "<IP>")
    regexp_replace(noIp, PhoneRe, "<PHONE>")
  }

  /** (emails, ips, phones) hit counts, evaluated with the same ordering
    * semantics as [[redactPii]]. */
  def piiCounts(text: Column): Column = {
    val t = coalesce(text, lit(""))
    val noEmail = regexp_replace(t, EmailRe, "<EMAIL>")
    val noIp = regexp_replace(noEmail, Ipv4Re, "<IP>")
    struct(
      regexp_count(t, lit(EmailRe)).cast("long").as("n_emails"),
      regexp_count(noEmail, lit(Ipv4Re)).cast("long").as("n_ips"),
      regexp_count(noIp, lit(PhoneRe)).cast("long").as("n_phones"))
  }
}
