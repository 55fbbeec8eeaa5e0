package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.apache.spark.sql.Row

/** Hand-vector pins for the Gopher/C4-style quality + repetition filters. */
class QualityFiltersSpec extends SparkTestBase {
  import spark.implicits._

  private def row(text: String, c: org.apache.spark.sql.Column): Row =
    Seq(text).toDF("t").select(c.as("v")).collect()(0).getStruct(0)

  test("duplicate line fractions: 4 lines, one repeated") {
    // "aa" repeats: 4 lines, 3 distinct → line frac 1/4;
    // chars 2+3+2+4=11, distinct chars 2+3+4=9 → char frac 2/11
    val df = Seq("aa\nbbb\naa\ncccc").toDF("t").select(
      QualityFilters.duplicateLineFraction(QualityFilters.lines(col("t"))).as("lf"),
      QualityFilters.duplicateLineCharFraction(QualityFilters.lines(col("t"))).as("cf"))
    val r = df.collect()(0)
    assert(r.getDouble(0) == 0.25)
    assert(math.abs(r.getDouble(1) - 2.0 / 11.0) < 1e-12)
    // no duplicates → both zero; empty text → zero (not NaN)
    val clean = Seq("x\ny", "").toDF("t").select(
      QualityFilters.duplicateLineFraction(QualityFilters.lines(col("t"))).as("lf"),
      QualityFilters.duplicateLineCharFraction(QualityFilters.lines(col("t"))).as("cf"))
      .collect()
    assert(clean(0).getDouble(0) == 0.0 && clean(0).getDouble(1) == 0.0)
  }

  test("top-bigram cover: heaviest 2-gram by occurrences x length") {
    // "a b a b a b c" → bigram "a b" x3 (len 3 → 9 covered), "b a" x2 (6),
    // "b c" x1 (3). n_chars = 13.
    val df = Seq((1L, "a b a b a b c"), (2L, "solo")).toDF("doc_id", "text")
    val out = QualityFilters.topBigramCover(df, "doc_id", "text")
      .orderBy("doc_id").collect()
    assert(out.length == 1) // doc 2 has <2 words → no bigrams → dropped
    assert(out(0).getAs[Long]("covered_chars") == 9L)
    assert(out(0).getAs[Long]("n_chars") == 13L)
  }

  test("gopher rules: word stats, stopwords, bullets, ellipsis") {
    val good = ("the cat and the dog sat with all of that " * 5).trim
    val g = row(good, QualityFilters.gopherRules(col("t")))
    assert(g.getAs[Long]("word_count") == 50L)
    assert(g.getAs[Long]("stop_hits") >= 2L)
    assert(g.getAs[Boolean]("ok_word_count"))
    assert(g.getAs[Boolean]("keep"))

    val short = row("tiny doc", QualityFilters.gopherRules(col("t")))
    assert(!short.getAs[Boolean]("ok_word_count") && !short.getAs[Boolean]("keep"))

    val hashy = row(("# " * 60).trim, QualityFilters.gopherRules(col("t")))
    assert(!hashy.getAs[Boolean]("ok_symbol_ratio"))
    assert(!hashy.getAs[Boolean]("ok_alpha_words"))

    val bullets = row((1 to 10).map(i => s"- item $i").mkString("\n"),
      QualityFilters.gopherRules(col("t")))
    assert(bullets.getAs[Double]("bullet_line_frac") == 1.0)
    assert(!bullets.getAs[Boolean]("ok_bullet_lines"))

    val dots = row("first line...\nsecond...\nthird...\nplain",
      QualityFilters.gopherRules(col("t")))
    assert(dots.getAs[Double]("ellipsis_line_frac") == 0.75)
    assert(!dots.getAs[Boolean]("ok_ellipsis_lines"))

    val empty = row("", QualityFilters.gopherRules(col("t")))
    assert(empty.getAs[Long]("word_count") == 0L)
    assert(!empty.getAs[Boolean]("keep"))
  }

  test("pii redaction: emails, ips, phones; email host not eaten by ip rule") {
    val in = "mail bob@ex.com or 10.1.2.3 or 555-123-4567 or alice@h2.org end"
    val red = Seq(in).toDF("t")
      .select(QualityFilters.redactPii(col("t")).as("r")).as[String].collect()(0)
    assert(red == "mail <EMAIL> or <IP> or <PHONE> or <EMAIL> end")
    val c = row(in, QualityFilters.piiCounts(col("t")))
    assert(c.getAs[Long]("n_emails") == 2L)
    assert(c.getAs[Long]("n_ips") == 1L)
    assert(c.getAs[Long]("n_phones") == 1L)
    // a bare version-like string must not count as an IP inside a word
    val none = row("v1.2.3.4beta", QualityFilters.piiCounts(col("t")))
    assert(none.getAs[Long]("n_ips") == 0L)
  }

  private def ngramRow(text: String): Row =
    QualityFilters.ngramRepetition(
      Seq((0L, text)).toDF("id", "t"), "id", col("t")).collect()(0)

  test("ngram repetition: top-n fractions count word chars times runs") {
    // "a b a b": tot word chars 4. 2-grams (a b, b a, a b): top run 2 of
    // "a b" × 2 word chars = 4 → 1.0. 3-grams each once, 3 word chars each
    // → 0.75. The single 4-gram covers all 4 word chars → 1.0.
    val r = ngramRow("a b a b")
    assert(r.getAs[Double]("top2_gram_frac") == 1.0)
    assert(r.getAs[Double]("top3_gram_frac") == 0.75)
    assert(r.getAs[Double]("top4_gram_frac") == 1.0)
    // below-n docs and empty docs are 0.0, never NaN
    val short = ngramRow("solo")
    assert(short.getAs[Double]("top2_gram_frac") == 0.0)
    val empty = ngramRow("")
    assert(empty.getAs[Double]("top2_gram_frac") == 0.0)
    assert(empty.getAs[Double]("dup5_gram_frac") == 0.0)
  }

  test("ngram repetition: duplicated n-gram coverage unions overlaps") {
    // 6-word phrase twice: every word sits under a duplicated 5- and
    // 6-gram occurrence → dup5 = dup6 = 1.0; no 7-gram repeats → 0.0.
    val twice = ngramRow("one two three four five six one two three four five six")
    assert(twice.getAs[Double]("dup5_gram_frac") == 1.0)
    assert(twice.getAs[Double]("dup6_gram_frac") == 1.0)
    assert(twice.getAs[Double]("dup7_gram_frac") == 0.0)
    assert(!twice.getAs[Boolean]("keep")) // dup5 1.0 > 0.15

    // heavy self-overlap: "a b" × 4 → the two distinct 5-grams each repeat;
    // interval-merging covers all 8 words EXACTLY once → 1.0 (double-
    // counting occurrences would claim 20/8 = 2.5)
    val overlap = ngramRow("a b a b a b a b")
    assert(overlap.getAs[Double]("dup5_gram_frac") == 1.0)

    // a single repeated 5-gram embedded mid-doc covers only its own words:
    // "p q r s t" occurs at positions 6 and 14 of 25 one-char words →
    // covered = 10 of 25 word chars
    val mid = ngramRow("u v w x y z p q r s t m n o p q r s t c d e f g h")
    assert(mid.getAs[Double]("dup5_gram_frac") == 10.0 / 25.0)
  }

  test("c4 line rule: terminal punctuation, 3 words, javascript") {
    val keep = Seq(
      "This line is fine.", // period, 4 words
      "Is this a question?", // question mark
      "He said \"stop\" and then \"go.\"", // closing quote counts
      "Three words suffice!  " // trailing whitespace rtrimmed
    ).toDF("t").select(QualityFilters.c4LineKeep(col("t")).as("k"))
      .as[Boolean].collect()
    assert(keep.forall(identity))
    val drop = Seq(
      "no terminal punctuation here", // rule 1
      "Too short.", // 2 words — rule 2
      "Please enable javascript in your Browser.", // rule 3 (case-insensitive)
      "", // empty
      "JavaScript is required here." // mixed case still matches
    ).toDF("t").select(QualityFilters.c4LineKeep(col("t")).as("k"))
      .as[Boolean].collect()
    assert(drop.forall(!_))
  }

  test("c4 page gate: lorem ipsum, curly brace, five sentences") {
    def page(ls: String*): Row =
      row(ls.mkString("\n"), QualityFilters.c4Clean(col("t")))

    // 5 kept sentences across 2 kept lines + 2 dropped lines
    val good = page(
      "One good sentence here. And another one follows! A third?",
      "dropped: no terminal punct",
      "Js.", // dropped: 1 word
      "Sentence four is long enough. Sentence five closes it out.")
    assert(good.getAs[Long]("n_lines") == 4L)
    assert(good.getAs[Long]("n_kept_lines") == 2L)
    assert(good.getAs[Long]("n_sentences") == 5L)
    assert(good.getAs[Boolean]("keep_page"))
    assert(good.getAs[String]("cleaned") ==
      "One good sentence here. And another one follows! A third?\n" +
        "Sentence four is long enough. Sentence five closes it out.")

    // sentences on DROPPED lines must not count toward the page gate
    val starved = page(
      "only four sentences kept. two here! three? and four.",
      "unterminated line with lots. of! punctuation? inside")
    assert(starved.getAs[Long]("n_sentences") == 4L)
    assert(!starved.getAs[Boolean]("keep_page"))

    // lorem ipsum anywhere (any case) kills the page even with 5 sentences
    val lorem = page(
      "One good sentence here. And another one follows! A third?",
      "Lorem Ipsum dolor sit amet. Filler text continues on.")
    assert(lorem.getAs[Long]("n_sentences") >= 5L)
    assert(!lorem.getAs[Boolean]("keep_page"))

    // a curly brace anywhere kills the page, even on a dropped line
    val code = page(
      "One good sentence here. And another one follows! A third?",
      "Sentence four is long enough. Sentence five closes it out.",
      "if (x) { y++ }")
    assert(code.getAs[Long]("n_sentences") == 5L)
    assert(!code.getAs[Boolean]("keep_page"))

    // null page behaves as empty: nothing kept, page dropped
    val nul = Seq[Option[String]](None).toDF("t")
      .select(QualityFilters.c4Clean(col("t")).as("v")).collect()(0).getStruct(0)
    assert(nul.getAs[Long]("n_kept_lines") == 0L)
    assert(!nul.getAs[Boolean]("keep_page"))
  }
}
