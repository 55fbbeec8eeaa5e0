package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Quickwit tokenizer registry re-expressed as composed Spark built-ins
  * (all codegen'd; no UDFs in the hot path).
  *
  * Reference: quickwit-query/src/tokenizers/mod.rs:41-93 —
  *  - raw:        whole value is a single token, dropped if >255 chars
  *  - lowercase:  raw + lower-casing
  *  - default:    SimpleTokenizer (split at non-alphanumeric) + remove-long(255) + lowercase
  *  - whitespace: split at whitespace (no lowercase, no length filter beyond 255? —
  *                reference WhitespaceTokenizer has no filters)
  *  - en_stem:    default + English (Porter) stemmer
  *  - source_code_default: split at camelCase/number boundaries + ascii folding
  *                (test: "PigCaféFactory2" → pig, cafe, factory, 2;
  *                 quickwit-query/src/tokenizers/mod.rs:152-162)
  */
object Tokenizers {

  val MaxTokenLen = 255 // tantivy RemoveLongFilter limit (tokenizers/mod.rs:45,55,62)

  /** raw: one token, dropped entirely when longer than 255 chars or null. */
  def raw(c: Column): Column =
    when(c.isNotNull && length(c) <= MaxTokenLen, array(c))
      .otherwise(array().cast("array<string>"))

  /** lowercase: raw + lower. Fast-field normalizer variant
    * (tokenizers/mod.rs:96-108). */
  def lowercase(c: Column): Column = raw(lower(c))

  /** default: split at non-alphanumeric (unicode), drop empty and >255,
    * lowercase. The engine's main text tokenizer. */
  def default(c: Column): Column =
    filter(
      split(lower(coalesce(c, lit(""))), "[^\\p{L}\\p{N}]+"),
      t => t =!= "" && length(t) <= MaxTokenLen)

  /** whitespace: split at runs of whitespace, keep case. */
  def whitespace(c: Column): Column =
    filter(split(coalesce(c, lit("")), "\\s+"), t => t =!= "" && length(t) <= MaxTokenLen)

  /** The BARE SimpleTokenizer: split at non-alphanumeric, NO filters —
    * casing preserved, no length cap (the custom-registry base shape;
    * filters come from the config). */
  def simpleSplit(c: Column): Column =
    filter(split(coalesce(c, lit("")), "[^\\p{L}\\p{N}]+"), t => t =!= "")

  /** source_code_default: the reference's CodeTokenizer char-class state
    * machine (code_tokenizer.rs:96-237) re-expressed as break-inserting
    * regexes, then RemoveLong + LowerCaser + AsciiFolding via `default`
    * (the analyzer chain at tokenizers/mod.rs:76-83). Char classes are
    * Upper = `\p{Lu}`, Lower = any OTHER letter (uncased scripts and
    * titlecase count as lower, matching Rust's `is_alphabetic &&
    * !is_uppercase`), Numeric = `\p{N}`; breaks at every class change
    * except a SINGLE leading upper absorbed by a lower run ("Pig"), with
    * an upper run splitting before its last char when a lower follows
    * ("ABCa" → "AB","Ca" — code_tokenizer.rs:145-166). */
  private def codeBreaks(c: Column): Column = {
    val lowerCls = "[\\p{L}&&[^\\p{Lu}]]" // Rust LowerCase class: alphabetic, not uppercase
    regexp_replace(
      regexp_replace(
        regexp_replace(
          regexp_replace(coalesce(c, lit("")), s"(\\p{Lu})(\\p{Lu}$lowerCls)", "$1 $2"),
          s"($lowerCls)(\\p{Lu})", "$1 $2"),
        "(\\p{L})(\\p{N})", "$1 $2"),
      "(\\p{N})(\\p{L})", "$1 $2")
  }

  /** The BARE CodeTokenizer — the custom-registry `source_code` TYPE
    * (tokenizer_entry.rs:57: `TextAnalyzer::builder(CodeTokenizer)` with
    * NO implicit filters — casing preserved; config filters apply after). */
  def sourceCodeBare(c: Column): Column = simpleSplit(codeBreaks(c))

  def sourceCode(c: Column): Column = default(asciiFold(codeBreaks(c)))

  /** The accent-fold tables — ONE definition shared by the column-side
    * [[asciiFold]] and the analyze endpoint's scalar twin
    * ([[Analyze]]), so the two can never drift. */
  val AsciiFoldFrom = "àáâãäåçèéêëìíîïñòóôõöùúûüýÿÀÁÂÃÄÅÇÈÉÊËÌÍÎÏÑÒÓÔÕÖÙÚÛÜÝ"
  val AsciiFoldTo   = "aaaaaaceeeeiiiinooooouuuuyyAAAAAACEEEEIIIINOOOOOUUUUY"

  /** ascii folding for the common latin-1 accents (é→e etc.) — shared by
    * `source_code_default` and the custom-registry `ascii_folding` filter. */
  def asciiFold(c: Column): Column = translate(c, AsciiFoldFrom, AsciiFoldTo)

  /** en_stem: default + the REAL Porter stemmer (tantivy's
    * Stemmer(Language::English) = Porter; TokenizersSpec pins the published
    * Porter example vocabulary). r3: a native Catalyst expression
    * ([[StemTokens]]) rather than a UDF, so the whole tokenizer chain stays
    * inside whole-stage codegen; `enStemLite` below remains the pure-regex
    * approximation. */
  def enStem(c: Column): Column = StemTokens.stem(default(c))

  /** UDF-free regex approximation of en_stem (common -ing/-ed/-ies/-s
    * families only) for fully-codegen'd pipelines that can trade stemming
    * accuracy for it. */
  def enStemLite(c: Column): Column =
    transform(default(c), t => stemToken(t))

  private def stemToken(t: Column): Column = {
    val ies = when(t.rlike(".{2,}ies$"), regexp_replace(t, "ies$", "i"))
    val sses = when(t.rlike(".{2,}sses$"), regexp_replace(t, "sses$", "ss"))
    val ing = when(t.rlike(".{4,}ing$"), regexp_replace(t, "ing$", ""))
    val ed = when(t.rlike(".{4,}ed$"), regexp_replace(t, "ed$", ""))
    val s = when(t.rlike(".{3,}[^su]s$"), regexp_replace(t, "s$", ""))
    coalesce(ies, sses, ing, ed, s, t)
  }

  /** chinese_compatible: every CJK ideograph is its own token, non-CJK
    * alphanumeric runs tokenize like `default`, + remove-long(255) +
    * lowercase (tokenizers/chinese_compatible.rs:47-120 + the analyzer
    * chain at tokenizers/mod.rs:70-74). The char ranges mirror the
    * reference EXACTLY — including its quirky 4500 (not 4E00) lower bound
    * on the main ideograph block (chinese_compatible.rs:56). Expressed as a
    * codegen'd space-insertion around CJK chars followed by the `default`
    * split (CJK ideographs are \p{L}, so each becomes a 1-char token). */
  /** The reference's CJK char-class — including its quirky 4500 (not
    * 4E00) lower bound (chinese_compatible.rs:56). ONE definition shared
    * by [[chineseCompatible]] and both multilang variants. */
  private val CjkRange =
    "[\\x{4500}-\\x{9FFF}\\x{3400}-\\x{4DBF}\\x{20000}-\\x{2A6DF}\\x{2A700}-\\x{2CEAF}]"

  private def cjkBreaks(c: Column): Column =
    regexp_replace(coalesce(c, lit("")), s"($CjkRange)", " $1 ")

  def chineseCompatible(c: Column): Column = default(cjkBreaks(c))

  /** Japanese segmentation with an embedded ipadic-shaped dictionary
    * slice ([[JpnLexicon]]) — the reference links Lindera's ipadic
    * tokenizer (multilang.rs:65-150; the full dictionaries are absent
    * offline). Three break rules as codegen'd regex passes:
    *  1. dictionary surfaces (kanji stem × conjugation-class okurigana:
    *     好き, 飲み, 言っ, 高く…) stay WHOLE, tried longest-first ahead of
    *     the bare script-run branches; remaining kanji runs and katakana
    *     runs (incl. the ー prolonged-sound mark) become tokens —
    *     script-transition breaks;
    *  2. a single-char particle/connective at the START of a hiragana run
    *     (i.e. right after a content word) is detached (が を は の に…);
    *  3. a sentence-final auxiliary at the END of a hiragana run is
    *     detached (です ます ました…).
    * Remaining divergence vs a full dictionary: out-of-slice stems split
    * at the script transition, and compound-noun boundaries inside one
    * kanji run (勉強好き) are not found. */
  def jpnSegment(body: Column): Column = {
    val hira = "\\p{IsHiragana}"
    val runs = regexp_replace(concat(lit(" "), body),
      s"(${JpnLexicon.alternation}|\\p{IsHan}+|[\\p{IsKatakana}\\x{30FC}]+)", " $1 ")
    // で is both the instrumental particle and the copula stem — don't
    // detach it off the です/でした auxiliaries rule 3 owns
    val particles = regexp_replace(runs,
      s"(?<=\\s)(は|が|を|に|で(?!す|した)|と|の|へ|も|や|て)(?=$hira)", "$1 ")
    regexp_replace(particles,
      s"(?<=$hira)(でした|ました|ません|です|ます|ない|たい)(?=\\s|$$)", " $1")
  }

  /** Korean: ko-dic-shaped morpheme boundaries (multilang.rs:54-62 Korean
    * arm) in three stages. (1) [[KorLexicon.rewrites]] un-fuses the
    * conjugated syllable of in-slice vowel-final stems (합니다→하ㅂ니다,
    * 일본입니다→일본이ㅂ니다, 갔→가았) via real syllable arithmetic.
    * (2) Generic boundary rules — no lexicon needed — cut the whole-
    * syllable endings every stem shares: the detached-jamo heads (ㅂ니다,
    * ㄴ), past 았/었, formal 습니다/습니까, honorific 세요/십니다, polite
    * 어요/아요, and the light-verb stems 하/되 ahead of an already-cut
    * ending (안녕하세요→안녕 하 세요, the reference's own golden shape:
    * 일본입니다 → 일본/이/ㅂ니다). (3) One trailing case particle (josa)
    * detached per eojeol. Remaining divergence vs full ko-dic: fused
    * syllables of out-of-slice vowel stems stay whole. */
  def korSegment(body: Column): Column = {
    val han = "[가-힣]"
    val unfused = KorLexicon.rewrites.foldLeft(body) {
      case (c, (pattern, repl)) => regexp_replace(c, pattern, repl)
    }
    val jamoCut = regexp_replace(unfused, s"(?<=$han)(?=[ㄴㅂㄹ])", " ")
    val pastCut = regexp_replace(jamoCut, s"(?<=$han)(았|었)(?=$han|\\s|$$)", " $1 ")
    val endings = regexp_replace(pastCut,
      s"(?<=$han)(습니다|습니까|십니다|세요|어요|아요)(?=\\s|$$|[^가-힣])", " $1")
    val lightVerb = regexp_replace(endings,
      s"(?<=$han)(하|되)(?= (?:ㅂ니|았|었|세요|십니))", " $1")
    regexp_replace(lightVerb,
      "(?<=\\p{IsHangul})(에서|에게|으로|부터|까지|처럼|보다|한테|은|는|이|가|을|를|에|의|도|만|와|과|로)(?=\\s|$)",
      " $1")
  }

  /** multilang: per-value language detection (or an explicit `ENG:`/`CMN:`/
    * `JPN:`/`KOR:` prefix override) dispatching to a per-language analyzer
    * (tokenizers/multilang.rs:65-150). Detection is [[LangDetect]] — script
    * blocks decide CJK outright, latin text scores against embedded
    * function-word profiles (whichlang's decision shape; r2's script-
    * presence dispatch misread latin-script non-English as `eng`).
    * JPN/KOR segment by [[jpnSegment]]/[[korSegment]] — script runs + an
    * embedded particle lexicon standing in for the reference's Lindera
    * dictionaries (absent offline; divergences documented there). The
    * dispatch shape, prefix contract and CMN/ENG paths match — all non-CJK
    * languages take the default analyzer, exactly as the reference's
    * `_ => SimpleTokenizer` arm. */
  /** ONE prefix-strip + language when-chain for both multilang variants:
    * `wrap` is the per-language finishing analyzer applied to the
    * segmented body. */
  private def multilangWith(c: Column)(wrap: Column => Column): Column = {
    val t = coalesce(c, lit(""))
    val prefix = substring(t, 1, 4)
    val body = when(prefix.isin("ENG:", "CMN:", "JPN:", "KOR:"), substring(t, 5, Int.MaxValue))
      .otherwise(t)
    val lang = when(prefix === "ENG:", "eng").when(prefix === "CMN:", "cmn")
      .when(prefix === "JPN:", "jpn").when(prefix === "KOR:", "kor")
      .otherwise(LangDetect.detectLanguage(body))
    when(lang === "cmn", wrap(cjkBreaks(body)))
      .when(lang === "jpn", wrap(jpnSegment(body)))
      .when(lang === "kor", wrap(korSegment(body)))
      .otherwise(wrap(body))
  }

  def multilang(c: Column): Column = multilangWith(c)(default)

  /** The BARE MultiLangTokenizer — the custom-registry `multilang` TYPE
    * (tokenizer_entry.rs:53-55: the tokenizer alone, NO implicit filters;
    * the registered `multilang_default` chain adds RemoveLong+LowerCaser,
    * tokenizers/mod.rs:85-93). Same dispatch and segmentation as
    * [[multilang]], but casing preserved and no length cap. */
  def multilangBare(c: Column): Column = multilangWith(c)(simpleSplit)

  /** Tokenizer lookup by reference name. */
  def byName(name: String): Column => Column = name match {
    case "raw"                 => raw
    case "lowercase"           => lowercase
    case "default"             => default
    case "whitespace"          => whitespace
    case "source_code_default" => sourceCode
    case "en_stem"             => enStem
    case "chinese_compatible"  => chineseCompatible
    case "multilang"           => multilang
    case other => throw new IllegalArgumentException(s"unknown tokenizer: $other")
  }
}
