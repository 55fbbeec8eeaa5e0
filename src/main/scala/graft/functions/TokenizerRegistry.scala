package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** User-definable tokenizer registry (U1) — the reference's
  * `TokenizerEntry` config: a base tokenizer (simple / source_code /
  * multilang / ngram / regex) plus an ordered token-filter chain
  * (remove_long / lower_caser / ascii_folding), registered under a custom
  * name next to the 8 built-ins.
  *
  * Reference: quickwit-doc-mapper/src/default_doc_mapper/tokenizer_entry.rs
  * :28-149 (config model + analyzer build), tantivy NgramTokenizer /
  * RegexTokenizer / RemoveLongFilter semantics. Everything compiles to
  * codegen'd column expressions — a registry lookup returns a
  * `Column => Column`, same contract as [[Tokenizers.byName]].
  *
  * Fidelity notes:
  *  - remove_long drops tokens with byte length >= 255
  *    (`RemoveLongFilter::limit(DEFAULT_REMOVE_TOKEN_LENGTH)`, keep-if
  *    `len < limit`, bytes) — measured here with octet_length;
  *  - ngram emits, for every codepoint position, all gram lengths
  *    min..max that fit (prefix_only keeps position 0 only) — tantivy's
  *    (position, length) emission order preserved;
  *  - regex tokens are the successive non-empty matches of the pattern
  *    (`RegexTokenizer`), via regexp_extract_all with group 0.
  */
object TokenizerRegistry {

  sealed trait TokenizerType
  case object Simple extends TokenizerType
  case object SourceCode extends TokenizerType
  case object Multilang extends TokenizerType
  final case class Ngram(minGram: Int, maxGram: Int, prefixOnly: Boolean = false)
      extends TokenizerType {
    require(minGram > 0 && minGram <= maxGram,
      s"invalid ngram tokenizer: 0 < min_gram ($minGram) <= max_gram ($maxGram)")
  }
  final case class Regex(pattern: String) extends TokenizerType

  sealed trait TokenFilter
  case object RemoveLong extends TokenFilter
  case object LowerCaser extends TokenFilter
  case object AsciiFolding extends TokenFilter

  final case class TokenizerConfig(tokenizerType: TokenizerType,
                                   filters: Seq[TokenFilter] = Nil)
  final case class TokenizerEntry(name: String, config: TokenizerConfig)

  /** tantivy RemoveLongFilter::limit value (tokenizers/mod.rs:38). */
  val RemoveTokenLength = 255

  /** Base tokenizer WITHOUT filters — filters compose separately, in the
    * declared order, exactly like the reference's analyzer builder. */
  private def baseTokens(t: TokenizerType)(c: Column): Column = t match {
    case Simple =>
      // tantivy SimpleTokenizer: split at non-alphanumeric, no casing
      Tokenizers.simpleSplit(c)
    // the TYPE compiles to the BARE tokenizer — no implicit filters
    // (tokenizer_entry.rs:49-68); the registered `source_code_default` /
    // `multilang` NAMES carry their own chains in Tokenizers.byName
    case SourceCode => Tokenizers.sourceCodeBare(c)
    case Multilang  => Tokenizers.multilangBare(c)
    case Ngram(minG, maxG, prefixOnly) =>
      val s = coalesce(c, lit(""))
      val len = length(s)
      val positions =
        if (prefixOnly) array(lit(0)) else sequence(lit(0), greatest(len - minG, lit(0)))
      when(len >= minG,
        flatten(transform(positions, i =>
          filter(
            transform(sequence(lit(minG), lit(maxG)), n =>
              when(i + n <= len, s.substr(i + 1, n))),
            g => g.isNotNull))))
        .otherwise(array().cast("array<string>"))
    case Regex(pattern) =>
      filter(regexp_extract_all(coalesce(c, lit("")), lit(pattern), lit(0)), x => x =!= "")
  }

  private def applyFilter(f: TokenFilter)(tokens: Column): Column = f match {
    case RemoveLong   => filter(tokens, t => octet_length(t) < RemoveTokenLength)
    case LowerCaser   => transform(tokens, t => lower(t))
    case AsciiFolding => transform(tokens, t => Tokenizers.asciiFold(t))
  }

  /** Compile a config to a column function: base tokenizer, then the
    * filter chain in order. */
  def analyzer(cfg: TokenizerConfig): Column => Column =
    c => cfg.filters.foldLeft(baseTokens(cfg.tokenizerType)(c))((acc, f) => applyFilter(f)(acc))

  /** A registry = the 8 built-ins + custom entries; custom names may not
    * shadow built-ins (the reference's TokenizerManager rejects those). */
  final class Registry(entries: Seq[TokenizerEntry]) {
    private val builtins = Set("raw", "lowercase", "default", "whitespace",
      "source_code_default", "en_stem", "chinese_compatible", "multilang")
    entries.groupBy(_.name).foreach { case (n, es) =>
      require(es.size == 1, s"duplicated tokenizer definition `$n`")
      require(!builtins(n), s"custom tokenizer `$n` shadows a built-in")
    }
    private val custom = entries.map(e => e.name -> analyzer(e.config)).toMap

    def byName(name: String): Column => Column =
      custom.getOrElse(name,
        if (builtins(name)) Tokenizers.byName(name)
        else throw new IllegalArgumentException(s"unknown tokenizer: $name"))
  }
}
