package graft.functions

import graft.SparkTestBase
import graft.functions.TokenizerRegistry._

/** Golden tests for the custom tokenizer registry, pinned on tantivy's
  * documented NgramTokenizer / RegexTokenizer / filter semantics and the
  * reference's tokenizer_entry.rs config tests. */
class TokenizerRegistrySpec extends SparkTestBase {

  private def run(cfg: TokenizerConfig, text: String): Seq[String] =
    evalTokens(text, analyzer(cfg))

  test("ngram: all positions, lengths min..max, (position, length) order") {
    assert(run(TokenizerConfig(Ngram(2, 3)), "hello") ===
      Seq("he", "hel", "el", "ell", "ll", "llo", "lo"))
  }

  test("ngram prefix_only: grams from position 0 only") {
    assert(run(TokenizerConfig(Ngram(1, 3, prefixOnly = true)), "hello") ===
      Seq("h", "he", "hel"))
  }

  test("ngram: reference config golden shape (min 1, max 3) + short input + validation") {
    assert(run(TokenizerConfig(Ngram(1, 3)), "abc") ===
      Seq("a", "ab", "abc", "b", "bc", "c"))
    assert(run(TokenizerConfig(Ngram(3, 4)), "ab") === Seq.empty)
    intercept[IllegalArgumentException](Ngram(0, 3))
    intercept[IllegalArgumentException](Ngram(4, 3))
  }

  test("regex: tokens are successive pattern matches") {
    assert(run(TokenizerConfig(Regex("[a-z]+")), "abc DEF ghi") === Seq("abc", "ghi"))
    assert(run(TokenizerConfig(Regex("(my_pattern)")), "xx my_pattern yy my_pattern") ===
      Seq("my_pattern", "my_pattern"))
  }

  test("filter chain applies in declared order; remove_long is byte-based at 255") {
    val longTok = "x" * 255
    assert(run(TokenizerConfig(Simple, Seq(RemoveLong)), s"ok $longTok also") ===
      Seq("ok", "also"))
    // 254 bytes survives, 255 does not (keep-if len < limit)
    assert(run(TokenizerConfig(Simple, Seq(RemoveLong)), "y" * 254) === Seq("y" * 254))
    assert(run(TokenizerConfig(Simple, Seq(LowerCaser, AsciiFolding)), "Café NOËL") ===
      Seq("cafe", "noel"))
    // no filters: simple keeps case (unlike the default builtin)
    assert(run(TokenizerConfig(Simple), "Hello World") === Seq("Hello", "World"))
  }

  test("registry: custom + builtin resolution, duplicate and shadow rejection") {
    val reg = new Registry(Seq(
      TokenizerEntry("my_ngram", TokenizerConfig(Ngram(2, 2), Seq(LowerCaser))),
      TokenizerEntry("my_regex", TokenizerConfig(Regex("[0-9]+")))))
    assert(evalTokens("AbC", reg.byName("my_ngram")) === Seq("ab", "bc"))
    assert(evalTokens("a1b22", reg.byName("my_regex")) === Seq("1", "22"))
    assert(evalTokens("Hello World", reg.byName("default")) === Seq("hello", "world"))
    intercept[IllegalArgumentException](reg.byName("nope"))
    intercept[IllegalArgumentException](new Registry(Seq(
      TokenizerEntry("dup", TokenizerConfig(Simple)),
      TokenizerEntry("dup", TokenizerConfig(Simple)))))
    intercept[IllegalArgumentException](new Registry(Seq(
      TokenizerEntry("default", TokenizerConfig(Simple)))))
  }
}
