package graft.functions

import graft.SparkTestBase

/** Golden tokenizer tests mirroring the reference's
  * quickwit-query/src/tokenizers/mod.rs:116-163 test block. */
class TokenizersSpec extends SparkTestBase {

  test("default: split at non-alphanumeric, lowercase, drop empties") {
    assert(evalTokens("Hello, happy tax payer!", Tokenizers.default) ===
      Seq("hello", "happy", "tax", "payer"))
  }

  test("default: unicode letters and digits are token chars") {
    assert(evalTokens("Méchant pilote; 42 fois", Tokenizers.default) ===
      Seq("méchant", "pilote", "42", "fois"))
  }

  test("default: tokens longer than 255 chars are dropped") {
    val long = "a" * 256
    assert(evalTokens(s"keep $long also", Tokenizers.default) === Seq("keep", "also"))
    // exactly 255 survives (RemoveLongFilter is strictly greater-than)
    val ok = "b" * 255
    assert(evalTokens(ok, Tokenizers.default) === Seq(ok))
  }

  test("default: null → empty") {
    assert(evalTokens(null, Tokenizers.default) === Seq.empty)
  }

  test("raw: whole value is one token; >255 drops it entirely") {
    assert(evalTokens("Hello World!", Tokenizers.raw) === Seq("Hello World!"))
    assert(evalTokens("x" * 256, Tokenizers.raw) === Seq.empty)
    assert(evalTokens(null, Tokenizers.raw) === Seq.empty)
  }

  test("lowercase: raw + lowercase") {
    assert(evalTokens("Hello WORLD", Tokenizers.lowercase) === Seq("hello world"))
  }

  test("whitespace: split at whitespace runs, keep case") {
    assert(evalTokens("Hello  Happy\tTax payer", Tokenizers.whitespace) ===
      Seq("Hello", "Happy", "Tax", "payer"))
  }

  test("source_code_default: PigCaféFactory2 → pig cafe factory 2") {
    // the reference's documented golden case (tokenizers/mod.rs:152-162)
    assert(evalTokens("PigCaféFactory2", Tokenizers.sourceCode) ===
      Seq("pig", "cafe", "factory", "2"))
  }

  test("source_code_default: snake_case and digits") {
    assert(evalTokens("read_file2Parse", Tokenizers.sourceCode) ===
      Seq("read", "file", "2", "parse"))
  }

  test("source_code_default: the reference's remaining golden cases (code_tokenizer.rs:246-385)") {
    // post-filter-chain (lowercased + folded) renditions of the raw
    // CodeTokenizer expectations
    assert(evalTokens("PIG_CAFE_FACTORY", Tokenizers.sourceCode) ===
      Seq("pig", "cafe", "factory"))
    assert(evalTokens("TPigCafeFactory", Tokenizers.sourceCode) ===
      Seq("t", "pig", "cafe", "factory"))
    assert(evalTokens("PIG# Cafe@FACTORY", Tokenizers.sourceCode) ===
      Seq("pig", "cafe", "factory"))
  }

  test("source_code_default: upper-run splits before its last char when a lower follows") {
    // "ABCa" → AB|Ca (code_tokenizer.rs:145-166); acronym-then-word shape
    assert(evalTokens("HTMLParser", Tokenizers.sourceCode) === Seq("html", "parser"))
    assert(evalTokens("ABCa", Tokenizers.sourceCode) === Seq("ab", "ca"))
    assert(evalTokens("AAaa", Tokenizers.sourceCode) === Seq("a", "aaa"))
  }

  test("source_code_default: uncased letters are lower-class (break before a following upper)") {
    // Rust is_alphabetic && !is_uppercase → LowerCase: 国A breaks, A国 merges
    assert(evalTokens("国A", Tokenizers.sourceCode) === Seq("国", "a"))
    assert(evalTokens("A国", Tokenizers.sourceCode) === Seq("a国"))
  }

  test("en_stem: real Porter over the default token stream") {
    assert(evalTokens("running jumped stories glasses tokens", Tokenizers.enStem) ===
      Seq("run", "jump", "stori", "glass", "token"))
  }

  test("en_stem_lite: regex approximation keeps its pinned output") {
    assert(evalTokens("running jumped stories glasses tokens", Tokenizers.enStemLite) ===
      Seq("runn", "jump", "stori", "glass", "token"))
  }

  test("chinese_compatible: reference golden — CJK per-char, latin per-word") {
    // chinese_compatible.rs:135-209 test_chinese_tokenizer
    assert(evalTokens("Hello world, 你好世界, bonjour monde", Tokenizers.chineseCompatible) ===
      Seq("hello", "world", "你", "好", "世", "界", "bonjour", "monde"))
    // chinese_compatible.rs:212-257 test_chinese_tokenizer_no_space
    assert(evalTokens("Hello你好bonjour", Tokenizers.chineseCompatible) ===
      Seq("hello", "你", "好", "bonjour"))
  }

  test("chinese_compatible: ascii-only input equals default (reference proptest)") {
    // chinese_compatible.rs:259-264 proptest: ascii text → same as default
    for (t <- Seq("Hello, happy tax payer!", "a-b_c 42", "", "   "))
      assert(evalTokens(t, Tokenizers.chineseCompatible) === evalTokens(t, Tokenizers.default), t)
  }

  test("multilang: prefix override and script-based dispatch") {
    // explicit prefix forces the analyzer and is stripped (multilang.rs:129-150)
    assert(evalTokens("ENG:Hello World", Tokenizers.multilang) === Seq("hello", "world"))
    assert(evalTokens("CMN:你好世界", Tokenizers.multilang) === Seq("你", "好", "世", "界"))
    // detection: Han → per-char; plain latin → default
    assert(evalTokens("你好 world", Tokenizers.multilang) === Seq("你", "好", "world"))
    assert(evalTokens("Hello happy tax payer", Tokenizers.multilang) ===
      Seq("hello", "happy", "tax", "payer"))
    // an all-hiragana content word stays ONE token (script-run
    // segmentation; the old per-char fallback gave す/も/も)
    assert(evalTokens("JPN:すもも", Tokenizers.multilang) === Seq("すもも"))
  }

  test("multilang JPN: script runs + particle lexicon segment like a dictionary") {
    // MeCab(ipadic) gives 東京/タワー/は/パリ/の/エッフェル/塔/に/似/て/い/ます
    assert(evalTokens("JPN:東京タワーはパリのエッフェル塔に似ています", Tokenizers.multilang) ===
      Seq("東京", "タワー", "は", "パリ", "の", "エッフェル", "塔", "に", "似", "て", "い", "ます"))
    // kanji+okurigana compounds resolve through the embedded dictionary
    // slice: 好き is ONE morpheme, exactly MeCab's boundary
    assert(evalTokens("JPN:猫が好きです", Tokenizers.multilang) ===
      Seq("猫", "が", "好き", "です"))
    // katakana loanword with prolonged-sound mark is one token; the verb
    // continuative 飲み stays whole with ます split off (MeCab: 飲み/ます)
    assert(evalTokens("JPN:コーヒーを飲みます", Tokenizers.multilang) ===
      Seq("コーヒー", "を", "飲み", "ます"))
  }

  test("multilang JPN: dictionary-slice conjugation surfaces match MeCab boundaries") {
    // godan geminate stem: 言った → 言っ/た (the euphonic stem keeps its
    // okurigana; た is the auxiliary)
    assert(evalTokens("JPN:彼はそう言った", Tokenizers.multilang) ===
      Seq("彼", "は", "そう", "言っ", "た"))
    // i-adjective surfaces: 高く one token; past 高かった → 高かっ/た
    assert(evalTokens("JPN:山が高くなる", Tokenizers.multilang) ===
      Seq("山", "が", "高く", "なる"))
    assert(evalTokens("JPN:値段が高かった", Tokenizers.multilang) ===
      Seq("値段", "が", "高かっ", "た"))
    // ichidan bare stem before an auxiliary: 食べました → 食べ/ました
    assert(evalTokens("JPN:寿司を食べました", Tokenizers.multilang) ===
      Seq("寿司", "を", "食べ", "ました"))
    // longest-first: dictionary form 食べる wins over the bare stem 食べ
    assert(evalTokens("JPN:パンを食べる", Tokenizers.multilang) ===
      Seq("パン", "を", "食べる"))
    // out-of-slice stems still fall back to the script-run break
    assert(evalTokens("JPN:物語を紡ぎます", Tokenizers.multilang) ===
      Seq("物語", "を", "紡", "ぎ", "ます"))
  }

  test("multilang KOR: ko-dic slice morpheme boundaries") {
    // the reference's own golden sentence (multilang.rs:276-284, Lindera/
    // ko-dic yields 11 tokens incl. two periods; ours drops punctuation):
    // 일본/이/ㅂ니다 — the copula's fused 입 un-fuses, first token 일본
    // matching the reference's assert_eq!(token.text, "일본")
    assert(evalTokens("KOR:일본입니다. 매우 멋진 단어입니다.", Tokenizers.multilang) ===
      Seq("일본", "이", "ㅂ니다", "매우", "멋지", "ㄴ", "단어", "이", "ㅂ니다"))
    // 가+ㅂ니다 un-fused via syllable arithmetic; josa split off
    assert(evalTokens("KOR:나는 학교에 갑니다", Tokenizers.multilang) ===
      Seq("나", "는", "학교", "에", "가", "ㅂ니다"))
    // longest-match josa (에서 before 에); polite 어요 is a generic ending
    assert(evalTokens("KOR:도서관에서 책을 읽어요", Tokenizers.multilang) ===
      Seq("도서관", "에서", "책", "을", "읽", "어요"))
    // light verb 하 detaches ahead of an already-cut ending
    assert(evalTokens("안녕하세요 세계", Tokenizers.multilang) ===
      Seq("안녕", "하", "세요", "세계"))
    // past-tense contraction reversed: 갔→가+았, 했→하+았, 됐→되+었
    assert(evalTokens("KOR:어제 집에 갔습니다", Tokenizers.multilang) ===
      Seq("어제", "집", "에", "가", "았", "습니다"))
    assert(evalTokens("KOR:공부했습니다", Tokenizers.multilang) ===
      Seq("공부", "하", "았", "습니다"))
    // ㅡ-deletion harmony follows the preceding syllable: 바쁘+았→바빴
    assert(evalTokens("KOR:바빴습니다", Tokenizers.multilang) ===
      Seq("바쁘", "았", "습니다"))
    // consonant-final stems need no lexicon: generic 었 boundary
    assert(evalTokens("KOR:밥을 먹었습니다", Tokenizers.multilang) ===
      Seq("밥", "을", "먹", "었", "습니다"))
    // out-of-slice fused syllables stay whole (documented divergence)
    assert(evalTokens("KOR:꿈을 꿉니다", Tokenizers.multilang) ===
      Seq("꿈", "을", "꿉니다"))
  }

  test("byName resolves every registered tokenizer") {
    for (n <- Seq("raw", "lowercase", "default", "whitespace", "source_code_default",
                  "en_stem", "chinese_compatible", "multilang"))
      Tokenizers.byName(n)
    intercept[IllegalArgumentException](Tokenizers.byName("nope"))
  }
}
