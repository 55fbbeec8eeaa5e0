package graft.functions

/** A small embedded slice of a ko-dic-shaped Korean morphological
  * dictionary (the reference tokenizes Korean with Lindera over ko-dic,
  * quickwit-query/src/tokenizers/multilang.rs:54-62 — the dictionary is
  * ~100 MB and absent offline).
  *
  * ko-dic stores verb/adjective/copula STEMS and realizes conjugated
  * surfaces by fusing the ending's initial consonant into the stem's final
  * syllable (하 + ㅂ니다 → 합니다, 가 + 았 → 갔). This slice does the same
  * in reverse: for a frequency-ranked set of vowel-final stems it generates
  * the fused surface syllable per conjugation row via real Hangul syllable
  * arithmetic (0xAC00 + (choseong×21 + jungseong)×28 + jongseong) and maps
  * it back to `stem + ending` — exactly ko-dic's morpheme boundaries
  * (일본입니다 → 일본/이/ㅂ니다, MeCab-ko style). Consonant-final stems
  * need no lexicon at all: their endings (습니다, 었/았, 은/을, 어요) are
  * whole syllables that a handful of generic boundary rules in
  * `Tokenizers.korSegment` detach.
  *
  * Everything here is public linguistic data (standard conjugation
  * paradigms + common-vocabulary stems), not copied from any dictionary
  * file. Documented divergences from full ko-dic: out-of-slice vowel
  * stems keep their fused syllable whole; the past of 하 is emitted as
  * 하+았 (ko-dic's compressed-EP analysis) rather than 하+였.
  */
object KorLexicon {

  /** Vowel-final stems (last syllable carries no final consonant), ranked
    * by frequency: copula 이, light verbs 하/되, core motion/action verbs,
    * and the common vowel-final adjectives. */
  val vowelStems: Seq[String] = Seq(
    "이", "하", "되", "가", "오", "보", "주", "내", "쓰", "자", "타",
    "만나", "지내", "보내", "다니", "배우", "멋지", "예쁘", "바쁘", "나쁘", "아니")

  /** Adnominal (-ㄴ) surfaces are only generated for multi-syllable stems:
    * single-syllable ones (한, 간, 본…) collide with ordinary nouns. */
  private val adnominalStems =
    vowelStems.filter(_.length > 1)

  private val SBase = 0xAC00
  private val JongN = 4 // ㄴ as jongseong index
  private val JongB = 17 // ㅂ
  private val JongSS = 20 // ㅆ

  private def parts(c: Char): (Int, Int, Int) = {
    val v = c - SBase
    require(v >= 0 && v < 11172, s"not a Hangul syllable: $c")
    (v / 28 / 21, v / 28 % 21, v % 28)
  }

  /** Fuse a final consonant into the stem's (open) last syllable. */
  private def attach(stem: String, jong: Int): String = {
    val (cho, jung, j0) = parts(stem.last)
    require(j0 == 0, s"stem not vowel-final: $stem")
    stem.init + (SBase + (cho * 21 + jung) * 28 + jong).toChar
  }

  /** Past-tense surface: vowel-harmony merge of the stem's last vowel with
    * 아/어, then ㅆ fused as the final consonant (가+았→갔, 오+았→왔,
    * 되+었→됐, 쓰+었→썼, 멋지+었→멋졌). Returns (surface, 았|었). */
  private def past(stem: String): (String, String) = {
    val (cho, jung, j0) = parts(stem.last)
    require(j0 == 0, s"stem not vowel-final: $stem")
    val (jung2, bright) = if (stem.last == '하') {
      (1, true) // 여-irregular: 하+았(였) contracts to 했 (vowel ㅐ)
    } else jung match {
      case 0 => (0, true) // ㅏ + 았 absorbs (가+았→갔, 타+았→탔)
      case 1 => (1, false) // ㅐ (내+었→냈)
      case 4 => (4, false) // ㅓ
      case 5 => (5, false) // ㅔ
      case 8 => (9, true) // ㅗ → ㅘ (오+았→왔)
      case 11 => (10, false) // ㅚ → ㅙ (되+었→됐)
      case 13 => (14, false) // ㅜ → ㅝ (배우+었→배웠)
      case 18 => // ㅡ deletes; harmony follows the PRECEDING syllable's
        // vowel (바쁘+았→바빴, 나쁘+았→나빴) — dark for monosyllables
        // (쓰+었→썼, 크+었→컸)
        val brightPrev = stem.length > 1 &&
          Set(0, 8).contains(parts(stem.charAt(stem.length - 2))._2)
        if (brightPrev) (0, true) else (4, false)
      case 20 => (6, false) // ㅣ → ㅕ (멋지+었→멋졌)
      case other => throw new IllegalArgumentException(
        s"no past merge for jungseong $other in $stem")
    }
    (stem.init + (SBase + (cho * 21 + jung2) * 28 + JongSS).toChar,
      if (bright) "았" else "었")
  }

  /** Syllable-decomposition rewrites, longest surface first: regex (with
    * its context lookahead) → replacement restoring `stem + ending-head`.
    * The generic spacing rules in korSegment then cut the morpheme
    * boundaries, so each rewrite stays a single fused-syllable swap. */
  val rewrites: Seq[(String, String)] = {
    val formal = vowelStems.map { s =>
      (java.util.regex.Pattern.quote(attach(s, JongB)) + "(?=니다|니까)", s + "ㅂ")
    }
    val pastRows = vowelStems.map { s =>
      val (surface, ending) = past(s)
      (java.util.regex.Pattern.quote(surface) + "(?=[습다고지어으며면던]|\\s|$)",
        s + ending)
    }
    val adnominal = adnominalStems.map { s =>
      (java.util.regex.Pattern.quote(attach(s, JongN)) + "(?![가-힣])", s + "ㄴ")
    }
    (formal ++ pastRows ++ adnominal).sortBy { case (p, _) => -p.length }
  }
}
