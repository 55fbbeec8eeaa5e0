package graft.functions

/** The Porter stemming algorithm (M.F. Porter, "An algorithm for suffix
  * stripping", Program 14(3) 1980 — public domain), implemented from the
  * published rule tables. This is the `en_stem` token filter of the
  * reference (quickwit-query/src/tokenizers/mod.rs:60-66 wires tantivy's
  * Stemmer(Language::English), which is the same algorithm).
  *
  * Pure per-token function — wrapped as a UDF over the token array in
  * `Tokenizers.enStem` (a per-token loop is not expressible as codegen'd
  * built-ins; token lengths are tiny so this is off the byte-bandwidth
  * hot path).
  */
object PorterStemmer {

  /** letter i of s is a consonant (y counts as vowel after a consonant). */
  private def cons(s: CharSequence, i: Int): Boolean = s.charAt(i) match {
    case 'a' | 'e' | 'i' | 'o' | 'u' => false
    case 'y'                         => i == 0 || !cons(s, i - 1)
    case _                           => true
  }

  /** m(stem) = number of VC sequences. */
  private def measure(s: CharSequence): Int = {
    val n = s.length
    var i = 0
    var m = 0
    while (i < n && cons(s, i)) i += 1
    while (i < n) {
      while (i < n && !cons(s, i)) i += 1
      if (i < n) {
        m += 1
        while (i < n && cons(s, i)) i += 1
      }
    }
    m
  }

  private def containsVowel(s: CharSequence): Boolean =
    (0 until s.length).exists(i => !cons(s, i))

  /** *d — ends with a double consonant. */
  private def doubleC(s: String): Boolean =
    s.length >= 2 && s(s.length - 1) == s(s.length - 2) && cons(s, s.length - 1)

  /** *o — ends cvc where the final c is not w, x or y. */
  private def cvc(s: String): Boolean = {
    val n = s.length
    n >= 3 && cons(s, n - 3) && !cons(s, n - 2) && cons(s, n - 1) &&
      !"wxy".contains(s(n - 1))
  }

  /** Replace `suffix` by `repl` when the remaining stem satisfies `cond`;
    * returns None when the suffix does not match (try next rule), Some when
    * it matches (rule fires or blocks — per the paper, within a step only
    * the longest matching suffix is considered). */
  private def rule(w: String, suffix: String, repl: String,
                  cond: String => Boolean): Option[String] =
    if (!w.endsWith(suffix)) None
    else {
      val stem = w.substring(0, w.length - suffix.length)
      Some(if (cond(stem)) stem + repl else w)
    }

  private def firstOf(w: String, rules: (String, String, String => Boolean)*): String =
    rules.iterator
      .flatMap { case (suf, repl, cond) => rule(w, suf, repl, cond) }
      .nextOption()
      .getOrElse(w)

  private val mGt0: String => Boolean = s => measure(s) > 0
  private val mGt1: String => Boolean = s => measure(s) > 1

  def stem(word: String): String = {
    if (word == null || word.length <= 2) return word
    var w = word

    // Step 1a
    w = firstOf(w,
      ("sses", "ss", _ => true), ("ies", "i", _ => true),
      ("ss", "ss", _ => true), ("s", "", _ => true))

    // Step 1b
    if (w.endsWith("eed")) {
      val stem = w.dropRight(3)
      if (measure(stem) > 0) w = stem + "ee"
    } else {
      val stripped =
        if (w.endsWith("ed") && containsVowel(w.dropRight(2))) Some(w.dropRight(2))
        else if (w.endsWith("ing") && containsVowel(w.dropRight(3))) Some(w.dropRight(3))
        else None
      stripped.foreach { s =>
        w =
          if (s.endsWith("at") || s.endsWith("bl") || s.endsWith("iz")) s + "e"
          else if (doubleC(s) && !"lsz".contains(s.last)) s.dropRight(1)
          else if (measure(s) == 1 && cvc(s)) s + "e"
          else s
      }
    }

    // Step 1c
    if (w.endsWith("y") && containsVowel(w.dropRight(1))) w = w.dropRight(1) + "i"

    // Step 2 (longest matching suffix only, condition m(stem) > 0)
    w = firstOf(w,
      ("ational", "ate", mGt0), ("tional", "tion", mGt0), ("enci", "ence", mGt0),
      ("anci", "ance", mGt0), ("izer", "ize", mGt0), ("abli", "able", mGt0),
      ("alli", "al", mGt0), ("entli", "ent", mGt0), ("eli", "e", mGt0),
      ("ousli", "ous", mGt0), ("ization", "ize", mGt0), ("ation", "ate", mGt0),
      ("ator", "ate", mGt0), ("alism", "al", mGt0), ("iveness", "ive", mGt0),
      ("fulness", "ful", mGt0), ("ousness", "ous", mGt0), ("aliti", "al", mGt0),
      ("iviti", "ive", mGt0), ("biliti", "ble", mGt0))

    // Step 3
    w = firstOf(w,
      ("icate", "ic", mGt0), ("ative", "", mGt0), ("alize", "al", mGt0),
      ("iciti", "ic", mGt0), ("ical", "ic", mGt0), ("ful", "", mGt0),
      ("ness", "", mGt0))

    // Step 4 (m(stem) > 1; `ion` additionally requires stem ending s or t)
    w = firstOf(w,
      ("al", "", mGt1), ("ance", "", mGt1), ("ence", "", mGt1), ("er", "", mGt1),
      ("ic", "", mGt1), ("able", "", mGt1), ("ible", "", mGt1), ("ant", "", mGt1),
      ("ement", "", mGt1), ("ment", "", mGt1), ("ent", "", mGt1),
      ("ion", "", s => mGt1(s) && s.nonEmpty && (s.last == 's' || s.last == 't')),
      ("ou", "", mGt1), ("ism", "", mGt1), ("ate", "", mGt1), ("iti", "", mGt1),
      ("ous", "", mGt1), ("ive", "", mGt1), ("ize", "", mGt1))

    // Step 5a
    if (w.endsWith("e")) {
      val stem = w.dropRight(1)
      val m = measure(stem)
      if (m > 1 || (m == 1 && !cvc(stem))) w = stem
    }

    // Step 5b
    if (measure(w) > 1 && doubleC(w) && w.last == 'l') w = w.dropRight(1)

    w
  }
}
