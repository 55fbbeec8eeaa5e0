package graft.functions

/** A small embedded slice of an ipadic-shaped Japanese morphological
  * dictionary (the reference tokenizes Japanese with Lindera over ipadic,
  * quickwit-query/src/tokenizers/multilang.rs:65-150 — the dictionaries
  * are ~50 MB and absent offline).
  *
  * ipadic stores verb/adjective STEMS plus a conjugation class; surface
  * forms are stem × class-specific okurigana. This slice does the same:
  * frequency-ranked kanji stems for the common conjugation classes, with
  * the surfaces generated per class. The surfaces are exactly MeCab's
  * morpheme boundaries — the continuative stem stays whole (飲み, 好き,
  * 言っ) while the auxiliary (ます, です, た) is its own token, so
  * `jpnSegment` can keep kanji+okurigana compounds together instead of
  * breaking at the script transition.
  *
  * Everything here is public linguistic data (standard conjugation
  * paradigms + common-vocabulary stems), not copied from any dictionary
  * file.
  */
object JpnLexicon {

  // Godan (five-row) verbs, grouped by their dictionary-form ending.
  // Surfaces per stem: dictionary form, continuative (masu-stem),
  // irrealis, geminate/euphonic stem (言っ/書い/飲ん — MeCab's boundary
  // before た/て), potential/imperative row, volitional row.
  private val godan: Seq[(Seq[String], Seq[String])] = Seq(
    // -u: 言う 思う 使う 買う 会う 習う 歌う 洗う 払う 笑う
    (Seq("言", "思", "使", "買", "会", "習", "歌", "洗", "払", "笑"),
      Seq("う", "い", "わ", "っ", "え", "お")),
    // -ku: 書く 聞く 歩く 働く 泣く 届く 驚く 招く 置く 動く
    (Seq("書", "聞", "歩", "働", "泣", "届", "驚", "招", "置", "動"),
      Seq("く", "き", "か", "い", "け", "こ")),
    // -gu: 泳ぐ 急ぐ 脱ぐ 騒ぐ
    (Seq("泳", "急", "脱", "騒"), Seq("ぐ", "ぎ", "が", "い", "げ", "ご")),
    // -su: 話す 出す 貸す 消す 押す 探す 渡す 返す 直す 示す
    (Seq("話", "出", "貸", "消", "押", "探", "渡", "返", "直", "示"),
      Seq("す", "し", "さ", "せ", "そ")),
    // -tsu: 持つ 待つ 立つ 勝つ 打つ 育つ
    (Seq("持", "待", "立", "勝", "打", "育"), Seq("つ", "ち", "た", "っ", "て", "と")),
    // -nu: 死ぬ
    (Seq("死"), Seq("ぬ", "に", "な", "ん", "ね", "の")),
    // -bu: 遊ぶ 学ぶ 飛ぶ 呼ぶ 選ぶ 運ぶ 並ぶ 喜ぶ
    (Seq("遊", "学", "飛", "呼", "選", "運", "並", "喜"),
      Seq("ぶ", "び", "ば", "ん", "べ", "ぼ")),
    // -mu: 読む 飲む 休む 住む 頼む 盗む 進む 包む 楽しむ→楽し is i-adj stem; 望む
    (Seq("読", "飲", "休", "住", "頼", "盗", "進", "包", "望"),
      Seq("む", "み", "ま", "ん", "め", "も")),
    // -ru (godan): 作る 売る 帰る 走る 入る 知る 切る 曲がる→曲が 乗る 取る
    //              残る 送る 終わる→終わ 分かる→分か 始まる→始ま 止まる→止ま
    //              決まる→決ま 困る 頑張る→頑張
    (Seq("作", "売", "帰", "走", "入", "知", "切", "乗", "取", "残", "送",
      "困", "終わ", "分か", "始ま", "止ま", "決ま", "曲が", "頑張"),
      Seq("る", "り", "ら", "っ", "れ", "ろ")))

  // Ichidan (one-row) verbs: the stem already ends in the e/i-row kana;
  // surfaces are stem (bare continuative), stem+る (dictionary form),
  // stem+れ/よ (potential/volitional rows).
  private val ichidanStems = Seq(
    "食べ", "教え", "覚え", "忘れ", "始め", "閉め", "開け", "考え", "答え",
    "調べ", "集め", "育て", "決め", "見え", "聞こえ", "生まれ", "入れ",
    "落ち", "起き", "生き", "過ぎ", "感じ", "信じ", "続け", "伝え", "変え",
    "見せ", "任せ", "助け", "挙げ", "上げ", "下げ", "受け", "避け", "似せ")

  // i-adjectives: stem + い/く/かっ/けれ/さ (MeCab keeps 高かっ together,
  // た separate).
  private val iAdjStems = Seq(
    "高", "安", "古", "良", "悪", "早", "遅", "近", "遠", "強", "弱", "長",
    "短", "暑", "寒", "多", "広", "狭", "重", "軽", "暗", "深", "浅", "若",
    "楽し", "嬉し", "悲し", "美し", "難し", "面白", "新し", "明る", "少な",
    "大き", "小さ", "正し", "優し", "厳し", "忙し", "懐かし", "欲し", "親し")

  // na-adjective / nominal kanji+okurigana forms (one surface each).
  private val nominals = Seq("好き", "大好き", "嫌い", "幸せ", "半ば", "斜め")

  // Irregular 来る (the geminate 来 alone is a bare kanji run — only the
  // okurigana-bearing surfaces need entries).
  private val irregular = Seq("来る", "来れ", "来よ", "来い")

  /** Every surface form, longest first (regex alternation is first-match,
    * so longer surfaces must precede their prefixes: 食べる before 食べ). */
  val surfaces: Seq[String] = {
    val godanSurfaces =
      for ((stems, suffixes) <- godan; s <- stems; x <- suffixes) yield s + x
    val ichidanSurfaces =
      for (s <- ichidanStems; x <- Seq("る", "", "れ", "よ")) yield s + x
    val iAdjSurfaces =
      for (s <- iAdjStems; x <- Seq("い", "く", "かっ", "けれ", "さ")) yield s + x
    (godanSurfaces ++ ichidanSurfaces ++ iAdjSurfaces ++ nominals ++ irregular)
      .distinct.sortBy(s => (-s.length, s))
  }

  /** The alternation fragment `jpnSegment` splices ahead of the bare
    * kanji-run branch — a surface match keeps the compound whole. */
  val alternation: String = surfaces.mkString("|")
}
