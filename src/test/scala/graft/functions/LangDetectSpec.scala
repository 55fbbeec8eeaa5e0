package graft.functions

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Pins detection accuracy on a mixed-language corpus (VERDICT r2 next #8):
  * every sentence must land on its language — 100% on this corpus, with
  * per-language coverage over {eng, fra, deu, spa, ita, por} (profile-
  * scored) and {cmn, jpn, kor, rus, ara, hin} (script-decided). */
class LangDetectSpec extends SparkTestBase {

  private val corpus: Seq[(String, String)] = Seq(
    ("eng", "The quick brown fox jumps over the lazy dog and it was not seen again"),
    ("eng", "This is a test of the language detection that we have built for you"),
    ("fra", "Le chat est dans la maison et je ne vous vois pas"),
    ("fra", "Les enfants jouent dans le jardin pour le plaisir de nous tous"),
    ("deu", "Der Hund ist nicht mit der Katze in dem Haus"),
    ("deu", "Die Kinder spielen auf der Straße und wir sind auch dabei"),
    ("spa", "El perro no está en la casa pero los niños sí"),
    ("spa", "Una mujer con su hijo camina por el parque para ver las flores"),
    ("ita", "Il gatto non è nella casa ma sono con il cane"),
    ("ita", "Questo è un test della lingua che anche noi possiamo fare"),
    ("por", "O cão não está em casa mas os meninos são felizes"),
    ("por", "Uma mulher com o seu filho caminha para ver as flores"),
    ("cmn", "你好世界这是一个测试"),
    ("jpn", "これはテストですさくら"),
    ("jpn", "東京タワーはパリのエッフェル塔に似ています"),
    ("jpn", "コーヒーを飲みます"),
    ("kor", "안녕하세요 세계 이것은 테스트입니다"),
    ("kor", "나는 학교에 갑니다"),
    ("kor", "도서관에서 책을 읽어요"),
    ("rus", "Привет мир это тест"),
    ("ara", "مرحبا بالعالم هذا اختبار"),
    ("hin", "नमस्ते दुनिया यह एक परीक्षण है"))

  test("100% accuracy on the pinned mixed-language corpus") {
    import spark.implicits._
    val got = corpus.toDF("expected", "text")
      .withColumn("got", LangDetect.detectLanguage(col("text")))
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2)))
    val wrong = got.filter { case (exp, _, g) => exp != g }
    assert(wrong.isEmpty, s"misdetected: ${wrong.mkString("; ")}")
  }

  test("empty and null text default to eng; no-signal latin defaults to eng") {
    assert(evalStr[String](null, LangDetect.detectLanguage) === "eng")
    assert(evalStr[String]("", LangDetect.detectLanguage) === "eng")
    assert(evalStr[String]("xyzzy plugh", LangDetect.detectLanguage) === "eng")
  }

  test("multilang tokenizer routes latin-script non-English through the default analyzer") {
    // r2's script-presence dispatch called this `eng`; either way the
    // TOKENS must be the default analyzer's (reference `_ =>` arm)
    assert(evalTokens("Le chat est dans la maison", Tokenizers.multilang) ===
      Seq("le", "chat", "est", "dans", "la", "maison"))
    // detection feeding multilang agrees with the standalone detector
    assert(evalStr[String]("Der Hund ist nicht hier",
      (c: org.apache.spark.sql.Column) => LangDetect.detectLanguage(c)) === "deu")
  }
}
