package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Text-analysis operator tests: language ID, quality features, token
  * counting, fingerprinting. */
class TextAnalysisSpec extends SparkTestBase {

  test("langId picks the profile with most stopword hits; und when none") {
    assert(evalStr[String]("the cat is on the mat and it is happy",
      TextAnalysis.langId) === "en")
    assert(evalStr[String]("der Hund ist nicht auf der Matte und das ist gut",
      TextAnalysis.langId) === "de")
    assert(evalStr[String]("xyzzy plugh zork", TextAnalysis.langId) === "und")
  }

  test("quality features: exact ratios on a crafted string") {
    import spark.implicits._
    val text = "The cat! 123" // 12 chars, 3 punct? no: 1 punct, 3 digits, 1 upper
    val f = Seq(text).toDF("t")
      .select(TextAnalysis.qualityFeatures(col("t")).as("f"))
      .select("f.*").collect()(0)
    assert(f.getAs[Long]("n_chars") === 12L)
    assert(f.getAs[Long]("n_tokens") === 3L) // the, cat, 123
    assert(f.getAs[Double]("punct_ratio") === math.rint(1.0 / 12 * 10000) / 10000)
    assert(f.getAs[Double]("digit_ratio") === 0.25)
    assert(f.getAs[Double]("upper_ratio") === math.rint(1.0 / 12 * 10000) / 10000)
    assert(f.getAs[Double]("stopword_ratio") === math.rint(1.0 / 3 * 10000) / 10000)
  }

  test("quality score is bounded and orders garbage below prose") {
    val prose = "the quick brown fox jumps over the lazy dog and that is fine by the river"
    val garbage = "@@@@ #### 1234 !!!! %%%%"
    val ps = evalStr[Double](prose, TextAnalysis.qualityScore)
    val gs = evalStr[Double](garbage, TextAnalysis.qualityScore)
    assert(ps > gs)
    assert(ps >= 0.0 && ps <= 1.0 && gs >= 0.0 && gs <= 1.0)
  }

  test("whitespace and BPE-ish token counts") {
    assert(evalStr[Int]("one two  three", TextAnalysis.wsTokenCount) === 3)
    val short = evalStr[Long]("hi", TextAnalysis.bpeishTokenCount)
    val long = evalStr[Long]("internationalization considerations", TextAnalysis.bpeishTokenCount)
    assert(short === 1L)
    assert(long >= 8L) // ceil(20/4) + ceil(14/4) = 5 + 4
  }

  test("fingerprint: equality ⇔ same token sequence; order-sensitive") {
    val a = evalStr[Long]("alpha beta gamma", TextAnalysis.fingerprint)
    val b = evalStr[Long]("Alpha, beta; GAMMA!", TextAnalysis.fingerprint) // same tokens
    val c = evalStr[Long]("gamma beta alpha", TextAnalysis.fingerprint) // permuted
    assert(a === b)
    assert(a !== c)
  }
}
