package graft.operators

import graft.SparkTestBase
import graft.functions.Tokenizers
import org.apache.spark.sql.functions._

/** Dedup-operator tests: exact, shingles, MinHash+LSH, SimHash, n-gram
  * Jaccard — the training-data-pipeline staples. */
class DedupSpec extends SparkTestBase {

  test("exact dedup groups identical texts, keeps lowest id") {
    import spark.implicits._
    val df = Seq((1L, "same text"), (2L, "same text"), (3L, "other"), (7L, "same text"))
      .toDF("doc_id", "text")
    val out = Dedup.exact(df, col("doc_id"), col("text"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(out === Map("same text" -> (1L, 3L), "other" -> (3L, 1L)))
  }

  test("character shingles are distinct, normalized, ordered by construction") {
    assert(evalTokens("abcde", Dedup.shingles(_, 3)) === Seq("abc", "bcd", "cde"))
    assert(evalTokens("ab", Dedup.shingles(_, 3)) === Seq.empty) // shorter than k
    assert(evalTokens("A  B", Dedup.shingles(_, 3)) === Seq("a b")) // ws-normalized + lower
    assert(evalTokens("aaaa", Dedup.shingles(_, 2)) === Seq("aa")) // distinct
  }

  test("word n-grams") {
    import spark.implicits._
    val df = Seq(Seq("a", "b", "c", "d")).toDF("toks")
    val grams = df.select(Dedup.wordNgrams(col("toks"), 2)).collect()(0)
      .getAs[scala.collection.Seq[String]](0)
    assert(grams === Seq("a b", "b c", "c d"))
  }

  test("minhash signatures: identical texts agree, est_jaccard finds near-dups") {
    import spark.implicits._
    val base = "the quick brown fox jumps over the lazy dog again and again"
    val df = Seq(
      (1L, base),
      (2L, base), // exact dup
      (3L, base + " extra tail"), // near dup
      (4L, "completely different content about spark query planning")
    ).toDF("doc_id", "text")
    val sigs = Dedup.minhashSignatures(df, col("doc_id"), col("text"), shingleK = 4, numHashes = 32)
      .collect().map(r => r.getLong(0) -> r.getAs[scala.collection.Seq[Long]](1)).toMap
    assert(sigs(1L) === sigs(2L))
    assert(sigs(1L).length === 32)

    val pairs = Dedup.minhashNearDups(df, col("doc_id"), col("text"),
        shingleK = 4, numHashes = 32, bands = 8, threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)))
    assert(pairs.contains((1L, 3L)) || pairs.contains((2L, 3L)))
    assert(!pairs.exists(p => p._1 == 4L || p._2 == 4L))
    // exact dup pair estimates jaccard 1.0
    val est = Dedup.minhashNearDups(df, col("doc_id"), col("text"), 4, 32, 8, 0.5)
      .filter(col("doc_id1") === 1L && col("doc_id2") === 2L)
      .collect()(0).getDouble(2)
    assert(est === 1.0)
  }

  test("simhash: equal token bags collide; hamming verification filters") {
    import spark.implicits._
    val df = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "the quick brown fox jumps over the lazy dog"),
      (3L, "dog lazy the over jumps fox brown quick the"), // permutation — same bag
      (4L, "entirely unrelated words describing database internals stuff")
    ).toDF("doc_id", "text").withColumn("tokens", Tokenizers.default(col("text")))
    val fps = df.select(col("doc_id"), Dedup.simhash(col("tokens")).as("fp"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fps(1L) === fps(2L))
    assert(fps(1L) === fps(3L)) // simhash is order-insensitive
    assert(fps(1L) !== fps(4L))

    // the aggregate form must agree bit-for-bit with the expression form
    val aggFps = Dedup.simhashDf(df, col("doc_id"), col("tokens"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(aggFps === fps)

    val pairs = Dedup.simhashNearDups(df, col("doc_id"), col("tokens"), maxHamming = 3)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getInt(2))).toMap
    assert(pairs.keySet.contains((1L, 2L)))
    assert(pairs((1L, 2L)) === 0)
    assert(!pairs.keySet.exists(p => p._1 == 4L || p._2 == 4L))
  }

  test("hamming distance") {
    import spark.implicits._
    val df = Seq((0L, 0L), (0L, 7L), (-1L, 0L)).toDF("a", "b")
    val out = df.select(Dedup.hammingDist(col("a"), col("b"))).collect().map(_.getInt(0)).toSeq
    assert(out === Seq(0, 3, 64))
  }

  test("ngram jaccard pairs: exact value, blocking respected") {
    import spark.implicits._
    val df = Seq(
      (1L, Seq("a", "b", "c", "d"), "en"),
      (2L, Seq("a", "b", "c", "e"), "en"), // jaccard 3/5 = 0.6
      (3L, Seq("a", "b", "c", "d"), "de")  // identical to 1 but other bucket
    ).toDF("doc_id", "tokens", "lang")
    val out = Dedup.ngramJaccardPairs(df, col("doc_id"), col("tokens"), col("lang"),
        n = 1, threshold = 0.5)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    assert(out.keySet === Set((1L, 2L))) // cross-bucket pair (1,3) blocked
    assert(math.abs(out((1L, 2L)) - 0.6) < 1e-9)
  }
}
