package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Hand-vector pins for sequence packing and mixture sampling. */
class TrainingMixSpec extends SparkTestBase {
  import spark.implicits._

  test("packSequences: chunk boundaries, seam-spanning docs, empty docs") {
    // one bucket (numBuckets=1), budget 10; docs in doc_id order:
    //   id 0: 4 toks [0,4)   → seq 0
    //   id 1: 6 toks [4,10)  → seq 0 (ends exactly at the boundary)
    //   id 2: 0 toks [10,10) → empty doc pinned to first_seq = seq 1
    //   id 3: 12 toks [10,22)→ spans seqs 1..2 (one seam)
    //   id 4: 3 toks [22,25) → seq 2
    val docs = Seq((0L, 4L), (1L, 6L), (2L, 0L), (3L, 12L), (4L, 3L))
      .toDF("doc_id", "n_tokens")
    val out = TrainingMix.packSequences(docs, "doc_id", "n_tokens", budget = 10L, numBuckets = 1)
      .orderBy("doc_id")
      .select("start_tok", "first_seq", "last_seq", "offset_in_seq")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out(0) == (0L, 0L, 0L, 0L))
    assert(out(1) == (4L, 0L, 0L, 4L))
    assert(out(2) == (10L, 1L, 1L, 0L))
    assert(out(3) == (10L, 1L, 2L, 0L))
    assert(out(4) == (22L, 2L, 2L, 2L))
  }

  test("packSequences: buckets pack independent streams; windows stay bucket-bounded") {
    val docs = (0L until 100L).map(i => (i, 7L)).toDF("doc_id", "n_tokens")
    val out = TrainingMix.packSequences(docs, "doc_id", "n_tokens", budget = 50L, numBuckets = 4)
    // per bucket: 25 docs x 7 toks = 175 toks → max start_tok 168, seqs 0..3
    val perBucket = out.groupBy("bucket")
      .agg(max("start_tok").as("mx"), max("last_seq").as("ms"), count(lit(1)).as("n"))
      .collect()
    assert(perBucket.length == 4)
    perBucket.foreach { r =>
      assert(r.getAs[Long]("n") == 25L && r.getAs[Long]("mx") == 168L && r.getAs[Long]("ms") == 3L)
    }
    // the sort for the running sum must be a bucket-partitioned window,
    // not a global one: partitioning column present in the Sort/Window
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("Window") && plan.contains("bucket"), s"plan:\n$plan")
  }

  test("sampleMixture: rate ladder, whitelist default-0, deterministic u") {
    val docs = Seq((0L, "web"), (1L, "web"), (13L, "wiki"), (14L, "books"))
      .toDF("doc_id", "source")
    val out = TrainingMix.sampleMixture(docs, "doc_id", "source",
        Map("web" -> 0.5, "wiki" -> 1.0))
      .orderBy("doc_id").collect()
    // u = ((id*37+11) % 1000)/1000: id0→0.011, id1→0.048, id13→0.492, id14→0.529
    assert(math.abs(out(0).getAs[Double]("u") - 0.011) < 1e-12)
    assert(out(0).getAs[Boolean]("keep"))   // 0.011 < 0.5
    assert(out(1).getAs[Boolean]("keep"))   // 0.048 < 0.5
    assert(out(2).getAs[Boolean]("keep"))   // wiki rate 1.0
    assert(!out(3).getAs[Boolean]("keep"))  // books absent → rate 0
    assert(out(3).getAs[Double]("rate") == 0.0)
  }

  test("deterministicShuffle: order invariant to partitioning, seed re-shuffles") {
    import spark.implicits._
    val ids = (1L to 200L).toDF("doc_id")
    def order(df: org.apache.spark.sql.DataFrame, seed: Long): Seq[Long] =
      TrainingMix.deterministicShuffle(df, "doc_id", seed)
        .collect().map(_.getLong(0)).toSeq
    val base = order(ids, 7L)
    assert(order(ids.repartition(13), 7L) === base) // cluster-size independent
    assert(base !== (1L to 200L)) // actually shuffled
    assert(order(ids, 8L) !== base) // seed changes the permutation
    // shuffle_key is the md5 Spark computes — engine-portable
    val k = TrainingMix.deterministicShuffle(Seq(7L).toDF("doc_id"), "doc_id", 42L)
      .collect()(0).getString(1)
    assert(k === java.security.MessageDigest.getInstance("MD5")
      .digest("42:7".getBytes("UTF-8")).map("%02x".format(_)).mkString)
  }

  test("holdoutSplit: stable under corpus growth, roughly proportional") {
    import spark.implicits._
    val small = (1L to 500L).toDF("doc_id")
    val grown = (1L to 1000L).toDF("doc_id")
    def evalSet(df: org.apache.spark.sql.DataFrame): Set[Long] =
      TrainingMix.holdoutSplit(df, "doc_id", seed = 42L, buckets = 10, holdoutBuckets = 1)
        .filter("split = 'eval'").collect().map(_.getLong(0)).toSet
    val e1 = evalSet(small); val e2 = evalSet(grown)
    // appending docs never flips existing assignments
    assert(e2.filter(_ <= 500L) === e1)
    // ~10% with hash-uniform slack
    assert(e2.size > 50 && e2.size < 150)
    // buckets cover [0, buckets)
    val buckets = TrainingMix.holdoutSplit(small, "doc_id", 42L, buckets = 10)
      .select("split_bucket").distinct().collect().map(_.getLong(0)).toSet
    assert(buckets.forall(b => b >= 0 && b < 10))
  }
}
