package graft.sources

import graft.SparkTestBase
import graft.model.TranscriptGen
import graft.publish.Checkpoint

/** Iceberg-layout table tests: append/publish, metadata time pruning
  * (the list_relevant_splits analog, root.rs:1037-1052), count fast path. */
class TranscriptTableSpec extends SparkTestBase {

  private def delta(from: Long, to: Long) =
    Checkpoint.Delta(Seq(Checkpoint.PartitionDelta("src", from, to)))

  test("append publishes per-file stats; scan reads everything back") {
    import spark.implicits._
    val dir = tmpDir("ttable")
    val table = new TranscriptTable(dir, spark)
    val turns = TranscriptGen.turns(numConvs = 20, avgTurns = 5)
    table.append(turns.toDS().toDF(), delta(-1, 100), numFiles = 3)
    assert(table.scan().count() === turns.size.toLong)
    assert(table.countFromMetadata() === turns.size.toLong)
    val snap = table.store.currentSnapshot().get
    assert(snap.splits.nonEmpty && snap.splits.forall(_.numDocs > 0))
  }

  test("metadata time pruning skips disjoint file groups") {
    import spark.implicits._
    val dir = tmpDir("ttable")
    val table = new TranscriptTable(dir, spark)
    val turns = TranscriptGen.turns(numConvs = 30, avgTurns = 6)
    table.append(turns.toDS().toDF(), delta(-1, 100), numFiles = 4)
    val micros = turns.map(_.ts.getTime * 1000L)
    val (lo, hi) = (micros.min, micros.max)
    // full-range scan sees all rows
    assert(table.scan(Some(lo), Some(hi + 1)).count() === turns.size.toLong)
    // a range beyond max prunes everything without touching data files
    assert(table.scan(Some(hi + 1000000L), None).count() === 0L)
    // a narrow range returns at least the rows in range (pruning is
    // file-granular, never lossy)
    val mid = (lo + hi) / 2
    val expect = micros.count(_ >= mid).toLong
    assert(table.scan(Some(mid), None).count() >= expect)
  }

  test("tag pruning: a tag-excluded file group is never opened") {
    import spark.implicits._
    import graft.queryast.QueryAst
    val dir = tmpDir("ttable")
    val table = new TranscriptTable(dir, spark)
    val turns = TranscriptGen.turns(numConvs = 20, avgTurns = 5)
    val df = turns.toDS().toDF()
    // two single-file batches with disjoint role tag sets
    table.append(df.filter("role = 'user'"), delta(-1, 50), numFiles = 1,
      tagFields = Seq("role"))
    table.append(df.filter("role <> 'user'"), delta(50, 100), numFiles = 1,
      tagFields = Seq("role"))
    val snap = table.store.currentSnapshot().get
    assert(snap.splits.forall(_.tags.contains("role!")))
    val userFiles = snap.splits.filter(_.tags.contains("role:user")).flatMap(_.files)
      .map(_.replaceFirst("^file:", "")).toSet
    assert(userFiles.nonEmpty)

    val q = QueryAst.Term("role", "user")
    val scanned = table.scan(query = Some(q), tagFields = Set("role"))
    // only the user-tagged file group is opened
    def norm(fs: Iterable[String]): Set[String] =
      fs.map(_.replaceFirst("^file:/+", "/")).toSet
    assert(norm(scanned.inputFiles) === norm(userFiles))
    // pruning is never lossy: applying the predicate gives the full answer
    val resolver = graft.queryast.FieldResolver(Set.empty, Nil)
    val got = scanned.filter(q.toColumn(resolver)).count()
    assert(got === turns.count(_.role == "user").toLong)

    // an uninformative query (range) must NOT prune
    val all = table.scan(query = Some(QueryAst.Range("turn_idx", gte = Some(0))),
      tagFields = Set("role"))
    assert(all.inputFiles.length > userFiles.size)

    // TermSet prunes to the union of listed values
    val ts = table.scan(
      query = Some(QueryAst.TermSet("role", Seq("user", "nonexistent"))),
      tagFields = Set("role"))
    assert(norm(ts.inputFiles) === norm(userFiles))
  }

  test("duplicate append delta is rejected by the manifest store") {
    import spark.implicits._
    val dir = tmpDir("ttable")
    val table = new TranscriptTable(dir, spark)
    val turns = TranscriptGen.turns(numConvs = 5, avgTurns = 4)
    table.append(turns.toDS().toDF(), delta(-1, 50))
    intercept[IllegalStateException] {
      table.append(turns.toDS().toDF(), delta(-1, 50))
    }
  }
}
