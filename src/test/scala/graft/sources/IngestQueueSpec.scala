package graft.sources

import org.scalatest.funsuite.AnyFunSuite

/** Ingest-v1 queue tests: position monotonicity, checkpoint-tail fetch,
  * segment-granular truncation, resume across reopen. */
class IngestQueueSpec extends AnyFunSuite {

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("ingestq").toString

  test("ingest assigns contiguous positions across batches") {
    val q = new IngestQueue(tmp())
    q.createQueue("idx")
    assert(q.ingest("idx", Seq("a", "b", "c")) === (0L, 2L))
    assert(q.ingest("idx", Seq("d")) === (3L, 3L))
    assert(q.endPosition("idx") === 4L)
  }

  test("fetch tails from a checkpoint position, bounded by maxDocs") {
    val q = new IngestQueue(tmp())
    q.createQueue("idx")
    q.ingest("idx", Seq("a", "b", "c"))
    q.ingest("idx", Seq("d", "e"))
    assert(q.fetch("idx", afterPosition = -1L, maxDocs = 100) ===
      Seq(0L -> "a", 1L -> "b", 2L -> "c", 3L -> "d", 4L -> "e"))
    assert(q.fetch("idx", afterPosition = 1L, maxDocs = 2) === Seq(2L -> "c", 3L -> "d"))
    assert(q.fetch("idx", afterPosition = 4L, maxDocs = 10) === Seq.empty)
  }

  test("suggest_truncate is segment-granular and never reuses positions (T5)") {
    val q = new IngestQueue(tmp())
    q.createQueue("idx")
    q.ingest("idx", Seq("a", "b", "c")) // seg 0-2
    q.ingest("idx", Seq("d", "e"))      // seg 3-4
    // publish committed through position 3: only seg 0-2 is fully ≤ 3
    assert(q.suggestTruncate("idx", 3L) === 1)
    assert(q.fetch("idx", -1L, 10) === Seq(3L -> "d", 4L -> "e"))
    // positions keep advancing after truncation
    assert(q.ingest("idx", Seq("f")) === (5L, 5L))
    // truncating everything leaves an empty queue that KEEPS its position
    // floor — positions are never reused
    assert(q.suggestTruncate("idx", 5L) === 2)
    assert(q.fetch("idx", -1L, 10) === Seq.empty)
    assert(q.endPosition("idx") === 6L)
    assert(q.ingest("idx", Seq("g")) === (6L, 6L))
  }

  test("a reopened queue resumes from the surviving segments") {
    val dir = tmp()
    val q1 = new IngestQueue(dir)
    q1.createQueue("idx")
    q1.ingest("idx", Seq("a", "b"))
    val q2 = new IngestQueue(dir)
    assert(q2.endPosition("idx") === 2L)
    assert(q2.fetch("idx", -1L, 10) === Seq(0L -> "a", 1L -> "b"))
  }

  test("ingest into a missing queue fails") {
    val q = new IngestQueue(tmp())
    intercept[IllegalArgumentException](q.ingest("nope", Seq("a")))
  }
}
