package graft.publish

import graft.publish.SplitLifecycle._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the split state machine on the reference's transition + error
  * semantics (file_backed_index/mod.rs:215-467). */
class SplitLifecycleSpec extends AnyFunSuite {

  private val base: Index = Map(
    "staged-1" -> Record(Staged, 0L, None),
    "pub-1" -> Record(Published, 0L, Some(5L)),
    "marked-1" -> Record(MarkedForDeletion, 0L, Some(5L)))

  test("stage: re-staging a Staged split overwrites; other states fail (mod.rs:222-230)") {
    val restaged = stageSplit(base, "staged-1", now = 9L)
    assert(restaged == Right(base.updated("staged-1", Record(Staged, 9L, None))))
    assert(stageSplit(base, "new-1", 9L).exists(_.contains("new-1")))
    assert(stageSplit(base, "pub-1", 9L) ==
      Left(FailedPrecondition(Seq("pub-1"), "split is not staged")))
    assert(stageSplit(base, "marked-1", 9L) ==
      Left(FailedPrecondition(Seq("marked-1"), "split is not staged")))
  }

  test("publish: staged→Published with publish_timestamp; not-found beats not-staged (mod.rs:302-340)") {
    val out = publishSplits(base, Seq("staged-1"), Nil, now = 7L).toOption.get
    assert(out("staged-1") == Record(Published, 7L, Some(7L)))
    // not-found error takes precedence even when another id is not staged
    assert(publishSplits(base, Seq("ghost", "pub-1"), Nil, 7L) == Left(NotFound(Seq("ghost"))))
    assert(publishSplits(base, Seq("pub-1"), Nil, 7L) ==
      Left(FailedPrecondition(Seq("pub-1"), "splits are not staged")))
    // replaced splits must be Published; a staged replaced id is not deletable
    assert(publishSplits(base, Seq("staged-1"), Seq("pub-1"), 7L).toOption.get
      .apply("pub-1").state == MarkedForDeletion)
    val err = publishSplits(base, Nil, Seq("staged-1"), 7L)
    assert(err == Left(FailedPrecondition(Seq("staged-1"), "splits are not deletable")))
    // replaced not-found errors (return_error_on_splits_not_found = true)
    assert(publishSplits(base, Nil, Seq("ghost"), 7L) == Left(NotFound(Seq("ghost"))))
  }

  test("mark-for-deletion: skip-if-marked without mutation; not-found precedence (mod.rs:243-299)") {
    val (out, mutated) = markForDeletion(base, Seq("pub-1", "marked-1"),
      Set(Published, MarkedForDeletion), errorOnNotFound = false, now = 3L).toOption.get
    assert(mutated && out("pub-1").state == MarkedForDeletion)
    assert(out("marked-1") == base("marked-1")) // untouched, no timestamp bump
    // already-marked only → no mutation
    val (same, m2) = markForDeletion(base, Seq("marked-1"),
      Set(Published, MarkedForDeletion), errorOnNotFound = false, 3L).toOption.get
    assert(!m2 && same == base)
    // not-found tolerated when not requested as error
    assert(markForDeletion(base, Seq("ghost"), Set(Published), false, 3L)
      .exists(!_._2))
    assert(markForDeletion(base, Seq("ghost"), Set(Published), true, 3L) ==
      Left(NotFound(Seq("ghost"))))
    // not-found beats non-deletable when both present
    assert(markForDeletion(base, Seq("ghost", "staged-1"), Set(Published), true, 3L) ==
      Left(NotFound(Seq("ghost"))))
    assert(markForDeletion(base, Seq("staged-1"), Set(Published), true, 3L) ==
      Left(FailedPrecondition(Seq("staged-1"), "splits are not deletable")))
  }

  test("delete: only MarkedForDeletion removable; Staged/Published forbidden; missing warn-only (mod.rs:416-467)") {
    assert(deleteSplits(base, Seq("marked-1", "ghost")) == Right(base - "marked-1"))
    assert(deleteSplits(base, Seq("staged-1")) ==
      Left(FailedPrecondition(Seq("staged-1"), "splits are not deletable")))
    assert(deleteSplits(base, Seq("pub-1", "marked-1")) ==
      Left(FailedPrecondition(Seq("pub-1"), "splits are not deletable")))
  }

  test("full lifecycle walk: stage → publish(replacing) → mark → delete") {
    val s0: Index = Map.empty
    val s1 = stageSplit(s0, "a", 1L).toOption.get
    val s2 = publishSplits(s1, Seq("a"), Nil, 2L).toOption.get
    val s3 = stageSplit(s2, "b", 3L).toOption.get
    val s4 = publishSplits(s3, Seq("b"), Seq("a"), 4L).toOption.get // b replaces a
    assert(s4("a").state == MarkedForDeletion && s4("b").state == Published)
    val s5 = deleteSplits(s4, Seq("a")).toOption.get
    assert(s5 == Map("b" -> Record(Published, 4L, Some(4L))))
  }
}
