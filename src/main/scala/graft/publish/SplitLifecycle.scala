package graft.publish

/** The metastore's split-lifecycle state machine
  * (quickwit-metastore/src/metastore/file_backed/file_backed_index/mod.rs:
  * 215-240 stage, :243-299 mark-for-deletion, :302-378 publish, :428-467
  * delete), as a pure function over an immutable split map — the
  * driver-side companion to [[Manifest]]'s on-disk CAS commit. Every error
  * string and precedence rule matches the reference:
  *
  *  - re-staging an existing STAGED split overwrites it; any other state →
  *    FailedPrecondition "split is not staged";
  *  - mark-for-deletion: not-found errors (when requested) take precedence
  *    over "splits are not deletable"; already-marked splits are skipped
  *    without counting as a mutation;
  *  - publish: apply the checkpoint delta first (contiguity enforced by
  *    the caller / [[Checkpoint]]), then staged→Published (not-found before
  *    "splits are not staged"), then replaced splits marked for deletion
  *    with deletable states = [Published] and not-found = error;
  *  - delete: only MarkedForDeletion splits are deletable — Staged and
  *    Published are forbidden ("splits are not deletable"); missing ids
  *    only warn — the forbidden error wins over not-found.
  */
object SplitLifecycle {

  sealed trait State
  case object Staged extends State
  case object Published extends State
  case object MarkedForDeletion extends State

  final case class Record(state: State, updateTimestamp: Long,
                          publishTimestamp: Option[Long])

  sealed trait LifecycleError { def splitIds: Seq[String]; def message: String }
  final case class NotFound(splitIds: Seq[String]) extends LifecycleError {
    def message = "splits not found"
  }
  final case class FailedPrecondition(splitIds: Seq[String], message: String)
      extends LifecycleError

  type Index = Map[String, Record]

  /** stage_split (mod.rs:215-240). */
  def stageSplit(idx: Index, splitId: String, now: Long): Either[LifecycleError, Index] =
    idx.get(splitId) match {
      case Some(r) if r.state != Staged =>
        Left(FailedPrecondition(Seq(splitId), "split is not staged"))
      case _ => Right(idx.updated(splitId, Record(Staged, now, None)))
    }

  /** mark_splits_for_deletion (mod.rs:243-299). Returns the new index and
    * whether a mutation occurred. */
  def markForDeletion(idx: Index, splitIds: Seq[String],
                      deletableStates: Set[State],
                      errorOnNotFound: Boolean,
                      now: Long): Either[LifecycleError, (Index, Boolean)] = {
    var out = idx
    var mutated = false
    val notFound = Seq.newBuilder[String]
    val nonDeletable = Seq.newBuilder[String]
    splitIds.foreach { id =>
      idx.get(id) match {
        case None => notFound += id
        case Some(r) if !deletableStates.contains(r.state) => nonDeletable += id
        case Some(r) if r.state == MarkedForDeletion => () // already marked: skip
        case Some(r) =>
          out = out.updated(id, r.copy(state = MarkedForDeletion, updateTimestamp = now))
          mutated = true
      }
    }
    val nf = notFound.result()
    if (nf.nonEmpty && errorOnNotFound) Left(NotFound(nf))
    else {
      val nd = nonDeletable.result()
      if (nd.nonEmpty) Left(FailedPrecondition(nd, "splits are not deletable"))
      else Right((out, mutated))
    }
  }

  /** mark_splits_as_published_helper + publish_splits (mod.rs:302-378).
    * Checkpoint-delta application is the caller's step (see [[Checkpoint]]
    * / [[Manifest.Store.publish]]); this is the state transition. */
  def publishSplits(idx: Index, stagedIds: Seq[String], replacedIds: Seq[String],
                    now: Long): Either[LifecycleError, Index] = {
    var out = idx
    val notFound = Seq.newBuilder[String]
    val notStaged = Seq.newBuilder[String]
    stagedIds.foreach { id =>
      idx.get(id) match {
        case None => notFound += id
        case Some(r) if r.state == Staged =>
          out = out.updated(id, Record(Published, now, Some(now)))
        case Some(_) => notStaged += id
      }
    }
    val nf = notFound.result()
    if (nf.nonEmpty) Left(NotFound(nf))
    else {
      val ns = notStaged.result()
      if (ns.nonEmpty) Left(FailedPrecondition(ns, "splits are not staged"))
      else markForDeletion(out, replacedIds, Set(Published),
        errorOnNotFound = true, now).map(_._1)
    }
  }

  /** delete_splits (mod.rs:416-467): ONLY MarkedForDeletion splits are
    * deletable — Staged and Published are both Forbidden (mod.rs:418-422) —
    * and the Forbidden error beats NotFound, which only warns in the
    * reference and is silently dropped here. */
  def deleteSplits(idx: Index, splitIds: Seq[String]): Either[LifecycleError, Index] = {
    var out = idx
    val forbidden = Seq.newBuilder[String]
    splitIds.foreach { id =>
      idx.get(id) match {
        case None => () // warn-only in the reference
        case Some(r) if r.state == MarkedForDeletion => out = out - id
        case Some(_) => forbidden += id
      }
    }
    val fb = forbidden.result()
    if (fb.nonEmpty) Left(FailedPrecondition(fb, "splits are not deletable"))
    else Right(out)
  }
}
