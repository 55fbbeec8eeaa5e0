package graft.publish

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The metastore's split-listing query surface
  * (quickwit-metastore/src/metastore/mod.rs:393-449 `ListSplitsQuery`,
  * file_backed/file_backed_index/mod.rs:380-411 `list_splits` and
  * :678-720 `split_query_predicate`), rebuilt over a split-metadata
  * DataFrame: every filter compiles to a codegen'd Column predicate, so at
  * a 100 TB deployment's multi-million-split metastore the listing is a
  * pushdown-friendly scan (state/opstamp/timestamp predicates reach the
  * parquet footer of a persisted metastore table), the staleness sort with
  * a limit collapses to TakeOrdered, and nothing is collected.
  *
  * Expected columns: split_id, split_state, tags (array&lt;string&gt;),
  * time_range_start/time_range_end (nullable — null = no time range),
  * delete_opstamp, update_timestamp, create_timestamp,
  * maturation_period_secs (nullable — null = already mature),
  * publish_timestamp (nullable).
  *
  * Reference quirks replicated exactly (pinned in ListSplitsSpec):
  *  - a maturity bound EARLY-RETURNS: when `mature` is set, the time-range
  *    overlap check is skipped (mod.rs:704-713 `match … return`);
  *  - a split with no time range passes any time filter (mod.rs:714-718);
  *  - bounds are Included/Excluded/Unbounded with the reference's
  *    `FilterRange::contains` / `overlaps_with` semantics
  *    (metastore/mod.rs:479-530).
  */
object ListSplits {

  sealed trait Bound
  final case class Included(v: Long) extends Bound
  final case class Excluded(v: Long) extends Bound
  case object Unbounded extends Bound

  /** FilterRange (metastore/mod.rs:466-530): [start, end] bounds, each
    * independently inclusive/exclusive/absent. */
  final case class FilterRange(start: Bound = Unbounded, end: Bound = Unbounded) {
    def isUnbounded: Boolean = start == Unbounded && end == Unbounded

    /** `contains(value)` as a Column (mod.rs:479-499). */
    def contains(v: Column): Column =
      if (isUnbounded) lit(true)
      else {
        val lo = start match {
          case Unbounded => lit(true)
          case Included(x) => lit(x) <= v
          case Excluded(x) => lit(x) < v
        }
        val hi = end match {
          case Unbounded => lit(true)
          case Included(x) => lit(x) >= v
          case Excluded(x) => lit(x) > v
        }
        lo && hi
      }

    /** `overlaps_with(range)` against the INCLUSIVE split range [lo, hi]
      * (mod.rs:502-523). */
    def overlaps(lo: Column, hi: Column): Column =
      if (isUnbounded) lit(true)
      else {
        val lower = start match {
          case Unbounded => lit(true)
          case Included(x) => lit(x) <= hi
          case Excluded(x) => lit(x) < hi
        }
        val upper = end match {
          case Unbounded => lit(true)
          case Included(x) => lit(x) >= lo
          case Excluded(x) => lit(x) > lo
        }
        lower && upper
      }
  }
  object FilterRange {
    def gt(v: Long): FilterRange = FilterRange(start = Excluded(v))
    def gte(v: Long): FilterRange = FilterRange(start = Included(v))
    def lt(v: Long): FilterRange = FilterRange(end = Excluded(v))
    def lte(v: Long): FilterRange = FilterRange(end = Included(v))
  }

  /** TagFilterAst (quickwit-doc-mapper/src/tag_pruning.rs:172-233):
    * `Tag{is_present}` checks set membership == is_present; And of empty
    * list is true, Or of empty list is false — Rust `all`/`any`. */
  sealed trait TagAst
  final case class Tag(isPresent: Boolean, tag: String) extends TagAst
  final case class TagAnd(children: Seq[TagAst]) extends TagAst
  final case class TagOr(children: Seq[TagAst]) extends TagAst

  def tagPredicate(ast: TagAst, tags: Column): Column = ast match {
    case Tag(isPresent, t) =>
      coalesce(array_contains(tags, t), lit(false)) === lit(isPresent)
    case TagAnd(cs) => cs.map(tagPredicate(_, tags)).foldLeft(lit(true))(_ && _)
    case TagOr(cs) => cs.map(tagPredicate(_, tags)).foldLeft(lit(false))(_ || _)
  }

  /** ListSplitsQuery: unset fields filter nothing, mirroring
    * `ListSplitsQuery::for_index` defaults (mod.rs:434-449). `mature` is a
    * Bound on the evaluation epoch-second: Included = only splits mature at
    * that instant, Excluded = only immature ones. */
  final case class Query(
      splitStates: Seq[String] = Nil,
      tags: Option[TagAst] = None,
      timeRange: FilterRange = FilterRange(),
      deleteOpstamp: FilterRange = FilterRange(),
      updateTimestamp: FilterRange = FilterRange(),
      createTimestamp: FilterRange = FilterRange(),
      mature: Bound = Unbounded,
      sortByStaleness: Boolean = false,
      offset: Int = 0,
      limit: Option[Int] = None)

  /** `split_query_predicate` as one Column (file_backed_index/mod.rs:678-720),
    * in the reference's evaluation order. */
  def predicate(q: Query): Column = {
    val tagOk = q.tags.map(tagPredicate(_, col("tags"))).getOrElse(lit(true))
    val stateOk =
      if (q.splitStates.isEmpty) lit(true)
      else col("split_state").isin(q.splitStates.map(x => x: Any): _*)
    val delOk = q.deleteOpstamp.contains(col("delete_opstamp"))
    val updOk = q.updateTimestamp.contains(col("update_timestamp"))
    val createOk = q.createTimestamp.contains(col("create_timestamp"))
    val base = tagOk && stateOk && delOk && updOk && createOk
    // mature if no maturation period, or create_ts + period <= eval instant
    // (split_metadata.rs:208-218)
    def isMature(evalSec: Long): Column =
      col("maturation_period_secs").isNull ||
        (col("create_timestamp") + col("maturation_period_secs")) <= lit(evalSec)
    q.mature match {
      // reference EARLY-RETURNS on a maturity bound: time range not checked
      case Included(dt) => base && isMature(dt)
      case Excluded(dt) => base && !isMature(dt)
      case Unbounded =>
        val timeOk = col("time_range_start").isNull ||
          q.timeRange.overlaps(col("time_range_start"), col("time_range_end"))
        base && timeOk
    }
  }

  /** Filter + order + paginate (file_backed_index/mod.rs:380-411).
    * Staleness order is (delete_opstamp asc, publish_timestamp asc) with
    * nulls first — Rust's `None < Some` — plus a split_id tiebreak the
    * reference leaves unspecified (`sorted_unstable_by`) that we pin for
    * determinism. Without the staleness sort, pagination follows split_id
    * order, the BTreeMap iteration order of the file-backed store. */
  def apply(splits: DataFrame, q: Query): DataFrame = {
    val filtered = splits.filter(predicate(q))
    val ordered =
      if (q.sortByStaleness)
        filtered.orderBy(col("delete_opstamp").asc,
          col("publish_timestamp").asc_nulls_first, col("split_id").asc)
      else if (q.offset > 0 || q.limit.isDefined) filtered.orderBy(col("split_id").asc)
      else filtered
    val off = if (q.offset > 0) ordered.offset(q.offset) else ordered
    q.limit.fold(off)(off.limit)
  }
}
