package graft.queryast

import org.apache.spark.sql.Column

/** ES sort-spec compilation with the reference's missing-value semantics
  * (rest-api-tests/scenarii/sort_orders/0001-sort-elasticapi.yaml; sort
  * validation root.rs:268-299): documents MISSING a sort field sort LAST in
  * BOTH directions — tantivy's fast-field missing handling — where Spark's
  * bare `asc` would put nulls first. The implicit final tiebreaker (the
  * (split_id, doc_addr) pair in the reference; a global doc address here)
  * follows the PRIMARY sort's direction: the scenario's count-desc case
  * orders its count=10 tie [addr5, addr2, addr1] and its missing docs
  * [addr7, addr4], both descending; the asc case orders both ascending. */
object EsSort {

  /** quickwit's REST `sort_by` mini-DSL (quickwit-serve/src/search_api/
    * rest_handler.rs:99-124), quirks preserved EXACTLY: a bare field AND a
    * `+` prefix both sort DESCENDING while `-` sorts ASCENDING
    * (rest_handler.rs:106-113 maps both the `+`-stripped and the bare
    * branch to SortOrder::Desc); only literally-empty segments are
    * skipped, and the sign is checked BEFORE trimming — ` -count` (leading
    * space) is therefore a descending sort on the field `-count`, exactly
    * as the reference parses it. Returns (field, ascending) for
    * [[compile]]. */
  def parseMiniDsl(sortBy: String): Seq[(String, Boolean)] =
    sortBy.split(',').toSeq.filter(_.nonEmpty).map { seg =>
      if (seg.startsWith("+")) seg.drop(1).trim -> false
      else if (seg.startsWith("-")) seg.drop(1).trim -> true
      else seg.trim -> false
    }

  /** `spec`: (column, ascending) in priority order; `docAddr`: the implicit
    * tiebreaker column. Returns orderBy-ready columns. */
  def compile(spec: Seq[(Column, Boolean)], docAddr: Column): Seq[Column] = {
    val cols = spec.map { case (c, asc) =>
      if (asc) c.asc_nulls_last else c.desc_nulls_last
    }
    val primaryAsc = spec.headOption.forall(_._2)
    cols :+ (if (primaryAsc) docAddr.asc else docAddr.desc)
  }
}
