package graft.queryast

import org.apache.spark.sql.{Column, DataFrame}
import scala.collection.concurrent.TrieMap

/** ES scroll API envelopes — `_search?scroll=TTL`, `GET _search/scroll`,
  * `DELETE _search/scroll` (quickwit-serve/src/elasticsearch_api/
  * rest_handler.rs:150-156,219-236,474-…; context semantics
  * quickwit-search/src/scroll_context.rs:48-150; contract pinned by
  * rest-api-tests/scenarii/es_compatibility/0012-scroll-api.yaml):
  *
  *  - the opening `_search` answers the NORMAL envelope (hits + total +
  *    aggregations) plus a `_scroll_id`;
  *  - every `_search/scroll` continuation replays the stored request with
  *    a search_after cursor (the scroll-context refill shape) and answers
  *    the next `size` hits, the ORIGINAL total, and NO aggregations (ES
  *    serves them only on the first response);
  *  - an exhausted scroll keeps answering empty hits with the total;
  *  - TTL is capped at 1800 s with the reference's exact error string
  *    (rest_handler.rs parse_scroll_ttl).
  *
  * A unique id tiebreak sort is appended to the request so the cursor is
  * a TOTAL order — sort-value ties can never drop or repeat rows across
  * pages. */
object EsScroll {

  val MaxTtlSecs = 1800L

  /** `30m`/`1800s`-style TTL. Over the cap → the reference's error.
    * Sub-second TTLs round UP — `500ms` must outlive its own creation. */
  def parseTtlSecs(s: String): Long = {
    val pat = "([0-9]+)(ms|s|m|h)".r
    val secs = s.trim match {
      case pat(n, "ms") => (n.toLong + 999) / 1000
      case pat(n, "s")  => n.toLong
      case pat(n, "m")  => n.toLong * 60
      case pat(n, "h")  => n.toLong * 3600
      case other => throw new IllegalArgumentException(s"invalid scroll TTL: $other")
    }
    if (secs > MaxTtlSecs) throw new IllegalArgumentException(
      s"Invalid argument: Quickwit only supports scroll TTL period up to $MaxTtlSecs secs")
    secs
  }

  final class Context(clock: () => Long = () => System.currentTimeMillis()) {

    private final case class State(df: DataFrame, resolver: FieldResolver,
                                   idCol: Column, idField: String,
                                   bodyJson: String,
                                   cursor: Option[Seq[Any]],
                                   total: Long,
                                   deadlineMs: Long, ttlMs: Long)

    private val store = TrieMap.empty[String, State]

    private def evictExpired(): Unit = {
      val now = clock()
      store.filterInPlace((_, s) => s.deadlineMs > now)
    }

    /** Opening `_search?scroll=TTL`. `idField` names the unique id column
      * (also the `_id` source) used as the trailing tiebreak sort. The
      * cursor and total are carried NATIVELY from the page (full i64 /
      * timestamp precision — never re-parsed from the rendered JSON). */
    def search(df: DataFrame, resolver: FieldResolver, idField: String,
               bodyJson: String, scrollTtl: String): String = {
      evictExpired()
      val ttlMs = parseTtlSecs(scrollTtl) * 1000L
      val idCol = org.apache.spark.sql.functions.col(idField)
      val page = EsApi.searchPage(df, resolver, idCol, bodyJson,
        cursorOverride = None, extraSort = Seq(idField -> true), includeAggs = true)
      val sid = java.util.UUID.randomUUID().toString
      store.put(sid, State(df, resolver, idCol, idField, bodyJson,
        page.lastSortValues, page.total, clock() + ttlMs, ttlMs))
      splice(sid, page.rendered)
    }

    /** `_search/scroll` continuation: one bounded TakeOrdered job per page
      * (the total is the one fixed at open — no per-page count job).
      * Unknown/expired ids get the reference-shaped failure. The
      * window-CACHED variant of this machinery (serve many tiny pages per
      * refill, scroll_context.rs's batch shape) is
      * [[graft.operators.ScrollContext]] for programmatic callers; the ES
      * envelope layer keeps pages stateless beyond the cursor. */
    def scroll(scrollId: String): String = {
      evictExpired()
      val st = store.getOrElse(scrollId,
        throw new IllegalArgumentException(s"scroll context not found: $scrollId"))
      // an EXHAUSTED scroll simply replays its final cursor: everything
      // after the true last row is the empty set, total stays intact —
      // no special casing (a cursor of None means the result set itself
      // is empty, and the cursorless replay is equally empty)
      val page = EsApi.searchPage(st.df, st.resolver, st.idCol, st.bodyJson,
        cursorOverride = st.cursor, extraSort = Seq(st.idField -> true),
        includeAggs = false, totalOverride = Some(st.total))
      store.put(scrollId,
        st.copy(cursor = page.lastSortValues.orElse(st.cursor),
          deadlineMs = clock() + st.ttlMs))
      splice(scrollId, page.rendered)
    }

    /** DELETE `_search/scroll`. */
    def clear(scrollId: String): Boolean = store.remove(scrollId).isDefined

    private def splice(sid: String, rendered: String): String =
      s"""{"_scroll_id":"$sid",""" + rendered.stripPrefix("{")
  }
}
