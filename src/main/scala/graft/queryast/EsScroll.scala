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

  /** `30m`/`1800s`-style TTL. Over the cap → the reference's error. */
  def parseTtlSecs(s: String): Long = {
    val pat = "([0-9]+)(ms|s|m|h)".r
    val secs = s.trim match {
      case pat(n, "ms") => n.toLong / 1000
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
                                   deadlineMs: Long, ttlMs: Long)

    private val store = TrieMap.empty[String, State]

    private def evictExpired(): Unit = {
      val now = clock()
      store.filterInPlace((_, s) => s.deadlineMs > now)
    }

    /** Opening `_search?scroll=TTL`. `idField` names the unique id column
      * (also the `_id` source) used as the trailing tiebreak sort. */
    def search(df: DataFrame, resolver: FieldResolver, idField: String,
               bodyJson: String, scrollTtl: String): String = {
      evictExpired()
      val ttlMs = parseTtlSecs(scrollTtl) * 1000L
      val idCol = org.apache.spark.sql.functions.col(idField)
      val rendered = EsApi.search(df, resolver, idCol, bodyJson,
        cursorOverride = None, extraSort = Seq(idField -> true), includeAggs = true)
      val sid = java.util.UUID.randomUUID().toString
      store.put(sid, State(df, resolver, idCol, idField, bodyJson,
        lastCursor(rendered), clock() + ttlMs, ttlMs))
      splice(sid, rendered)
    }

    /** `_search/scroll` continuation. Unknown/expired ids get the
      * reference-shaped failure. */
    def scroll(scrollId: String): String = {
      evictExpired()
      val st = store.getOrElse(scrollId,
        throw new IllegalArgumentException(s"scroll context not found: $scrollId"))
      // an EXHAUSTED scroll simply replays its final cursor: everything
      // after the true last row is the empty set, total stays intact —
      // no special casing (a cursor of None means the result set itself
      // is empty, and the cursorless replay is equally empty)
      val rendered = EsApi.search(st.df, st.resolver, st.idCol, st.bodyJson,
        cursorOverride = st.cursor, extraSort = Seq(st.idField -> true),
        includeAggs = false)
      val next = lastCursor(rendered)
      store.put(scrollId,
        st.copy(cursor = next.orElse(st.cursor), deadlineMs = clock() + st.ttlMs))
      splice(scrollId, rendered)
    }

    /** DELETE `_search/scroll`. */
    def clear(scrollId: String): Boolean = store.remove(scrollId).isDefined

    /** The last hit's sort values from the rendered envelope — the next
      * cursor. None when the page is empty. */
    private def lastCursor(rendered: String): Option[Seq[Any]] = {
      val parsed = graft.util.Json.parse(rendered).asInstanceOf[Map[String, Any]]
      val hits = parsed("hits").asInstanceOf[Map[String, Any]]("hits")
        .asInstanceOf[Seq[Any]]
      hits.lastOption.map(_.asInstanceOf[Map[String, Any]]("sort").asInstanceOf[Seq[Any]])
    }

    private def splice(sid: String, rendered: String): String =
      s"""{"_scroll_id":"$sid",""" + rendered.stripPrefix("{")
  }
}
