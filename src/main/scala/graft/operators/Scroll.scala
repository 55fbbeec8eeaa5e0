package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions.col
import scala.collection.concurrent.TrieMap

/** Scroll (K6) — the reference keeps a server-side TTL-cached context per
  * scroll id holding the search request plus a cached window of up to
  * SCROLL_BATCH_LEN=1000 partial hits, refilled by re-running the query
  * with search_after when the window drains
  * (quickwit-search/src/scroll_context.rs:48-58,90-150).
  *
  * Same structure here: `start` materializes the first window of the
  * sorted result, every `scroll` serves the next page from the cached
  * window and refills via [[Aggs.searchAfter]] (K5) on the last served
  * cursor when the window runs dry. Entries expire `ttlMillis` after last
  * access (TtlCache analog). Deep unbounded exports should use the
  * search-stream path (S9) instead — same advice as the reference docs. */
final class ScrollContext(ttlMillis: Long = 60000L,
                          batchLen: Int = 1000,
                          clock: () => Long = () => System.currentTimeMillis()) {

  private final case class State(df: DataFrame, sortCol: String, tieCol: String,
                                 pageSize: Int, window: Vector[Row], pos: Int,
                                 deadline: Long)

  private val store = TrieMap.empty[String, State]

  private def evictExpired(): Unit = {
    val now = clock()
    store.filterInPlace((_, s) => s.deadline > now)
  }

  /** Open a scroll over `df` sorted by (sortCol asc, tieCol asc): returns
    * the scroll id and the first page. */
  def start(df: DataFrame, sortCol: String, tieCol: String, pageSize: Int): (String, Seq[Row]) = {
    evictExpired()
    val window = df.orderBy(col(sortCol).asc, col(tieCol).asc).limit(batchLen)
      .collect().toVector
    val page = window.take(pageSize)
    val id = java.util.UUID.randomUUID().toString
    store.put(id, State(df, sortCol, tieCol, pageSize,
      window, page.length, clock() + ttlMillis))
    (id, page)
  }

  /** Next page, or None when the id is unknown/expired. An empty page means
    * the result set is exhausted (the ES contract for ending a scroll). */
  def scroll(id: String): Option[Seq[Row]] = {
    evictExpired()
    store.get(id).map { s0 =>
      var st = s0
      var page = Vector.empty[Row]
      var exhausted = false
      // serve a FULL page even across a window boundary (ES pages are
      // pageSize until the result set ends)
      while (page.length < st.pageSize && !exhausted) {
        if (st.pos < st.window.length) {
          val take = st.window.slice(st.pos, st.pos + (st.pageSize - page.length))
          page ++= take
          st = st.copy(pos = st.pos + take.length)
        } else if (st.window.nonEmpty) { // drained: refill via search_after
          val last = st.window.last
          val refilled = Aggs.searchAfter(st.df, col(st.sortCol), col(st.tieCol),
            last.getAs[Any](st.sortCol), last.getAs[Any](st.tieCol), batchLen)
            .collect().toVector
          exhausted = refilled.isEmpty
          st = st.copy(window = refilled, pos = 0)
        } else exhausted = true
      }
      store.put(id, st.copy(deadline = clock() + ttlMillis))
      page
    }
  }

  /** DELETE _search/scroll analog. */
  def clear(id: String): Boolean = store.remove(id).isDefined
}
