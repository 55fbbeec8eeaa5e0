package graft.queryast

import graft.SparkTestBase
import graft.util.Json

/** ES scroll envelopes, contract pinned from the reference's own
  * 0012-scroll-api.yaml scenario: first response carries _scroll_id +
  * aggs, continuations page size-at-a-time with the original total and
  * no aggs, exhaustion keeps answering empty pages, TTL cap error. */
class EsScrollSpec extends SparkTestBase {

  private val resolver = FieldResolver(Set.empty, Seq("name"))

  private lazy val docs = {
    import spark.implicits._
    (1 to 100).map(i => (i.toLong, s"doc$i", Seq("push", "fork", "watch")(i % 3)))
      .toDF("id", "name", "type")
  }

  private def parsed(s: String): Map[String, Any] =
    Json.parse(s).asInstanceOf[Map[String, Any]]
  private def hits(m: Map[String, Any]): Seq[Map[String, Any]] =
    m("hits").asInstanceOf[Map[String, Any]]("hits").asInstanceOf[Seq[Any]]
      .map(_.asInstanceOf[Map[String, Any]])
  private def total(m: Map[String, Any]): Double =
    m("hits").asInstanceOf[Map[String, Any]]("total")
      .asInstanceOf[Map[String, Any]]("value").asInstanceOf[Double]

  test("scenario 0012 shape: size 1, sort desc, aggs on first page only") {
    val ctx = new EsScroll.Context()
    val r1 = parsed(ctx.search(docs, resolver, "id",
      """{"query":{"match_all":{}},"size":1,"sort":[{"id":{"order":"desc"}}],
        |"aggs":{"mytypeagg":{"terms":{"field":"type","size":5}}}}""".stripMargin,
      "30m"))
    val sid = r1("_scroll_id").asInstanceOf[String]
    assert(sid.length > 4)
    assert(total(r1) === 100.0)
    assert(hits(r1).map(_("_id")) === Seq(100.0))
    assert(r1.contains("aggregations"))

    val r2 = parsed(ctx.scroll(sid))
    assert(hits(r2).map(_("_id")) === Seq(99.0))
    assert(total(r2) === 100.0)
    assert(!r2.contains("aggregations")) // ES: aggs only on the first page

    val r3 = parsed(ctx.scroll(sid))
    assert(hits(r3).map(_("_id")) === Seq(98.0))
    assert(ctx.clear(sid))
    intercept[IllegalArgumentException](ctx.scroll(sid))
  }

  test("size 40 over 100 docs: 40/40/20/0/0 pages, total stays 100") {
    val ctx = new EsScroll.Context()
    val r1 = parsed(ctx.search(docs, resolver, "id",
      """{"query":{"match_all":{}},"size":40,"sort":[{"id":{"order":"desc"}}]}""",
      "30m"))
    val sid = r1("_scroll_id").asInstanceOf[String]
    assert(hits(r1).size === 40)
    val pages = (1 to 4).map(_ => parsed(ctx.scroll(sid)))
    assert(pages.map(p => hits(p).size) === Seq(40, 20, 0, 0))
    assert(pages.forall(p => total(p) === 100.0))
    // no row lost or repeated across the scroll
    val seen = (hits(r1) ++ pages.flatMap(hits)).map(_("_id").asInstanceOf[Double])
    assert(seen.sorted === (1 to 100).map(_.toDouble))
  }

  test("TTL over the 1800 s cap reproduces the reference error") {
    val ctx = new EsScroll.Context()
    val e = intercept[IllegalArgumentException] {
      ctx.search(docs, resolver, "id", "{}", "31m")
    }
    assert(e.getMessage ===
      "Invalid argument: Quickwit only supports scroll TTL period up to 1800 secs")
    assert(EsScroll.parseTtlSecs("30m") === 1800L)
    assert(EsScroll.parseTtlSecs("90s") === 90L)
  }

  test("expired contexts are evicted; sort-value ties never drop rows") {
    var now = 0L
    val ctx = new EsScroll.Context(clock = () => now)
    val r1 = parsed(ctx.search(docs, resolver, "id",
      """{"size":10,"sort":[{"type":"asc"}]}""", "60s")) // 3-way ties: id tiebreak
    val sid = r1("_scroll_id").asInstanceOf[String]
    val all = Iterator.continually(parsed(ctx.scroll(sid)))
      .takeWhile(p => hits(p).nonEmpty).take(20).toSeq
    val ids = (hits(r1) ++ all.flatMap(hits)).map(_("_id").asInstanceOf[Double])
    assert(ids.distinct.size === 100) // tie-broken cursor: complete + unique
    now = 61000L
    intercept[IllegalArgumentException](ctx.scroll(sid))
  }
}
