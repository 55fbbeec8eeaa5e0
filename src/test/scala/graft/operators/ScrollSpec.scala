package graft.operators

import graft.SparkTestBase

/** Scroll-context tests: paging equals the global sort, windows refill via
  * search_after, TTL expiry invalidates, clear() deletes. */
class ScrollSpec extends SparkTestBase {

  private def df = {
    import spark.implicits._
    // deliberately unsorted input with a tie-breaking id
    (1 to 25).map(i => ((i * 7) % 26, i.toLong)).toDF("v", "id")
  }

  test("pages concatenate to the full sorted result; empty page ends the scroll") {
    val ctx = new ScrollContext(batchLen = 10)
    val (id, p1) = ctx.start(df, "v", "id", pageSize = 7)
    val pages = Iterator.iterate(Option(p1))(_ => ctx.scroll(id))
      .takeWhile(p => p.exists(_.nonEmpty)).flatten.toSeq
    assert(pages.map(_.size) === Seq(7, 7, 7, 4))
    val expect = df.orderBy(org.apache.spark.sql.functions.col("v").asc,
        org.apache.spark.sql.functions.col("id").asc)
      .collect().map(_.toString).toSeq
    assert(pages.flatten.map(_.toString) === expect)
    assert(ctx.scroll(id).get.isEmpty) // exhausted
  }

  test("TTL: expired ids vanish; access refreshes the deadline") {
    var now = 0L
    val ctx = new ScrollContext(ttlMillis = 100, batchLen = 10, clock = () => now)
    val (id, _) = ctx.start(df, "v", "id", 5)
    now = 90
    assert(ctx.scroll(id).isDefined) // refreshed at 90 → new deadline 190
    now = 180
    assert(ctx.scroll(id).isDefined)
    now = 400
    assert(ctx.scroll(id).isEmpty) // expired
  }

  test("clear deletes; unknown id → None") {
    val ctx = new ScrollContext()
    val (id, _) = ctx.start(df, "v", "id", 5)
    assert(ctx.clear(id))
    assert(!ctx.clear(id))
    assert(ctx.scroll(id).isEmpty)
    assert(ctx.scroll("nope").isEmpty)
  }
}
