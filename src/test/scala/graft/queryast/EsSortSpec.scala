package graft.queryast

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Golden replication of the reference's sort_orders scenario
  * (rest-api-tests/scenarii/sort_orders/0001-sort-elasticapi.yaml): the
  * 7-doc corpus from its two ingest batches, doc addresses in ingestion
  * order, and all four expected orderings byte-for-byte. */
class EsSortSpec extends SparkTestBase {

  // (addr, count, id): batch 1 = addrs 1-4, batch 2 = addrs 5-7
  private def corpus = {
    import spark.implicits._
    Seq(
      (1L, Some(10.0), 1L), (2L, Some(10.0), 2L), (3L, Some(15.0), 2L),
      (4L, None, 3L),
      (5L, Some(10.0), 0L), (6L, Some(-2.5), 4L), (7L, None, 5L)
    ).toDF("addr", "count", "id")
  }

  private def run(spec: Seq[(String, Boolean)]): Seq[(Option[Double], Long)] =
    corpus.orderBy(EsSort.compile(spec.map { case (n, a) => (col(n), a) },
        col("addr")): _*)
      .collect().map(r => (Option(r.get(1)).map(_.asInstanceOf[Double]), r.getLong(2)))
      .toSeq

  test("count desc: missing docs last, ties and missing follow addr desc") {
    assert(run(Seq("count" -> false)) === Seq(
      Some(15.0) -> 2L, Some(10.0) -> 0L, Some(10.0) -> 2L, Some(10.0) -> 1L,
      Some(-2.5) -> 4L, None -> 5L, None -> 3L))
  }

  test("count asc: missing docs STILL last (not first), ties follow addr asc") {
    assert(run(Seq("count" -> true)) === Seq(
      Some(-2.5) -> 4L, Some(10.0) -> 1L, Some(10.0) -> 2L, Some(10.0) -> 0L,
      Some(15.0) -> 2L, None -> 3L, None -> 5L))
  }

  test("id asc, count asc: two-field spec, inner missing stays last") {
    assert(run(Seq("id" -> true, "count" -> true)) === Seq(
      Some(10.0) -> 0L, Some(10.0) -> 1L, Some(10.0) -> 2L, Some(15.0) -> 2L,
      None -> 3L, Some(-2.5) -> 4L, None -> 5L))
  }

  test("count desc, id desc: secondary field ordered within missing group too") {
    assert(run(Seq("count" -> false, "id" -> false)) === Seq(
      Some(15.0) -> 2L, Some(10.0) -> 2L, Some(10.0) -> 1L, Some(10.0) -> 0L,
      Some(-2.5) -> 4L, None -> 5L, None -> 3L))
  }

  test("sort_by mini-DSL: bare and '+' are DESC, '-' is ASC (rest_handler.rs:99-124)") {
    assert(EsSort.parseMiniDsl("ts") === Seq("ts" -> false))
    assert(EsSort.parseMiniDsl("+ts") === Seq("ts" -> false))
    assert(EsSort.parseMiniDsl("-ts") === Seq("ts" -> true))
    // comma list, literally-empty segments skipped
    assert(EsSort.parseMiniDsl("-ts,,+ count ,id") ===
      Seq("ts" -> true, "count" -> false, "id" -> false))
    assert(EsSort.parseMiniDsl("") === Nil)
    // reference quirk preserved: the sign check precedes trimming, so a
    // leading space makes `-count` a DESC sort on the field "-count"
    // (rest_handler.rs:106-113)
    assert(EsSort.parseMiniDsl(" -count") === Seq("-count" -> false))
  }
}
