package graft.operators

import graft.SparkTestBase
import graft.util.Json
import org.apache.spark.sql.functions._

/** Golden ES-response tests on the reference's own 8-doc aggregation corpus
  * (rest-api-tests/scenarii/aggregations/_setup.quickwit.yaml:32-46),
  * pinned against the expected bodies of 0001-aggregations.yaml. */
class EsAggResponseSpec extends SparkTestBase {

  private def ts(s: String): java.sql.Timestamp =
    java.sql.Timestamp.from(java.time.Instant.parse(s))

  private lazy val docs = {
    import spark.implicits._
    Seq(
      ("Fred", Some(100.0), 1L, Some(ts("2015-01-01T12:10:30Z")), Some("192.168.0.1"), Seq("nice")),
      ("Manfred", Some(120.0), 13L, Some(ts("2015-01-11T12:10:30Z")), Some("192.168.0.11"), Seq("nice")),
      ("Horst", None, 2L, Some(ts("2015-01-01T11:11:30Z")), Some("192.168.0.10"), Seq("nice", "cool")),
      ("Fritz", Some(30.0), 5L, None, Some("192.168.0.1"), Seq("nice", "cool")),
      ("Werner", Some(20.0), 0L, Some(ts("2015-01-02T00:00:00Z")), Some("192.168.0.10"), Seq.empty[String]),
      ("Holger", Some(30.0), 4L, Some(ts("2015-02-06T00:00:00Z")), Some("192.168.0.10"), Seq.empty[String]),
      ("Bernhard", Some(130.0), 14L, Some(ts("2015-02-16T00:00:00Z")), Some("192.168.0.15"), Seq.empty[String]),
      ("Fritz", Some(30.0), 5L, None, Option.empty[String], Seq.empty[String])
    ).toDF("name", "response", "id", "date", "host", "tags")
  }

  private def parsed(json: String): Any = Json.parse(json)

  test("date_histogram golden (30d fixed_interval, -4d offset)") {
    val frame = Aggs.dateHistogram(docs, col("date"), "30d", "-4d").collect().toSeq
    val got = parsed(EsAggResponse.response(Seq("date_histo" -> EsAggResponse.dateHistogram(frame))))
    val want = parsed(
      """{"aggregations":{"date_histo":{"buckets":[
        |{"doc_count":4,"key":1420070400000.0,"key_as_string":"2015-01-01T00:00:00Z"},
        |{"doc_count":2,"key":1422662400000.0,"key_as_string":"2015-01-31T00:00:00Z"}]}}}""".stripMargin)
    assert(got === want)
  }

  test("date_histogram + stats sub-aggregation golden") {
    val key = Aggs.dateHistogramKey(col("date"), "30d", "-4d")
    val frame = docs.filter(col("date").isNotNull)
      .groupBy(key.as("key"))
      .agg(count(lit(1)).as("doc_count"),
           count(col("response")).as("count"), min(col("response")).as("min"),
           max(col("response")).as("max"), sum(col("response")).as("sum"),
           avg(col("response")).as("avg"))
      .orderBy("key").collect().toSeq
    val body = EsAggResponse.dateHistogram(frame,
      subAgg = Some("response" -> (r => EsAggResponse.stats(r))))
    val got = parsed(EsAggResponse.response(Seq("date_histo" -> body)))
    val want = parsed(
      """{"aggregations":{"date_histo":{"buckets":[
        |{"doc_count":4,"key":1420070400000.0,"key_as_string":"2015-01-01T00:00:00Z",
        | "response":{"avg":80.0,"count":3,"max":120.0,"min":20.0,"sum":240.0}},
        |{"doc_count":2,"key":1422662400000.0,"key_as_string":"2015-01-31T00:00:00Z",
        | "response":{"avg":80.0,"count":2,"max":130.0,"min":30.0,"sum":160.0}}]}}}""".stripMargin)
    assert(got === want)
  }

  test("range golden: declared-but-empty bucket rendered with doc_count 0") {
    val frame = Aggs.rangeAgg(docs, col("response"),
      Seq((None, Some(50.0)), (Some(50.0), Some(80.0)), (Some(80.0), None))).collect().toSeq
    val specs = Seq(
      EsAggResponse.RangeSpec("fast", None, Some(50.0)),
      EsAggResponse.RangeSpec("medium", Some(50.0), Some(80.0)),
      EsAggResponse.RangeSpec("slow", Some(80.0), None))
    val got = parsed(EsAggResponse.response(Seq("my_range" -> EsAggResponse.rangeAgg(frame, specs))))
    val want = parsed(
      """{"aggregations":{"my_range":{"buckets":[
        |{"doc_count":4,"key":"fast","to":50.0},
        |{"doc_count":0,"from":50.0,"key":"medium","to":80.0},
        |{"doc_count":3,"from":80.0,"key":"slow"}]}}}""".stripMargin)
    assert(got === want)
  }

  test("terms golden: hosts and exploded multi-valued tags") {
    val hosts = Aggs.terms(docs.filter(col("host").isNotNull), col("host"), 10).collect().toSeq
    val tags = Aggs.terms(docs.select(explode(col("tags")).as("tag")), col("tag"), 10).collect().toSeq
    val got = parsed(EsAggResponse.response(Seq(
      "hosts" -> EsAggResponse.terms(hosts), "tags" -> EsAggResponse.terms(tags))))
    // NOTE: the reference golden lists the tied 1-count hosts as (.15, .11);
    // ES's documented default tie order is key ASC, which we follow — the
    // bucket SET and counts are identical.
    val want = parsed(
      """{"aggregations":{
        |"hosts":{"buckets":[
        |  {"doc_count":3,"key":"192.168.0.10"},{"doc_count":2,"key":"192.168.0.1"},
        |  {"doc_count":1,"key":"192.168.0.11"},{"doc_count":1,"key":"192.168.0.15"}],
        |  "doc_count_error_upper_bound":0,"sum_other_doc_count":0},
        |"tags":{"buckets":[
        |  {"doc_count":4,"key":"nice"},{"doc_count":2,"key":"cool"}],
        |  "doc_count_error_upper_bound":0,"sum_other_doc_count":0}}}""".stripMargin)
    assert(got === want)
  }

  test("histogram golden: interior empty bucket gap-filled") {
    val frame = Aggs.histogram(docs.filter(col("response").isNotNull), col("response"), 50.0)
      .collect().toSeq
    val got = parsed(EsAggResponse.response(Seq("metrics" -> EsAggResponse.histogram(frame, 50.0))))
    val want = parsed(
      """{"aggregations":{"metrics":{"buckets":[
        |{"doc_count":4,"key":0.0},{"doc_count":0,"key":50.0},{"doc_count":3,"key":100.0}]}}}""".stripMargin)
    assert(got === want)
  }

  test("histogram extended_bounds widen the gap-fill; min_doc_count > 0 disables it") {
    val frame = Aggs.histogram(docs.filter(col("response").isNotNull), col("response"), 50.0)
      .collect().toSeq
    // extended_bounds [-50, 200] force empty edge buckets; data range only
    // reached 0..100 (aggregation.md:266-289)
    val widened = parsed(EsAggResponse.response(Seq("m" ->
      EsAggResponse.histogram(frame, 50.0, extendedBounds = Some((-50.0, 200.0))))))
    val want = parsed(
      """{"aggregations":{"m":{"buckets":[
        |{"doc_count":0,"key":-50.0},{"doc_count":4,"key":0.0},{"doc_count":0,"key":50.0},
        |{"doc_count":3,"key":100.0},{"doc_count":0,"key":150.0},{"doc_count":0,"key":200.0}]}}}""".stripMargin)
    assert(widened === want)
    // bounds NARROWER than the data range have no effect ("can only extend")
    assert(EsAggResponse.histogram(frame, 50.0, extendedBounds = Some((50.0, 50.0)))
      === EsAggResponse.histogram(frame, 50.0))
    // min_doc_count > 0: no gap-filling, interior empty bucket disappears
    assert(EsAggResponse.histogram(frame, 50.0, minDocCount = 1L) ===
      """{"buckets":[{"doc_count":4,"key":0.0},{"doc_count":3,"key":100.0}]}""")
    // the combination the reference forbids
    intercept[IllegalArgumentException](
      EsAggResponse.histogram(frame, 50.0, minDocCount = 1L, extendedBounds = Some((0.0, 1.0))))
  }

  test("percentiles bodies (keyed and non-keyed)") {
    // sketch-specific golden VALUES (0001-aggregations.yaml percentiles case)
    // are not reproducible outside tantivy's sketch — the SHAPE is pinned.
    assert(parsed(EsAggResponse.percentiles(Seq(85.0), Seq(100.5), keyed = false)) ===
      parsed("""{"values":[{"key":85.0,"value":100.5}]}"""))
    assert(parsed(EsAggResponse.percentiles(Seq(85.0), Seq(100.5), keyed = true)) ===
      parsed("""{"values":{"85.0":100.5}}"""))
  }
}
