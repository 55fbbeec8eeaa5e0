package graft.queryast

import graft.SparkTestBase
import graft.operators.DdSketch
import graft.util.Json

/** END-TO-END aggregation-request goldens: each scenario's `json` request
  * body from rest-api-tests/scenarii/aggregations/0001-aggregations.yaml is
  * fed VERBATIM to [[EsAggs.search]] over the reference's own 8-doc corpus
  * (_setup.quickwit.yaml:32-46) and the rendered response is compared —
  * parsed, so only values and array order matter — against the scenario's
  * `expected` body. Percentile values are the reference's DDSketch
  * estimates, matched bit-for-bit (see [[graft.operators.DdSketch]]).
  */
class EsAggsSpec extends SparkTestBase {

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

  private val resolver = FieldResolver(Set.empty, Seq("name"))

  private def check(request: String, expectedAggs: String): Unit = {
    val got = Json.parse(EsAggs.search(docs, resolver, request))
    val want = Json.parse(s"""{"aggregations":$expectedAggs}""")
    assert(got === want)
  }

  test("golden 1: date_histogram (30d fixed_interval, -4d offset)") {
    check(
      """{"query":{"match_all":{}},"aggs":{"date_histo":{"date_histogram":
        |{"field":"date","fixed_interval":"30d","offset":"-4d"}}}}""".stripMargin,
      """{"date_histo":{"buckets":[
        |{"doc_count":4,"key":1420070400000.0,"key_as_string":"2015-01-01T00:00:00Z"},
        |{"doc_count":2,"key":1422662400000.0,"key_as_string":"2015-01-31T00:00:00Z"}]}}""".stripMargin)
  }

  test("golden 2: date_histogram + stats sub-aggregation") {
    check(
      """{"query":{"match_all":{}},"aggs":{"date_histo":{"date_histogram":
        |{"field":"date","fixed_interval":"30d","offset":"-4d"},
        |"aggs":{"response":{"stats":{"field":"response"}}}}}}""".stripMargin,
      """{"date_histo":{"buckets":[
        |{"doc_count":4,"key":1420070400000.0,"key_as_string":"2015-01-01T00:00:00Z",
        | "response":{"avg":80.0,"count":3,"max":120.0,"min":20.0,"sum":240.0}},
        |{"doc_count":2,"key":1422662400000.0,"key_as_string":"2015-01-31T00:00:00Z",
        | "response":{"avg":80.0,"count":2,"max":130.0,"min":30.0,"sum":160.0}}]}}""".stripMargin)
  }

  test("golden 3: bool/exists query + date_histogram + stats sub") {
    check(
      """{"query":{"bool":{"must":[{"exists":{"field":"response"}}]}},
        |"aggs":{"date_histo":{"date_histogram":
        |{"field":"date","fixed_interval":"30d","offset":"-4d"},
        |"aggs":{"response":{"stats":{"field":"response"}}}}}}""".stripMargin,
      """{"date_histo":{"buckets":[
        |{"doc_count":3,"key":1420070400000.0,"key_as_string":"2015-01-01T00:00:00Z",
        | "response":{"avg":80.0,"count":3,"max":120.0,"min":20.0,"sum":240.0}},
        |{"doc_count":2,"key":1422662400000.0,"key_as_string":"2015-01-31T00:00:00Z",
        | "response":{"avg":80.0,"count":2,"max":130.0,"min":30.0,"sum":160.0}}]}}""".stripMargin)
  }

  test("golden 4: range aggregation with named, declared-but-empty buckets") {
    check(
      """{"query":{"match_all":{}},"aggs":{"my_range":{"range":{"field":"response",
        |"ranges":[{"to":50,"key":"fast"},{"from":50,"to":80,"key":"medium"},{"from":80,"key":"slow"}]}}}}""".stripMargin,
      """{"my_range":{"buckets":[
        |{"doc_count":4,"key":"fast","to":50.0},
        |{"doc_count":0,"from":50.0,"key":"medium","to":80.0},
        |{"doc_count":3,"from":80.0,"key":"slow"}]}}""".stripMargin)
  }

  test("golden 5: terms aggs — scalar host and multi-valued tags, reference tie order") {
    // NOTE the reference's count-tie order is key DESC (192.168.0.15 before
    // 192.168.0.11), not ES-proper's key asc — pinned here deliberately.
    check(
      """{"query":{"match_all":{}},"aggs":{
        |"hosts":{"terms":{"field":"host"}},
        |"tags":{"terms":{"field":"tags"}}}}""".stripMargin,
      """{"hosts":{"buckets":[
        |{"doc_count":3,"key":"192.168.0.10"},{"doc_count":2,"key":"192.168.0.1"},
        |{"doc_count":1,"key":"192.168.0.15"},{"doc_count":1,"key":"192.168.0.11"}],
        |"doc_count_error_upper_bound":0,"sum_other_doc_count":0},
        |"tags":{"buckets":[{"doc_count":4,"key":"nice"},{"doc_count":2,"key":"cool"}],
        |"doc_count_error_upper_bound":0,"sum_other_doc_count":0}}""".stripMargin)
  }

  test("golden 6: date_histogram + percentiles sub — DDSketch values bit-exact") {
    check(
      """{"query":{"match_all":{}},"aggs":{"metrics":{"date_histogram":
        |{"field":"date","fixed_interval":"30d","offset":"-4d"},
        |"aggs":{"response":{"percentiles":{"field":"response","percents":[85],"keyed":false}}}}}}""".stripMargin,
      """{"metrics":{"buckets":[
        |{"doc_count":4,"key":1420070400000.0,"key_as_string":"2015-01-01T00:00:00Z",
        | "response":{"values":[{"key":85.0,"value":100.49456770856702}]}},
        |{"doc_count":2,"key":1422662400000.0,"key_as_string":"2015-01-31T00:00:00Z",
        | "response":{"values":[{"key":85.0,"value":30.26717133872237}]}}]}}""".stripMargin)
  }

  test("golden 7: histogram with interior empty bucket gap-filled") {
    check(
      """{"query":{"match_all":{}},"aggs":{"metrics":{"histogram":{"field":"response","interval":50}}}}""",
      """{"metrics":{"buckets":[
        |{"doc_count":4,"key":0.0},{"doc_count":0,"key":50.0},{"doc_count":3,"key":100.0}]}}""".stripMargin)
  }

  test("keyed histogram: buckets render as a hashmap keyed by bucket key") {
    // aggregation.md "keyed" — same buckets (gap-fill included), hashmap
    // form; bucket bodies identical to the array form
    check(
      """{"query":{"match_all":{}},"aggs":{"metrics":{"histogram":
        |{"field":"response","interval":50,"keyed":true}}}}""".stripMargin,
      """{"metrics":{"buckets":{
        |"0.0":{"doc_count":4,"key":0.0},
        |"50.0":{"doc_count":0,"key":50.0},
        |"100.0":{"doc_count":3,"key":100.0}}}}""".stripMargin)
  }

  test("keyed date_histogram: hashmap keys are the key_as_string") {
    check(
      """{"query":{"match_all":{}},"aggs":{"date_histo":{"date_histogram":
        |{"field":"date","fixed_interval":"30d","offset":"-4d","keyed":true}}}}""".stripMargin,
      """{"date_histo":{"buckets":{
        |"2015-01-01T00:00:00Z":
        |  {"doc_count":4,"key":1420070400000.0,"key_as_string":"2015-01-01T00:00:00Z"},
        |"2015-01-31T00:00:00Z":
        |  {"doc_count":2,"key":1422662400000.0,"key_as_string":"2015-01-31T00:00:00Z"}}}}""".stripMargin)
  }

  test("histogram: offset + extended_bounds snap on the SAME offset grid as data keys") {
    // data keys (interval 50, offset 5): 30/20→5, 100→55, 120/130→105;
    // extended_bounds snap WITH the offset: 0→-45, 200→155. Snapping without
    // the offset iterated 0,50,100,… — misaligned with byKey, so every real
    // bucket was replaced by a zero-count gap bucket (ADVICE r3 #1).
    check(
      """{"query":{"match_all":{}},"aggs":{"metrics":{"histogram":
        |{"field":"response","interval":50,"offset":5,
        | "extended_bounds":{"min":0,"max":200}}}}}""".stripMargin,
      """{"metrics":{"buckets":[
        |{"doc_count":0,"key":-45.0},{"doc_count":4,"key":5.0},
        |{"doc_count":1,"key":55.0},{"doc_count":2,"key":105.0},
        |{"doc_count":0,"key":155.0}]}}""".stripMargin)
  }

  test("histogram: fractional interval gap-fill keeps populated buckets (integral index iteration)") {
    // interval 1.1 over responses {20, 30, 30, 30}: data buckets at indexes
    // 18 (19.8…) and 27 (29.7…). Accumulating doubles (lo + n*interval)
    // drifts off the floor-computed keys, and the exact-equality lookup
    // then replaced BOTH populated buckets with zero-count gaps.
    val got = Json.parse(EsAggs.search(docs, resolver,
      """{"query":{"range":{"response":{"lt":35}}},
        |"aggs":{"h":{"histogram":{"field":"response","interval":1.1}}}}""".stripMargin))
    val buckets = got.asInstanceOf[Map[String, Any]]("aggregations")
      .asInstanceOf[Map[String, Any]]("h")
      .asInstanceOf[Map[String, Any]]("buckets").asInstanceOf[Seq[Any]]
      .map(_.asInstanceOf[Map[String, Any]])
    assert(buckets.size === 10) // indexes 18..27 inclusive
    assert(buckets.map(_("doc_count").asInstanceOf[Double].toLong).sum === 4L)
    assert(buckets.count(_("doc_count") !== 0.0) === 2)
  }

  test("unknown aggregation variant reproduces the reference error (root.rs:3513-3517)") {
    val e = intercept[IllegalArgumentException] {
      EsAggs.parse("""{"x":{"termss":{"field":"host"}}}""")
    }
    assert(e.getMessage.contains("unknown variant `termss`, expected one of `range`, " +
      "`histogram`, `date_histogram`, `terms`, `avg`, `value_count`, `max`, `min`, " +
      "`stats`, `sum`, `percentiles`"))
  }

  test("nested buckets: terms under date_histogram, metrics at the leaf") {
    // hand-computed on the corpus: bucket 2015-01-01 holds hosts
    // .1(Fred), .11(Manfred), .10(Horst), .10(Werner); 2015-01-31 holds
    // .10(Holger), .15(Bernhard)
    val got = Json.parse(EsAggs.search(docs, resolver,
      """{"aggs":{"dh":{"date_histogram":{"field":"date","fixed_interval":"30d","offset":"-4d"},
        |"aggs":{"hosts":{"terms":{"field":"host"},
        |"aggs":{"r":{"avg":{"field":"response"}}}}}}}}""".stripMargin))
    val want = Json.parse(
      """{"aggregations":{"dh":{"buckets":[
        |{"doc_count":4,"key":1420070400000.0,"key_as_string":"2015-01-01T00:00:00Z",
        | "hosts":{"buckets":[
        |   {"doc_count":2,"key":"192.168.0.10","r":{"value":20.0}},
        |   {"doc_count":1,"key":"192.168.0.11","r":{"value":120.0}},
        |   {"doc_count":1,"key":"192.168.0.1","r":{"value":100.0}}],
        |  "doc_count_error_upper_bound":0,"sum_other_doc_count":0}},
        |{"doc_count":2,"key":1422662400000.0,"key_as_string":"2015-01-31T00:00:00Z",
        | "hosts":{"buckets":[
        |   {"doc_count":1,"key":"192.168.0.15","r":{"value":130.0}},
        |   {"doc_count":1,"key":"192.168.0.10","r":{"value":30.0}}],
        |  "doc_count_error_upper_bound":0,"sum_other_doc_count":0}}]}}}""".stripMargin)
    assert(got === want)
  }

  test("terms size truncation fills sum_other_doc_count; min_doc_count drops into it") {
    val got = Json.parse(EsAggs.search(docs, resolver,
      """{"aggs":{"hosts":{"terms":{"field":"host","size":1}}}}"""))
    val want = Json.parse(
      """{"aggregations":{"hosts":{"buckets":[{"doc_count":3,"key":"192.168.0.10"}],
        |"doc_count_error_upper_bound":0,"sum_other_doc_count":4}}}""".stripMargin)
    assert(got === want)

    val got2 = Json.parse(EsAggs.search(docs, resolver,
      """{"aggs":{"hosts":{"terms":{"field":"host","min_doc_count":2}}}}"""))
    val want2 = Json.parse(
      """{"aggregations":{"hosts":{"buckets":[
        |{"doc_count":3,"key":"192.168.0.10"},{"doc_count":2,"key":"192.168.0.1"}],
        |"doc_count_error_upper_bound":0,"sum_other_doc_count":2}}}""".stripMargin)
    assert(got2 === want2)
  }

  test("top-level metrics: avg/sum/min/max/value_count/stats/percentiles") {
    // responses: 100,120,30,20,30,130,30 (7 non-null of 8)
    val got = Json.parse(EsAggs.search(docs, resolver,
      """{"aggs":{
        |"a":{"avg":{"field":"response"}},"s":{"sum":{"field":"response"}},
        |"mn":{"min":{"field":"response"}},"mx":{"max":{"field":"response"}},
        |"vc":{"value_count":{"field":"response"}},"st":{"stats":{"field":"response"}},
        |"p":{"percentiles":{"field":"response","percents":[50]}}}}""".stripMargin))
    val sum = 460.0
    val p50 = DdSketch.binValue(1, math.ceil(math.log(30.0) / DdSketch.GammaLn).toInt)
    val want = Json.parse(
      s"""{"aggregations":{
         |"a":{"value":${sum / 7}},"s":{"value":460.0},
         |"mn":{"value":20.0},"mx":{"value":130.0},
         |"vc":{"value":7},
         |"st":{"avg":${sum / 7},"count":7,"max":130.0,"min":20.0,"sum":460.0},
         |"p":{"values":{"50.0":$p50}}}}""".stripMargin)
    assert(got === want)
  }

  test("bucket limit guards the agg tree cumulatively (AggregationLimits analog)") {
    // docs fixture has >1 host bucket; a limit of 1 must abort with the
    // reference's error text; the default (65000) sails through
    val e = intercept[IllegalArgumentException] {
      EsAggs.run(docs, EsAggs.parseAggs(graft.util.Json.parse(
        """{"hosts": {"terms": {"field": "host"}}}""").asInstanceOf[Map[String, Any]]),
        bucketLimit = 1)
    }
    assert(e.getMessage.contains("Aborting aggregation because bucket limit was reached"))
    assert(EsAggs.search(docs, resolver,
      """{"aggs": {"hosts": {"terms": {"field": "host"}}}}""").nonEmpty)
  }

  test("terms: show_term_doc_count_error renders per-bucket bound; split_size accepted") {
    // exact engine ⇒ 0 is the truthful per-bucket upper bound
    // (aggregation.md:509-513; split_size is a leaf-truncation accuracy
    // knob with no effect on an exact computation)
    val got = EsAggs.search(docs, resolver,
      """{"aggs":{"hosts":{"terms":{"field":"host","size":2,
        |"split_size":5,"show_term_doc_count_error":true}}}}""".stripMargin)
    assert(got.contains(""""doc_count_error_upper_bound":0,"doc_count":"""))
    // absent flag: buckets carry no per-bucket bound (agg-level one remains)
    val plain = EsAggs.search(docs, resolver,
      """{"aggs":{"hosts":{"terms":{"field":"host","size":2}}}}""")
    assert(!plain.replaceAll("""\],"doc_count_error_upper_bound".*""", "")
      .contains("doc_count_error_upper_bound"))
  }
}
