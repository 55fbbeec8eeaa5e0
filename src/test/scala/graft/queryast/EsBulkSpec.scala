package graft.queryast

import graft.SparkTestBase
import org.apache.spark.sql.Row

/** ES `_bulk` NDJSON semantics pinned against
  * elasticsearch_api/bulk.rs:79-143 and the BulkAction serde tests
  * (model/bulk_body.rs:55-110). */
class EsBulkSpec extends SparkTestBase {
  import spark.implicits._
  import org.apache.spark.sql.functions.col

  private def parse(body: String, defaultIndex: Option[String] = None): Seq[Row] =
    EsApi.bulkParse(Seq(body).toDF("body"), col("body"), defaultIndex)
      .orderBy("line_no")
      .select("line_no", "action", "index_id", "doc_id", "source", "error")
      .collect().toSeq

  test("index and create actions batch to their _index with doc ids") {
    val body =
      """{ "create" : { "_index" : "test", "_id" : "2" } }
        |{"title": "doc2"}
        |{ "index" : { "_index" : "other", "_id" : "3" } }
        |{"title": "doc3"}""".stripMargin
    val out = parse(body)
    assert(out == Seq(
      Row(0, "create", "test", "2", """{"title": "doc2"}""", null),
      Row(2, "index", "other", "3", """{"title": "doc3"}""", null)))
  }

  test("reference serde cases: optional _id / optional _index (bulk_body.rs:55-101)") {
    val body =
      """{"create": {"_index": "test"}}
        |{"a": 1}
        |{"create": {"_id": "3"}}
        |{"a": 2}""".stripMargin
    val out = parse(body, defaultIndex = Some("dflt"))
    assert(out.map(r => (r.getString(2), r.getString(3))) ==
      Seq(("test", null), ("dflt", "3")))
  }

  test("delete is an unknown variant — as malformed as broken JSON (bulk_body.rs:102-110)") {
    val body =
      """{"delete": {"_index": "test", "_id": "2"}}
        |{"a": 1}
        |{ not json
        |{"a": 2}""".stripMargin
    val out = parse(body, defaultIndex = Some("dflt"))
    assert(out.map(_.getString(5)) == Seq(
      "Malformed action/metadata line [#0].",
      "Malformed action/metadata line [#2]."))
    assert(out.forall(_.getString(2) == null)) // no index routing on errors
  }

  test("blank lines are skipped before pairing and numbering (rest_handler.rs:260-268)") {
    val body = "\n  \n{ \"index\" : { \"_index\" : \"t\" } }\n\n{\"a\": 1}\n   \n"
    val out = parse(body)
    assert(out == Seq(Row(0, "index", "t", null, """{"a": 1}""", null)))
  }

  test("path index is a default, not a constraint (bulk.rs:106-112)") {
    val body =
      """{ "index" : { "_index" : "explicit" } }
        |{"a": 1}
        |{ "index" : { } }
        |{"a": 2}""".stripMargin
    val out = parse(body, defaultIndex = Some("from-path"))
    assert(out.map(_.getString(2)) == Seq("explicit", "from-path"))
  }

  test("missing _index with no default errors; trailing action without source errors") {
    val noIdx = parse("""{ "index" : { } }""" + "\n" + """{"a": 1}""")
    assert(noIdx.head.getString(5) == "missing required field: `_index` in the line [#0].")
    val noSrc = parse("""{ "index" : { "_index" : "t" } }""")
    assert(noSrc.head.getString(5) == "expected source for the action")
  }

  test("bulkCounts batches per index and tallies errors") {
    val body =
      """{ "index" : { "_index" : "a" } }
        |{"x": 1}
        |{ "index" : { "_index" : "a" } }
        |{"x": 2}
        |{ "index" : { "_index" : "b" } }
        |{"x": 3}
        |{ bogus
        |{"x": 4}""".stripMargin
    val out = EsApi.bulkCounts(
        EsApi.bulkParse(Seq(body).toDF("body"), col("body"), None))
      .orderBy("index_id").as[(String, Long)].collect().toSeq
    assert(out == Seq(("(error)", 1L), ("a", 2L), ("b", 1L)))
  }

  test("empty body yields zero actions") {
    assert(parse("").isEmpty)
    assert(parse("\n \n").isEmpty)
  }
}
