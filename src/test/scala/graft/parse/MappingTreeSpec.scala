package graft.parse

import graft.SparkTestBase
import graft.parse.MappingTree._
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

/** Golden tests replicating the reference doc-mapper's parse fixtures:
  * default_mapper.rs:666-712 (example doc → expected paths/values incl.
  * the dynamic field), mapping_tree.rs:889-1000 (numeric coercion matrix),
  * and the mode/error variants. */
class MappingTreeSpec extends SparkTestBase {

  /** default_doc_mapper_for_test analog (lib.rs:94-174). */
  private val goldenMapping = DocMapping(Seq(
    Leaf("timestamp", TDateTime(Seq("unix_timestamp"))),
    Leaf("body", TText),
    Leaf("response_date", TDateTime(Seq("rfc3339", "unix_timestamp"))),
    Leaf("response_time", TF64),
    Leaf("response_payload", TBytes()),
    Leaf("owner", TText),
    Leaf("isImportant", TBool),
    Leaf("properties", TJson),
    Leaf("children", TJson, multi = true),
    Node("attributes", Seq(
      Leaf("tags", TI64, multi = true),
      Leaf("server", TText),
      Leaf("server.status", TText, multi = true),
      Leaf("server.payload", TBytes(), multi = true)))),
    mode = Dynamic, storeSource = true)

  /** example_json_doc_value (default_mapper.rs:666-682). */
  private val goldenDoc =
    """{
      |  "timestamp": 1586960586,
      |  "body": "20200415T072306-0700 INFO This is a great log",
      |  "response_date2": "2021-12-19T16:39:57+00:00",
      |  "response_date": "2021-12-19T16:39:57Z",
      |  "response_time": 2.3,
      |  "response_payload": "YWJj",
      |  "owner": "foo",
      |  "isImportant": false,
      |  "attributes": {
      |    "server": "ABC",
      |    "tags": [22, 23],
      |    "server.status": ["200", "201"],
      |    "server.payload": ["YQ==", "Yg=="]
      |  }
      |}""".stripMargin.replace("\n", "")

  private def parseOne(doc: String, m: DocMapping): Row = {
    import spark.implicits._
    MappingTree.parse(Seq(doc).toDF("json"), col("json"), m).collect()(0)
  }

  test("golden parse: the reference example doc, every expected path and value") {
    val r = parseOne(goldenDoc, goldenMapping)
    assert(r.getAs[java.sql.Timestamp]("timestamp").toInstant.toString
      === "2020-04-15T14:23:06Z") // unix secs inferred
    assert(r.getAs[String]("body") === "20200415T072306-0700 INFO This is a great log")
    assert(r.getAs[java.sql.Timestamp]("response_date").toInstant.toString
      === "2021-12-19T16:39:57Z")
    assert(r.getAs[Double]("response_time") === 2.3)
    assert(new String(r.getAs[Array[Byte]]("response_payload")) === "abc")
    assert(r.getAs[String]("owner") === "foo")
    assert(r.getAs[Boolean]("isImportant") === false)
    assert(r.getAs[Any]("properties") === null) // absent json leaf
    assert(r.getAs[Any]("children") === null)
    assert(r.getAs[String]("attributes.server") === "ABC")
    assert(r.getAs[scala.collection.Seq[Long]]("attributes.tags") === Seq(22L, 23L))
    assert(r.getAs[scala.collection.Seq[String]]("attributes.server\\.status")
      === Seq("200", "201"))
    assert(r.getAs[scala.collection.Seq[Array[Byte]]]("attributes.server\\.payload")
      .map(new String(_)) === Seq("a", "b"))
    // the one unmapped field lands in the dynamic doc (value verbatim —
    // the reference's fast-path datetime re-rendering is a documented
    // divergence)
    assert(r.getAs[String]("dynamic_json")
      === """{"response_date2":"2021-12-19T16:39:57+00:00"}""")
    assert(r.getAs[String]("_source") === goldenDoc)
    assert(r.getAs[Any]("parse_error_kind") === null)
  }

  test("docToJson: parse → back-projection round-trip (populate_json analog)") {
    import spark.implicits._
    val rendered = MappingTree.parse(Seq(goldenDoc).toDF("json"), col("json"), goldenMapping)
      .select(MappingTree.docToJson(goldenMapping).as("out"))
      .collect()(0).getString(0)
    // value_to_json formats: datetime rfc3339 UTC, bytes base64, numbers
    // plain; absent leaves (properties, children) omitted; dotted names
    // stay literal keys inside attributes; mapping declaration order
    assert(rendered ===
      """{"timestamp":"2020-04-15T14:23:06Z",""" +
      """"body":"20200415T072306-0700 INFO This is a great log",""" +
      """"response_date":"2021-12-19T16:39:57Z",""" +
      """"response_time":2.3,""" +
      """"response_payload":"YWJj",""" +
      """"owner":"foo",""" +
      """"isImportant":false,""" +
      """"attributes":{"tags":[22,23],"server":"ABC",""" +
      """"server.status":["200","201"],"server.payload":["YQ==","Yg=="]}}""")
  }

  test("doc mapper runs unchanged in Structured Streaming (pure column exprs)") {
    // the indexing pipeline's streaming path can parse with the SAME
    // mapping compiler — no state, no aggregation, so the projection
    // composes with readStream like any narrow transform
    import spark.implicits._
    val in = tmpDir("mt_stream_in"); val out = tmpDir("mt_stream_out")
    val cp = tmpDir("mt_stream_cp")
    val docs = Seq(
      """{"owner":"a","response_time":1.5}""",
      """{"owner":"b","response_time":"2.5"}""", // coerced
      "not json")
    docs.toDF("json").write.mode("overwrite").parquet(in)
    val stream = spark.readStream.schema("json STRING").parquet(in)
    MappingTree.parse(stream, col("json"), goldenMapping)
      .select(col("owner"), col("response_time"), col("parse_error_kind"))
      .writeStream.format("parquet").option("path", out)
      .option("checkpointLocation", cp)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
      .awaitTermination()
    val got = spark.read.parquet(out)
      .collect().map(r => (r.getAs[String]("owner"), r.getAs[Any]("response_time"),
        r.getAs[String]("parse_error_kind"))).toSet
    assert(got === Set(("a", 1.5, null), ("b", 2.5, null),
      (null, null, "json_parse_error")))
  }

  test("numeric coercion matrix (mapping_tree.rs:889-1000)") {
    def one(doc: String, typ: LeafType, coerce: Boolean = true): (Any, Any) = {
      val r = parseOne(doc, DocMapping(Seq(Leaf("n", typ, coerce = coerce))))
      (r.getAs[Any]("n"), r.getAs[Any]("parse_error_kind"))
    }
    // u64: number ok, string coerced, bad string errors, coerce off errors
    assert(one("""{"n":20}""", TU64) ===
      ((new java.math.BigDecimal(20), null)))
    assert(one("""{"n":"20"}""", TU64)._1 === new java.math.BigDecimal(20))
    assert(one("""{"n":"foo"}""", TU64)._2 === "value_error")
    assert(one("""{"n":"20"}""", TU64, coerce = false)._2 === "value_error")
    // u64 negative rejected; u64::MAX accepted
    assert(one("""{"n":-20}""", TU64)._2 === "value_error")
    assert(one("""{"n":18446744073709551615}""", TU64)._1
      === new java.math.BigDecimal("18446744073709551615"))
    // i64: u64::MAX too large; floats (incl. x.0) are not integers
    assert(one("""{"n":18446744073709551615}""", TI64)._2 === "value_error")
    assert(one("""{"n":20.2}""", TI64)._2 === "value_error")
    assert(one("""{"n":2.0}""", TI64)._2 === "value_error")
    assert(one("""{"n":20}""", TI64) === ((20L, null)))
    // f64 takes integers
    assert(one("""{"n":4000}""", TF64) === ((4000.0, null)))
  }

  test("null leaves are ignored; arrays only at multi-valued leaves; scalar at multi ok") {
    val single = DocMapping(Seq(Leaf("b", TBool)))
    assert(parseOne("""{"b":null}""", single).getAs[Any]("parse_error_kind") === null)
    val r = parseOne("""{"b":[true,false,true]}""", single)
    assert(r.getAs[Any]("parse_error_kind") === "multi_values_not_supported")
    assert(r.getAs[Any]("parse_error_field") === "b")
    val multi = DocMapping(Seq(Leaf("b", TBool, multi = true)))
    assert(parseOne("""{"b":[true,false,true]}""", multi)
      .getAs[scala.collection.Seq[Boolean]]("b") === Seq(true, false, true))
    // nulls inside arrays skipped (mapping_tree.rs:127-131)
    assert(parseOne("""{"b":[true,null,false]}""", multi)
      .getAs[scala.collection.Seq[Boolean]]("b") === Seq(true, false))
    assert(parseOne("""{"b":true}""", multi)
      .getAs[scala.collection.Seq[Boolean]]("b") === Seq(true))
  }

  test("modes: lenient ignores, strict errors no_such_field, dynamic captures nested") {
    val m = Seq(Node("attributes", Seq(Leaf("server", TText))), Leaf("a", TI64))
    val doc = """{"a":1,"other":7,"attributes":{"server":"x","extra1":{"deep":true}}}"""
    assert(parseOne(doc, DocMapping(m, Lenient)).getAs[Any]("parse_error_kind") === null)
    val strict = parseOne(doc, DocMapping(m, Strict))
    assert(strict.getAs[String]("parse_error_kind") === "no_such_field")
    assert(strict.getAs[String]("parse_error_field") === "other")
    // nested unmapped path in strict names the full path
    val strictNested = parseOne("""{"a":1,"attributes":{"server":"x","bad":1}}""",
      DocMapping(m, Strict))
    assert(strictNested.getAs[String]("parse_error_field") === "attributes.bad")
    val dyn = parseOne(doc, DocMapping(m, Dynamic))
    assert(dyn.getAs[String]("dynamic_json")
      === """{"other":7,"attributes":{"extra1":{"deep":true}}}""")
    // nothing unmapped → null dynamic doc
    assert(parseOne("""{"a":1}""", DocMapping(m, Dynamic)).getAs[Any]("dynamic_json") === null)
  }

  test("object nodes reject non-objects; doc-level errors") {
    val m = DocMapping(Seq(Node("attributes", Seq(Leaf("server", TText)))))
    val r = parseOne("""{"attributes":5}""", m)
    assert(r.getAs[String]("parse_error_kind") === "value_error")
    assert(r.getAs[String]("parse_error_field") === "attributes")
    assert(parseOne("not json at all", m).getAs[String]("parse_error_kind") === "json_parse_error")
    assert(parseOne("""[1,2]""", m).getAs[String]("parse_error_kind") === "not_json_object")
  }

  test("ip, bytes, text and json leaf dispatch") {
    val m = DocMapping(Seq(Leaf("ip", TIpAddr), Leaf("t", TText), Leaf("j", TJson)))
    val r = parseOne("""{"ip":"127.0.0.1","t":"x","j":{"a":1}}""", m)
    assert(r.getAs[String]("ip") === "::ffff:127.0.0.1")
    assert(r.getAs[String]("j") === """{"a":1}""")
    assert(parseOne("""{"ip":"999.1.1.1"}""", m).getAs[String]("parse_error_kind") === "value_error")
    // text leaf rejects numbers (mapping_tree.rs:60-66)
    assert(parseOne("""{"t":42}""", m).getAs[String]("parse_error_kind") === "value_error")
    // an array at any single-valued leaf is the cardinality error — the
    // reference checks arrays BEFORE type dispatch (mapping_tree.rs:123-126)
    assert(parseOne("""{"j":[1]}""", m).getAs[String]("parse_error_kind")
      === "multi_values_not_supported")
    // json leaf rejects non-object scalars
    assert(parseOne("""{"j":7}""", m).getAs[String]("parse_error_kind") === "value_error")
    // invalid base64 errors
    assert(parseOne("""{"p":"no!!"}""", DocMapping(Seq(Leaf("p", TBytes()))))
      .getAs[String]("parse_error_kind") === "value_error")
  }

  test("first error in mapping-declaration order wins") {
    val m = DocMapping(Seq(Leaf("a", TI64), Leaf("b", TBool)))
    val r = parseOne("""{"b":"notbool","a":"notint"}""", m)
    assert(r.getAs[String]("parse_error_field") === "a")
  }
}
