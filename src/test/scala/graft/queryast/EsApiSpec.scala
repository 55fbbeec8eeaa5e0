package graft.queryast

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** ES serve-layer shells: response shapes + msearch single-scan batching
  * semantics (elasticsearch_api/mod.rs:53-72 route behaviors). */
class EsApiSpec extends SparkTestBase {

  private val resolver = FieldResolver(textFields = Set("text"), defaultFields = Seq("text"))

  private def docs = {
    import spark.implicits._
    Seq(
      (1L, "spark joins fast", "en"),
      (2L, "vector search", "en"),
      (3L, "nichts hier", "de")
    ).toDF("doc_id", "text", "lang")
  }

  test("_count: DSL query filter; match_all when absent") {
    assert(EsApi.countQuery(docs, resolver, Some("""{"term": {"lang": "en"}}""")) === 2L)
    assert(EsApi.countQuery(docs, resolver, None) === 3L)
    assert(EsApi.countResponse(2L) ===
      """{"count":2,"_shards":{"total":1,"successful":1,"skipped":0,"failed":0}}""")
  }

  test("_msearch: every sub-search answered, zero-hit ones as (0, empty)") {
    val rows = EsApi.msearch(docs, resolver, col("doc_id"), Seq(
        """{"match": {"text": "spark"}}""",
        """{"match": {"text": "nothing_matches_this"}}""",
        """{"term": {"lang": "en"}}"""), size = 10)
      .orderBy("query_idx")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSeq
    assert(rows === Seq((0L, 1L, "1"), (1L, 0L, ""), (2L, 2L, "1,2")))
  }

  test("_msearch: top_doc_ids capped at size") {
    import spark.implicits._
    val big = (1L to 25L).map(i => (i, "common token", "en")).toDF("doc_id", "text", "lang")
    val r = EsApi.msearch(big, resolver, col("doc_id"),
      Seq("""{"match": {"text": "common"}}"""), size = 3).collect()(0)
    assert(r.getLong(1) === 25L)
    assert(r.getString(2) === "1,2,3")
  }

  test("_field_caps: text fields searchable-only, scalars aggregatable") {
    val caps = EsApi.fieldCaps(docs, resolver).toMap2
    assert(caps("text") === (("text", true, false)))
    assert(caps("lang") === (("keyword", true, true)))
    assert(caps("doc_id") === (("long", true, true)))
    val resp = EsApi.fieldCapsResponse("documents", EsApi.fieldCaps(docs, resolver))
    assert(resp.contains(""""indices":["documents"]"""))
    assert(resp.contains(""""text":{"text":{"type":"text","metadata_field":false,"searchable":true,"aggregatable":false}}"""))
  }

  private implicit class CapsOps(caps: Seq[(String, String, Boolean, Boolean)]) {
    def toMap2: Map[String, (String, Boolean, Boolean)] =
      caps.map { case (f, t, s, a) => f -> ((t, s, a)) }.toMap
  }

  test("_cat/indices: per-index doc count and stored bytes") {
    import spark.implicits._
    val other = Seq((1L, "xy")).toDF("id", "event_type")
    val rows = EsApi.catIndices(Seq(
        ("documents", docs, col("text")), ("other", other, col("event_type"))))
      .orderBy("index")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(rows === Seq(("documents", 3L, 40L), ("other", 1L, 2L)))
  }
}
