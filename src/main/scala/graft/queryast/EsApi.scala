package graft.queryast

import org.apache.spark.sql.{Column, DataFrame, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** ES-compatible serve-layer endpoints (VERDICT r2 missing #5) — the thin
  * request/response shells over compute that already exists:
  * `_count`, `_msearch`, `_field_caps`, `_cat/indices`.
  *
  * Reference: quickwit-serve/src/elasticsearch_api/mod.rs:53-72 (route
  * table), rest_handler.rs (es_compat_index_count / es_compat_index_multi_
  * search / es_compat_index_field_capabilities / es_compat_cat_indices).
  *
  * Spark-first note on `_msearch`: the reference fans each sub-search out
  * as an independent query; here a whole msearch batch compiles into ONE
  * aggregate pass (per-query conditional counts) plus one top-k job —
  * every sub-query shares the same table scan.
  */
object EsApi {

  // ---- _count ------------------------------------------------------------
  /** es_compat_index_count: count of docs matching the DSL query (missing
    * query = match_all). */
  def countQuery(df: DataFrame, resolver: FieldResolver, queryJson: Option[String]): Long =
    queryJson.fold(df)(q => df.filter(EsDsl.parse(q).toColumn(resolver))).count()

  def countResponse(n: Long): String =
    s"""{"count":$n,"_shards":{"total":1,"successful":1,"skipped":0,"failed":0}}"""

  // ---- _msearch ----------------------------------------------------------
  /** One msearch batch over one index: per-query (total, top-`size` doc ids
    * by the id sort). All sub-query counts come from a SINGLE aggregate over
    * one scan; hits from one windowed top-k pass. Returns a DataFrame
    * (query_idx, total, top_doc_ids). */
  def msearch(df: DataFrame, resolver: FieldResolver, id: Column,
              queryJsons: Seq[String], size: Int = 10): DataFrame = {
    val preds = queryJsons.map(q => EsDsl.parse(q).toColumn(resolver))
    // (query_idx, matched) pairs per row, filtered to matches — one scan
    val tagged = df.select(id.as("_doc_id"),
      explode(filter(
        array(preds.zipWithIndex.map { case (p, i) =>
          struct(lit(i.toLong).as("query_idx"), p.as("m"))
        }: _*),
        s => s.getField("m"))).as("_q"))
      .select(col("_q.query_idx").as("query_idx"), col("_doc_id"))
    // segment/root top-k per query (collector.rs:383-437 shape): a bounded
    // typed Aggregator keeps ≤2·size ids per (query, map task) as its
    // PARTIAL buffer, so even a match-all sub-query shuffles only k-bounded
    // buffers — never the matched rows themselves (a window/row_number rank
    // would shuffle and sort every matched row first)
    val minK = udaf(new graft.operators.MinKLongsAggregator(size), Encoders.scalaLong)
    val agg = tagged
      .groupBy("query_idx")
      .agg(count(lit(1)).as("total"),
        array_join(transform(
          minK(col("_doc_id")),
          d => d.cast("string")), ",").as("top_doc_ids"))
    // ES answers EVERY sub-search, zero-hit ones included — left-join the
    // query index list so empty queries yield (idx, 0, "")
    df.sparkSession.range(preds.size).select(col("id").as("query_idx"))
      .join(agg, Seq("query_idx"), "left")
      .select(col("query_idx"),
        coalesce(col("total"), lit(0L)).as("total"),
        coalesce(col("top_doc_ids"), lit("")).as("top_doc_ids"))
  }

  // ---- _field_caps ---------------------------------------------------------
  /** es_compat_index_field_capabilities: schema-derived capabilities.
    * text-resolver fields are ES `text` (searchable, not aggregatable);
    * everything else maps to its ES scalar type (searchable + aggregatable
    * — the fast-field analog); arrays report their element type (ES treats
    * every field as multi-valued). */
  def fieldCaps(df: DataFrame, resolver: FieldResolver): Seq[(String, String, Boolean, Boolean)] =
    df.schema.fields.toSeq.map { f =>
      def esType(dt: DataType): String = dt match {
        case StringType => if (resolver.isText(f.name)) "text" else "keyword"
        case LongType | IntegerType | ShortType => "long"
        case DoubleType | FloatType => "double"
        case _: DecimalType => "double"
        case BooleanType => "boolean"
        case TimestampType | TimestampNTZType | DateType => "date"
        case BinaryType => "binary"
        case ArrayType(e, _) => esType(e)
        case _ => "object"
      }
      val t = esType(f.dataType)
      (f.name, t, true, t != "text")
    }

  def fieldCapsResponse(index: String, caps: Seq[(String, String, Boolean, Boolean)]): String = {
    val fields = caps.map { case (name, t, s, a) =>
      s""""$name":{"$t":{"type":"$t","metadata_field":false,"searchable":$s,"aggregatable":$a}}"""
    }.mkString(",")
    s"""{"indices":["$index"],"fields":{$fields}}"""
  }

  // ---- _cat/indices --------------------------------------------------------
  /** es_compat_cat_indices: one row per index with doc count + stored-bytes
    * (from split metadata at the warehouse — here an aggregate per table). */
  def catIndices(indexes: Seq[(String, DataFrame, Column)]): DataFrame =
    indexes.map { case (name, df, bytesCol) =>
      df.agg(count(lit(1)).as("docs_count"),
             coalesce(sum(octet_length(bytesCol).cast("long")), lit(0L)).as("store_bytes"))
        .select(lit(name).as("index"), col("docs_count"), col("store_bytes"))
    }.reduce(_ unionByName _)
}
