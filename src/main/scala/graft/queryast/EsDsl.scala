package graft.queryast

import graft.util.Json
import QueryAst._

/** Elasticsearch-compatible query DSL → QueryAst.
  *
  * Reference: quickwit-query/src/elastic_query_dsl (~1,200 LoC) converts
  * the ES JSON DSL (`query_string`, `bool`, `range`, `match`, `match_phrase`,
  * `match_bool_prefix`, `multi_match`, `term`, `terms`, `exists`,
  * `match_all`/`match_none`, `wildcard`) into the same QueryAst this package
  * compiles to Column predicates — so the DSL layer is pure parsing.
  */
object EsDsl {

  def parse(json: String, defaultFields: Seq[String] = Seq("text")): QueryAst =
    node(Json.parse(json), defaultFields)

  /** Entry for callers that already hold a parsed JSON tree (e.g. the
    * aggregation-request compiler, which parses the full `_search` body
    * once and hands the `query` subtree here). */
  def fromParsed(v: Any, defaultFields: Seq[String] = Seq("text")): QueryAst =
    node(v, defaultFields)

  private type Obj = Map[String, Any]

  private def node(v: Any, df: Seq[String]): QueryAst = {
    val m = v.asInstanceOf[Obj]
    require(m.size == 1, s"expected a single query key, got ${m.keys.mkString(",")}")
    val (kind, body) = m.head
    kind match {
      case "match_all"  => MatchAll
      case "match_none" => MatchNone
      case "bool"       => boolQuery(body.asInstanceOf[Obj], df)
      case "term"       => fieldParam(body) { case (f, p) => Term(f, str(value(p, "value"))) }
      case "terms" =>
        fieldParam(body) { case (f, vs) =>
          TermSet(f, vs.asInstanceOf[Seq[Any]].map(str)) }
      case "exists" => Exists(str(body.asInstanceOf[Obj]("field")))
      case "range" =>
        fieldParam(body) { case (f, p) =>
          val o = p.asInstanceOf[Obj]
          Range(f, gte = o.get("gte"), gt = o.get("gt"), lte = o.get("lte"), lt = o.get("lt")) }
      case "match" =>
        fieldParam(body) { case (f, p) =>
          val (q, op) = p match {
            case o: Obj @unchecked => (str(o("query")), o.getOrElse("operator", "or"))
            case s => (str(s), "or")
          }
          FullText(f, q, if (op == "and") ModeAnd else ModeOr) }
      case "match_phrase" =>
        fieldParam(body) { case (f, p) =>
          val (q, slop) = p match {
            case o: Obj @unchecked =>
              (str(o("query")), o.getOrElse("slop", 0.0).asInstanceOf[Double].toInt)
            case s => (str(s), 0)
          }
          FullText(f, q, ModePhrase(slop)) }
      case "match_bool_prefix" =>
        // match_bool_prefix.rs:38-53 → FullTextMode::BoolPrefix — OR/AND of
        // term queries with only the LAST term as a prefix (NOT a phrase)
        fieldParam(body) { case (f, p) =>
          val (q, op) = p match {
            case o: Obj @unchecked => (str(o("query")), o.getOrElse("operator", "or"))
            case s => (str(s), "or")
          }
          BoolPrefix(f, q, andOperator = op == "and") }
      case "match_phrase_prefix" =>
        // phrase_prefix_query.rs:31-44 → query_ast::PhrasePrefixQuery
        fieldParam(body) { case (f, p) => PhrasePrefix(f, str(value(p, "query"))) }
      case "multi_match" =>
        // multi_match.rs:36-144: type ∈ {most_fields (default), phrase,
        // phrase_prefix}, expanded to the per-field query and UNIONed;
        // `lenient` accepted and ignored (multi_match.rs:30-34); field
        // boosting `^` and wildcard `*` rejected with the reference's
        // error text (multi_match.rs:72-86); fields may be one-or-many.
        val o = body.asInstanceOf[Obj]
        val q = str(o("query"))
        val fields = o.get("fields").map {
          case xs: Seq[Any] @unchecked => xs.map(str)
          case one => Seq(str(one)) // OneOrMany, PreferMany
        }.getOrElse(df)
        fields.foreach { f =>
          require(!f.contains("^"), "Quickwit does not support field boosting in " +
            s"the multi match query fields (got `$f`)")
          require(!f.contains("*"), "Quickwit does not support wildcards in " +
            s"the multi match query fields (got `$f`)")
        }
        val alts: Seq[QueryAst] = o.get("type").map(str).getOrElse("most_fields") match {
          case "most_fields" =>
            val andOp = o.get("operator").map(str).contains("and")
            fields.map(f => FullText(f, q, if (andOp) ModeAnd else ModeOr))
          case "phrase" =>
            val slop = o.get("slop").map(_.asInstanceOf[Double].toInt).getOrElse(0)
            fields.map(f => FullText(f, q, ModePhrase(slop)))
          case "phrase_prefix" =>
            fields.map(f => PhrasePrefix(f, q))
          case other => throw new IllegalArgumentException(
            s"unknown variant `$other`, expected one of `most_fields`, `phrase`, `phrase_prefix`")
        }
        if (alts.size == 1) alts.head else Bool(should = alts)
      case "wildcard" =>
        fieldParam(body) { case (f, p) => Wildcard(f, str(value(p, "value"))) }
      case "query_string" =>
        // query_string_query.rs:24-40: default_field XOR fields (both set is
        // an error, rs:26-28); default_operator defaults to OR — the ES
        // BooleanOperand serde default (lib.rs:53-59) — unlike the quickwit
        // query-language endpoint, whose default is AND.
        val o = body.asInstanceOf[Obj]
        require(!(o.contains("default_field") && o.contains("fields")),
          "fields and default_field cannot be both set in `query_string` queries")
        val fields = o.get("default_field").map(f => Seq(str(f)))
          .orElse(o.get("fields").map(_.asInstanceOf[Seq[Any]].map(str)))
          .getOrElse(df)
        val andOp = o.get("default_operator").map(str).exists {
          case "and" | "AND" => true
          case "or" | "OR"   => false
          case other => throw new IllegalArgumentException(
            s"unknown variant `$other`, expected `and` or `or`")
        }
        UserQueryParser.parse(str(o("query")), fields, defaultAnd = andOp)
      case "boost" =>
        val o = body.asInstanceOf[Obj]
        Boost(node(o("query"), df), o.getOrElse("value", 1.0).asInstanceOf[Double])
      case other => throw new IllegalArgumentException(s"unsupported ES query kind: $other")
    }
  }

  private def boolQuery(o: Obj, df: Seq[String]): QueryAst = {
    def clauses(key: String): Seq[QueryAst] = o.get(key) match {
      case None => Nil
      case Some(xs: Seq[Any] @unchecked) => xs.map(node(_, df))
      case Some(one) => Seq(node(one, df))
    }
    Bool(must = clauses("must"), mustNot = clauses("must_not"),
      should = clauses("should"), filterQ = clauses("filter"))
  }

  /** `{"field": <param>}` single-entry objects used by term/match/etc. */
  private def fieldParam(body: Any)(f: (String, Any) => QueryAst): QueryAst = {
    val m = body.asInstanceOf[Obj]
    require(m.size == 1, s"expected one field, got ${m.keys.mkString(",")}")
    f(m.head._1, m.head._2)
  }

  /** Accept both `{"value": x}` objects and bare values. Object form MUST
    * carry the expected key — a typo'd parameter is a parse error, mirroring
    * the reference DSL's strict deserialization (not a silent stringify). */
  private def value(p: Any, key: String): Any = p match {
    case o: Obj @unchecked =>
      o.getOrElse(key, throw new IllegalArgumentException(
        s"expected parameter '$key', got {${o.keys.mkString(",")}}"))
    case other => other
  }

  private def str(v: Any): String = v match {
    case s: String => s
    case d: Double => if (d == d.toLong) d.toLong.toString else d.toString
    case b: Boolean => b.toString
    case other => String.valueOf(other)
  }
}
