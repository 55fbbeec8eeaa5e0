package graft.queryast

import graft.operators.{Aggs, DdSketch, EsAggResponse => R}
import graft.util.Json
import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.ArrayType

/** ES aggregation-REQUEST compiler: the `aggs` body of a `_search` request
  * → one Spark aggregation plan per top-level aggregation → the ES JSON
  * response body (rendering shared with [[graft.operators.EsAggResponse]]).
  *
  * This is the request side of the reference's aggregation path: the ES
  * handler deserializes `aggs` into tantivy's aggregation tree and runs it
  * against each split, merging intermediate results at the root
  * (quickwit-search/src/root.rs:897-945). The supported variant set — and
  * the exact unknown-variant error text — mirror the reference
  * (root.rs:3513-3517: `range`, `histogram`, `date_histogram`, `terms`,
  * `avg`, `value_count`, `max`, `min`, `stats`, `sum`, `percentiles`).
  *
  * Plan shape per bucket aggregation: ONE `groupBy` over the bucket-key
  * chain computes `doc_count` and EVERY non-percentile metric sub-agg in a
  * single two-phase HashAggregate (partials map-side, only group cells
  * shuffle). `percentiles` subs add one extra aggregation over
  * (bucket-keys, sketch-bin) — the DDSketch state IS that histogram (see
  * [[graft.operators.DdSketch]]), so merging is count-sum and the estimate
  * is bit-exact with the reference's golden values. Nested bucket aggs
  * recurse with the parent keys prepended to the grouping chain: depth-L
  * nesting costs L shuffles, each partially aggregated, and per-parent
  * truncation for nested `terms` runs as a window over the per-parent TERM
  * HISTOGRAM (the same bounded state tantivy keeps per bucket), never over
  * rows. Top-level `terms` keeps the TakeOrdered + single-row-total shape
  * of [[Aggs.terms]].
  *
  * Terms tie-break: the reference orders equal-count terms by key
  * DESCENDING (0001-aggregations.yaml:108-124: hosts 192.168.0.15 before
  * 192.168.0.11 at doc_count 1) — tantivy compares the full (count, key)
  * tuple under the requested direction — unlike ES-proper's documented
  * key-asc tie. This compiler follows the reference.
  */
object EsAggs {

  // ------------------------------------------------------------------ AST

  sealed trait Agg
  sealed trait Bucket extends Agg
  final case class Terms(field: String, size: Int, minDocCount: Long,
                         orderTarget: String, orderAsc: Boolean,
                         showError: Boolean = false) extends Bucket
  final case class Histogram(field: String, interval: Double, offset: Double,
                             minDocCount: Long,
                             hardBounds: Option[(Double, Double)],
                             extendedBounds: Option[(Double, Double)],
                             keyed: Boolean = false) extends Bucket
  final case class DateHistogram(field: String, fixedInterval: String,
                                 offset: String,
                                 keyed: Boolean = false) extends Bucket
  final case class RangeB(field: String, ranges: Seq[R.RangeSpec]) extends Bucket

  sealed trait Metric extends Agg { def field: String }
  final case class Avg(field: String) extends Metric
  final case class Sum(field: String) extends Metric
  final case class Min(field: String) extends Metric
  final case class Max(field: String) extends Metric
  final case class ValueCount(field: String) extends Metric
  final case class Stats(field: String) extends Metric
  final case class Percentiles(field: String, percents: Seq[Double],
                               keyed: Boolean) extends Metric

  final case class Node(name: String, agg: Agg, subs: Seq[Node])

  private val Supported = Seq("range", "histogram", "date_histogram", "terms",
    "avg", "value_count", "max", "min", "stats", "sum", "percentiles")

  /** tantivy's percents default when omitted (aggregation.md:855). */
  val DefaultPercents: Seq[Double] = Seq(1, 5, 25, 50, 75, 95, 99)

  // -------------------------------------------------------------- parsing

  private type Obj = Map[String, Any]

  def parse(aggsJson: String): Seq[Node] = parseAggs(Json.parse(aggsJson))

  def parseAggs(v: Any): Seq[Node] = v.asInstanceOf[Obj].toSeq.map {
    case (name, bodyAny) =>
      val body = bodyAny.asInstanceOf[Obj]
      val subs = body.get("aggs").orElse(body.get("aggregations"))
        .map(parseAggs).getOrElse(Nil)
      val kinds = (body.keySet -- Set("aggs", "aggregations")).toSeq
      require(kinds.size == 1,
        s"invalid aggregation request: aggregation `$name` must have exactly one kind, got ${kinds.sorted.mkString(", ")}")
      val kind = kinds.head
      val p = body(kind).asInstanceOf[Obj]
      def fld = p("field").asInstanceOf[String]
      def dbl(k: String, dflt: Double) = p.get(k).map(_.asInstanceOf[Double]).getOrElse(dflt)
      val agg: Agg = kind match {
        case "terms" =>
          // order: {"_count"|"_key": "asc"|"desc"}; default _count desc
          val (target, asc) = p.get("order").map { o =>
            val (t, dir) = o.asInstanceOf[Obj].head
            (t, dir == "asc")
          }.getOrElse(("_count", false))
          // split_size is an ACCURACY knob for truncated leaves
          // (aggregation.md:527-532); this engine computes terms exactly
          // (Aggs.terms rollup), so it is accepted and has no effect —
          // 0 error bounds are the truthful exact-case values.
          // show_term_doc_count_error adds the per-bucket bound field.
          Terms(fld, dbl("size", 10).toInt, dbl("min_doc_count", 1).toLong, target, asc,
            p.get("show_term_doc_count_error").exists(_.asInstanceOf[Boolean]))
        case "histogram" =>
          def bounds(k: String): Option[(Double, Double)] = p.get(k).map { b =>
            val o = b.asInstanceOf[Obj]
            (o("min").asInstanceOf[Double], o("max").asInstanceOf[Double])
          }
          Histogram(fld, p("interval").asInstanceOf[Double], dbl("offset", 0.0),
            dbl("min_doc_count", 0).toLong, bounds("hard_bounds"), bounds("extended_bounds"),
            p.get("keyed").exists(_.asInstanceOf[Boolean]))
        case "date_histogram" =>
          DateHistogram(fld, p("fixed_interval").asInstanceOf[String],
            p.get("offset").map(_.asInstanceOf[String]).getOrElse("0ms"),
            p.get("keyed").exists(_.asInstanceOf[Boolean]))
        case "range" =>
          val ranges = p("ranges").asInstanceOf[Seq[Any]].map { rAny =>
            val o = rAny.asInstanceOf[Obj]
            val from = o.get("from").map(_.asInstanceOf[Double])
            val to = o.get("to").map(_.asInstanceOf[Double])
            val key = o.get("key").map(_.asInstanceOf[String]).getOrElse(
              s"${from.map(_.toString).getOrElse("*")}-${to.map(_.toString).getOrElse("*")}")
            R.RangeSpec(key, from, to)
          }
          RangeB(fld, ranges)
        case "avg"         => Avg(fld)
        case "sum"         => Sum(fld)
        case "min"         => Min(fld)
        case "max"         => Max(fld)
        case "value_count" => ValueCount(fld)
        case "stats"       => Stats(fld)
        case "percentiles" =>
          val ps = p.get("percents").map(_.asInstanceOf[Seq[Any]].map(_.asInstanceOf[Double]))
            .getOrElse(DefaultPercents)
          Percentiles(fld, ps, p.get("keyed").forall(_.asInstanceOf[Boolean]))
        case other =>
          // root.rs:3513-3517 error shape
          throw new IllegalArgumentException(
            "invalid aggregation request: unknown variant `" + other +
              "`, expected one of " + Supported.map(s => s"`$s`").mkString(", "))
      }
      agg match {
        case _: Metric => require(subs.isEmpty,
          s"invalid aggregation request: metric aggregation `$name` cannot have sub-aggregations")
        case _ =>
      }
      Node(name, agg, subs)
  }

  // ------------------------------------------------------------ execution

  /** Full `_search`-body aggregation execution: optional `query` filter via
    * the ES DSL, then each top-level agg, rendered as the
    * `{"aggregations": ...}` envelope. */
  def search(df: DataFrame, resolver: FieldResolver, requestJson: String): String = {
    val m = Json.parse(requestJson).asInstanceOf[Obj]
    val filtered = m.get("query").map { q =>
      df.filter(EsDsl.fromParsed(q, resolver.defaultFields).toColumn(resolver))
    }.getOrElse(df)
    val nodes = m.get("aggs").orElse(m.get("aggregations")).map(parseAggs).getOrElse(Nil)
    R.response(run(filtered, nodes))
  }

  /** name → rendered JSON body for each top-level aggregation. */
  def run(df: DataFrame, nodes: Seq[Node],
          bucketLimit: Int = DefaultBucketLimit): Seq[(String, String)] = {
    val counter = new BucketCounter(bucketLimit)
    nodes.map {
      case Node(name, m: Metric, _) => name -> topMetric(df, m)
      case n @ Node(name, _: Bucket, _) =>
        name -> bucketBodies(df, n, Nil, counter).getOrElse(Seq.empty[Any], emptyBucketBody(n))
    }
  }

  private def vcol(f: String): Column = col(f).cast("double")

  private def topMetric(df: DataFrame, m: Metric): String = m match {
    case Percentiles(f, ps, keyed) =>
      val bins = DdSketch.binsByGroup(df, lit(0), vcol(f)).collect().toSeq
        .map(r => DdSketch.Bin(r.getAs[Int]("store"), r.getAs[Int]("key"), r.getAs[Long]("cnt")))
      percentilesBody(ps, ps.map(p => DdSketch.quantile(bins, p / 100.0)), keyed)
    case _ =>
      val exprs = metricExprs(0, m)
      metricBody(0, m, df.agg(exprs.head, exprs.tail: _*).collect().head, Nil)
  }

  /** One metric sub-agg → prefixed aggregate expressions for the shared
    * bucket groupBy (percentiles excluded: sketch pass). */
  private def metricExprs(i: Int, m: Metric): Seq[Column] = m match {
    case Avg(f)        => Seq(avg(vcol(f)).as(s"_m$i"))
    case Sum(f)        => Seq(coalesce(sum(vcol(f)), lit(0.0)).as(s"_m$i"))
    case Min(f)        => Seq(min(vcol(f)).as(s"_m$i"))
    case Max(f)        => Seq(max(vcol(f)).as(s"_m$i"))
    case ValueCount(f) => Seq(count(vcol(f)).as(s"_m$i"))
    case Stats(f)      => Seq(count(vcol(f)).as(s"_m${i}_count"),
                              min(vcol(f)).as(s"_m${i}_min"), max(vcol(f)).as(s"_m${i}_max"),
                              coalesce(sum(vcol(f)), lit(0.0)).as(s"_m${i}_sum"),
                              avg(vcol(f)).as(s"_m${i}_avg"))
    case _: Percentiles => Nil
  }

  private def metricBody(i: Int, m: Metric, r: Row, bins: Seq[DdSketch.Bin]): String = m match {
    case _: Avg | _: Min | _: Max =>
      R.singleValue(Option(r.getAs[Any](s"_m$i")).map(_.asInstanceOf[Double]))
    case _: Sum        => R.singleValue(Some(r.getAs[Double](s"_m$i")))
    case _: ValueCount => R.valueCount(r.getAs[Long](s"_m$i"))
    case _: Stats =>
      val c = r.getAs[Long](s"_m${i}_count")
      R.statsValues(c,
        Option(r.getAs[Any](s"_m${i}_min")).map(_.asInstanceOf[Double]),
        Option(r.getAs[Any](s"_m${i}_max")).map(_.asInstanceOf[Double]),
        r.getAs[Double](s"_m${i}_sum"),
        Option(r.getAs[Any](s"_m${i}_avg")).map(_.asInstanceOf[Double]))
    case Percentiles(_, ps, keyed) =>
      percentilesBody(ps, ps.map(p => DdSketch.quantile(bins, p / 100.0)), keyed)
  }

  private def emptyMetricBody(m: Metric): String = m match {
    case _: Avg | _: Min | _: Max => R.singleValue(None)
    case _: Sum                   => R.singleValue(Some(0.0))
    case _: ValueCount            => R.valueCount(0L)
    case _: Stats                 => R.statsValues(0L, None, None, 0.0, None)
    case Percentiles(_, ps, keyed) => percentilesBody(ps, ps.map(_ => None), keyed)
  }

  private def percentilesBody(ps: Seq[Double], vs: Seq[Option[Double]], keyed: Boolean): String = {
    def v(o: Option[Double]) = o.map(R.num).getOrElse("null")
    if (keyed)
      s"""{"values":{${ps.zip(vs).map { case (p, o) => s"${R.esc(R.num(p))}:${v(o)}" }.mkString(",")}}}"""
    else
      s"""{"values":[${ps.zip(vs).map { case (p, o) => s"""{"key":${R.num(p)},"value":${v(o)}}""" }.mkString(",")}]}"""
  }

  /** Bucket-key source frame + key expression; working columns are
    * depth-suffixed so nested same-type buckets never collide. */
  private def prepare(df: DataFrame, b: Bucket, depth: Int): (DataFrame, Column) = b match {
    case Terms(f, _, _, _, _, _) =>
      val isArr = df.schema(f).dataType.isInstanceOf[ArrayType]
      val tk = s"_t$depth"
      val d2 = if (isArr) df.withColumn(tk, explode(col(f))) else df.withColumn(tk, col(f))
      (d2.filter(col(tk).isNotNull), col(tk))
    case Histogram(f, interval, offset, _, hb, _, _) =>
      val v = vcol(f)
      val clipped = hb.fold(df.filter(v.isNotNull)) { case (lo, hi) =>
        df.filter(v.isNotNull && v >= lo && v <= hi)
      }
      (clipped, floor((v - offset) / interval) * interval + offset)
    case DateHistogram(f, ivl, off, _) =>
      (df.filter(col(f).isNotNull), Aggs.dateHistogramKey(col(f), ivl, off))
    case RangeB(f, ranges) =>
      val v = vcol(f)
      val label = ranges.foldLeft(when(lit(false), lit(""))) { case (acc, rs) =>
        val cond = (rs.from.map(v >= _) ++ rs.to.map(v < _))
          .reduceOption(_ && _).getOrElse(lit(true))
        acc.when(cond, lit(rs.key))
      }
      (df.filter(v.isNotNull && label.isNotNull).withColumn(s"_r$depth", label), col(s"_r$depth"))
  }

  /** Cross-type ordering for collected bucket keys (driver-side, over the
    * ≤ response-sized kept buckets only). */
  private val keyOrd: Ordering[Any] = (a: Any, b: Any) => (a, b) match {
    case (x: String, y: String) => x.compareTo(y)
    case (x: java.sql.Timestamp, y: java.sql.Timestamp) => x.compareTo(y)
    case (x: java.time.LocalDateTime, y: java.time.LocalDateTime) => x.compareTo(y)
    case (x: Number, y: Number) => java.lang.Double.compare(x.doubleValue, y.doubleValue)
    case _ => 0
  }

  /** Recursive bucket execution: returns parent-key-path → rendered body.
    * `pathNames` are the `_k<d>` grouping columns of enclosing buckets
    * (empty at top level). */
  /** Cumulative bucket counter — the AggregationLimits guard the reference
    * wires into every segment collector (collector.rs:562,860-894; node
    * config default `aggregation_bucket_limit: 65000`,
    * quickwit-config/src/node_config/mod.rs:198,220). Enforced at each
    * collect of bucket cells, cumulatively across the whole agg tree, so a
    * high-cardinality terms/histogram request fails fast instead of
    * OOMing the driver — same role the limit plays for the reference's
    * searcher memory. */
  final class BucketCounter(limit: Int) {
    private var n = 0
    /** How many more buckets may be collected (≥0). */
    def remaining: Int = math.max(0, limit - n)
    def add(k: Int): Unit = {
      n += k
      if (n > limit) throw new IllegalArgumentException(
        s"Aborting aggregation because bucket limit was reached (limit: $limit)")
    }
  }
  val DefaultBucketLimit = 65000 // node_config/mod.rs:220

  private def bucketBodies(df: DataFrame, node: Node,
                           pathNames: Seq[String],
                           counter: BucketCounter): Map[Seq[Any], String] = {
    val bucket = node.agg.asInstanceOf[Bucket]
    val depth = pathNames.size
    val kName = s"_k$depth"
    val (src, keyExpr) = prepare(df, bucket, depth)
    val keyed = src.withColumn(kName, keyExpr)
    val groupCols = (pathNames :+ kName).map(col)

    val metricSubs = node.subs.zipWithIndex.collect {
      case (Node(nm, m: Metric, _), i) => (nm, m, i)
    }
    val aggExprs = count(lit(1)).as("_dc") +:
      metricSubs.flatMap { case (_, m, i) => metricExprs(i, m) }

    // terms truncation/order; other buckets keep every non-empty cell
    val (keptFrame, totals: Map[Seq[Any], Long]) = bucket match {
      case Terms(_, size, minDoc, target, asc, _) =>
        // ONE rollup aggregate computes the per-term cells AND the
        // per-parent totals that sum_other_doc_count needs (same shape as
        // Aggs.terms, VERDICT r1): grouping_id 0 = (parents..., term) cell,
        // 1 = (parents...) total with the term rolled up. Term keys are
        // non-null by construction (prepare filters), so the gid is
        // unambiguous.
        val g = keyed.rollup(groupCols: _*)
          .agg(aggExprs.head, (aggExprs.tail :+ grouping_id().as("_gid")): _*)
        val cells = g.filter(col("_gid") === 0 && col("_dc") >= minDoc)
        val ord: Seq[Column] = target match {
          case "_count" =>
            if (asc) Seq(col("_dc").asc, col(kName).asc) else Seq(col("_dc").desc, col(kName).desc)
          case "_key" => Seq(if (asc) col(kName).asc else col(kName).desc)
          case other => throw new IllegalArgumentException(
            s"invalid aggregation request: unknown terms order target `$other`")
        }
        val kept =
          if (pathNames.isEmpty) cells.orderBy(ord: _*).limit(size) // TakeOrdered
          else { // per-parent window over the term HISTOGRAM (bounded)
            val w = Window.partitionBy(pathNames.map(col): _*).orderBy(ord: _*)
            cells.withColumn("_rk", row_number().over(w))
              .filter(col("_rk") <= size).drop("_rk")
          }
        val tots = g.filter(col("_gid") === 1).collect().toSeq.map { r =>
          (0 until pathNames.size).map(r.get).toSeq -> r.getAs[Long]("_dc")
        }.toMap
        (kept, tots)
      case _ =>
        (keyed.groupBy(groupCols: _*).agg(aggExprs.head, aggExprs.tail: _*),
          Map.empty[Seq[Any], Long])
    }

    // percentile subs: one (path, key, sketch-bin) aggregation each
    val pctBins: Map[Int, Map[Seq[Any], Seq[DdSketch.Bin]]] =
      metricSubs.collect { case (_, Percentiles(f, _, _), i) =>
        val v = vcol(f)
        val rows = keyed.filter(v.isNotNull)
          .groupBy(groupCols :+ DdSketch.storeCol(v).as("_st") :+ DdSketch.keyCol(v).as("_dk"): _*)
          .agg(count(lit(1)).as("_c")).collect().toSeq
        i -> rows.groupBy(r => (0 to pathNames.size).map(r.get).toList: Seq[Any]).map { case (path, rs) =>
          path -> rs.map(r => DdSketch.Bin(r.getAs[Int]("_st"), r.getAs[Int]("_dk"), r.getAs[Long]("_c")))
        }
      }.toMap

    // nested bucket subs recurse over the SAME keyed frame
    val nestedBodies: Seq[(String, Map[Seq[Any], String], Node)] = node.subs.collect {
      case n @ Node(nm, _: Bucket, _) => (nm, bucketBodies(keyed, n, pathNames :+ kName, counter), n)
    }

    // collect is BOUNDED by the remaining budget + 1 before it runs — a
    // high-cardinality agg must abort with the limit error, not OOM the
    // driver materializing every bucket first (the +1 row proves overflow)
    val rows = keptFrame.limit(counter.remaining + 1).collect().toSeq
    counter.add(rows.size)
    val byParent = rows.groupBy(r => (0 until pathNames.size).map(r.get).toList: Seq[Any])

    def subsJson(path: Seq[Any], r: Row): String = {
      val metricParts = metricSubs.map { case (nm, m, i) =>
        s"${R.esc(nm)}:${metricBody(i, m, r, pctBins.get(i).flatMap(_.get(path)).getOrElse(Nil))}"
      }
      val nestedParts = nestedBodies.map { case (nm, bodies, n) =>
        s"${R.esc(nm)}:${bodies.getOrElse(path, emptyBucketBody(n))}"
      }
      (metricParts ++ nestedParts).map("," + _).mkString
    }
    def emptySubsJson: String = {
      val metricParts = metricSubs.map { case (nm, m, _) => s"${R.esc(nm)}:${emptyMetricBody(m)}" }
      val nestedParts = nestedBodies.map { case (nm, _, n) => s"${R.esc(nm)}:${emptyBucketBody(n)}" }
      (metricParts ++ nestedParts).map("," + _).mkString
    }

    val parents = if (pathNames.isEmpty) Seq(Seq.empty[Any]) else byParent.keys.toSeq
    parents.map { parent =>
      val cells = byParent.getOrElse(parent, Nil)
      parent -> renderBucketBody(bucket, kName, parent, cells, totals, subsJson, emptySubsJson)
    }.toMap
  }

  private def emptyBucketBody(n: Node): String = n.agg match {
    case _: Terms => """{"buckets":[],"doc_count_error_upper_bound":0,"sum_other_doc_count":0}"""
    case RangeB(_, ranges) =>
      val bs = ranges.map { rs =>
        val fromJ = rs.from.map(f => s""","from":${R.num(f)}""").getOrElse("")
        val toJ = rs.to.map(t => s""","to":${R.num(t)}""").getOrElse("")
        s"""{"doc_count":0$fromJ,"key":${R.esc(rs.key)}$toJ}"""
      }.mkString(",")
      s"""{"buckets":[$bs]}"""
    case _ => """{"buckets":[]}"""
  }

  private def renderBucketBody(bucket: Bucket, kName: String, path: Seq[Any], cells: Seq[Row],
                               totals: Map[Seq[Any], Long],
                               subsJson: (Seq[Any], Row) => String,
                               emptySubsJson: => String): String = {
    def key(r: Row): Any = r.getAs[Any](kName)
    def dc(r: Row): Long = r.getAs[Long]("_dc")
    bucket match {
      case Terms(_, _, _, target, asc, showErr) =>
        val sorted = target match {
          case "_key" =>
            val s = cells.sortBy(key)(keyOrd); if (asc) s else s.reverse
          case _ =>
            val s = cells.sortBy(r => (dc(r), key(r)))(Ordering.Tuple2(Ordering.Long, keyOrd))
            if (asc) s else s.reverse
        }
        val errJ = if (showErr) "\"doc_count_error_upper_bound\":0," else ""
        val kept = sorted.map(r => s"""{$errJ"doc_count":${dc(r)},"key":${keyJson(key(r))}${subsJson(path :+ key(r), r)}}""")
        val other = totals.getOrElse(path, 0L) - sorted.map(dc).sum
        s"""{"buckets":[${kept.mkString(",")}],"doc_count_error_upper_bound":0,"sum_other_doc_count":$other}"""

      case Histogram(_, interval, offset, minDoc, _, extendedBounds, keyed) =>
        val byKey = cells.map(r => key(r).asInstanceOf[Double] -> r).toMap
        val bs: Seq[(String, String)] =
          if (minDoc > 0L)
            byKey.toSeq.sortBy(_._1).collect { case (k, r) if dc(r) >= minDoc =>
              R.num(k) ->
                s"""{"doc_count":${dc(r)},"key":${R.num(k)}${subsJson(path :+ (k: Any), r)}}"""
            }
          else {
            // Snap with the offset so gap-fill keys land on the same grid as the
            // data bucket keys (floor((v-offset)/interval)*interval+offset).
            // Iterate by INTEGRAL bucket index, not by accumulating doubles —
            // lo + n*interval drifts off the floor-computed data keys for
            // fractional intervals (0.1+0.1+0.1 != 0.3) and exact-equality
            // lookups would replace populated buckets with zero-count ones.
            def snap(v: Double): Double = math.floor((v - offset) / interval) * interval + offset
            def idxOf(k: Double): Long = math.round((k - offset) / interval)
            val byIdx = byKey.map { case (k, r) => idxOf(k) -> (k, r) }
            val dataRange = if (byIdx.isEmpty) None else Some((byIdx.keys.min, byIdx.keys.max))
            val range = (dataRange,
              extendedBounds.map { case (l, h) => (idxOf(snap(l)), idxOf(snap(h))) }) match {
              case (Some((dl, dh)), Some((el, eh))) => Some((math.min(dl, el), math.max(dh, eh)))
              case (d, e) => d.orElse(e)
            }
            range.toSeq.flatMap { case (lo, hi) =>
              (lo to hi).map { i =>
                byIdx.get(i) match {
                  case Some((k, r)) => R.num(k) ->
                    s"""{"doc_count":${dc(r)},"key":${R.num(k)}${subsJson(path :+ (k: Any), r)}}"""
                  case None =>
                    val k = i * interval + offset
                    R.num(k) -> s"""{"doc_count":0,"key":${R.num(k)}$emptySubsJson}"""
                }
              }
            }
          }
        s"""{"buckets":${bucketsJson(bs, keyed)}}"""

      case DateHistogram(_, ivl, off, keyed) =>
        val ivlMs = Aggs.intervalMicros(ivl) / 1000L
        val byMs = cells.map { r =>
          val ms = key(r) match {
            case t: java.sql.Timestamp => t.getTime
            case t: java.time.LocalDateTime => t.toInstant(java.time.ZoneOffset.UTC).toEpochMilli
            case t: java.time.Instant => t.toEpochMilli
          }
          ms -> r
        }.toMap
        val bs: Seq[(String, String)] =
          if (byMs.isEmpty) Nil
          else (byMs.keys.min to byMs.keys.max by ivlMs).map { ms =>
            val iso = java.time.Instant.ofEpochMilli(ms).toString
            // keyed hashmap key = key_as_string when one exists (the
            // date_histogram case), else the numeric key's rendering
            iso -> (byMs.get(ms) match {
              case Some(r) =>
                s"""{"doc_count":${dc(r)},"key":${R.num(ms.toDouble)},"key_as_string":${R.esc(iso)}${subsJson(path :+ key(r), r)}}"""
              case None =>
                s"""{"doc_count":0,"key":${R.num(ms.toDouble)},"key_as_string":${R.esc(iso)}$emptySubsJson}"""
            })
          }
        s"""{"buckets":${bucketsJson(bs, keyed)}}"""

      case RangeB(_, ranges) =>
        val byLabel = cells.map(r => key(r).asInstanceOf[String] -> r).toMap
        val bs = ranges.map { rs =>
          val fromJ = rs.from.map(f => s""","from":${R.num(f)}""").getOrElse("")
          val toJ = rs.to.map(t => s""","to":${R.num(t)}""").getOrElse("")
          byLabel.get(rs.key) match {
            case Some(r) =>
              s"""{"doc_count":${dc(r)}$fromJ,"key":${R.esc(rs.key)}$toJ${subsJson(path :+ key(r), r)}}"""
            case None => s"""{"doc_count":0$fromJ,"key":${R.esc(rs.key)}$toJ$emptySubsJson}"""
          }
        }
        s"""{"buckets":[${bs.mkString(",")}]}"""
    }
  }

  /** `keyed: true` renders the bucket list as a hashmap keyed by each
    * bucket's `key` (aggregation.md "keyed" parameter on histogram and
    * date_histogram — "key in the bucket will be the key in the hashmap";
    * a date bucket's hashmap key is its key_as_string, matching ES). The
    * bucket bodies themselves are identical in both forms. */
  private def bucketsJson(bs: Seq[(String, String)], keyed: Boolean): String =
    if (keyed) bs.map { case (k, b) => s"${R.esc(k)}:$b" }.mkString("{", ",", "}")
    else bs.map(_._2).mkString("[", ",", "]")

  private def keyJson(k: Any): String = k match {
    case s: String => R.esc(s)
    case d: Double => R.num(d)
    case l: Long   => R.num(l.toDouble)
    case i: Int    => R.num(i.toDouble)
    case other     => R.esc(String.valueOf(other))
  }
}
