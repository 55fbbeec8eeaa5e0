package graft.queryast

/** Query-AST → timestamp-bound refinement — the `ExtractTimestampRange`
  * visitor (quickwit-search/src/root.rs:1188-1316), applied at scan
  * planning before split listing (root.rs:1034): bounds implied by the
  * query itself NARROW the explicit `[start_timestamp, end_timestamp)`
  * request window, so splits provably outside the refined window are never
  * opened.
  *
  * Semantics pinned on the reference:
  *  - interval is `[start..end)` — start inclusive, end exclusive
  *    (root.rs:1206-1210);
  *  - only strict (positive) requirements refine: `must` + `filter` branches
  *    of bool nodes; `should` and `must_not` are ignored (root.rs:1261-1267);
  *  - `range` on the timestamp field: excluded lower bound is bumped by one
  *    unit, included upper bound likewise (root.rs:1217-1256);
  *  - `term` pins the range to `DATE..=DATE` (root.rs:1288-1297);
  *  - `term_set` uses the lexicographically first/last values — RFC 3339 is
  *    lexicographically ordered for years ≤ 9999 (root.rs:1299-1313);
  *  - bounds combine by intersection: max of starts, min of ends
  *    (root.rs:1233-1236, 1253-1256);
  *  - unparseable bounds are SKIPPED, never errors (pruning is an
  *    optimization — root.rs:1224-1226 `else return`).
  *
  * Timezone contract: bounds WITHOUT an explicit offset are interpreted at
  * UTC — like the reference, whose zone-less input formats default to UTC.
  * The conjunctive row filter casts the same literal in the SESSION
  * timezone, so sessions must pin `spark.sql.session.timeZone=UTC` (every
  * main and the test harness in this repo do) or pruning could disagree
  * with the filter on offset-less literals.
  *
  * One resolution divergence, documented: the reference quantizes every
  * bound to SECONDS (its split metadata stores secs), rounding an upper
  * bound up when it has a fractional second (root.rs:1244-1249). Our split
  * metadata keeps µs (`Manifest.SplitEntry.timeRange*Micros`), so the ±1
  * adjustments act on µs and the window is EXACT: it always contains every
  * matching row's timestamp (sound by construction), with none of the
  * secs-truncation slop the reference's own `TODO saturating isn't exactly
  * right` comment flags (root.rs:1228-1230).
  */
object TimestampPruning {

  import QueryAst._

  private val SecondsBound = graft.parse.DateTimeParse.SecondsBound

  // STRICT resolution: ofPattern defaults to SMART, which silently clamps
  // 2023/02/31 to Feb 28 where the reference's strptime rejects it; uuuu
  // (not yyyy) is the proleptic year STRICT requires
  private val SlashDate = java.time.format.DateTimeFormatter.ofPattern("uuuu/MM/dd")
    .withResolverStyle(java.time.format.ResolverStyle.STRICT)

  /** Interpret a bound literal as epoch micros — the
    * `DateTime::interpret_json` attempt chain (quickwit-query
    * InterpretUserInput for DateTime): integers get unit inference by
    * magnitude (quickwit-datetime/src/date_time_parsing.rs:150-178), floats
    * are fractional seconds, strings try RFC 3339 / ISO-8601 date(-time)
    * then all-digit epoch. None = uninterpretable (bound is skipped). */
  def interpretMicros(v: Any): Option[Long] = v match {
    case null       => None
    case l: Long    => Some(inferUnitMicros(l))
    case i: Int     => Some(inferUnitMicros(i.toLong))
    // JSON parsers hand every number over as Double; serde in the reference
    // dispatches i64-FIRST (date_time_type.rs:80-83), so a whole Double like
    // 1704067200000 (epoch millis) must take the integer unit-inference path
    // — only genuinely fractional values are fractional SECONDS.
    case d: Double  => Some(if (d.isWhole && math.abs(d) < 9.2e18) inferUnitMicros(d.toLong)
                            else (d * 1e6).toLong)
    case f: Float   => interpretMicros(f.toDouble)
    case s: String  => interpretString(s)
    case t: java.sql.Timestamp =>
      Some(t.getTime * 1000L + (t.getNanos / 1000) % 1000)
    case i: java.time.Instant =>
      Some(i.getEpochSecond * 1000000L + i.getNano / 1000)
    case _ => None
  }

  private[queryast] def inferUnitMicros(epoch: Long): Long = {
    val a = math.abs(epoch)
    if (a < SecondsBound) epoch * 1000000L
    else if (a < SecondsBound * 1000L) epoch * 1000L
    else if (a < SecondsBound * 1000000L) epoch
    else epoch / 1000L
  }

  /** The reference's FULL default datetime-literal chain for query-language
    * bounds (quickwit-query/src/json_literal.rs:29-45): RFC 3339, RFC 2822,
    * epoch with unit inference, `%Y-%m-%dT%H:%M:%S`,
    * `%Y-%m-%d %H:%M:%S(.%f)`, `%Y-%m-%d`, `%Y/%m/%d`. RFC 2822 is
    * approximated by RFC 1123 (java's closest; 2-digit-year archaisms are
    * the documented gap). */
  private def interpretString(s: String): Option[Long] = {
    val t = s.trim
    def attempt[A](f: => A)(g: A => Long): Option[Long] =
      try Some(g(f)) catch { case _: java.time.format.DateTimeParseException => None }
    def ofLocal(l: java.time.LocalDateTime): Long =
      l.toEpochSecond(java.time.ZoneOffset.UTC) * 1000000L + l.getNano / 1000
    if (t.matches("-?[0-9]+"))
      try Some(inferUnitMicros(t.toLong)) catch { case _: NumberFormatException => None }
    else if (t.matches("-?[0-9]+\\.[0-9]+$")) Some((t.toDouble * 1e6).toLong)
    else
      attempt(java.time.OffsetDateTime.parse(t))(o =>
          o.toEpochSecond * 1000000L + o.getNano / 1000)
        .orElse(attempt(java.time.OffsetDateTime.parse(t,
          java.time.format.DateTimeFormatter.RFC_1123_DATE_TIME))(o =>
          o.toEpochSecond * 1000000L + o.getNano / 1000))
        .orElse(attempt(java.time.LocalDateTime.parse(t))(ofLocal))
        .orElse(attempt(java.time.LocalDateTime.parse(t.replace(' ', 'T')))(ofLocal))
        .orElse(attempt(java.time.LocalDate.parse(t))(d =>
          d.atStartOfDay.toEpochSecond(java.time.ZoneOffset.UTC) * 1000000L))
        .orElse(attempt(java.time.LocalDate.parse(t, SlashDate))(d =>
          d.atStartOfDay.toEpochSecond(java.time.ZoneOffset.UTC) * 1000000L))
  }

  private def satAdd1(x: Long): Long = if (x == Long.MaxValue) x else x + 1L

  private final class Bounds(var start: Option[Long], var end: Option[Long]) {
    def updStart(v: Any, included: Boolean): Unit =
      interpretMicros(v).foreach { us =>
        val lb = if (included) us else satAdd1(us)
        start = Some(start.fold(lb)(math.max(_, lb)))
      }
    def updEnd(v: Any, included: Boolean): Unit =
      interpretMicros(v).foreach { us =>
        val ub = if (included) satAdd1(us) else us
        end = Some(end.fold(ub)(math.min(_, ub)))
      }
  }

  /** Refine `[start..end)` (epoch µs) from the AST. Sound only when the
    * query is applied as the scan's conjunctive row filter — pruning never
    * replaces the filter (same contract as TagPruning). */
  def refine(q: QueryAst, tsField: String,
             start: Option[Long] = None, end: Option[Long] = None): (Option[Long], Option[Long]) = {
    val b = new Bounds(start, end)
    visit(q, tsField, b)
    (b.start, b.end)
  }

  private def visit(q: QueryAst, tsField: String, b: Bounds): Unit = q match {
    case bool: Bool =>
      (bool.must ++ bool.filterQ).foreach(visit(_, tsField, b))
    case Boost(inner, _) => visit(inner, tsField, b)
    case Range(f, gte, gt, lte, lt) if f == tsField =>
      gte.foreach(b.updStart(_, included = true))
      gt.foreach(b.updStart(_, included = false))
      lte.foreach(b.updEnd(_, included = true))
      lt.foreach(b.updEnd(_, included = false))
    case TsRange(f, s, e) if f == tsField =>
      // already [start..end) in µs — intersect directly
      s.foreach(us => b.start = Some(b.start.fold(us)(math.max(_, us))))
      e.foreach(us => b.end = Some(b.end.fold(us)(math.min(_, us))))
    case Term(f, v) if f == tsField =>
      b.updStart(v, included = true)
      b.updEnd(v, included = true)
    case TermSet(f, vs) if f == tsField && vs.nonEmpty =>
      val sorted = vs.sorted
      b.updStart(sorted.head, included = true)
      b.updEnd(sorted.last, included = true)
    case _ => () // should / mustNot / other nodes: uninformative
  }
}
