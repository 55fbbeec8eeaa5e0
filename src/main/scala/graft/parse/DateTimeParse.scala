package graft.parse

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Datetime input parsing, mirroring quickwit-datetime:
  *  - multi-format attempts (iso8601 / rfc3339 / strptime / unix timestamp),
  *    quickwit-datetime/src/date_time_format.rs:153-167
  *  - integer timestamps get unit inference BY MAGNITUDE
  *    (secs / millis / micros / nanos),
  *    quickwit-datetime/src/date_time_parsing.rs:150-178:
  *      [-17_987_443_200, 17_987_443_200)            → seconds
  *      [-17_987_443_200_000, 17_987_443_200_000)    → milliseconds
  *      ... ×1000 each for micros, nanos
  *    (bound = |year 2540| epoch seconds)
  *  - float timestamps are fractional seconds (date_time_parsing.rs:121-137)
  *
  * All expressed as a `when` ladder over built-ins — UDF-free, codegen'd.
  */
object DateTimeParse {

  val SecondsBound = 17987443200L // quickwit-datetime/src/date_time_parsing.rs:150-178

  /** Epoch integer of unknown unit → epoch micros (BIGINT). Kept separate
    * from the timestamp form so callers can stay in integer space (zone- and
    * range-free: secs-unit inputs can exceed the year-2262 ns range). */
  def inferUnitMicros(epoch: Column): Column = {
    val a = abs(epoch)
    when(a < SecondsBound, epoch * 1000000L)                   // secs → µs
      .when(a < SecondsBound * 1000L, epoch * 1000L)           // ms → µs
      .when(a < SecondsBound * 1000000L, epoch)                // µs
      .otherwise((epoch / 1000L).cast("long"))                 // ns → µs
  }

  /** Epoch integer of unknown unit → TimestampType (µs precision). */
  def inferUnitTimestamp(epoch: Column): Column =
    timestamp_micros(inferUnitMicros(epoch))

  /** Unit name the inference picks (for tests / introspection). */
  def inferredUnit(epoch: Column): Column = {
    val a = abs(epoch)
    when(a < SecondsBound, "secs")
      .when(a < SecondsBound * 1000L, "millis")
      .when(a < SecondsBound * 1000000L, "micros")
      .otherwise("nanos")
  }

  /** Float timestamp = fractional seconds. */
  def fractionalSeconds(c: Column): Column =
    timestamp_micros((c * 1e6).cast("long"))

  /** Multi-format attempt chain, first success wins — the per-field
    * `input_formats` list. Accepts ISO-8601/RFC-3339 strings, the given
    * strptime patterns, then (if the string is all digits) unit-inferred
    * epoch. */
  def parseChain(c: Column, strptimeFormats: Seq[String] = Nil): Column = {
    val attempts: Seq[Column] =
      Seq(try_to_timestamp(c)) ++
        strptimeFormats.map(f => try_to_timestamp(c, lit(f))) :+
        when(c.rlike("^-?[0-9]+$"), inferUnitTimestamp(c.cast("long"))) :+
        when(c.rlike("^-?[0-9]+\\.[0-9]+$"), fractionalSeconds(c.cast("double")))
    coalesce(attempts: _*)
  }
}
