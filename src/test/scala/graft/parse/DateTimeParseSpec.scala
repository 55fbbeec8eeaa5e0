package graft.parse

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Unit-inference-by-magnitude tests mirroring
  * quickwit-datetime/src/date_time_parsing.rs:150-178. */
class DateTimeParseSpec extends SparkTestBase {

  private def unitOf(epoch: Long): String = {
    import spark.implicits._
    Seq(epoch).toDF("e").select(DateTimeParse.inferredUnit(col("e"))).collect()(0).getString(0)
  }

  private def microsOf(epoch: Long): Long = {
    import spark.implicits._
    Seq(epoch).toDF("e")
      .select(unix_micros(DateTimeParse.inferUnitTimestamp(col("e"))))
      .collect()(0).getLong(0)
  }

  test("unit inference boundaries (bound = |year 2540| epoch seconds)") {
    val b = DateTimeParse.SecondsBound
    assert(unitOf(1704067200L) === "secs")
    assert(unitOf(b - 1) === "secs")
    assert(unitOf(b) === "millis")
    assert(unitOf(1704067200000L) === "millis")
    assert(unitOf(b * 1000 - 1) === "millis")
    assert(unitOf(b * 1000) === "micros")
    assert(unitOf(1704067200000000L) === "micros")
    assert(unitOf(b * 1000000) === "nanos")
    assert(unitOf(-1704067200L) === "secs") // negative epochs infer by |x|
  }

  test("all units normalize to the same instant in µs") {
    val micros = 1704067200000000L // 2024-01-01T00:00:00Z
    assert(microsOf(1704067200L) === micros)
    assert(microsOf(1704067200000L) === micros)
    assert(microsOf(1704067200000000L) === micros)
    assert(microsOf(1704067200000000000L) === micros)
  }

  test("float timestamps are fractional seconds") {
    import spark.implicits._
    val us = Seq(1704067200.25d).toDF("v")
      .select(unix_micros(DateTimeParse.fractionalSeconds(col("v"))))
      .collect()(0).getLong(0)
    assert(us === 1704067200250000L)
  }

  test("parse chain: ISO strings, strptime formats, digit epochs, fractional") {
    import spark.implicits._
    val df = Seq(
      "2024-01-01T00:00:00Z",
      "2024-01-01 00:00:00",
      "15/06/2024",
      "1704067200",
      "1704067200000",
      "1704067200.5",
      "not a date").toDF("v")
    val out = df.select(
        col("v"),
        unix_micros(DateTimeParse.parseChain(col("v"), Seq("dd/MM/yyyy"))).as("us"))
      .collect().map(r => r.getString(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    assert(out("2024-01-01T00:00:00Z") === Some(1704067200000000L))
    assert(out("2024-01-01 00:00:00") === Some(1704067200000000L))
    assert(out("15/06/2024") === Some(1718409600000000L))
    assert(out("1704067200") === Some(1704067200000000L))
    assert(out("1704067200000") === Some(1704067200000000L))
    assert(out("1704067200.5") === Some(1704067200500000L))
    assert(out("not a date") === None)
  }
}
