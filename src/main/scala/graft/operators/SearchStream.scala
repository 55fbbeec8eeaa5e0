package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{BinaryType, DataType}

/** Search-stream export serialization — the reference's fast-field export
  * formats (quickwit-search/src/search_stream/mod.rs:36-115):
  *  - CSV: one `Display` value per line (mod.rs:95-101);
  *  - ClickHouseRowBinary: 8 little-endian bytes per i64/u64/f64 value
  *    (mod.rs:103-113), date fields exported as i64 MICROSECONDS
  *    (leaf.rs:242-243);
  *  - partitioned buffers: per partition value, a header of
  *    `partition u64le · payload_size_bytes u64le` followed by the
  *    partition's values u64le (serialize_partitions, mod.rs:72-93).
  *
  * The byte encoding is a custom codegen'd Catalyst expression
  * ([[LongToLeBytes]]) — per-row work stays inside whole-stage codegen, and
  * buffers assemble with built-in binary concat aggregation. */
object SearchStream {

  /** i64 → 8-byte little-endian binary, codegen'd. */
  def leBytes(c: Column): Column =
    ColumnBridge.column(LongToLeBytes(ColumnBridge.expression(c)))

  /** CSV stream body: one value per line, trailing newline per line
    * (serialize_csv writes `writeln!`). One string per input row; leaf
    * chunks concatenate downstream. */
  def csvLine(c: Column): Column = concat(c.cast("string"), lit("\n"))

  /** One ClickHouseRowBinary buffer per partition-key value, values in
    * ascending order (a leaf emits its doc order; a deterministic order is
    * the distributed analog and makes the buffer oracle-checkable).
    * Output: (partition, payload) where payload = concat of value bytes;
    * the full wire buffer is header(partition·u64le, size·u64le) ++
    * payload, exposed as `buffer`. Distributed shape: one groupBy shuffle
    * of (partition, value) pairs; buffers are per-partition sized, never
    * a global collect. */
  def partitionBuffers(df: DataFrame, partition: Column, value: Column): DataFrame = {
    val payload = df
      .select(partition.as("partition"), value.as("_v"))
      .groupBy(col("partition"))
      .agg(sort_array(collect_list(col("_v"))).as("_vs"))
      .select(col("partition"),
        aggregate(col("_vs"), lit(Array.empty[Byte]),
          (acc, v) => concat(acc, leBytes(v))).as("payload"))
    payload.select(col("partition"), col("payload"),
      concat(leBytes(col("partition")),
        leBytes(octet_length(col("payload")).cast("long")),
        col("payload")).as("buffer"))
  }
}

/** 8-byte little-endian encoding of a long (ClickHouse RowBinary i64/u64;
  * f64 callers pass the raw bits). Null-safe unary expression with full
  * codegen — the hot path is a byte loop, no boxing. */
case class LongToLeBytes(child: Expression) extends UnaryExpression {
  override def dataType: DataType = BinaryType
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == org.apache.spark.sql.types.LongType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"LongToLeBytes needs LONG, got ${child.dataType.simpleString}")

  override def nullSafeEval(input: Any): Any =
    LongToLeBytes.encode(input.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      // fresh names: two leBytes in one codegen scope must not redeclare
      // the same locals (nullSafeCodeGen emits unbraced for non-nullable
      // children)
      val b = ctx.freshName("leb")
      val x = ctx.freshName("lex")
      val i = ctx.freshName("lei")
      s"""byte[] $b = new byte[8];
         |long $x = $v;
         |for (int $i = 0; $i < 8; $i++) { $b[$i] = (byte) ($x & 0xffL); $x >>>= 8; }
         |${ev.value} = $b;""".stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): LongToLeBytes =
    copy(child = newChild)
}

object LongToLeBytes {
  def encode(x: Long): Array[Byte] = {
    val b = new Array[Byte](8)
    var v = x
    var i = 0
    while (i < 8) { b(i) = (v & 0xffL).toByte; v >>>= 8; i += 1 }
    b
  }
}
