package graft.parse

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Bytes / IP leaf parsing, mirroring the doc mapper's binary and ip field
  * types:
  *  - bytes: base64 (default) or hex `input_format`
  *    (quickwit-doc-mapper/src/default_doc_mapper/field_mapping_entry.rs:183-232)
  *  - ip: string addresses, IPv4 mapped into the IPv6 space
  *    (mapping_tree.rs:77-86)
  */
object BytesParse {

  /** base64 text → binary (the default bytes input_format). */
  def fromBase64(c: Column): Column = unbase64(c)

  /** hex text → binary. */
  def fromHex(c: Column): Column = unhex(c)

  /** binary → base64 text (output side, docstore round-trip). */
  def toBase64(c: Column): Column = base64(c)

  def toHexStr(c: Column): Column = lower(hex(c))

  private val Ipv4Re = "^([0-9]{1,3})\\.([0-9]{1,3})\\.([0-9]{1,3})\\.([0-9]{1,3})$"

  /** Normalize an IP string: IPv4 literals become their IPv4-mapped IPv6
    * form `::ffff:a.b.c.d`; everything else lower-cases. The reference
    * stores all IPs as IPv6 (Ipv6Addr::from mapping). */
  def normalizeIp(c: Column): Column =
    when(c.rlike(Ipv4Re), concat(lit("::ffff:"), c)).otherwise(lower(c))

  /** Parse per input_format name — the field_mapping_entry dispatch. */
  def byFormat(format: String): Column => Column = format match {
    case "base64" => fromBase64
    case "hex"    => fromHex
    case other    => throw new IllegalArgumentException(s"unknown bytes input_format: $other")
  }
}
