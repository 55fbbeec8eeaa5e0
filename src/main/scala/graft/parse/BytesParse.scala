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

  /** Strict dotted-quad with octets 0-255, no leading zeros (the common
    * wire form — the codegen'd fast path; other shapes go through the full
    * parser below). */
  private val Octet = "(25[0-5]|2[0-4][0-9]|1[0-9][0-9]|[1-9]?[0-9])"
  private val Ipv4StrictRe = s"^$Octet\\.$Octet\\.$Octet\\.$Octet$$"

  /** Parse an IPv4/IPv6 literal to its 16-byte form; None when invalid.
    * Hand-rolled (InetAddress.getByName would fall back to DNS for
    * non-literals) — accepts dotted-quad, full/compressed IPv6, and the
    * embedded-IPv4 tail form. */
  private[parse] def parseIpBytes(s: String): Option[Array[Byte]] = {
    def v4(t: String): Option[Array[Byte]] = {
      val parts = t.split("\\.", -1)
      if (parts.length != 4) None
      else {
        val os = parts.map(p =>
          if (p.nonEmpty && p.length <= 3 && p.forall(_.isDigit)) p.toInt else -1)
        if (os.forall(o => o >= 0 && o <= 255)) Some(os.map(_.toByte)) else None
      }
    }
    def v6(t: String): Option[Array[Byte]] = {
      val (head, tail) = t.indexOf("::") match {
        case -1 => (t, null)
        case i  => (t.substring(0, i), t.substring(i + 2))
      }
      if (tail != null && tail.contains("::")) return None // one '::' max
      def groups(part: String): Option[Seq[Array[Byte]]] =
        if (part == null || part.isEmpty) Some(Nil)
        else {
          val toks = part.split(":", -1).toSeq
          if (toks.exists(_.isEmpty)) None
          else toks.zipWithIndex.foldLeft(Option(Seq.empty[Array[Byte]])) {
            case (None, _) => None
            case (Some(acc), (g, i)) =>
              if (g.contains(".")) // embedded IPv4: only as the last group
                if (i == toks.length - 1) v4(g).map(b => acc :+ b) else None
              else if (g.length <= 4 && g.forall(c => Character.digit(c, 16) >= 0)) {
                val n = Integer.parseInt(g, 16)
                Some(acc :+ Array(((n >> 8) & 0xff).toByte, (n & 0xff).toByte))
              } else None
          }
        }
      for {
        h <- groups(head)
        rest <- groups(tail)
        hb = h.flatten; rb = rest.flatten
        pad = 16 - hb.length - rb.length
        // without '::' the groups must fill exactly; with it, the
        // compression must stand for at least one zero group
        if (tail == null && pad == 0) || (tail != null && pad >= 2)
      } yield (hb ++ Array.fill(pad)(0.toByte) ++ rb).toArray
    }
    if (s == null) None
    else {
      val t = s.trim
      if (t.isEmpty) None
      else if (t.contains(":")) v6(t)
      else v4(t).map(b => Array.fill(10)(0.toByte) ++ Array(0xff.toByte, 0xff.toByte) ++ b)
    }
  }

  /** RFC 5952 canonical text of a 16-byte address: lowercase, longest zero
    * run (≥2 groups) compressed to `::`, IPv4-mapped kept in dotted form. */
  private[parse] def canonicalIp(s: String): String =
    parseIpBytes(s).map { b =>
      val mapped = b.take(10).forall(_ == 0) && b(10) == -1 && b(11) == -1
      if (mapped)
        s"::ffff:${b(12) & 0xff}.${b(13) & 0xff}.${b(14) & 0xff}.${b(15) & 0xff}"
      else {
        val gs = (0 until 8).map(i => ((b(2 * i) & 0xff) << 8) | (b(2 * i + 1) & 0xff))
        // longest run of zero groups, first on tie, only if length ≥ 2
        var bestStart = -1; var bestLen = 0; var i = 0
        while (i < 8) {
          if (gs(i) == 0) {
            var j = i; while (j < 8 && gs(j) == 0) j += 1
            if (j - i > bestLen) { bestStart = i; bestLen = j - i }
            i = j
          } else i += 1
        }
        if (bestLen < 2) gs.map(_.toHexString).mkString(":")
        else {
          val pre = gs.take(bestStart).map(_.toHexString).mkString(":")
          val post = gs.drop(bestStart + bestLen).map(_.toHexString).mkString(":")
          s"$pre::$post"
        }
      }
    }.orNull

  private val canonIpUdf = udf((s: String) => canonicalIp(s))

  /** Normalize an IP string: every address canonicalizes to its IPv6 text
    * form — IPv4 literals to the IPv4-mapped `::ffff:a.b.c.d`, IPv6 to the
    * RFC 5952 canonical spelling (so `0:0:0:0:0:0:0:1`, `::1` and `::FFFF:…`
    * variants of one address always normalize identically) — and invalid
    * strings (e.g. `999.1.1.1`) become NULL, the mapper's parse-error
    * representation. The reference parses into Ipv6Addr the same way
    * (mapping_tree.rs:77-86). Strict dotted-quads take the codegen'd fast
    * path; everything else pays the scalar parse UDF. */
  def normalizeIp(c: Column): Column =
    when(c.rlike(Ipv4StrictRe), concat(lit("::ffff:"), c)).otherwise(canonIpUdf(c))

  /** Parse per input_format name — the field_mapping_entry dispatch. */
  def byFormat(format: String): Column => Column = format match {
    case "base64" => fromBase64
    case "hex"    => fromHex
    case other    => throw new IllegalArgumentException(s"unknown bytes input_format: $other")
  }
}
