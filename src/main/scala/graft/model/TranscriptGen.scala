package graft.model

import java.sql.Timestamp
import scala.util.Random

/** Deterministic (seeded) synthetic transcript generator — the test/bench
  * input per FIXTURES.md §1. All text patterns are grok targets of the parse
  * stage; ~2% of rows are malformed to exercise the dead-letter path
  * (reference analog: DocProcessor test fixture, 2 valid / 2 invalid,
  * quickwit-indexing/src/actors/doc_processor.rs:576-640).
  *
  * No external data: everything derives from the seed.
  */
object TranscriptGen {

  val ToolVocab: Vector[String] = Vector(
    "search", "browse", "bash", "python", "sql", "read_file",
    "write_file", "calculator", "translate", "summarize", "embed", "ocr")

  val Roles: Vector[String] = Vector("user", "assistant", "system", "tool")

  val Severities: Vector[String] = Vector("INFO", "WARN", "ERROR")

  private val words = Vector(
    "the", "quick", "brown", "fox", "jumps", "over", "lazy", "dog",
    "spark", "query", "plan", "shuffle", "join", "filter", "agg",
    "token", "split", "index", "merge", "route", "batch", "stream")

  /** Generate `numConvs` conversations; turns per conversation are
    * `avgTurns ± avgTurns/2`. If `skewed`, conversation 0 gets ~30% of all
    * rows (the hot-conv scenario the salted repartition must defuse).
    */
  def turns(numConvs: Int, avgTurns: Int, seed: Long = 42L,
            skewed: Boolean = false): Vector[Turn] = {
    val rng = new Random(seed)
    val baseMs = 1704067200000L // 2024-01-01T00:00:00Z
    val out = Vector.newBuilder[Turn]
    var convSizes = (0 until numConvs).map { _ =>
      math.max(1, avgTurns / 2 + rng.nextInt(math.max(1, avgTurns)))
    }.toVector
    if (skewed && numConvs > 1) {
      val total = convSizes.sum
      convSizes = convSizes.updated(0, math.max(convSizes(0), (total * 0.3).toInt))
    }
    var c = 0
    while (c < numConvs) {
      val convId = f"conv$c%06d"
      val n = convSizes(c)
      var t0 = baseMs + rng.nextInt(86400000)
      var i = 0
      while (i < n) {
        val role = Roles(rng.nextInt(Roles.length))
        val sev = Severities(rng.nextInt(Severities.length))
        val tool =
          if (role == "tool" || rng.nextInt(4) == 0) ToolVocab(rng.nextInt(ToolVocab.length))
          else null
        val malformed = rng.nextInt(50) == 0 // ~2%
        val text =
          if (malformed) {
            if (rng.nextBoolean()) null else "CALL truncated(" // no closing
          } else {
            val body = Vector.fill(3 + rng.nextInt(8))(words(rng.nextInt(words.length))).mkString(" ")
            val parts = new StringBuilder
            parts ++= s"$sev $body"
            if (tool != null) {
              val status = if (rng.nextInt(5) == 0) "ERR" else "OK"
              parts ++= s" CALL $tool(arg=${rng.nextInt(100)}) -> $status"
              if (status == "ERR")
                parts ++= s" ERROR[${100 + rng.nextInt(900)}]: ${words(rng.nextInt(words.length))} failed"
            }
            parts.result()
          }
        out += Turn(convId, i, role, text, tool, new Timestamp(t0))
        t0 += 1000 + rng.nextInt(60000)
        i += 1
      }
      c += 1
    }
    out.result()
  }

  /** tools dimension (broadcast-join enrichment; FIXTURES.md §2). */
  def toolsDim: Seq[(String, String, String, Boolean)] =
    ToolVocab.map { t =>
      val category = t match {
        case "search" | "browse"                       => "web"
        case "bash" | "python" | "sql"                 => "exec"
        case "read_file" | "write_file"                => "fs"
        case _                                         => "ml"
      }
      (t, s"sink_$category", category, category == "exec" || category == "web")
    }

  /** roles dimension. */
  def rolesDim: Seq[(String, String, Double)] = Seq(
    ("user", "human", 1.0),
    ("assistant", "model", 0.5),
    ("system", "control", 0.1),
    ("tool", "machine", 0.25))
}
