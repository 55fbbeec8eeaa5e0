package graft.parse

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** VRL-shaped doc transform (P5/U2) — the reference compiles a source's
  * `transform.vrl_script` with the VRL compiler and runs it per doc before
  * the doc mapper (quickwit-config/src/source_config/mod.rs:455-470,
  * quickwit-indexing/src/actors/vrl_processing.rs; canonical example script
  * `.message = downcase(string!(.message))` at source_config/mod.rs:195).
  *
  * This implements the remap SUBSET those pipelines actually use —
  * assignment of field paths from field refs / literals / function calls,
  * and `del(.field)` — compiled to Catalyst Column expressions, so the
  * "script" runs codegen'd inside the scan instead of per-row interpreted.
  * VRL's `!` (abort-on-error) maps to ANSI casts (throw), the bare form to
  * `try_`-casts (null on failure) — the same error-vs-null contract.
  *
  * Supported functions: downcase, upcase, trim, string, to_int, to_float,
  * strlen. Unknown constructs are a compile error (strict, like VRL). */
object Vrl {

  sealed trait Expr
  final case class FieldRef(name: String) extends Expr
  final case class StrLit(value: String) extends Expr
  final case class Call(fn: String, bang: Boolean, arg: Expr) extends Expr

  sealed trait Stmt
  final case class Assign(field: String, expr: Expr) extends Stmt
  final case class Del(field: String) extends Stmt

  def parse(script: String): Seq[Stmt] =
    script.split(";").map(_.trim).filter(_.nonEmpty).toSeq.map(parseStmt)

  private val DelRe = """del\(\s*\.([A-Za-z_][A-Za-z0-9_]*)\s*\)""".r
  private val AssignRe = """\.([A-Za-z_][A-Za-z0-9_]*)\s*=\s*(.+)""".r

  private def parseStmt(s: String): Stmt = s match {
    case DelRe(f)          => Del(f)
    case AssignRe(f, rhs)  => Assign(f, parseExpr(rhs.trim))
    case other             => fail(s"unsupported VRL statement: $other")
  }

  private val CallRe = """([a-z_]+)(!?)\(\s*(.+)\s*\)""".r
  private val RefRe = """\.([A-Za-z_][A-Za-z0-9_]*)""".r

  private def parseExpr(s: String): Expr = s match {
    case CallRe(fn, bang, inner) => Call(fn, bang == "!", parseExpr(inner.trim))
    case RefRe(f)                => FieldRef(f)
    case lit if lit.length >= 2 && lit.head == '"' && lit.last == '"' =>
      StrLit(lit.substring(1, lit.length - 1))
    case other => fail(s"unsupported VRL expression: $other")
  }

  private def fail(msg: String): Nothing = throw new IllegalArgumentException(msg)

  private def compileExpr(e: Expr): Column = e match {
    case FieldRef(f) => col(f)
    case StrLit(v)   => lit(v)
    case Call(fn, bang, arg) =>
      val a = compileExpr(arg)
      fn match {
        case "downcase" => lower(a)
        case "upcase"   => upper(a)
        case "trim"     => trim(a)
        case "strlen"   => length(a).cast("long")
        case "string"   => a.cast("string")
        case "to_int"   => if (bang) a.cast("long") else a.try_cast("long")
        case "to_float" => if (bang) a.cast("double") else a.try_cast("double")
        case other      => fail(s"unsupported VRL function: $other")
      }
  }

  /** Compile a script into a DataFrame transform. Statements apply in
    * order; an assignment to an existing column replaces it. */
  def transform(script: String): DataFrame => DataFrame = {
    val stmts = parse(script)
    df =>
      stmts.foldLeft(df) {
        case (acc, Assign(f, e)) => acc.withColumn(f, compileExpr(e))
        case (acc, Del(f))       => acc.drop(f)
      }
  }
}
