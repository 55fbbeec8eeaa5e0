package graft.queryast

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** ES-style index-id pattern resolution for multi-index search
  * (`logs-*,metrics-2024.*` → concrete index ids):
  * `validate_index_id_pattern` (quickwit-config/src/lib.rs:123-151) and
  * the metastore's pattern matcher
  * (quickwit-metastore/src/metastore/file_backed/mod.rs:934-961
  * build_regex_set_from_patterns / build_regex_exprs_from_pattern), with
  * the reference's exact validation error strings and regex renditions
  * (goldens pinned in IndexPatternsSpec).
  *
  * Resolution over a metastore index-list frame is a tiny broadcast-side
  * operation; [[matchColumn]] compiles the pattern set to one ORed `rlike`
  * so the filter stays a codegen'd predicate.
  */
object IndexPatterns {

  private val PatternRe = "^[a-zA-Z\\*][a-zA-Z0-9-_\\.\\*]{0,254}$".r

  /** `validate_index_id_pattern`: identifier chars plus `*` globs, no
    * consecutive stars, star-free patterns need ≥3 chars. */
  def validate(pattern: String): Either[String, Unit] =
    if (PatternRe.findFirstIn(pattern).isEmpty)
      Left(s"index ID pattern `$pattern` is invalid: patterns must match the following " +
        "regular expression: `^[a-zA-Z\\*][a-zA-Z0-9-_\\.\\*]{0,254}$`")
    else if (pattern.contains("**"))
      Left(s"index ID pattern `$pattern` is invalid: patterns must not contain multiple " +
        "consecutive `*`")
    else if (!pattern.contains('*') && pattern.length < 3)
      Left(s"index ID pattern `$pattern` is invalid: an index ID must have at least 3 characters")
    else Right(())

  /** Rust `regex::escape`: every char outside `[A-Za-z0-9_]` is
    * backslash-escaped. */
  private def escape(s: String): String =
    s.flatMap { c =>
      if (c.isLetterOrDigit && c < 128 || c == '_') c.toString else "\\" + c
    }

  /** `build_regex_exprs_from_pattern`: `*` → `.*`, everything else
    * escaped, anchored. */
  def toRegex(pattern: String): Either[String, String] =
    validate(pattern).map(_ => "^" + pattern.split("\\*", -1).map(escape).mkString(".*") + "$")

  /** `build_regex_set_from_patterns`: a match-all pattern short-circuits
    * the whole set to `.*`. */
  def buildRegexes(patterns: Seq[String]): Either[String, Seq[String]] =
    if (patterns.contains("*")) Right(Seq(".*"))
    else patterns.foldLeft(Right(Vector.empty[String]): Either[String, Vector[String]]) {
      (acc, p) => acc.flatMap(v => toRegex(p).map(v :+ _))
    }

  /** The RegexSet membership test on a Scala string. */
  def matches(patterns: Seq[String], indexId: String): Either[String, Boolean] =
    buildRegexes(patterns).map(_.exists(re => re.r.findFirstIn(indexId).isDefined))

  /** The RegexSet membership test as a Column predicate over an index-id
    * column. Throws on an invalid pattern (callers validate user input via
    * [[validate]] first). */
  def matchColumn(patterns: Seq[String], indexId: Column): Column =
    buildRegexes(patterns)
      .fold(err => throw new IllegalArgumentException(err), identity)
      .map(indexId.rlike)
      .foldLeft(lit(false))(_ || _)
}
