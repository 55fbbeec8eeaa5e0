package graft.queryast

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Pins IndexPatterns on the reference's own goldens:
  * quickwit-config/src/lib.rs:271-281 (validate),
  * file_backed/mod.rs:1915-1938 (regex renditions) and :1941-1969
  * (RegexSet matcher matrix). */
class IndexPatternsSpec extends SparkTestBase {
  import spark.implicits._

  test("validate_index_id_pattern goldens (lib.rs:271-281)") {
    assert(IndexPatterns.validate("*").isRight)
    assert(IndexPatterns.validate("abc.*").isRight)
    assert(IndexPatterns.validate("ab").isLeft) // no star, < 3 chars
    assert(IndexPatterns.validate("").isLeft)
    assert(IndexPatterns.validate("**").isLeft)
    assert(IndexPatterns.validate("foo!").left.exists(
      _.contains("index ID pattern `foo!` is invalid:")))
  }

  test("build_regex_exprs_from_pattern goldens (mod.rs:1915-1938)") {
    assert(IndexPatterns.toRegex("*") == Right("^.*$"))
    assert(IndexPatterns.toRegex("index-1") == Right("^index\\-1$"))
    assert(IndexPatterns.toRegex("*-index-*-1") == Right("^.*\\-index\\-.*\\-1$"))
    assert(IndexPatterns.toRegex("INDEX.2*-1") == Right("^INDEX\\.2.*\\-1$"))
    assert(IndexPatterns.toRegex("index-**-1") == Left(
      "index ID pattern `index-**-1` is invalid: patterns must not contain multiple consecutive `*`"))
    assert(IndexPatterns.toRegex("-index-1").isLeft)
  }

  test("RegexSet matcher matrix (mod.rs:1941-1969), Scala and Column paths agree") {
    val patterns = Seq("index-1", "index-2", "*-index-pattern-1-*", "*.index.pattern.*.2-*")
    val yes = Seq("index-1", "index-2", "abc-index-pattern-1-1", "def-index-pattern-1-2",
      "ghi.index.pattern.1.2-1", "jkl.index.pattern.1.2-bignumber")
    val no = Seq("index-3", "index.pattern.1.2-1")
    yes.foreach(id => assert(IndexPatterns.matches(patterns, id) == Right(true), id))
    no.foreach(id => assert(IndexPatterns.matches(patterns, id) == Right(false), id))
    // match-all short-circuit
    Seq("index-1", "index-2", "abc-index-pattern-1-1").foreach(id =>
      assert(IndexPatterns.matches(Seq("index-1", "*"), id) == Right(true)))
    // the Column predicate resolves the same set over a frame
    val out = (yes ++ no).toDF("index_id")
      .filter(IndexPatterns.matchColumn(patterns, col("index_id")))
      .collect().map(_.getString(0)).toSet
    assert(out == yes.toSet)
  }
}
