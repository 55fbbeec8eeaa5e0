package graft.queryast

import org.scalatest.funsuite.AnyFunSuite
import QueryAst._

/** Golden-AST tests for the query mini-language
  * (reference: docs/reference/query-language.md;
  * user_input_query.rs:64-75 — default operator is AND). */
class UserQueryParserSpec extends AnyFunSuite {

  private def p(q: String) = UserQueryParser.parse(q, Seq("text"))

  test("bare terms on the default field, implicit AND") {
    assert(p("foo") === Term("text", "foo"))
    assert(p("foo bar") === Bool(must = Seq(Term("text", "foo"), Term("text", "bar"))))
  }

  test("explicit AND / OR with precedence (AND binds tighter)") {
    assert(p("a AND b") === Bool(must = Seq(Term("text", "a"), Term("text", "b"))))
    assert(p("a OR b") === Bool(should = Seq(Term("text", "a"), Term("text", "b"))))
    assert(p("a OR b AND c") ===
      Bool(should = Seq(Term("text", "a"),
        Bool(must = Seq(Term("text", "b"), Term("text", "c"))))))
  }

  test("NOT, '-' and '+' prefixes") {
    assert(p("NOT a") === Bool(mustNot = Seq(Term("text", "a"))))
    assert(p("a -b") === Bool(must = Seq(Term("text", "a")), mustNot = Seq(Term("text", "b"))))
    assert(p("+a b") === Bool(must = Seq(Term("text", "a"), Term("text", "b"))))
  }

  test("field-scoped term / wildcard / exists") {
    assert(p("lang:de") === Term("lang", "de"))
    assert(p("source:src1*") === Wildcard("source", "src1*"))
    assert(p("tool:*") === Exists("tool"))
  }

  test("phrases with slop") {
    assert(p("\"hello world\"") === FullText("text", "hello world", ModePhrase(0)))
    assert(p("text:\"hello world\"~2") === FullText("text", "hello world", ModePhrase(2)))
  }

  test("ranges: bracket and comparator forms") {
    assert(p("v:[1 TO 5]") === Range("v", gte = Some("1"), lte = Some("5")))
    assert(p("v:{1 TO 5}") === Range("v", gt = Some("1"), lt = Some("5")))
    assert(p("v:[* TO 5}") === Range("v", lt = Some("5")))
    assert(p("v:>=3") === Range("v", gte = Some("3")))
    assert(p("v:<10") === Range("v", lt = Some("10")))
  }

  test("IN term set") {
    assert(p("lang:IN [de fr]") === TermSet("lang", Seq("de", "fr")))
  }

  test("parenthesized sub-expressions") {
    assert(p("lang:de AND (text:spark OR text:vector) AND NOT source:src3") ===
      Bool(
        must = Seq(
          Term("lang", "de"),
          Bool(should = Seq(Term("text", "spark"), Term("text", "vector")))),
        mustNot = Seq(Term("source", "src3"))))
  }

  test("escapes in bare tokens") {
    assert(p("text:a\\:b") === Term("text", "a:b"))
  }

  test("trailing garbage rejected") {
    intercept[IllegalArgumentException](p("a )"))
  }

  test("default operator OR (ES query_string BooleanOperand default, lib.rs:53-59)") {
    def pOr(q: String) = UserQueryParser.parse(q, Seq("text"), defaultAnd = false)
    // bare juxtaposition takes the default occur (Should)
    assert(pOr("a b") === Bool(should = Seq(Term("text", "a"), Term("text", "b"))))
    // single clause unwrapped either way
    assert(pOr("a") === Term("text", "a"))
    // explicit AND pins BOTH neighbors to must; the bare tail stays should
    assert(pOr("a AND b c") === Bool(
      must = Seq(Term("text", "a"), Term("text", "b")),
      should = Seq(Term("text", "c"))))
    // '+' is must, '-' is mustNot, regardless of the default
    assert(pOr("+a -b c") === Bool(
      must = Seq(Term("text", "a")),
      mustNot = Seq(Term("text", "b")),
      should = Seq(Term("text", "c"))))
    // default AND is unchanged
    assert(p("a b") === Bool(must = Seq(Term("text", "a"), Term("text", "b"))))
  }
}
