package graft.parse

import org.scalatest.funsuite.AnyFunSuite

/** Env-var config templating pinned on the reference's own test matrix
  * (quickwit-config/src/templating.rs:101-177) — substitution, brace
  * whitespace, `:-` defaults, unset-without-default error, comment-line
  * passthrough — plus the render-before-validate index-config load. */
class ConfigTemplatingSpec extends AnyFunSuite {

  private def env(pairs: (String, String)*): String => Option[String] =
    pairs.toMap.get

  test("set variable substitutes its value (test_template_render)") {
    assert(ConfigTemplating.render(
      "metastore_uri: ${QW_TEST_VAR}", env("QW_TEST_VAR" -> "s3://test-bucket/metastore"))
      === "metastore_uri: s3://test-bucket/metastore")
  }

  test("whitespace inside braces is ignored (test_template_render_supports_whitespaces)") {
    assert(ConfigTemplating.render(
      "metastore_uri: ${  QW_TEST_VAR  }", env("QW_TEST_VAR" -> "s3://test-bucket/metastore"))
      === "metastore_uri: s3://test-bucket/metastore")
  }

  test("unset variable falls back to the `:-` default, whitespace tolerated") {
    assert(ConfigTemplating.render(
      "metastore_uri: ${QW_NOT_SET:-s3://test-bucket/metastore}", env())
      === "metastore_uri: s3://test-bucket/metastore")
    assert(ConfigTemplating.render(
      "metastore_uri: ${  QW_NOT_SET  :-  s3://test-bucket/metastore  }", env())
      === "metastore_uri: s3://test-bucket/metastore")
  }

  test("set variable WINS over the default (test_template_render_with_default_use_env)") {
    assert(ConfigTemplating.render(
      "metastore_uri: ${QW_TEST_VAR:-s3://test-bucket/wrongbucket}",
      env("QW_TEST_VAR" -> "s3://test-bucket/metastore"))
      === "metastore_uri: s3://test-bucket/metastore")
  }

  test("unset without default is the reference's error (test_template_render_should_panic)") {
    val e = intercept[IllegalArgumentException] {
      ConfigTemplating.render("metastore_uri: ${QW_NOT_SET}", env())
    }
    assert(e.getMessage === "failed to render config file template: environment " +
      "variable `QW_NOT_SET` is not set and no default value is provided")
  }

  test("commented-out lines keep the literal template (test_template_render_ignores_commented_lines)") {
    assert(ConfigTemplating.render("# metastore_uri: ${QW_NOT_SET}", env())
      === "# metastore_uri: ${QW_NOT_SET}")
    assert(ConfigTemplating.render(
      " # metastore_uri: ${ QW_NOT_SET :- default-value }", env())
      === " # metastore_uri: ${ QW_NOT_SET :- default-value }")
  }

  test("a commented occurrence never clobbers a live one (documented divergence)") {
    val content =
      """index_uri: ${QW_TEST_VAR}
        |# example: index_uri: ${QW_TEST_VAR}""".stripMargin
    assert(ConfigTemplating.render(content, env("QW_TEST_VAR" -> "file:///tmp/idx"))
      === "index_uri: file:///tmp/idx\n# example: index_uri: ${QW_TEST_VAR}")
  }

  test("substitution values are literal — `$` and `\\` never act as backreferences") {
    assert(ConfigTemplating.render("v: ${QW_TEST_VAR}", env("QW_TEST_VAR" -> """pre$1\post"""))
      === """v: pre$1\post""")
  }

  test("multiple variables on one line; several lines; empty lines preserved") {
    val content = "a: ${A}\n\nb: ${B:-bee} ${A}"
    assert(ConfigTemplating.render(content, env("A" -> "ay"))
      === "a: ay\n\nb: bee ay")
  }

  test("loadIndexConfig renders BEFORE validating (serialize.rs:134 order)") {
    val content =
      """{"index_id": "${QW_INDEX_ID}",
        | "doc_mapping": {"field_mappings": [
        |   {"name": "text", "type": "text"},
        |   {"name": "ts", "type": "datetime", "fast": true}]}}""".stripMargin
    val cfg = ConfigTemplating.loadIndexConfig(content, env("QW_INDEX_ID" -> "transcripts-a"))
    assert(cfg.indexId === "transcripts-a")
    // an unset id both fails the render — never reaching the validator
    val e = intercept[IllegalArgumentException] {
      ConfigTemplating.loadIndexConfig(content, env())
    }
    assert(e.getMessage.contains("environment variable `QW_INDEX_ID` is not set"))
  }
}
