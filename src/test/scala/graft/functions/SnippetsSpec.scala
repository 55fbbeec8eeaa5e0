package graft.functions

import graft.SparkTestBase
import org.apache.spark.sql.Column

/** Snippet-generation pins mirroring the reference's fetch-phase
  * SnippetGenerator behavior (fetch_docs.rs:50-130). */
class SnippetsSpec extends SparkTestBase {

  private def snip(text: String, term: String, window: Int = 30): String =
    evalStr[String](text, (c: Column) => Snippets.snippet(c, term, window))

  test("highlights the first occurrence with window context") {
    assert(snip("alpha spark beta", "spark", 6) === "alpha <b>spark</b> beta")
  }

  test("window truncates long context") {
    assert(snip("0123456789 spark tail", "spark", 4) === "789 <b>spark</b> tai")
  }

  test("case-insensitive match keeps original casing in the highlight") {
    assert(snip("say Spark loudly", "spark", 4) === "say <b>Spark</b> lou")
  }

  test("no occurrence → null") {
    assert(snip("nothing here", "spark") === null)
  }

  test("multi-term form joins fragments and skips unmatched terms") {
    val got = evalStr[String]("spark and vector here",
      (c: Column) => Snippets.snippets(c, Seq("spark", "vector", "absent"), 4))
    assert(got === "<b>spark</b> and…and <b>vector</b> her")
  }
}
