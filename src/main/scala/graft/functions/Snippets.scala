package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Fetch-phase snippet generation — the reference builds highlighted
  * fragments around matched terms when `snippet_fields` is requested
  * (quickwit-search/src/fetch_docs.rs:33,50-130, SnippetGenerator with
  * <b>…</b> highlight tags). Expressed as a single codegen'd regexp over the
  * stored text: the fragment is the first case-insensitive occurrence of the
  * term with up to `window` context chars on each side, the hit wrapped in
  * <b></b> with its original casing preserved. */
object Snippets {

  /** Highlighted fragment for one term; NULL when the term does not occur. */
  def snippet(text: Column, term: String, window: Int = 30): Column = {
    val quoted = java.util.regex.Pattern.quote(term)
    val pat = s"(?i)(.{0,$window})($quoted)(.{0,$window})"
    val hit = regexp_extract(text, pat, 2)
    when(hit =!= "",
      concat(regexp_extract(text, pat, 1), lit("<b>"), hit, lit("</b>"),
             regexp_extract(text, pat, 3)))
      .otherwise(lit(null).cast("string"))
  }

  /** Multi-term form: one fragment per matched term (unmatched terms are
    * skipped), concatenated with the reference's fragment separator. */
  def snippets(text: Column, terms: Seq[String], window: Int = 30): Column =
    array_join(
      filter(array(terms.map(t => snippet(text, t, window)): _*), _.isNotNull),
      "…")
}
