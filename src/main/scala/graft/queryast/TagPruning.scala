package graft.queryast

/** Tag-based split pruning — the `extract_tags_from_query` analog
  * (quickwit-doc-mapper/src/tag_pruning.rs:40-160, applied at scan planning
  * in quickwit-search/src/root.rs:1041).
  *
  * Splits store `field:value` tags for configured tag fields, plus a
  * `field!` marker when the value list is exhaustive (≤ cap distinct
  * values). A split may be skipped only when the query PROVABLY cannot match
  * any of its docs: term clauses on tagged fields prune; everything else is
  * uninformative (must be kept — pruning is an optimization, never a
  * filter). */
object TagPruning {

  sealed trait TagFilter
  final case class HasTag(field: String, value: String) extends TagFilter
  final case class And(children: Seq[TagFilter]) extends TagFilter
  final case class Or(children: Seq[TagFilter]) extends TagFilter
  /** Clause that cannot restrict the split set (negations, ranges, full
    * text, untagged fields, …) — always "may match". */
  case object Uninformative extends TagFilter

  /** Positive-form tag extraction. mustNot is deliberately ignored:
    * pruning on a negation is unsound when a split holds mixed values
    * (tag_pruning.rs keeps only the positive skeleton too). */
  def extract(q: QueryAst, tagFields: Set[String]): TagFilter = q match {
    case QueryAst.Term(f, v) if tagFields(f)     => HasTag(f, v)
    case QueryAst.TermSet(f, vs) if tagFields(f) => Or(vs.map(HasTag(f, _)))
    case QueryAst.Boost(inner, _)                => extract(inner, tagFields)
    case b: QueryAst.Bool =>
      val musts = (b.must ++ b.filterQ).map(extract(_, tagFields))
      if (musts.nonEmpty) And(musts)
      else if (b.should.nonEmpty) Or(b.should.map(extract(_, tagFields)))
      else Uninformative
    case _ => Uninformative
  }

  /** Whether a split with `tags` may contain a matching doc. A tagged field
    * prunes only when the split carries the exhaustive `field!` marker. */
  def mayMatch(f: TagFilter, tags: Set[String]): Boolean = f match {
    case Uninformative => true
    case HasTag(fld, v) =>
      if (tags.contains(s"$fld!")) tags.contains(s"$fld:$v") else true
    case And(cs) => cs.forall(mayMatch(_, tags))
    case Or(cs)  => cs.isEmpty || cs.exists(mayMatch(_, tags))
  }
}
