package graft.queryast

import QueryAst._

/** Parser for Quickwit's query mini-language
  * (reference: docs/reference/query-language.md;
  * quickwit-query/src/query_ast/user_input_query.rs:64-75).
  *
  * Supported grammar:
  *   query     := orExpr
  *   orExpr    := andExpr (OR andExpr)*
  *   andExpr   := unary ((AND)? unary)*        -- default operator AND
  *   unary     := (NOT | '-' | '+')? primary
  *   primary   := '(' query ')' | clause
  *   clause    := [field ':'] (phrase[~slop] | range | set | wildcard | term | '*')
  *   range     := ('[' | '{') bound TO bound (']' | '}') | ('>='|'>'|'<='|'<') value
  *   set       := IN '[' value* ']'
  *
  * `field:*` = exists. Escapes: `\` before any reserved char.
  */
object UserQueryParser {

  def parse(query: String, defaultFields: Seq[String],
            defaultAnd: Boolean = true): QueryAst =
    new Parser(query, defaultFields, defaultAnd).parseQuery()

  private final class Parser(s: String, defaultFields: Seq[String], defaultAnd: Boolean) {
    private var i = 0

    def parseQuery(): QueryAst = {
      val q = orExpr()
      ws()
      require(i >= s.length, s"trailing input at $i: '${s.substring(i)}'")
      q
    }

    private def orExpr(): QueryAst = {
      var clauses = List(andExpr())
      while ({ ws(); peekWord("OR") }) {
        eatWord("OR")
        clauses ::= andExpr()
      }
      if (clauses.size == 1) clauses.head
      else Bool(should = clauses.reverse)
    }

    private def andExpr(): QueryAst = {
      // clause markers: Some(true)=+ (must), Some(false)=NOT/- (mustNot),
      // None = bare (resolved to the default occur; an explicit AND join
      // upgrades BOTH neighbors to must, mirroring tantivy grammar occurs)
      var clauses = Vector.empty[(Option[Boolean], QueryAst)]
      var andJoin = Vector.empty[Boolean] // andJoin(k): clause k AND-joined to k+1
      def one(): Unit = {
        ws()
        if (peekWord("NOT") ) { eatWord("NOT"); clauses :+= (Some(false) -> primary()) }
        else if (peek == '-') { i += 1; clauses :+= (Some(false) -> primary()) }
        else if (peek == '+') { i += 1; clauses :+= (Some(true) -> primary()) }
        else clauses :+= (None -> primary())
      }
      one()
      while ({ ws(); i < s.length && peek != ')' && !peekWord("OR") }) {
        val joined = peekWord("AND")
        if (joined) eatWord("AND")
        andJoin :+= joined
        one()
      }
      val n = clauses.size
      def andTouched(k: Int): Boolean =
        (k > 0 && andJoin(k - 1)) || (k < n - 1 && andJoin(k))
      var must = List.empty[QueryAst]
      var mustNot = List.empty[QueryAst]
      var should = List.empty[QueryAst]
      clauses.zipWithIndex.foreach {
        case ((Some(false), q), _) => mustNot ::= q
        case ((Some(true), q), _)  => must ::= q
        case ((None, q), k) =>
          if (defaultAnd || andTouched(k)) must ::= q else should ::= q
      }
      (must, mustNot, should) match {
        case (m :: Nil, Nil, Nil) => m
        case (Nil, Nil, sh :: Nil) => sh
        case _ =>
          Bool(must = must.reverse, mustNot = mustNot.reverse, should = should.reverse)
      }
    }

    private def primary(): QueryAst = {
      ws()
      if (peek == '(') {
        i += 1
        val q = orExpr()
        ws(); expect(')')
        q
      } else clause()
    }

    private def clause(): QueryAst = {
      ws()
      if (peek == '"') return defaultFieldClause() // bare phrase on default fields
      val start = i
      val tok = bareToken()
      if (i < s.length && peek == ':') {
        i += 1
        fieldClause(tok)
      } else {
        i = start
        defaultFieldClause()
      }
    }

    private def defaultFieldClause(): QueryAst = {
      require(defaultFields.nonEmpty, "no default field set")
      ws()
      val make: String => QueryAst =
        if (peek == '"') { val (p, slop) = phrase(); f => FullText(f, p, ModePhrase(slop)) }
        else { val t = bareToken(); f =>
          if (t.contains("*") || t.contains("?")) Wildcard(f, t) else Term(f, t) }
      val alts = defaultFields.map(make)
      if (alts.size == 1) alts.head else Bool(should = alts)
    }

    private def fieldClause(field: String): QueryAst = {
      ws()
      peek match {
        case '"' =>
          val (p, slop) = phrase()
          FullText(field, p, ModePhrase(slop))
        case '[' | '{' => rangeClause(field)
        case '>' | '<' => comparatorClause(field)
        case 'I' if peekWord("IN") =>
          eatWord("IN"); ws(); expect('[')
          val vals = Seq.newBuilder[String]
          ws()
          while (peek != ']') { vals += bareToken(); ws() }
          i += 1
          TermSet(field, vals.result())
        case '*' if i + 1 >= s.length || isClauseEnd(s.charAt(i + 1)) =>
          i += 1; Exists(field)
        case _ =>
          val t = bareToken()
          if (t.contains("*") || t.contains("?")) Wildcard(field, t) else Term(field, t)
      }
    }

    private def rangeClause(field: String): QueryAst = {
      val loInc = peek == '['
      i += 1
      ws(); val lo = bareToken()
      ws(); eatWord("TO")
      ws(); val hi = bareToken()
      ws()
      val hiInc = peek == ']'
      i += 1
      val gte = if (lo != "*" && loInc) Some(lo: Any) else None
      val gt  = if (lo != "*" && !loInc) Some(lo: Any) else None
      val lte = if (hi != "*" && hiInc) Some(hi: Any) else None
      val ltv = if (hi != "*" && !hiInc) Some(hi: Any) else None
      Range(field, gte = gte, gt = gt, lte = lte, lt = ltv)
    }

    private def comparatorClause(field: String): QueryAst = {
      val op = new StringBuilder
      op += peek; i += 1
      if (peek == '=') { op += '='; i += 1 }
      val v = bareToken()
      op.result() match {
        case ">=" => Range(field, gte = Some(v))
        case ">"  => Range(field, gt = Some(v))
        case "<=" => Range(field, lte = Some(v))
        case "<"  => Range(field, lt = Some(v))
      }
    }

    /** Returns (phraseText, slop). */
    private def phrase(): (String, Int) = {
      expect('"')
      val sb = new StringBuilder
      while (peek != '"') {
        if (peek == '\\') i += 1
        sb += peek; i += 1
      }
      i += 1
      var slop = 0
      if (i < s.length && peek == '~') {
        i += 1
        val st = i
        while (i < s.length && peek.isDigit) i += 1
        slop = s.substring(st, i).toInt
      }
      (sb.result(), slop)
    }

    private def bareToken(): String = {
      ws()
      val sb = new StringBuilder
      while (i < s.length && !isClauseEnd(peek)) {
        if (peek == '\\' && i + 1 < s.length) { i += 1; sb += peek; i += 1 }
        else { sb += peek; i += 1 }
      }
      require(sb.nonEmpty, s"empty token at $i in '$s'")
      sb.result()
    }

    private def isClauseEnd(c: Char): Boolean =
      c.isWhitespace || c == ':' || c == ')' || c == '(' || c == ']' || c == '}' || c == '"'

    private def peek: Char = s.charAt(i)
    private def ws(): Unit = while (i < s.length && s.charAt(i).isWhitespace) i += 1
    private def expect(c: Char): Unit = {
      require(i < s.length && s.charAt(i) == c, s"expected '$c' at $i in '$s'")
      i += 1
    }
    private def peekWord(w: String): Boolean =
      s.regionMatches(i, w, 0, w.length) &&
        (i + w.length >= s.length || !s.charAt(i + w.length).isLetterOrDigit)
    private def eatWord(w: String): Unit = { require(peekWord(w)); i += w.length }
  }
}
