package graft.search

import graft.analysis.Analyzer

/** Hand-written recursive-descent parser for the classic query syntax
  * (reference /root/reference/src/core/queryparser/QueryParser.cpp:106-800 —
  * we re-implement the documented grammar, not the JavaCC tables):
  *
  * {{{
  *   +required -prohibited term  AND OR NOT && || !
  *   "a phrase"~slop   wild*card   wi?ld   prefix*   fuzzy~   fuzzy~0.7
  *   [lo TO hi]  {lo TO hi}   term^2.5   ( nested )
  * }}}
  *
  * Boolean combination follows the reference's addClause state machine:
  * an AND connective promotes BOTH adjacent clauses to required; NOT / '-'
  * prohibits the next clause; default operator is OR (SHOULD). Terms are
  * passed through the analyzer (a term that analyzes to several tokens
  * becomes a phrase); wildcard/fuzzy/range terms are lowercased only. */
object QueryParser {

  def parse(input: String, analyzer: Analyzer,
      metaFields: Set[String] = Set.empty): Query = {
    val p = new Parser(input, analyzer, metaFields)
    val q = p.parseQuery()
    Query.rewrite(q)
  }

  private sealed trait Conj
  private case object ConjNone extends Conj
  private case object ConjAnd extends Conj
  private case object ConjOr extends Conj

  private final class Parser(s: String, analyzer: Analyzer,
      metaFields: Set[String]) {
    private var i = 0

    def parseQuery(): Query = {
      val should = scala.collection.mutable.ArrayBuffer.empty[Query]
      val mustNot = Seq.newBuilder[Query]
      val mustBuf = scala.collection.mutable.ArrayBuffer.empty[Query]

      var conj: Conj = ConjNone
      var prohibited = false
      var required = false
      var prevWasShould = false // for AND promotion of the previous clause

      skipWs()
      while (i < s.length && s.charAt(i) != ')') {
        // connective? (word() self-resets when the token is not one)
        word() match {
          case Some("AND") | Some("&&") => conj = ConjAnd
          case Some("OR") | Some("||") => conj = ConjOr
          case Some("NOT") | Some("!") => prohibited = true
          case _ =>
        }
        skipWs()
        if (i < s.length && s.charAt(i) != ')') {
          // modifiers
          if (s.charAt(i) == '+') { required = true; i += 1 }
          else if (s.charAt(i) == '-') { prohibited = true; i += 1 }
          val clause = parseClause()
          clause.foreach { c =>
            if (prohibited) { mustNot += c; prevWasShould = false }
            else if (required || conj == ConjAnd) {
              // AND promotes the previous SHOULD clause too (reference
              // QueryParser addClause semantics)
              if (conj == ConjAnd && prevWasShould && should.nonEmpty)
                mustBuf += should.remove(should.length - 1)
              mustBuf += c
              prevWasShould = false
            } else { should += c; prevWasShould = true }
          }
          conj = ConjNone
          prohibited = false
          required = false
        }
        skipWs()
      }
      BoolQ(mustBuf.toSeq, should.toSeq, mustNot.result(), 0)
    }

    /** One clause (not including +/- which the caller consumed). */
    private def parseClause(): Option[Query] = {
      skipWs()
      if (i >= s.length) return None
      s.charAt(i) match {
        case '(' =>
          i += 1
          val inner = parseQuery()
          expect(')')
          Some(withBoost(inner))
        case '"' =>
          i += 1
          val sb = new StringBuilder
          while (i < s.length && s.charAt(i) != '"') {
            // \" embeds a quote (QueryParser.cpp discardEscapeChar :568-607)
            if (s.charAt(i) == '\\' && i + 1 < s.length) { sb.append(s.charAt(i + 1)); i += 2 }
            else { sb.append(s.charAt(i)); i += 1 }
          }
          val raw = sb.toString
          expect('"')
          var slop = 0
          if (i < s.length && s.charAt(i) == '~') {
            i += 1
            slop = number().map(_.toInt).getOrElse(0)
          }
          val terms = analyzer.analyze(raw).map(_.term).toSeq
          val q = terms match {
            case Nil => return None
            case Seq(t) => TermQ(t)
            case ts => PhraseQ(ts, slop)
          }
          Some(withBoost(q))
        case '[' | '{' =>
          val includeLower = s.charAt(i) == '['
          i += 1
          val lo = rangeTerm()
          skipWs()
          val afterLo = rangeTerm()
          val hi =
            if (afterLo.equalsIgnoreCase("TO")) { skipWs(); rangeTerm() }
            else afterLo
          skipWs()
          // each bracket carries its own inclusivity: [a TO b} is
          // lower-inclusive, upper-exclusive (classic syntax)
          var includeUpper = includeLower
          if (i < s.length && (s.charAt(i) == ']' || s.charAt(i) == '}')) {
            includeUpper = s.charAt(i) == ']'
            i += 1
          }
          val lower = if (lo == "*") None else Some(lo.toLowerCase)
          val upper = if (hi == "*") None else Some(hi.toLowerCase)
          Some(withBoost(TermRangeQ(lower, upper, includeLower, includeUpper)))
        case _ =>
          // term scan with \-escapes: an escaped char is literal — never a
          // wildcard, field colon, or terminator
          // (QueryParser.cpp discardEscapeChar :568-607)
          val start = i
          val sb = new StringBuilder
          val isEsc = scala.collection.mutable.ArrayBuffer.empty[Boolean]
          var scanning = true
          while (scanning && i < s.length) {
            val c = s.charAt(i)
            if (c == '\\' && i + 1 < s.length) { sb.append(s.charAt(i + 1)); isEsc += true; i += 2 }
            else if (isTermEnd(c)) scanning = false
            else { sb.append(c); isEsc += false; i += 1 }
          }
          if (i == start) { i += 1; return None }
          if (sb.isEmpty) return None
          var text = sb.toString
          var esc = isEsc.toIndexedSeq
          // field prefix at the first UNescaped ':' — a registered METADATA
          // field (lang:, source:, url:) dispatches to a MetaFieldQ
          // predicate on the source table (reference QueryParser field
          // dispatch, QueryParser.cpp:296-458); other field names are
          // accepted and stripped (single-text-field engine)
          val colon = esc.indices.find(j => text.charAt(j) == ':' && !esc(j)).getOrElse(-1)
          if (colon > 0 && colon < text.length - 1) {
            val field = text.substring(0, colon)
            if (metaFields.contains(field))
              return Some(MetaFieldQ(field, text.substring(colon + 1)))
            text = text.substring(colon + 1)
            esc = esc.drop(colon + 1)
          }
          // fuzzy?
          if (i < s.length && s.charAt(i) == '~') {
            i += 1
            val sim = number().map(_.toFloat).getOrElse(0.5f)
            return Some(withBoost(FuzzyQ(text.toLowerCase, sim)))
          }
          def unescapedWild(j: Int): Boolean =
            (text.charAt(j) == '*' || text.charAt(j) == '?') && !esc(j)
          val q: Query =
            if (text.indices.exists(unescapedWild)) {
              val lower = text.toLowerCase
              if (unescapedWild(text.length - 1) && text.charAt(text.length - 1) == '*' &&
                !text.indices.dropRight(1).exists(unescapedWild))
                PrefixQ(lower.dropRight(1))
              else WildcardQ(lower)
            } else {
              val toks = analyzer.analyze(text).map(_.term).toSeq
              toks match {
                case Nil => return None
                case Seq(t) => TermQ(t)
                case ts => PhraseQ(ts)
              }
            }
          Some(withBoost(q))
      }
    }

    private def withBoost(q: Query): Query = {
      if (i < s.length && s.charAt(i) == '^') {
        i += 1
        val b = number().map(_.toFloat).getOrElse(1f)
        q match {
          case t: TermQ => t.copy(boost = b)
          case p: PhraseQ => p.copy(boost = b)
          case pr: PrefixQ => pr.copy(boost = b)
          case w: WildcardQ => w.copy(boost = b)
          case r: TermRangeQ => r.copy(boost = b)
          case f: FuzzyQ => f.copy(boost = b)
          case c: ConstantScoreQ => c.copy(boost = b)
          case d: DisMaxQ => d.copy(boost = b)
          case other => ConstantScoreQ(other, b) // boosted sub-query
        }
      } else q
    }

    private def rangeTerm(): String = {
      skipWs()
      val start = i
      while (i < s.length && !s.charAt(i).isWhitespace &&
        s.charAt(i) != ']' && s.charAt(i) != '}') i += 1
      s.substring(start, i)
    }

    private def number(): Option[Double] = {
      val start = i
      while (i < s.length && (s.charAt(i).isDigit || s.charAt(i) == '.')) i += 1
      if (i == start) None else Some(s.substring(start, i).toDouble)
    }

    private def word(): Option[String] = {
      skipWs()
      val start = i
      if (i < s.length && (s.charAt(i) == '&' || s.charAt(i) == '|' || s.charAt(i) == '!')) {
        if (s.startsWith("&&", i)) { i += 2; return Some("&&") }
        if (s.startsWith("||", i)) { i += 2; return Some("||") }
        if (s.charAt(i) == '!') { i += 1; return Some("!") }
      }
      while (i < s.length && s.charAt(i).isUpper) i += 1
      val w = s.substring(start, i)
      if ((w == "AND" || w == "OR" || w == "NOT") &&
        (i >= s.length || s.charAt(i).isWhitespace)) Some(w)
      else { i = start; None }
    }

    private def isTermEnd(c: Char): Boolean =
      c.isWhitespace || c == ')' || c == '(' || c == '^' || c == '~' || c == '"'

    private def skipWs(): Unit = { while (i < s.length && s.charAt(i).isWhitespace) i += 1 }
    private def expect(c: Char): Unit = { if (i < s.length && s.charAt(i) == c) i += 1 }
  }
}
