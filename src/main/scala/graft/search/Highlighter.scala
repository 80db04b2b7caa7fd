package graft.search

import graft.analysis.Analyzer

/** Query highlighting — the reference's contrib Highlighter re-expressed
  * (/root/reference/src/contrib/highlighter/: Highlighter.cpp fragment
  * loop, SimpleFragmenter.cpp fixed-size fragmenting, QueryTermScorer.cpp
  * distinct-term fragment scoring, SimpleHTMLFormatter.cpp tag wrapping).
  *
  * The document is re-analyzed with offsets; fragments are consecutive
  * token runs of ~fragmentSize source chars; a fragment's score is the sum
  * of the weights (query boosts) of the DISTINCT query terms it contains;
  * the best fragments are returned with matched tokens wrapped in
  * pre/post tags. Multi-term nodes should be expanded first (or their
  * terms passed explicitly) — like the reference's QueryTermExtractor,
  * which reads terms from the (rewritten) query. */
object Highlighter {

  /** (term → weight) extraction, QueryTermExtractor.cpp semantics: positive
    * clauses only, weight = accumulated boost. */
  def weightedTerms(q: Query): Map[String, Float] = {
    val acc = scala.collection.mutable.Map.empty[String, Float]
    def add(t: String, w: Float): Unit =
      acc(t) = math.max(acc.getOrElse(t, 0f), w)
    def walk(q: Query, boost: Float): Unit = q match {
      case TermQ(t, b) => add(t, boost * b)
      case PhraseQ(ts, _, b) => ts.foreach(add(_, boost * b))
      case MultiPhraseQ(slots, b) => slots.flatten.foreach(add(_, boost * b))
      case BoolQ(m, s, _, _) => (m ++ s).foreach(walk(_, boost)) // not prohibited
      case ConstantScoreQ(inner, b) => walk(inner, boost * b)
      case CachedQ(inner) => walk(inner, boost)
      case CustomScoreQ(sub, _, b, _) => walk(sub, boost * b)
      case DisMaxQ(ds, _, b) => ds.foreach(walk(_, boost * b))
      case FilteredQ(q2, _) => walk(q2, boost) // filter side does not highlight
      case TermSetQ(ts, b) => ts.foreach(add(_, boost * b))
      case sq: SpanQuery => Spans.weightTerms(sq).foreach(add(_, boost * sq.boost))
      case PayloadTermQ(t, _, _, b) => add(t, boost * b)
      case _: MultiTermQ => () // expand first (reference rewrites first too)
      case MatchAllQ | _: ValueSourceQ | _: MetaFieldQ => ()
    }
    walk(q, 1f)
    acc.toMap
  }

  final case class Fragment(text: String, score: Float, startOffset: Int)

  /** Best fragments, highest score first (Highlighter.cpp
    * getBestTextFragments); fragments with no matched term are dropped. */
  def bestFragments(q: Query, analyzer: Analyzer, text: String,
      fragmentSize: Int = 100, maxFragments: Int = 3,
      pre: String = "<B>", post: String = "</B>"): Seq[String] = {
    val weights = weightedTerms(q)
    if (weights.isEmpty || text.isEmpty) return Nil

    val tokens = analyzer.analyze(text).toArray
    if (tokens.isEmpty) return Nil

    // SimpleFragmenter: a new fragment starts once a token's end offset
    // crosses the next fragmentSize boundary
    val frags = scala.collection.mutable.ArrayBuffer.empty[(Int, Int)] // token index range
    var fragStartTok = 0
    var boundary = fragmentSize
    var i = 0
    while (i < tokens.length) {
      if (tokens(i).end >= boundary && i > fragStartTok) {
        frags += ((fragStartTok, i))
        fragStartTok = i
        while (boundary <= tokens(i).end) boundary += fragmentSize
      }
      i += 1
    }
    frags += ((fragStartTok, tokens.length))

    val scored = frags.map { case (a, b) =>
      // distinct-term scoring (QueryTermScorer.cpp getTokenScore + uniqueTermsInFragment)
      val seen = scala.collection.mutable.Set.empty[String]
      var s = 0f
      var t = a
      while (t < b) {
        val term = tokens(t).term
        if (weights.contains(term) && seen.add(term)) s += weights(term)
        t += 1
      }
      val srcStart = if (a == 0) 0 else tokens(a).start
      val srcEnd = if (b == tokens.length) text.length else tokens(b).start
      (a, b, s, srcStart, srcEnd)
    }.filter(_._3 > 0f)

    scored.sortBy(f => (-f._3, f._4)).take(maxFragments).map { case (a, b, _, srcStart, srcEnd) =>
      val sb = new StringBuilder
      var cur = srcStart
      var t = a
      while (t < b) {
        val tok = tokens(t)
        if (weights.contains(tok.term) && tok.start >= cur) {
          sb.append(text.substring(cur, tok.start)).append(pre)
            .append(text.substring(tok.start, tok.end)).append(post)
          cur = tok.end
        }
        t += 1
      }
      sb.append(text.substring(cur, srcEnd))
      sb.toString
    }.toSeq
  }
}
