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

  /** Markup hook: (matched source text, score) → wrapped text. */
  type Formatter = (String, Float) => String

  /** SimpleHTMLFormatter.cpp: fixed pre/post tags. */
  def tagFormatter(pre: String = "<B>", post: String = "</B>"): Formatter =
    (t, _) => pre + t + post

  /** GradientFormatter.cpp: a font tag whose fore/background colors are
    * interpolated by score between min and max hex colors ("#rrggbb").
    * Ported quirk and all: getColorVal interpolates upward from the
    * LOWER channel value regardless of which endpoint is the min color. */
  def gradientFormatter(maxScore: Float,
      minFg: String = null, maxFg: String = null,
      minBg: String = null, maxBg: String = null): Formatter = {
    def parse(c: String): Array[Int] = {
      require(c.length == 7 && c.charAt(0) == '#',
        s"color is not a hex RGB value such as #FFFFFF: $c")
      Array(Integer.parseInt(c.substring(1, 3), 16),
        Integer.parseInt(c.substring(3, 5), 16),
        Integer.parseInt(c.substring(5, 7), 16))
    }
    val fg = if (minFg != null && maxFg != null) Some((parse(minFg), parse(maxFg))) else None
    val bg = if (minBg != null && maxBg != null) Some((parse(minBg), parse(maxBg))) else None
    def colorVal(lo: Int, hi: Int, score: Float): Int =
      if (lo == hi) lo
      else math.min(lo, hi) +
        (math.abs(lo - hi) * (math.min(maxScore, score) / maxScore)).toInt
    def color(ends: (Array[Int], Array[Int]), score: Float): String =
      (0 until 3).map(i => f"${colorVal(ends._1(i), ends._2(i), score)}%02x").mkString
    (text, score) =>
      if (score <= 0f) text
      else {
        val sb = new StringBuilder("<font ")
        fg.foreach(e => sb.append("color=\"#").append(color(e, score)).append("\" "))
        bg.foreach(e => sb.append("bgcolor=\"#").append(color(e, score)).append("\" "))
        sb.append(">").append(text).append("</font>")
        sb.toString
      }
  }

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

  /** A term's highlight weight plus, when it came from a positional query,
    * the token-position ranges where that query actually matched
    * (WeightedSpanTerm.cpp: positionSensitive + PositionSpans). */
  final case class WeightedSpanTerm(weight: Float, positionSensitive: Boolean,
      spans: Seq[(Int, Int)]) { // [start, endExclusive) token positions
    def checkPosition(p: Int): Boolean =
      !positionSensitive || spans.exists(s => p >= s._1 && p < s._2)
  }

  /** Span-aware term extraction (WeightedSpanTermExtractor.cpp): phrase
    * and span sub-queries contribute their terms ONLY at the positions
    * where the phrase/span actually matches in this document; plain term
    * queries stay position-insensitive. A term reached both ways keeps the
    * insensitive (wider) form, like the reference's extractWeightedTerms
    * overwrite of a position-sensitive entry. */
  def weightedSpanTerms(q: Query,
      termPositions: String => Option[Array[Int]]): Map[String, WeightedSpanTerm] = {
    val acc = scala.collection.mutable.Map.empty[String, WeightedSpanTerm]
    def addPlain(t: String, w: Float): Unit = acc.get(t) match {
      case Some(e) =>
        acc(t) = WeightedSpanTerm(math.max(e.weight, w), positionSensitive = false, Nil)
      case None => acc(t) = WeightedSpanTerm(w, positionSensitive = false, Nil)
    }
    def addSpans(sq: SpanQuery, boost: Float): Unit = {
      val matched = scala.collection.mutable.ArrayBuffer.empty[(Int, Int)]
      Spans.buildLocal(sq, termPositions).foreach { sp =>
        while (sp.next()) matched += ((sp.start, sp.end))
      }
      if (matched.isEmpty) return // no match in this doc: nothing to highlight
      Spans.weightTerms(sq).foreach { t =>
        acc.get(t) match {
          case Some(e) if !e.positionSensitive => () // insensitive stays wider
          case Some(e) =>
            acc(t) = WeightedSpanTerm(math.max(e.weight, boost),
              positionSensitive = true, (e.spans ++ matched).distinct)
          case None =>
            acc(t) = WeightedSpanTerm(boost, positionSensitive = true, matched.toSeq)
        }
      }
    }
    def walk(q: Query, boost: Float): Unit = q match {
      case TermQ(t, b) => addPlain(t, boost * b)
      case TermSetQ(ts, b) => ts.foreach(addPlain(_, boost * b))
      case PayloadTermQ(t, _, _, b) => addPlain(t, boost * b)
      case PhraseQ(ts, slop, b) =>
        // PhraseQuery → SpanNear with inOrder iff slop == 0
        // (WeightedSpanTermExtractor.cpp:66-86)
        addSpans(SpanNearQ(ts.map(SpanTermQ(_)), slop, inOrder = slop == 0), boost * b)
      case MultiPhraseQ(slots, b) =>
        val clauses = slots.map { sl =>
          if (sl.size == 1) SpanTermQ(sl.head)
          else SpanOrQ(sl.map(SpanTermQ(_)))
        }
        addSpans(SpanNearQ(clauses, 0, inOrder = true), boost * b)
      case PayloadNearQ(cs, slop, inOrder, _, b) =>
        addSpans(SpanNearQ(cs, slop, inOrder), boost * b)
      case sq: SpanQuery => addSpans(sq, boost * sq.boost)
      case BoolQ(m, s, _, _) => (m ++ s).foreach(walk(_, boost))
      case ConstantScoreQ(inner, b) => walk(inner, boost * b)
      case CachedQ(inner) => walk(inner, boost)
      case CustomScoreQ(sub, _, b, _) => walk(sub, boost * b)
      case DisMaxQ(ds, _, b) => ds.foreach(walk(_, boost * b))
      case FilteredQ(q2, _) => walk(q2, boost)
      case _ => ()
    }
    walk(q, 1f)
    acc.toMap
  }

  /** Best fragments with span-accurate highlighting (QueryScorer.cpp):
    * phrase/span terms are wrapped only where the phrase/span matched, so
    * a stray "york" far from "new" stays unhighlighted for the phrase
    * query "new york". */
  def bestFragmentsSpanAware(q: Query, analyzer: Analyzer, text: String,
      fragmentSize: Int = 100, maxFragments: Int = 3,
      pre: String = "<B>", post: String = "</B>",
      formatterOverride: Formatter = null): Seq[String] = {
    val formatter = if (formatterOverride != null) formatterOverride else tagFormatter(pre, post)
    val doc = BruteForce.analyzeCorpus(analyzer, Seq((0L, text))).head
    val wst = weightedSpanTerms(q, t => doc.termPositions.get(t))
    if (wst.isEmpty || text.isEmpty) return Nil
    val tokens = analyzer.analyze(text).toArray
    if (tokens.isEmpty) return Nil
    // token index → token position (posIncr-accumulated, first at 0)
    val positions = new Array[Int](tokens.length)
    var pos = -1
    var i = 0
    while (i < tokens.length) {
      pos += math.max(1, tokens(i).posIncr); positions(i) = pos; i += 1
    }
    render(tokens, text, fragmentSize, maxFragments, formatter,
      (idx, term) => wst.get(term).filter(_.checkPosition(positions(idx))).map(_.weight))
  }

  /** Best fragments, highest score first (Highlighter.cpp
    * getBestTextFragments); fragments with no matched term are dropped. */
  def bestFragments(q: Query, analyzer: Analyzer, text: String,
      fragmentSize: Int = 100, maxFragments: Int = 3,
      pre: String = "<B>", post: String = "</B>",
      formatterOverride: Formatter = null): Seq[String] = {
    val formatter = if (formatterOverride != null) formatterOverride else tagFormatter(pre, post)
    val weights = weightedTerms(q)
    if (weights.isEmpty || text.isEmpty) return Nil

    val tokens = analyzer.analyze(text).toArray
    if (tokens.isEmpty) return Nil
    render(tokens, text, fragmentSize, maxFragments, formatter,
      (_, term) => weights.get(term))
  }

  /** Shared fragment/score/markup loop: `tokenWeight` returns the weight
    * when the token at that index should highlight, None otherwise. */
  private def render(tokens: Array[graft.analysis.Token], text: String,
      fragmentSize: Int, maxFragments: Int, formatter: Formatter,
      tokenWeight: (Int, String) => Option[Float]): Seq[String] = {
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
        tokenWeight(t, term).foreach(w => if (seen.add(term)) s += w)
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
        val w = tokenWeight(t, tok.term)
        if (w.isDefined && tok.start >= cur) {
          sb.append(text.substring(cur, tok.start))
            .append(formatter(text.substring(tok.start, tok.end), w.get))
          cur = tok.end
        }
        t += 1
      }
      sb.append(text.substring(cur, srcEnd))
      sb.toString
    }.toSeq
  }
}
