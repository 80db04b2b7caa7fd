package graft.search

import graft.index.{PostingsIterator, SegmentFormat}

/** Positioned-match iterator — the span query family's execution contract
  * (reference: /root/reference/src/core/search/spans/Spans.cpp and the
  * Spans interface used throughout that directory). A Spans enumerates
  * (doc, start, end) triples in (doc, start, end) order; `skipTo` moves to
  * the first match in a doc >= target, always advancing past the current
  * match (the reference TermPositions do-while contract,
  * TermSpans.cpp:40-55).
  *
  * The composite algebra below (ordered/unordered near, or, not, first) is
  * shared by the segment-backed engine and the in-memory brute-force spec —
  * like SloppyPhrase, the semantics live in exactly one place and the two
  * implementations differ only in the leaf (TermSpans vs ArraySpans). */
trait Spans {
  def next(): Boolean
  def skipTo(target: Int): Boolean
  def doc: Int
  def start: Int
  def end: Int
  /** Payload bytes of the current match (reference Spans::getPayload;
    * TermSpans.cpp yields the current position's payload, composite spans
    * their collected match payloads). Empty when none. */
  def payload: Iterable[Array[Byte]] = Nil
  /** Reference Spans::isPayloadAvailable. */
  def payloadAvailable: Boolean = false
}

/** Leaf spans over a segment postings iterator: one span per term position
  * (reference TermSpans.cpp:27-55; end = start + 1). `withPayloads` turns
  * on per-position payload exposure (decoded lazily, once per doc). */
final class TermSpans(pi: PostingsIterator, withPayloads: Boolean = false) extends Spans {
  private var _doc = -1
  private var posArr: Array[Int] = null
  private var count = 0
  private var _pos = -1
  private var payArr: Array[Array[Byte]] = null
  private var payDoc = -1

  override def next(): Boolean = {
    if (posArr == null || count == posArr.length) {
      if (pi.nextDoc() == SegmentFormat.NoMoreDocs) { _doc = Int.MaxValue; return false }
      _doc = pi.docID
      posArr = pi.positions()
      count = 0
    }
    _pos = posArr(count); count += 1
    true
  }

  override def skipTo(target: Int): Boolean = {
    // always moves to a NEW doc >= target (TermSpans.cpp:40-55: the
    // underlying skipTo advances at least one doc even when target <= doc)
    val d = if (pi.docID >= target) pi.nextDoc() else pi.advance(target)
    if (d == SegmentFormat.NoMoreDocs) { _doc = Int.MaxValue; return false }
    _doc = d
    posArr = pi.positions()
    count = 1
    _pos = posArr(0)
    true
  }

  private def currentPayload: Array[Byte] = {
    if (!withPayloads || _doc < 0 || _doc == Int.MaxValue) return null
    if (payDoc != _doc) { payArr = pi.payloads(); payDoc = _doc }
    payArr(count - 1)
  }

  override def payload: Iterable[Array[Byte]] = {
    val p = currentPayload
    if (p == null) Nil else p :: Nil
  }
  override def payloadAvailable: Boolean = currentPayload != null

  override def doc: Int = _doc
  override def start: Int = _pos
  override def end: Int = _pos + 1
}

/** Leaf spans over in-memory (docId, sorted positions) entries — the
  * brute-force spec's TermSpans twin. `payloadsFor` optionally supplies the
  * per-position payload arrays (aligned with each entry's positions). */
final class ArraySpans(entries: Array[(Int, Array[Int])],
    payloadsFor: Int => Array[Array[Byte]] = _ => null) extends Spans {
  private var di = -1
  private var count = 0
  private var _pos = -1

  private def currentPayload: Array[Byte] = {
    if (di < 0 || di >= entries.length) return null
    val pays = payloadsFor(di)
    if (pays == null) null else pays(count - 1)
  }
  override def payload: Iterable[Array[Byte]] = {
    val p = currentPayload
    if (p == null) Nil else p :: Nil
  }
  override def payloadAvailable: Boolean = currentPayload != null

  override def next(): Boolean = {
    if (di < 0 || count == entries(di)._2.length) {
      di += 1
      if (di >= entries.length) return false
      count = 0
    }
    _pos = entries(di)._2(count); count += 1
    true
  }

  override def skipTo(target: Int): Boolean = {
    // move to first doc >= target, always leaving the current doc
    var cont = true
    while (cont) {
      di += 1
      if (di >= entries.length) return false
      cont = entries(di)._1 < target
    }
    count = 1
    _pos = entries(di)._2(0)
    true
  }

  override def doc: Int = if (di < 0 || di >= entries.length) Int.MaxValue else entries(di)._1
  override def start: Int = _pos
  override def end: Int = _pos + 1
}

/** Union of sub-spans, (doc, start, end)-ordered via a priority queue
  * (reference SpanOrQuery.cpp OrSpans/SpanQueue:118-246). */
final class OrSpans(clauses: Seq[Spans]) extends Spans {
  private var queue: java.util.PriorityQueue[Spans] = null
  private val cmp = new java.util.Comparator[Spans] {
    override def compare(a: Spans, b: Spans): Int =
      if (a.doc != b.doc) Integer.compare(a.doc, b.doc)
      else if (a.start != b.start) Integer.compare(a.start, b.start)
      else Integer.compare(a.end, b.end)
  }

  private def init(target: Int): Boolean = {
    queue = new java.util.PriorityQueue[Spans](math.max(1, clauses.size), cmp)
    clauses.foreach { s =>
      if (if (target == -1) s.next() else s.skipTo(target)) queue.add(s)
    }
    !queue.isEmpty
  }

  override def next(): Boolean = {
    if (queue == null) return init(-1)
    if (queue.isEmpty) return false
    val top = queue.poll()
    if (top.next()) queue.add(top)
    !queue.isEmpty
  }

  override def skipTo(target: Int): Boolean = {
    if (queue == null) return init(target)
    var skipCalled = false
    while (!queue.isEmpty && queue.peek().doc < target) {
      val top = queue.poll()
      if (top.skipTo(target)) queue.add(top)
      skipCalled = true
    }
    if (skipCalled) !queue.isEmpty else next()
  }

  override def doc: Int = queue.peek().doc
  override def start: Int = queue.peek().start
  override def end: Int = queue.peek().end
  // payload of the current (top) sub-span (reference SpanOrQuery.cpp OrSpans)
  override def payload: Iterable[Array[Byte]] = queue.peek().payload
  override def payloadAvailable: Boolean = queue.peek().payloadAvailable
}

/** In-order proximity: sub-spans must match in clause order with total gap
  * <= slop; enumerates the non-redundant shortest matches (reference
  * NearSpansOrdered.cpp:106-258 — toSameDoc / stretchToOrder /
  * shrinkToAfterShortestMatch). */
final class NearSpansOrdered(subs: Array[Spans], allowedSlop: Int,
    collectPayloads: Boolean = false) extends Spans {
  require(subs.length >= 2, "NearSpansOrdered needs at least 2 clauses")

  private var firstTime = true
  private var more = false
  private var inSameDoc = false
  private var matchDoc = -1
  private var matchStart = -1
  private var matchEnd = -1
  private val byDoc: Array[Spans] = subs.clone()
  private val docCmp = new java.util.Comparator[Spans] {
    override def compare(a: Spans, b: Spans): Int = Integer.compare(a.doc, b.doc)
  }
  // payloads of the current match, one per sub-position used (reference
  // NearSpansOrdered.cpp matchPayload; cleared per advance, filled by
  // shrinkToAfterShortestMatch). Insertion-ordered, reference-identity set
  // semantics (the reference's SetByteArray never dedups by content).
  private val matchPayload = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]

  def subSpans: Array[Spans] = subs

  override def doc: Int = matchDoc
  override def start: Int = matchStart
  override def end: Int = matchEnd
  override def payload: Iterable[Array[Byte]] = matchPayload
  override def payloadAvailable: Boolean = matchPayload.nonEmpty

  override def next(): Boolean = {
    if (firstTime) {
      firstTime = false
      var i = 0
      while (i < subs.length) {
        if (!subs(i).next()) { more = false; return false }
        i += 1
      }
      more = true
    }
    if (collectPayloads) matchPayload.clear() // NearSpansOrdered.cpp:75
    advanceAfterOrdered()
  }

  override def skipTo(target: Int): Boolean = {
    if (firstTime) {
      firstTime = false
      var i = 0
      while (i < subs.length) {
        if (!subs(i).skipTo(target)) { more = false; return false }
        i += 1
      }
      more = true
    } else if (more && subs(0).doc < target) {
      if (subs(0).skipTo(target)) inSameDoc = false
      else { more = false; return false }
    }
    if (collectPayloads) matchPayload.clear() // NearSpansOrdered.cpp:99
    advanceAfterOrdered()
  }

  private def advanceAfterOrdered(): Boolean = {
    while (more && (inSameDoc || toSameDoc())) {
      if (stretchToOrder() && shrinkToAfterShortestMatch()) return true
    }
    false
  }

  private def toSameDoc(): Boolean = {
    java.util.Arrays.sort(byDoc, docCmp)
    var firstIndex = 0
    var maxDoc = byDoc(byDoc.length - 1).doc
    while (byDoc(firstIndex).doc != maxDoc) {
      if (!byDoc(firstIndex).skipTo(maxDoc)) {
        more = false; inSameDoc = false; return false
      }
      maxDoc = byDoc(firstIndex).doc
      firstIndex += 1
      if (firstIndex == byDoc.length) firstIndex = 0
    }
    inSameDoc = true
    true
  }

  @inline private def spansOrdered(s1: Int, e1: Int, s2: Int, e2: Int): Boolean =
    if (s1 == s2) e1 < e2 else s1 < s2

  private def stretchToOrder(): Boolean = {
    matchDoc = subs(0).doc
    var i = 1
    while (inSameDoc && i < subs.length) {
      var ordered = spansOrdered(subs(i - 1).start, subs(i - 1).end, subs(i).start, subs(i).end)
      while (inSameDoc && !ordered) {
        if (!subs(i).next()) { inSameDoc = false; more = false }
        else if (matchDoc != subs(i).doc) inSameDoc = false
        else ordered = spansOrdered(subs(i - 1).start, subs(i - 1).end, subs(i).start, subs(i).end)
      }
      i += 1
    }
    inSameDoc
  }

  private def shrinkToAfterShortestMatch(): Boolean = {
    val last = subs(subs.length - 1)
    matchStart = last.start
    matchEnd = last.end
    // payload staging (NearSpansOrdered.cpp:174-220): the last sub-span's
    // current payload plus, per earlier sub-span, the payload of its FINAL
    // position used in the shrink — added only if the match lands
    val possibleMatchPayloads = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]
    if (collectPayloads && last.payloadAvailable) possibleMatchPayloads ++= last.payload
    var matchSlop = 0
    var lastStart = matchStart
    var lastEnd = matchEnd
    var i = subs.length - 2
    while (i >= 0) {
      val prev = subs(i)
      var possiblePayload: List[Array[Byte]] = null
      if (collectPayloads && prev.payloadAvailable) possiblePayload = prev.payload.toList
      var prevStart = prev.start
      var prevEnd = prev.end
      var advancing = true
      while (advancing) {
        if (!prev.next()) { inSameDoc = false; more = false; advancing = false }
        else if (matchDoc != prev.doc) { inSameDoc = false; advancing = false }
        else {
          val ppStart = prev.start
          val ppEnd = prev.end
          if (!spansOrdered(ppStart, ppEnd, lastStart, lastEnd)) advancing = false
          else {
            prevStart = ppStart
            prevEnd = ppEnd
            if (collectPayloads && prev.payloadAvailable) possiblePayload = prev.payload.toList
          }
        }
      }
      if (collectPayloads && possiblePayload != null) possibleMatchPayloads ++= possiblePayload
      // only non-overlapping spans add to slop (NearSpansOrdered.cpp:227-229)
      if (matchStart > prevEnd) matchSlop += matchStart - prevEnd
      matchStart = prevStart
      lastStart = prevStart
      lastEnd = prevEnd
      i -= 1
    }
    val matched = matchSlop <= allowedSlop
    if (collectPayloads && matched && possibleMatchPayloads.nonEmpty)
      matchPayload ++= possibleMatchPayloads
    matched
  }
}

/** Any-order proximity: all sub-spans in one doc within a window of
  * max.end - min.start - totalLength <= slop (reference
  * NearSpansUnordered.cpp:46-121, 214-238 SpansCell/atMatch). The
  * reference's cell queue + linked list reduce to min/max scans here (clause
  * counts are small); match enumeration order is identical. */
final class NearSpansUnordered(subs: Array[Spans], slop: Int) extends Spans {
  private var firstTime = true
  private var more = true

  def subSpans: Array[Spans] = subs

  // union of the sub-spans' current payloads (reference
  // NearSpansUnordered.cpp:136-152 getPayload/isPayloadAvailable)
  override def payload: Iterable[Array[Byte]] = subs.iterator.flatMap(_.payload).toSeq
  override def payloadAvailable: Boolean = subs.exists(_.payloadAvailable)

  private def minIdx: Int = {
    var m = 0
    var i = 1
    while (i < subs.length) {
      val a = subs(i); val b = subs(m)
      val less =
        if (a.doc != b.doc) a.doc < b.doc
        else if (a.start != b.start) a.start < b.start
        else a.end < b.end
      if (less) m = i
      i += 1
    }
    m
  }

  private def maxIdx: Int = {
    var m = 0
    var i = 1
    while (i < subs.length) {
      val a = subs(i); val b = subs(m)
      if (a.doc > b.doc || (a.doc == b.doc && a.end > b.end)) m = i
      i += 1
    }
    m
  }

  private def atMatch: Boolean = {
    val mn = subs(minIdx)
    val mx = subs(maxIdx)
    if (mn.doc != mx.doc) return false
    var totalLength = 0
    var i = 0
    while (i < subs.length) { totalLength += subs(i).end - subs(i).start; i += 1 }
    (mx.end - mn.start - totalLength) <= slop
  }

  private def alignDocs(): Boolean = {
    var aligned = false
    while (!aligned) {
      val mn = subs(minIdx)
      val mxDoc = subs(maxIdx).doc
      if (mn.doc == mxDoc) aligned = true
      else if (!mn.skipTo(mxDoc)) { more = false; return false }
    }
    true
  }

  override def next(): Boolean = {
    if (firstTime) {
      firstTime = false
      var i = 0
      while (i < subs.length) {
        if (!subs(i).next()) { more = false; return false }
        i += 1
      }
    } else if (more) {
      more = subs(minIdx).next()
    }
    while (more) {
      if (!alignDocs()) return false
      if (atMatch) return true
      more = subs(minIdx).next()
    }
    false
  }

  override def skipTo(target: Int): Boolean = {
    if (firstTime) {
      firstTime = false
      var i = 0
      while (i < subs.length) {
        if (!subs(i).skipTo(target)) { more = false; return false }
        i += 1
      }
    } else {
      while (more && subs(minIdx).doc < target) {
        if (!subs(minIdx).skipTo(target)) more = false
      }
    }
    more && (atMatch || next())
  }

  override def doc: Int = subs(minIdx).doc
  override def start: Int = subs(minIdx).start
  override def end: Int = subs(maxIdx).end
}

/** Include-spans with no overlapping exclude-span (reference
  * SpanNotQuery.cpp NotSpans:80-150). */
final class NotSpans(include: Spans, exclude: Spans) extends Spans {
  private var moreInclude = true
  private var moreExclude = exclude.next()

  override def next(): Boolean = {
    if (moreInclude) moreInclude = include.next()
    var done = false
    while (!done && moreInclude && moreExclude) {
      if (include.doc > exclude.doc) moreExclude = exclude.skipTo(include.doc)
      while (moreExclude && include.doc == exclude.doc && exclude.end <= include.start)
        moreExclude = exclude.next()
      if (!moreExclude || include.doc != exclude.doc || include.end <= exclude.start) done = true
      else moreInclude = include.next()
    }
    moreInclude
  }

  override def skipTo(target: Int): Boolean = {
    if (moreInclude) moreInclude = include.skipTo(target)
    if (!moreInclude) return false
    if (moreExclude && include.doc > exclude.doc) moreExclude = exclude.skipTo(include.doc)
    while (moreExclude && include.doc == exclude.doc && exclude.end <= include.start)
      moreExclude = exclude.next()
    if (!moreExclude || include.doc != exclude.doc || include.end <= exclude.start) true
    else next()
  }

  override def doc: Int = include.doc
  override def start: Int = include.start
  override def end: Int = include.end
  override def payload: Iterable[Array[Byte]] = include.payload
  override def payloadAvailable: Boolean = include.payloadAvailable
}

/** Matches whose span ends within the first `limit` positions (reference
  * SpanFirstQuery.cpp FirstSpans:90-105). */
final class FirstSpans(inner: Spans, limit: Int) extends Spans {
  override def next(): Boolean = {
    while (inner.next()) {
      if (inner.end <= limit) return true
    }
    false
  }

  override def skipTo(target: Int): Boolean = {
    if (!inner.skipTo(target)) return false
    inner.end <= limit || next()
  }

  override def doc: Int = inner.doc
  override def start: Int = inner.start
  override def end: Int = inner.end
  override def payload: Iterable[Array[Byte]] = inner.payload
  override def payloadAvailable: Boolean = inner.payloadAvailable
}

/** Scorer over a spans tree: per-doc freq = Σ sloppyFreq(end - start) over
  * matched spans, scored through the phrase weight (reference
  * SpanScorer.cpp:34-77). */
final class SpanScorer(spans: Spans, weight: graft.score.TermWeight,
    norms: Array[Byte], doclens: Array[Int]) extends Scorer {
  private var more = spans.next()
  private var _doc = if (more) -1 else Scorer.NoMoreDocs
  private var _freq = 0.0

  override def docID: Int = _doc

  override def nextDoc(): Int = {
    if (!setFreqCurrentDoc()) _doc = Scorer.NoMoreDocs
    _doc
  }

  override def advance(target: Int): Int = {
    if (!more) { _doc = Scorer.NoMoreDocs; return _doc }
    if (spans.doc < target) more = spans.skipTo(target)
    if (!setFreqCurrentDoc()) _doc = Scorer.NoMoreDocs
    _doc
  }

  private def setFreqCurrentDoc(): Boolean = {
    if (!more) return false
    _doc = spans.doc
    _freq = 0.0
    var same = true
    while (same) {
      _freq += Spans.sloppyFreq(spans.start, spans.end)
      more = spans.next()
      same = more && _doc == spans.doc
    }
    true
  }

  override def score(): Double = weight.score(_freq.toFloat, norms(_doc), doclens(_doc))
}

/** Scorer for [[PayloadNearQ]] (reference PayloadNearSpanScorer,
  * PayloadNearQuery.cpp:108-163): on entering a doc, the payloads of the
  * CURRENT (first) match are gathered from the near-span tree and folded
  * through the payload function; freq then accumulates over all matches as
  * in [[SpanScorer]]; score = spanScore x fn.docScore. */
final class PayloadNearSpanScorer(spans: Spans, weight: graft.score.TermWeight,
    fn: PayloadFunction, sim: graft.score.Similarity,
    norms: Array[Byte], doclens: Array[Int]) extends Scorer {
  private var more = spans.next()
  private var _doc = if (more) -1 else Scorer.NoMoreDocs
  private var _freq = 0.0
  private var payloadScore = 0.0
  private var payloadsSeen = 0

  override def docID: Int = _doc

  override def nextDoc(): Int = {
    if (!setFreqCurrentDoc()) _doc = Scorer.NoMoreDocs
    _doc
  }

  override def advance(target: Int): Int = {
    if (!more) { _doc = Scorer.NoMoreDocs; return _doc }
    if (spans.doc < target) more = spans.skipTo(target)
    if (!setFreqCurrentDoc()) _doc = Scorer.NoMoreDocs
    _doc
  }

  private def setFreqCurrentDoc(): Boolean = {
    if (!more) return false
    _doc = spans.doc
    payloadScore = fn.init
    payloadsSeen = 0
    Spans.collectMatchPayloads(spans, p => {
      payloadScore = fn.fold(payloadScore, sim.scorePayload(p).toDouble)
      payloadsSeen += 1
    })
    _freq = 0.0
    var same = true
    while (same) {
      _freq += Spans.sloppyFreq(spans.start, spans.end)
      more = spans.next()
      same = more && _doc == spans.doc
    }
    true
  }

  override def score(): Double =
    weight.score(_freq.toFloat, norms(_doc), doclens(_doc)) *
      fn.docScore(payloadsSeen, payloadScore)
}

object Spans {

  /** sloppyFreq contribution of one span — the reference's
    * DefaultSimilarity.cpp:42-44 over matchLength = end - start
    * (SpanScorer.cpp:62-64). Shared by engine scorer and brute-force spec. */
  @inline def sloppyFreq(start: Int, end: Int): Double = 1.0 / (end - start + 1)

  /** Build segment-backed spans; None when no match is possible in this
    * segment (a required leaf term is absent). */
  def build(sq: SpanQuery, reader: graft.index.SegmentReader,
      collectPayloads: Boolean = false): Option[Spans] = sq match {
    case SpanTermQ(t, _) =>
      val withPays = collectPayloads && reader.meta.hasPayloads
      reader.termInfo(t).map(ti =>
        new TermSpans(reader.postings(ti, needPositions = true), withPays))
    case SpanNearQ(cs, slop, inOrder, _) =>
      val subs = cs.map(build(_, reader, collectPayloads))
      if (subs.exists(_.isEmpty)) None
      else subs.flatten match {
        case Seq(one) => Some(one)
        case many if inOrder => Some(new NearSpansOrdered(many.toArray, slop, collectPayloads))
        case many => Some(new NearSpansUnordered(many.toArray, slop))
      }
    case PayloadNearQ(cs, slop, inOrder, _, _) =>
      // a SpanNearQuery whose spans collect payloads
      build(SpanNearQ(cs, slop, inOrder), reader, collectPayloads = true)
    case SpanOrQ(cs, _) =>
      cs.flatMap(build(_, reader, collectPayloads)) match {
        case Seq() => None
        case Seq(one) => Some(one)
        case many => Some(new OrSpans(many))
      }
    case SpanNotQ(inc, exc, _) =>
      build(inc, reader, collectPayloads).map { i =>
        build(exc, reader) match {
          case Some(e) => new NotSpans(i, e)
          case None => i
        }
      }
    case SpanFirstQ(inner, limit, _) =>
      build(inner, reader, collectPayloads).map(new FirstSpans(_, limit))
  }

  /** Brute-force twin of [[build]] over one analyzed doc (docId 0);
    * `payloads(t)` gives the per-position payload arrays aligned with
    * `positions(t)` (null when the term carries none). */
  def buildLocal(sq: SpanQuery, positions: String => Option[Array[Int]],
      payloads: String => Array[Array[Byte]] = _ => null,
      collectPayloads: Boolean = false): Option[Spans] = sq match {
    case SpanTermQ(t, _) =>
      positions(t).map { ps =>
        val pays = if (collectPayloads) payloads(t) else null
        new ArraySpans(Array((0, ps)), _ => pays)
      }
    case SpanNearQ(cs, slop, inOrder, _) =>
      val subs = cs.map(buildLocal(_, positions, payloads, collectPayloads))
      if (subs.exists(_.isEmpty)) None
      else subs.flatten match {
        case Seq(one) => Some(one)
        case many if inOrder => Some(new NearSpansOrdered(many.toArray, slop, collectPayloads))
        case many => Some(new NearSpansUnordered(many.toArray, slop))
      }
    case PayloadNearQ(cs, slop, inOrder, _, _) =>
      buildLocal(SpanNearQ(cs, slop, inOrder), positions, payloads, collectPayloads = true)
    case SpanOrQ(cs, _) =>
      cs.flatMap(buildLocal(_, positions, payloads, collectPayloads)) match {
        case Seq() => None
        case Seq(one) => Some(one)
        case many => Some(new OrSpans(many))
      }
    case SpanNotQ(inc, exc, _) =>
      buildLocal(inc, positions, payloads, collectPayloads).map { i =>
        buildLocal(exc, positions) match {
          case Some(e) => new NotSpans(i, e)
          case None => i
        }
      }
    case SpanFirstQ(inner, limit, _) =>
      buildLocal(inner, positions, payloads, collectPayloads).map(new FirstSpans(_, limit))
  }

  /** Weight-bearing terms of a span query — reference extractTerms
    * semantics: a SET of terms; SpanNot contributes only its include side
    * (SpanNotQuery.cpp:38-40). */
  def weightTerms(sq: SpanQuery): Set[String] = sq match {
    case SpanTermQ(t, _) => Set(t)
    case SpanNearQ(cs, _, _, _) => cs.flatMap(weightTerms).toSet
    case SpanOrQ(cs, _) => cs.flatMap(weightTerms).toSet
    case SpanNotQ(inc, _, _) => weightTerms(inc)
    case SpanFirstQ(inner, _, _) => weightTerms(inner)
    case PayloadNearQ(cs, _, _, _, _) => cs.flatMap(weightTerms).toSet
  }

  /** Walk the spans tree processing each near-node's current match
    * payloads — the reference PayloadNearSpanScorer::getPayloads recursion
    * (PayloadNearQuery.cpp:117-133: only NearSpansOrdered/Unordered nodes
    * are visited; other span types are passed over). */
  def collectMatchPayloads(s: Spans, f: Array[Byte] => Unit): Unit = s match {
    case n: NearSpansOrdered =>
      if (n.payloadAvailable) n.payload.foreach(f)
      n.subSpans.foreach(collectMatchPayloads(_, f))
    case n: NearSpansUnordered =>
      if (n.payloadAvailable) n.payload.foreach(f)
      n.subSpans.foreach(collectMatchPayloads(_, f))
    case _ => ()
  }

  /** idf summed over the sorted weight-term set — float order pinned so the
    * engine and the brute-force spec accumulate identically. */
  def idfSum(sq: SpanQuery, sim: graft.score.Similarity,
      stats: graft.score.CorpusStats, df: String => Long): Float = {
    var s = 0.0f
    weightTerms(sq).toSeq.sorted.foreach(t => s += sim.idf(df(t), stats))
    s
  }
}
