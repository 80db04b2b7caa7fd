package graft.search

/** Sloppy-phrase frequency — the reference's algorithm incl. the
  * repeated-term machinery
  * (/root/reference/src/core/search/SloppyPhraseScorer.cpp:31-70 scan loop,
  * :86-160 repeat initialization, :72-84 flip,
  * :163-178 termPositionsDiffer; sloppyFreq = 1/(matchLength+1),
  * DefaultSimilarity.cpp:42-44) over in-memory position arrays. Shared by
  * the engine scorer and the brute-force spec so sloppy semantics are
  * pinned in exactly one place.
  *
  * Repeats: two phrase slots carrying the SAME term share one underlying
  * position stream; the scorer must keep them on different actual token
  * positions (tpPos = adjusted position + offset) or one token would match
  * two slots at once. */
object SloppyPhrase {

  private final class PP(val arr: Array[Int], val offset: Int, var repeats: Boolean) {
    var idx: Int = 0
    var pos: Int = arr(0) - offset // adjusted position
    def nextPosition(): Boolean = {
      idx += 1
      if (idx < arr.length) { pos = arr(idx) - offset; true } else false
    }
    def tpPos: Int = pos + offset
  }

  /** posArrays(i) = sorted ACTUAL positions of phrase slot i; offsets(i) =
    * the slot's offset in the phrase. Slots with equal terms must share
    * equal arrays (they do: both come from the same postings). All arrays
    * non-empty. */
  def freq(posArrays: Array[Array[Int]], offsets: Array[Int], slop: Int): Double = {
    val m = posArrays.length
    val pps = Array.tabulate(m)(i => new PP(posArrays(i), offsets(i), repeats = false))

    // repeat detection: slots sitting on the same actual token
    // (SloppyPhraseScorer.cpp:110-135; with one token stream per term this
    // is exactly "same term appears in several slots")
    var anyRepeats = false
    var i = 0
    while (i < m) {
      var j = i + 1
      while (j < m) {
        if (pps(i).tpPos == pps(j).tpPos) {
          pps(i).repeats = true; pps(j).repeats = true; anyRepeats = true
        }
        j += 1
      }
      i += 1
    }
    val repeatPps: Array[PP] = if (anyRepeats) pps.filter(_.repeats) else Array.empty

    def termPositionsDiffer(pp: PP): PP = {
      val tp = pp.tpPos
      var k = 0
      while (k < repeatPps.length) {
        val pp2 = repeatPps(k)
        if ((pp2 ne pp) && pp2.tpPos == tp)
          return if (pp.offset > pp2.offset) pp else pp2
        k += 1
      }
      null
    }

    // advance repeating pps so they all start on differing actual tokens
    // (SloppyPhraseScorer.cpp:139-148)
    if (anyRepeats) {
      var r = 0
      while (r < repeatPps.length) {
        var pp2 = termPositionsDiffer(repeatPps(r))
        while (pp2 != null) {
          if (!pp2.nextPosition()) return 0.0 // ran out of a term — no match
          pp2 = termPositionsDiffer(repeatPps(r))
        }
        r += 1
      }
    }

    // phrase queue ordered by (adjusted position, offset) — PhraseQueue.cpp
    val pq = new java.util.PriorityQueue[PP](m, new java.util.Comparator[PP] {
      override def compare(a: PP, b: PP): Int =
        if (a.pos != b.pos) Integer.compare(a.pos, b.pos)
        else Integer.compare(a.offset, b.offset)
    })
    var end = Int.MinValue
    i = 0
    while (i < m) {
      if (pps(i).pos > end) end = pps(i).pos
      pq.add(pps(i))
      i += 1
    }

    def flip(pp: PP, pp2: PP): PP = {
      // pop until pp2 surfaces, restore the rest, insert pp (flip roles)
      val tmp = new Array[PP](m)
      var n = 0
      var p = pq.poll()
      while (p ne pp2) { tmp(n) = p; n += 1; p = pq.poll() }
      while (n > 0) { n -= 1; pq.add(tmp(n)) }
      pq.add(pp)
      pp2
    }

    // main scan (SloppyPhraseScorer.cpp:31-70)
    var f = 0.0
    var done = false
    while (!done) {
      var pp = pq.poll()
      var start = pp.pos
      val next = pq.peek().pos
      var tpsDiffer = true
      var posV = start
      var cont = true
      while (cont && (posV <= next || !tpsDiffer)) {
        if (posV <= next && tpsDiffer) start = posV // advance pp to min window
        if (!pp.nextPosition()) { done = true; cont = false }
        else {
          var pp2: PP = null
          if (pp.repeats) pp2 = termPositionsDiffer(pp)
          tpsDiffer = pp2 == null
          if (pp2 != null && (pp2 ne pp)) pp = flip(pp, pp2)
          posV = pp.pos
        }
      }
      val matchLength = end - start
      if (matchLength <= slop) f += 1.0 / (matchLength + 1)
      if (pp.pos > end) end = pp.pos
      pq.add(pp)
    }
    f
  }
}
