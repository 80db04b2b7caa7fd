package graft.search

/** Sloppy-phrase frequency — the reference's algorithm
  * (/root/reference/src/core/search/SloppyPhraseScorer.cpp:31-70, no-repeats
  * path; sloppyFreq = 1/(matchLength+1),
  * DefaultSimilarity.cpp:42-44) over in-memory position arrays. Shared by
  * the engine scorer and the brute-force spec so sloppy semantics are
  * pinned in exactly one place. Phrases with repeated terms are not
  * supported in v1 (the reference's repeat-flip machinery — later round). */
object SloppyPhrase {

  /** posArrays(i) = sorted positions of phrase term i, ALREADY offset-
    * adjusted (position - queryOffset). All arrays non-empty. */
  def freq(posArrays: Array[Array[Int]], slop: Int): Double = {
    val m = posArrays.length
    val idx = new Array[Int](m)
    val pos = new Array[Int](m)
    var end = Int.MinValue
    var i = 0
    while (i < m) {
      pos(i) = posArrays(i)(0)
      if (pos(i) > end) end = pos(i)
      i += 1
    }
    var f = 0.0
    var done = false
    while (!done) {
      // pop the minimum-position term
      var minI = 0
      i = 1
      while (i < m) { if (pos(i) < pos(minI)) minI = i; i += 1 }
      // next = smallest among the others
      var next = Int.MaxValue
      i = 0
      while (i < m) { if (i != minI && pos(i) < next) next = pos(i); i += 1 }

      var start = pos(minI)
      var p = pos(minI)
      var exhausted = false
      var advancing = true
      while (advancing && p <= next) {
        start = p // advance pp to min window
        idx(minI) += 1
        if (idx(minI) >= posArrays(minI).length) { exhausted = true; advancing = false }
        else { p = posArrays(minI)(idx(minI)); pos(minI) = p }
      }
      val matchLength = end - start
      if (matchLength <= slop) f += 1.0 / (matchLength + 1)
      if (exhausted) done = true
      else if (pos(minI) > end) end = pos(minI)
    }
    f
  }
}
