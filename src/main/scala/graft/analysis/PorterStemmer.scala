package graft.analysis

/** Porter stemming algorithm (M.F. Porter, "An algorithm for suffix
  * stripping", 1980) — the same algorithm the reference ships
  * (/root/reference/src/core/analysis/PorterStemmer.cpp), including its two
  * documented departures from the paper (bli→ble, logi→log) and the
  * don't-stem-length-≤2 guard. Operates on a reused char buffer; one
  * instance per analysis chain (not thread-safe, like the reference). */
final class PorterStemmer {

  private var b: Array[Char] = new Array[Char](64)
  private var k = 0 // index of last char
  private var j = 0 // ends() match point

  /** Stem a lowercase word; returns the stemmed form (the input String if
    * unchanged). */
  def stem(word: String): String = {
    val n = word.length
    if (n <= 2) return word // DEPARTURE: length 1-2 words pass through
    if (b.length < n) b = new Array[Char](math.max(n, b.length * 2))
    word.getChars(0, n, b, 0)
    k = n - 1
    step1ab(); step1c(); step2(); step3(); step4(); step5()
    if (k + 1 == n && new String(b, 0, k + 1) == word) word
    else new String(b, 0, k + 1)
  }

  @inline private def cons(i: Int): Boolean = b(i) match {
    case 'a' | 'e' | 'i' | 'o' | 'u' => false
    case 'y' => if (i == 0) true else !cons(i - 1)
    case _ => true
  }

  /** Number of consonant-vowel sequences in [0, j]. */
  private def m(): Int = {
    var n = 0
    var i = 0
    while (i <= j && cons(i)) i += 1
    if (i > j) return 0
    i += 1
    while (true) {
      while (i <= j && !cons(i)) i += 1
      if (i > j) return n
      i += 1
      n += 1
      while (i <= j && cons(i)) i += 1
      if (i > j) return n
      i += 1
    }
    n
  }

  private def vowelInStem(): Boolean = {
    var i = 0
    while (i <= j) { if (!cons(i)) return true; i += 1 }
    false
  }

  private def doublec(j: Int): Boolean =
    j >= 1 && b(j) == b(j - 1) && cons(j)

  private def cvc(i: Int): Boolean = {
    if (i < 2 || !cons(i) || cons(i - 1) || !cons(i - 2)) return false
    val ch = b(i)
    ch != 'w' && ch != 'x' && ch != 'y'
  }

  private def ends(s: String): Boolean = {
    val len = s.length
    if (len > k + 1) return false
    if (s.charAt(len - 1) != b(k)) return false
    var i = 0
    while (i < len) {
      if (b(k - len + 1 + i) != s.charAt(i)) return false
      i += 1
    }
    j = k - len
    true
  }

  private def setto(s: String): Unit = {
    var i = 0
    while (i < s.length) { b(j + 1 + i) = s.charAt(i); i += 1 }
    k = j + s.length
  }

  private def r(s: String): Unit = if (m() > 0) setto(s)

  private def step1ab(): Unit = {
    if (b(k) == 's') {
      if (ends("sses")) k -= 2
      else if (ends("ies")) setto("i")
      else if (b(k - 1) != 's') k -= 1
    }
    if (ends("eed")) { if (m() > 0) k -= 1 }
    else if ((ends("ed") || ends("ing")) && vowelInStem()) {
      k = j
      if (ends("at")) setto("ate")
      else if (ends("bl")) setto("ble")
      else if (ends("iz")) setto("ize")
      else if (doublec(k)) {
        k -= 1
        val ch = b(k)
        if (ch == 'l' || ch == 's' || ch == 'z') k += 1
      } else if (m() == 1 && cvc(k)) setto("e")
    }
  }

  private def step1c(): Unit =
    if (ends("y") && vowelInStem()) b(k) = 'i'

  private def step2(): Unit = {
    if (k == 0) return
    b(k - 1) match {
      case 'a' =>
        if (ends("ational")) r("ate")
        else if (ends("tional")) r("tion")
      case 'c' =>
        if (ends("enci")) r("ence")
        else if (ends("anci")) r("ance")
      case 'e' =>
        if (ends("izer")) r("ize")
      case 'l' =>
        if (ends("bli")) r("ble") // DEPARTURE (paper: abli→able)
        else if (ends("alli")) r("al")
        else if (ends("entli")) r("ent")
        else if (ends("eli")) r("e")
        else if (ends("ousli")) r("ous")
      case 'o' =>
        if (ends("ization")) r("ize")
        else if (ends("ation")) r("ate")
        else if (ends("ator")) r("ate")
      case 's' =>
        if (ends("alism")) r("al")
        else if (ends("iveness")) r("ive")
        else if (ends("fulness")) r("ful")
        else if (ends("ousness")) r("ous")
      case 't' =>
        if (ends("aliti")) r("al")
        else if (ends("iviti")) r("ive")
        else if (ends("biliti")) r("ble")
      case 'g' =>
        if (ends("logi")) r("log") // DEPARTURE
      case _ =>
    }
  }

  private def step3(): Unit = b(k) match {
    case 'e' =>
      if (ends("icate")) r("ic")
      else if (ends("ative")) r("")
      else if (ends("alize")) r("al")
    case 'i' =>
      if (ends("iciti")) r("ic")
    case 'l' =>
      if (ends("ical")) r("ic")
      else if (ends("ful")) r("")
    case 's' =>
      if (ends("ness")) r("")
    case _ =>
  }

  private def step4(): Unit = {
    if (k == 0) return
    val matched = b(k - 1) match {
      case 'a' => ends("al")
      case 'c' => ends("ance") || ends("ence")
      case 'e' => ends("er")
      case 'i' => ends("ic")
      case 'l' => ends("able") || ends("ible")
      case 'n' => ends("ant") || ends("ement") || ends("ment") || ends("ent")
      case 'o' => (ends("ion") && (b(j) == 's' || b(j) == 't')) || ends("ou")
      case 's' => ends("ism")
      case 't' => ends("ate") || ends("iti")
      case 'u' => ends("ous")
      case 'v' => ends("ive")
      case 'z' => ends("ize")
      case _ => false
    }
    if (matched && m() > 1) k = j
  }

  private def step5(): Unit = {
    j = k
    if (b(k) == 'e') {
      val a = m()
      if (a > 1 || (a == 1 && !cvc(k - 1))) k -= 1
    }
    if (b(k) == 'l' && doublec(k) && m() > 1) k -= 1
  }
}
