package graft.analysis

import scala.collection.mutable.ArrayBuffer

/** Hand-written maximal-munch scanner for the Lucene 3.x "classic" token
  * grammar (the public JFlex grammar behind the reference's generated DFA,
  * /root/reference/src/core/analysis/standard/StandardTokenizerImpl.cpp —
  * we re-implement the *grammar*, not the generated tables):
  *
  * {{{
  * ALPHANUM   = ({LETTER}|[:digit:])+
  * APOSTROPHE = {ALPHA} ("'" {ALPHA})+
  * ACRONYM    = {LETTER} "." ({LETTER} ".")+
  * COMPANY    = {ALPHA} ("&"|"@") {ALPHA}
  * EMAIL      = {ALPHANUM} (("."|"-"|"_") {ALPHANUM})* "@" {ALPHANUM} (("."|"-") {ALPHANUM})+
  * HOST       = {ALPHANUM} ("." {ALPHANUM})+
  * NUM        = segments joined by P = [_\-/.,] under a strict A/D
  *              alternation where every D segment contains a digit
  *              (the six NUM alternatives of the grammar collapse to:
  *              >=2 segments, alternating labels starting with either
  *              A or D)
  * CJ         = one CJK/kana char per token
  * ACRONYM_DEP= {ALPHANUM} "." ({ALPHANUM} ".")+   (host ending in '.';
  *              re-typed HOST, trailing dot dropped — StandardTokenizer.cpp:103-110)
  * }}}
  *
  * Longest match wins; on equal length the rule listed first wins
  * (JFlex semantics). Behavior is pinned by the reference's own test
  * suite (/root/reference/src/test/analysis/standard/StandardAnalyzerTest.cpp),
  * re-expressed in `AnalysisSpec`.
  *
  * Scaling note: this runs inside `mapPartitions` on every row of a
  * 100 TB corpus, so the common case (plain word) is a tight char loop
  * with no allocation beyond the token itself; the multi-segment
  * matchers only engage when a connector char follows an alphanumeric
  * run.
  */
object ClassicScanner {

  /** CJK/kana ranges tokenized one-char-per-token (CJ class). */
  @inline private def isCJ(c: Char): Boolean =
    (c >= 0x3040 && c <= 0x318F) || // hiragana, katakana, bopomofo, kana ext
      (c >= 0x31F0 && c <= 0x31FF) ||
      (c >= 0x3300 && c <= 0x337F) ||
      (c >= 0x3400 && c <= 0x4DBF) ||
      (c >= 0x4E00 && c <= 0x9FFF) ||
      (c >= 0xF900 && c <= 0xFAFF)

  @inline private def isLetter(c: Char): Boolean =
    Character.isLetter(c) && !isCJ(c)

  @inline private def isDigit(c: Char): Boolean = Character.isDigit(c)

  @inline private def isAlnum(c: Char): Boolean = isLetter(c) || isDigit(c)

  /** NUM segment separators. */
  @inline private def isP(c: Char): Boolean =
    c == '_' || c == '-' || c == '/' || c == '.' || c == ','

  /** Candidate match: length in chars and grammar rule priority (lower wins ties). */
  private final class Cand {
    var len = 0
    var tpe = -1
    var prio = Int.MaxValue
    @inline def offer(l: Int, t: Int, p: Int): Unit =
      if (l > len || (l == len && p < prio)) { len = l; tpe = t; prio = p }
  }

  /** Tokenize `s`, applying the reference's skip-long-token rule: a match
    * longer than `maxTokenLength` is dropped but still bumps the position
    * increment (StandardTokenizer.cpp:85-118). */
  def tokenize(s: String, maxTokenLength: Int = 255): Iterator[Token] = new Iterator[Token] {
    private var i = 0
    private var pendingIncr = 1
    private var nextTok: Token = null
    private val cand0 = new Cand // reused across tokens (no per-token alloc)
    advance()

    override def hasNext: Boolean = nextTok != null
    override def next(): Token = {
      val t = nextTok; advance(); t
    }

    private def advance(): Unit = {
      nextTok = null
      val n = s.length
      while (nextTok == null && i < n) {
        val c = s.charAt(i)
        if (isCJ(c)) {
          emit(i, i + 1, TokenType.CJ)
          i += 1
        } else if (isAlnum(c)) {
          val cand = matchAt(s, i, cand0)
          val end = i + cand.len
          if (cand.len <= maxTokenLength) {
            if (cand.tpe == TokenType.ACRONYM_DEP)
              emit(i, end - 1, TokenType.HOST) // strip trailing '.'
            else emit(i, end, cand.tpe)
          } else pendingIncr += 1
          i = end
        } else i += 1
      }
    }

    private def emit(from: Int, to: Int, tpe: Int): Unit = {
      nextTok = Token(s.substring(from, to), pendingIncr, from, to, tpe)
      pendingIncr = 1
    }
  }

  /** True for chars that can extend a match beyond a plain alphanumeric
    * run (connectors of APOSTROPHE/ACRONYM/COMPANY/EMAIL/HOST/NUM). */
  @inline private def isConnector(c: Char): Boolean =
    c == '\'' || c == '.' || c == '-' || c == '_' || c == '/' || c == ',' ||
      c == '@' || c == '&'

  /** Compute the winning (longest, then highest-priority) match at position
    * `i`; `s(i)` is alphanumeric. `cand` is caller-owned and reset here (one
    * instance per tokenize call — this runs per token on a 100 TB corpus). */
  private def matchAt(s: String, i: Int, cand: Cand): Cand = {
    val n = s.length
    cand.len = 0
    cand.tpe = -1
    cand.prio = Int.MaxValue

    // maximal alphanumeric run, tracking letter-purity for ALPHA-based rules
    var j = i
    var allLetters = true
    while (j < n && isAlnum(s.charAt(j))) {
      if (!isLetter(s.charAt(j))) allLetters = false
      j += 1
    }
    val runLen = j - i
    cand.offer(runLen, TokenType.ALPHANUM, 0)

    // fast path: nothing after the run can extend it → plain ALPHANUM
    // (the overwhelmingly common case; skips the multi-segment matchers)
    if (j >= n || !isConnector(s.charAt(j))) return cand

    // APOSTROPHE = ALPHA ("'" ALPHA)+
    if (allLetters && j < n && s.charAt(j) == '\'') {
      var k = j
      while (k < n && s.charAt(k) == '\'' && k + 1 < n && isLetter(s.charAt(k + 1))) {
        k += 1
        while (k < n && isLetter(s.charAt(k))) k += 1
      }
      if (k > j) cand.offer(k - i, TokenType.APOSTROPHE, 1)
    }

    // ACRONYM = LETTER "." (LETTER ".")+   (single letters only)
    if (runLen == 1 && isLetter(s.charAt(i))) {
      var k = i
      var pairs = 0
      // each "LETTER ." pair: the '.' right after the letter guarantees the
      // letter segment has length exactly 1
      while (k + 1 < n && isLetter(s.charAt(k)) && s.charAt(k + 1) == '.') {
        k += 2
        pairs += 1
      }
      if (pairs >= 2) cand.offer(k - i, TokenType.ACRONYM, 2)
    }

    // COMPANY = ALPHA ('&'|'@') ALPHA
    if (allLetters && j < n && (s.charAt(j) == '&' || s.charAt(j) == '@') &&
      j + 1 < n && isLetter(s.charAt(j + 1))) {
      var k = j + 1
      while (k < n && isLetter(s.charAt(k))) k += 1
      cand.offer(k - i, TokenType.COMPANY, 3)
    }

    // Segment structure for EMAIL/HOST/NUM/ACRONYM_DEP: maximal alnum runs
    // separated by single connector chars.
    // EMAIL = ALPHANUM (("."|"-"|"_") ALPHANUM)* "@" ALPHANUM (("."|"-") ALPHANUM)+
    emailMatch(s, i, n).foreach(l => cand.offer(l, TokenType.EMAIL, 4))

    // HOST = ALPHANUM ("." ALPHANUM)+
    {
      var k = j
      var last = j
      while (k < n && s.charAt(k) == '.' && k + 1 < n && isAlnum(s.charAt(k + 1))) {
        k += 1
        while (k < n && isAlnum(s.charAt(k))) k += 1
        last = k
      }
      if (last > j) cand.offer(last - i, TokenType.HOST, 5)
    }

    // NUM — strict A/D alternation over P-joined segments
    numMatch(s, i, n).foreach(l => cand.offer(l, TokenType.NUM, 6))

    // ACRONYM_DEP = ALPHANUM "." (ALPHANUM ".")+  (includes trailing '.')
    {
      var k = i
      var segs = 0
      var last = -1
      var ok = true
      while (ok && k < n && isAlnum(s.charAt(k))) {
        while (k < n && isAlnum(s.charAt(k))) k += 1
        if (k < n && s.charAt(k) == '.') { k += 1; segs += 1; last = k }
        else ok = false
      }
      if (segs >= 2) cand.offer(last - i, TokenType.ACRONYM_DEP, 8)
    }

    cand
  }

  /** Longest EMAIL match at `i`, if any. */
  private def emailMatch(s: String, i: Int, n: Int): Option[Int] = {
    var k = i
    // local part: ALPHANUM ((.|-|_) ALPHANUM)*  — greedy is safe because
    // '@' is not a local-part separator
    while (k < n && isAlnum(s.charAt(k))) k += 1
    while (k < n && (s.charAt(k) == '.' || s.charAt(k) == '-' || s.charAt(k) == '_') &&
      k + 1 < n && isAlnum(s.charAt(k + 1))) {
      k += 1
      while (k < n && isAlnum(s.charAt(k))) k += 1
    }
    if (k < n && s.charAt(k) == '@' && k + 1 < n && isAlnum(s.charAt(k + 1))) {
      k += 1
      while (k < n && isAlnum(s.charAt(k))) k += 1
      var domSegs = 0
      var last = -1
      while (k < n && (s.charAt(k) == '.' || s.charAt(k) == '-') &&
        k + 1 < n && isAlnum(s.charAt(k + 1))) {
        k += 1
        while (k < n && isAlnum(s.charAt(k))) k += 1
        domSegs += 1
        last = k
      }
      if (domSegs >= 1) Some(last - i) else None
    } else None
  }

  /** Longest NUM match at `i`: segments joined by single P chars, strictly
    * alternating A/D labels (either parity), every D segment containing a
    * digit, >=2 segments, >=1 digit somewhere (implied by a D label). */
  private def numMatch(s: String, i: Int, n: Int): Option[Int] = {
    // collect segments greedily
    val segEnds = new ArrayBuffer[Int](8)   // end offset of each segment
    val segHasDigit = new ArrayBuffer[Boolean](8)
    var k = i
    var more = true
    while (more) {
      var hasDigit = false
      while (k < n && isAlnum(s.charAt(k))) {
        if (isDigit(s.charAt(k))) hasDigit = true
        k += 1
      }
      segEnds += k
      segHasDigit += hasDigit
      if (k < n && isP(s.charAt(k)) && k + 1 < n && isAlnum(s.charAt(k + 1))) k += 1
      else more = false
    }
    val m = segEnds.length
    if (m < 2) return None
    // labeling 1: D at even indices (0-based); labeling 2: D at odd indices.
    // longest prefix (>=2 segments) valid under either labeling.
    var best = -1
    var ok1 = true
    var ok2 = true
    var idx = 0
    while (idx < m && (ok1 || ok2)) {
      val even = (idx & 1) == 0
      if (even && !segHasDigit(idx)) ok1 = false
      if (!even && !segHasDigit(idx)) ok2 = false
      if (idx >= 1 && (ok1 || ok2)) best = segEnds(idx)
      idx += 1
    }
    if (best > 0) Some(best - i) else None
  }
}
