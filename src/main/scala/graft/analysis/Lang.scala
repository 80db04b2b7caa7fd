package graft.analysis

/** Non-English analysis chains from the reference's contrib analyzers,
  * re-expressed as the same pure `Iterator[Token]` transforms the rest of
  * the chain uses (SURVEY.md §2.8). Each component cites its source file;
  * semantics are pinned by the reference's own contrib tests (AnalysisSpec
  * / LangSpec goldens). */
object Lang {

  // ---- CJK ---------------------------------------------------------------

  /** CJKAnalyzer's stop set
    * (/root/reference/src/contrib/analyzers/common/analysis/cjk/CJKAnalyzer.cpp:14-22). */
  val CjkStopWords: Set[String] = Set(
    "a", "and", "are", "as", "at", "be", "but", "by", "for", "if",
    "in", "into", "is", "it", "no", "not", "of", "on", "or", "s",
    "such", "t", "that", "the", "their", "then", "there", "these",
    "they", "this", "to", "was", "will", "with", "www")

  /** ChineseFilter's stop set (ChineseFilter.cpp:14-21 — the English list
    * without "a"/"s"/"t"/"www"). */
  val ChineseStopWords: Set[String] = Set(
    "and", "are", "as", "at", "be", "but", "by", "for", "if", "in",
    "into", "is", "it", "no", "not", "of", "on", "or", "such", "that",
    "the", "their", "then", "there", "these", "they", "this", "to",
    "was", "will", "with")

  @inline private def isOtherLetter(c: Char): Boolean =
    Character.getType(c) == Character.OTHER_LETTER
  @inline private def isNonSpacing(c: Char): Boolean =
    Character.getType(c) == Character.NON_SPACING_MARK

  /** CJK bigram tokenizer
    * (/root/reference/src/contrib/analyzers/common/analysis/cjk/CJKTokenizer.cpp:70-200):
    * runs of non-ASCII letters emit overlapping bigrams (a lone char emits
    * itself); ASCII/fullwidth alnum (+ `_ + #`) runs emit one lowercased
    * token, with fullwidth forms FF01-FF5E folded to ASCII. Offsets index
    * the original text. */
  def cjkTokenize(text: String): Iterator[Token] = {
    // classify with the fullwidth fold applied
    def mapped(c: Char): Char =
      if (c >= 0xFF01 && c <= 0xFF5E) (c - 0xFEE0).toChar else c
    def isHalfFull(c: Char) = c <= 0x7F || (c >= 0xFF00 && c <= 0xFFEF)
    def kind(c: Char): Int = {
      if (isHalfFull(c)) {
        val m = mapped(c)
        if (Character.isLetterOrDigit(m) || m == '_' || m == '+' || m == '#') 1 else 0
      } else if (Character.isLetter(c)) 2
      else 0
    }
    val out = Vector.newBuilder[Token]
    var i = 0
    val n = text.length
    while (i < n) {
      val k = kind(text.charAt(i))
      if (k == 0) i += 1
      else {
        var j = i
        while (j < n && kind(text.charAt(j)) == k) j += 1
        if (k == 1) {
          // ASCII-ish run, split at the 255-char buffer bound
          var s = i
          while (s < j) {
            val e = math.min(j, s + 255)
            val sb = new StringBuilder(e - s)
            var p = s
            while (p < e) { sb += Character.toLowerCase(mapped(text.charAt(p))); p += 1 }
            out += Token(sb.toString, 1, s, e, TokenType.ALPHANUM)
            s = e
          }
        } else {
          if (j - i == 1)
            out += Token(text.substring(i, j), 1, i, j, TokenType.CJ)
          else {
            var p = i
            while (p + 2 <= j) {
              out += Token(text.substring(p, p + 2), 1, p, p + 2, TokenType.CJ)
              p += 1
            }
          }
        }
        i = j
      }
    }
    out.result().iterator
  }

  // ---- Chinese (per-character) -------------------------------------------

  /** ChineseTokenizer (cn/ChineseTokenizer.cpp:47-122): letter runs and
    * digit runs are separate lowercased tokens; each OTHER_LETTER (CJK)
    * character is its own token. */
  def chineseTokenize(text: String): Iterator[Token] = {
    val out = Vector.newBuilder[Token]
    var i = 0
    val n = text.length
    def isEn(c: Char) = Character.isLowerCase(c) || Character.isUpperCase(c)
    while (i < n) {
      val c = text.charAt(i)
      if (isEn(c)) {
        var j = i
        while (j < n && isEn(text.charAt(j)) && j - i < 255) j += 1
        out += Token(text.substring(i, j).toLowerCase, 1, i, j, TokenType.ALPHANUM)
        i = j
      } else if (Character.isDigit(c)) {
        var j = i
        while (j < n && Character.isDigit(text.charAt(j)) && j - i < 255) j += 1
        out += Token(text.substring(i, j), 1, i, j, TokenType.NUM)
        i = j
      } else if (isOtherLetter(c)) {
        out += Token(text.substring(i, i + 1), 1, i, i + 1, TokenType.CJ)
        i += 1
      } else i += 1
    }
    out.result().iterator
  }

  /** ChineseFilter (cn/ChineseFilter.cpp:30-48): drop stop words; keep
    * English tokens only when longer than 1 char; keep CJK/digit tokens. */
  def chineseFilter(in: Iterator[Token]): Iterator[Token] = in.filter { t =>
    val c = t.term.charAt(0)
    !ChineseStopWords.contains(t.term) && {
      if (Character.isLowerCase(c) || Character.isUpperCase(c)) t.term.length > 1
      else isOtherLetter(c) || Character.isDigit(c)
    }
  }

  // ---- German ------------------------------------------------------------

  /** GermanAnalyzer's stop set (de/GermanAnalyzer.cpp:14-24). */
  val GermanStopWords: Set[String] = Set(
    "einer", "eine", "eines", "einem", "einen", "der", "die", "das",
    "dass", "daß", "du", "er", "sie", "es", "was", "wer", "wie",
    "wir", "und", "oder", "ohne", "mit", "am", "im", "in", "aus",
    "auf", "ist", "sein", "war", "wird", "ihr", "ihre", "ihres",
    "als", "für", "von", "dich", "dir", "mich", "mir", "mein",
    "kein", "durch", "wegen")

  /** The reference's heuristic German stemmer
    * (de/GermanStemmer.cpp:23-177): lowercase, substitute umlauts/digraph
    * masks, iteratively strip declension suffixes, unmask. Known-imperfect
    * by design — its own test file documents over/understemming cases,
    * which LangSpec pins. */
  object GermanStemmer {
    def stem(term: String): String = {
      val lower = term.toLowerCase
      if (!lower.forall(Character.isLetter)) return lower
      val buf = new StringBuilder(lower)
      val substCount = substitute(buf)
      strip(buf, substCount)
      optimize(buf, substCount)
      resubstitute(buf)
      removeParticleDenotion(buf)
      buf.toString
    }

    private def substitute(buf: StringBuilder): Int = {
      var substCount = 0
      var c = 0
      while (c < buf.length) {
        if (c > 0 && buf.charAt(c) == buf.charAt(c - 1)) buf.setCharAt(c, '*')
        else buf.charAt(c) match {
          case 'ä' => buf.setCharAt(c, 'a')
          case 'ö' => buf.setCharAt(c, 'o')
          case 'ü' => buf.setCharAt(c, 'u')
          case 'ß' =>
            buf.setCharAt(c, 's')
            buf.insert(c + 1, 's')
            substCount += 1
          case _ =>
        }
        if (c < buf.length - 1) {
          if (c < buf.length - 2 && buf.charAt(c) == 's' && buf.charAt(c + 1) == 'c' &&
            buf.charAt(c + 2) == 'h') {
            buf.setCharAt(c, '$'); buf.delete(c + 1, c + 3); substCount += 2
          } else if (buf.charAt(c) == 'c' && buf.charAt(c + 1) == 'h') {
            buf.setCharAt(c, '§'); buf.deleteCharAt(c + 1); substCount += 1
          } else if (buf.charAt(c) == 'e' && buf.charAt(c + 1) == 'i') {
            buf.setCharAt(c, '%'); buf.deleteCharAt(c + 1); substCount += 1
          } else if (buf.charAt(c) == 'i' && buf.charAt(c + 1) == 'e') {
            buf.setCharAt(c, '&'); buf.deleteCharAt(c + 1); substCount += 1
          } else if (buf.charAt(c) == 'i' && buf.charAt(c + 1) == 'g') {
            buf.setCharAt(c, '#'); buf.deleteCharAt(c + 1); substCount += 1
          } else if (buf.charAt(c) == 's' && buf.charAt(c + 1) == 't') {
            buf.setCharAt(c, '!'); buf.deleteCharAt(c + 1); substCount += 1
          }
        }
        c += 1
      }
      substCount
    }

    private def strip(buf: StringBuilder, substCount: Int): Unit = {
      var doMore = true
      while (doMore && buf.length > 3) {
        val len = buf.length
        if (len + substCount > 5 && buf.endsWith("nd")) buf.setLength(len - 2)
        else if (len + substCount > 4 && buf.endsWith("em")) buf.setLength(len - 2)
        else if (len + substCount > 4 && buf.endsWith("er")) buf.setLength(len - 2)
        else if (buf.charAt(len - 1) == 'e') buf.setLength(len - 1)
        else if (buf.charAt(len - 1) == 's') buf.setLength(len - 1)
        else if (buf.charAt(len - 1) == 'n') buf.setLength(len - 1)
        else if (buf.charAt(len - 1) == 't') buf.setLength(len - 1)
        else doMore = false
      }
    }

    private def optimize(buf: StringBuilder, substCount: Int): Unit = {
      if (buf.length > 5 && buf.endsWith("erin*")) {
        buf.setLength(buf.length - 1)
        strip(buf, substCount)
      }
      if (buf.nonEmpty && buf.charAt(buf.length - 1) == 'z')
        buf.setCharAt(buf.length - 1, 'x')
    }

    private def resubstitute(buf: StringBuilder): Unit = {
      var c = 0
      while (c < buf.length) {
        buf.charAt(c) match {
          case '*' => buf.setCharAt(c, buf.charAt(c - 1))
          case '$' => buf.setCharAt(c, 's'); buf.insert(c + 1, "ch")
          case '§' => buf.setCharAt(c, 'c'); buf.insert(c + 1, 'h')
          case '%' => buf.setCharAt(c, 'e'); buf.insert(c + 1, 'i')
          case '&' => buf.setCharAt(c, 'i'); buf.insert(c + 1, 'e')
          case '#' => buf.setCharAt(c, 'i'); buf.insert(c + 1, 'g')
          case '!' => buf.setCharAt(c, 's'); buf.insert(c + 1, 't')
          case _ =>
        }
        c += 1
      }
    }

    private def removeParticleDenotion(buf: StringBuilder): Unit = {
      if (buf.length > 4) {
        var c = 0
        while (c < buf.length - 3) {
          if (buf.substring(c, c + 4) == "gege") {
            buf.delete(c, c + 2)
            return
          }
          c += 1
        }
      }
    }
  }

  /** German stem filter with an exclusion set
    * (de/GermanStemFilter.cpp). */
  def germanStemFilter(exclusions: Set[String] = Set.empty)(
      in: Iterator[Token]): Iterator[Token] =
    in.map(t => if (exclusions.contains(t.term)) t else t.copy(term = GermanStemmer.stem(t.term)))

  // ---- Arabic / Persian --------------------------------------------------

  /** Letter-or-nonspacing-mark tokenizer
    * (ar/ArabicLetterTokenizer.cpp:26-28 — LetterTokenizer extended to keep
    * diacritics attached for the normalizer). */
  def arabicLetterTokenize(text: String): Iterator[Token] = {
    def tokChar(c: Char) = Character.isLetter(c) || isNonSpacing(c)
    val out = Vector.newBuilder[Token]
    var i = 0
    val n = text.length
    while (i < n) {
      if (!tokChar(text.charAt(i))) i += 1
      else {
        var j = i
        while (j < n && tokChar(text.charAt(j)) && j - i < 255) j += 1
        out += Token(text.substring(i, j), 1, i, j, TokenType.ALPHANUM)
        i = j
      }
    }
    out.result().iterator
  }

  /** ArabicNormalizer (ar/ArabicNormalizer.cpp:39-68): fold alef variants,
    * dotless yeh, teh marbuta; strip tatweel and harakat. */
  def arabicNormalize(term: String): String = {
    val sb = new StringBuilder(term.length)
    term.foreach {
      case 'آ' | 'أ' | 'إ' => sb += 'ا' // alef madda/hamza -> alef
      case 'ى' => sb += 'ي' // dotless yeh -> yeh
      case 'ة' => sb += 'ه' // teh marbuta -> heh
      case 'ـ' | 'ً' | 'ٌ' | 'ٍ' | 'َ' |
           'ُ' | 'ِ' | 'ّ' | 'ْ' => () // tatweel/harakat deleted
      case c => sb += c
    }
    sb.toString
  }

  /** ArabicStemmer (ar/ArabicStemmer.cpp:62-130): one prefix (longest
    * listed first; waw needs ≥4 chars, others ≥ prefix+2), then EVERY
    * matching suffix in list order (each needs ≥ 2 chars left). */
  def arabicStem(term0: String): String = {
    val prefixes = Seq("ال", "وال", "بال",
      "كال", "فال", "لل", "و")
    val suffixes = Seq("ها", "ان", "ات", "ون",
      "ين", "يه", "ية", "ه", "ة", "ي")
    var s = term0
    prefixes.find { p =>
      (if (p.length == 1) s.length >= 4 else s.length >= p.length + 2) && s.startsWith(p)
    }.foreach(p => s = s.substring(p.length))
    suffixes.foreach { suf =>
      if (s.length >= suf.length + 2 && s.endsWith(suf))
        s = s.substring(0, s.length - suf.length)
    }
    s
  }

  /** PersianNormalizer (fa/PersianNormalizer.cpp:26-48): fold farsi
    * yeh/yeh barree, keheh, heh variants; strip hamza above. */
  def persianNormalize(term: String): String = {
    val sb = new StringBuilder(term.length)
    term.foreach {
      case 'ی' | 'ے' => sb += 'ي' // farsi yeh / yeh barree -> yeh
      case 'ک' => sb += 'ك' // keheh -> kaf
      case 'ۀ' | 'ہ' => sb += 'ه' // heh yeh / heh goal -> heh
      case 'ٔ' => () // hamza above deleted
      case c => sb += c
    }
    sb.toString
  }

  // ---- Greek -------------------------------------------------------------

  /** GreekLowerCaseFilter (el/GreekLowerCaseFilter.cpp:36-86): lowercase
    * with final-sigma folding and tonos/dialytika diacritic removal. */
  def greekLowerCase(term: String): String = term.map {
    case 'ς' => 'σ'
    case 'Ά' | 'ά' => 'α'
    case 'Έ' | 'έ' => 'ε'
    case 'Ή' | 'ή' => 'η'
    case 'Ί' | 'Ϊ' | 'ί' | 'ϊ' | 'ΐ' => 'ι'
    case 'Ύ' | 'Ϋ' | 'ύ' | 'ϋ' | 'ΰ' => 'υ'
    case 'Ό' | 'ό' => 'ο'
    case 'Ώ' | 'ώ' => 'ω'
    case '΢' => 'ς'
    case c => Character.toLowerCase(c)
  }

  // ---- French elision / reverse ------------------------------------------

  /** FrenchAnalyzer's default elision articles (fr/FrenchAnalyzer.cpp +
    * ElisionFilter defaults: l', m', t', qu', n', s', j'). */
  val FrenchArticles: Set[String] = Set("l", "m", "t", "qu", "n", "s", "j")

  /** ElisionFilter (fr/ElisionFilter.cpp:33-57): strip a leading article
    * before the FIRST apostrophe (straight or typographic). */
  def elisionFilter(articles: Set[String] = FrenchArticles)(
      in: Iterator[Token]): Iterator[Token] = {
    val lowerArticles = articles.map(_.toLowerCase)
    in.map { t =>
      val p1 = t.term.indexOf('\'')
      val p2 = t.term.indexOf('’')
      val p = if (p1 < 0) p2 else if (p2 < 0) p1 else math.min(p1, p2)
      if (p >= 0 && lowerArticles.contains(t.term.substring(0, p).toLowerCase))
        t.copy(term = t.term.substring(p + 1))
      else t
    }
  }

  /** ReverseStringFilter (reverse/ReverseStringFilter.cpp:41-55) — the
    * leading-wildcard indexing trick; optional marker char appended before
    * reversal. */
  def reverseFilter(marker: Char = ' ')(in: Iterator[Token]): Iterator[Token] =
    in.map { t =>
      val base = if (marker != ' ') t.term + marker else t.term
      t.copy(term = base.reverse)
    }
}

/** CJKAnalyzer (cjk/CJKAnalyzer.cpp): bigram tokenizer + stop filter. */
case object CJKAnalyzer extends Analyzer {
  override def analyze(text: String): Iterator[Token] =
    Filters.stopFilter(Lang.CjkStopWords)(Lang.cjkTokenize(text))
  override def name: String = "cjk"
}

/** ChineseAnalyzer (cn/ChineseAnalyzer.cpp): per-char tokenizer +
  * ChineseFilter. */
case object ChineseAnalyzer extends Analyzer {
  override def analyze(text: String): Iterator[Token] =
    Lang.chineseFilter(Lang.chineseTokenize(text))
  override def name: String = "chinese"
}

/** GermanAnalyzer (de/GermanAnalyzer.cpp:59-66): standard chain with the
  * German stop set, then the German stemmer. */
final case class GermanAnalyzer(exclusions: Set[String] = Set.empty) extends Analyzer {
  override def analyze(text: String): Iterator[Token] =
    Lang.germanStemFilter(exclusions)(
      Filters.stopFilter(Lang.GermanStopWords)(
        Filters.lowerCaseFilter(
          Filters.standardFilter(
            ClassicScanner.tokenize(text, 255)))))
  override def name: String = "german"
}

/** ArabicAnalyzer (ar/ArabicAnalyzer.cpp:100-107): letter tokenizer →
  * lowercase → stop (UN-normalized list, as the reference notes) →
  * normalize → stem. */
case object ArabicAnalyzer extends Analyzer {
  override def analyze(text: String): Iterator[Token] =
    Filters.stopFilter(LangStopWords.Arabic)(
      Filters.lowerCaseFilter(Lang.arabicLetterTokenize(text)))
      .map(t => t.copy(term = Lang.arabicStem(Lang.arabicNormalize(t.term))))
  override def name: String = "arabic"
}

/** PersianAnalyzer (fa/PersianAnalyzer.cpp): letter tokenizer → lowercase
  * → arabic normalize → persian normalize → stop. */
case object PersianAnalyzer extends Analyzer {
  override def analyze(text: String): Iterator[Token] =
    Filters.stopFilter(LangStopWords.Persian)(
      Filters.lowerCaseFilter(Lang.arabicLetterTokenize(text))
        .map(t => t.copy(term = Lang.persianNormalize(Lang.arabicNormalize(t.term)))))
  override def name: String = "persian"
}

/** GreekAnalyzer (el/GreekAnalyzer.cpp:84-89): standard tokenizer → greek
  * lowercase → stop. */
case object GreekAnalyzer extends Analyzer {
  override def analyze(text: String): Iterator[Token] =
    Filters.stopFilter(LangStopWords.Greek)(
      Filters.standardFilter(ClassicScanner.tokenize(text, 255))
        .map(t => t.copy(term = Lang.greekLowerCase(t.term))))
  override def name: String = "greek"
}

/** CzechAnalyzer (cz/CzechAnalyzer.cpp): standard chain with the Czech
  * stop set (no stemmer in the reference either). */
case object CzechAnalyzer extends Analyzer {
  override def analyze(text: String): Iterator[Token] =
    Filters.stopFilter(LangStopWords.Czech)(
      Filters.lowerCaseFilter(
        Filters.standardFilter(
          ClassicScanner.tokenize(text, 255))))
  override def name: String = "czech"
}

/** FrenchAnalyzer front-end: elision + standard chain (the reference adds
  * a FrenchStemmer — out of scope; elision is the piece web queries hit:
  * "l'avion" must match "avion"). */
final case class FrenchElisionAnalyzer(articles: Set[String] = Lang.FrenchArticles)
  extends Analyzer {
  override def analyze(text: String): Iterator[Token] =
    Filters.lowerCaseFilter(
      Lang.elisionFilter(articles)(
        Filters.standardFilter(ClassicScanner.tokenize(text, 255))))
  override def name: String = "french-elision"
}
