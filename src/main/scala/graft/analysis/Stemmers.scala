package graft.analysis

/** The reference's French, Dutch and Russian stemmers, ported
  * rule-for-rule (each cites its source; the algorithms are the public
  * Snowball-derived heuristics Apache Lucene ships). Verified against the
  * reference's own fixtures — for Russian, its full 49k-word golden corpus
  * (src/test/testfiles/russian/wordsUTF8.txt). */
object Stemmers {

  // ---- French (fr/FrenchStemmer.cpp) -------------------------------------

  /** Stateful per the reference: a buffer plus the R0/RV/R1/R2 regions
    * recomputed after every mutation (setStrings). */
  final class FrenchStemmer {
    private var sb: String = ""
    private var R0 = ""
    private var RV = ""
    private var R1 = ""
    private var R2 = ""
    private var modified = false
    private var suite = false

    private val vowels = "aeiouyâàëéêèïîôüùû".toSet
    private def isVowel(c: Char) = vowels.contains(c)

    def stem(term: String): String = {
      if (!isStemmable(term)) return term
      sb = term.toLowerCase
      modified = false
      suite = false
      sb = treatVowels(sb)
      setStrings()
      step1()
      if (!modified || suite) {
        if (RV.nonEmpty) {
          suite = step2a()
          if (!suite) step2b()
        }
      }
      if (modified || suite) step3() else step4()
      step5()
      step6()
      sb
    }

    private def isStemmable(term: String): Boolean = {
      var upper = false
      var first = -1
      var c = 0
      while (c < term.length) {
        if (!Character.isLetter(term.charAt(c))) return false
        if (Character.isUpperCase(term.charAt(c))) {
          if (upper) return false
          first = c
          upper = true
        }
        c += 1
      }
      first <= 0
    }

    private def setStrings(): Unit = {
      R0 = sb
      RV = retrieveRV(sb)
      R1 = retrieveR(sb)
      R2 = if (R1.nonEmpty) retrieveR(R1) else ""
    }

    private def retrieveR(buffer: String): String = {
      val pos = buffer.indexWhere(isVowel)
      if (pos < 0) return ""
      var consonne = -1
      var c = pos
      while (c < buffer.length && consonne < 0) {
        if (!isVowel(buffer.charAt(c))) consonne = c
        c += 1
      }
      if (consonne > -1 && consonne + 1 < buffer.length) buffer.substring(consonne + 1)
      else ""
    }

    private def retrieveRV(buffer: String): String = {
      if (buffer.length <= 3) return ""
      if (isVowel(buffer.charAt(0)) && isVowel(buffer.charAt(1))) buffer.substring(3)
      else {
        var pos = 0
        var c = 1
        while (c < buffer.length && pos == 0) {
          if (isVowel(buffer.charAt(c))) pos = c
          c += 1
        }
        if (pos + 1 < buffer.length) buffer.substring(pos + 1) else ""
      }
    }

    private def treatVowels(b0: String): String = {
      val b = b0.toCharArray
      var c = 0
      while (c < b.length) {
        val ch = b(c)
        if (c == 0) {
          if (b.length > 1 && ch == 'y' && isVowel(b(1))) b(0) = 'Y'
        } else if (c == b.length - 1) {
          if (ch == 'u' && b(c - 1) == 'q') b(c) = 'U'
          if (ch == 'y' && isVowel(b(c - 1))) b(c) = 'Y'
        } else {
          if (ch == 'u') {
            if (b(c - 1) == 'q') b(c) = 'U'
            else if (isVowel(b(c - 1)) && isVowel(b(c + 1))) b(c) = 'U'
          }
          if (ch == 'i' && isVowel(b(c - 1)) && isVowel(b(c + 1))) b(c) = 'I'
          if (ch == 'y' && (isVowel(b(c - 1)) || isVowel(b(c + 1)))) b(c) = 'Y'
        }
        c += 1
      }
      new String(b)
    }

    // --- suffix helpers (FrenchStemmer.cpp:240-345), all mutate sb ---

    private def deleteFrom(source: String, suffixes: Seq[String]): Unit =
      if (source.nonEmpty) suffixes.find(source.endsWith).foreach { s =>
        sb = sb.substring(0, sb.length - s.length)
        modified = true
        setStrings()
      }

    private def replaceFrom(source: String, search: Seq[String], replace: String): Boolean = {
      if (source.isEmpty) return false
      search.find(source.endsWith) match {
        case Some(s) =>
          sb = sb.substring(0, sb.length - s.length) + replace
          modified = true
          setStrings()
          true
        case None => false
      }
    }

    private def deleteFromIfPrecededIn(source: String, search: Seq[String],
        from: String, prefix: String): Boolean = {
      if (source.isEmpty) return false
      search.find(s => source.endsWith(s) &&
        from.nonEmpty && from.endsWith(prefix + s)) match {
        case Some(s) =>
          sb = sb.substring(0, sb.length - s.length)
          setStrings()
          true
        case None => false
      }
    }

    private def deleteFromIfTestVowelBeforeIn(source: String, search: Seq[String],
        vowel: Boolean, from: String): Boolean = {
      if (source.isEmpty || from.isEmpty) return false
      var found = false
      val it = search.iterator
      while (!found && it.hasNext) {
        val s = it.next()
        if (source.endsWith(s) && s.length + 1 <= from.length) {
          if (isVowel(sb.charAt(sb.length - (s.length + 1))) == vowel) {
            sb = sb.substring(0, sb.length - s.length)
            modified = true
            found = true
            setStrings()
          }
        }
      }
      found
    }

    private def deleteButSuffixFrom(source: String, search: Seq[String],
        prefix: String, without: Boolean): Unit = {
      if (source.isEmpty) return
      var done = false
      val it = search.iterator
      while (!done && it.hasNext) {
        val s = it.next()
        if (source.endsWith(prefix + s)) {
          sb = sb.substring(0, sb.length - (prefix.length + s.length))
          modified = true
          done = true
          setStrings()
        } else if (without && source.endsWith(s)) {
          sb = sb.substring(0, sb.length - s.length)
          modified = true
          done = true
          setStrings()
        }
      }
    }

    private def deleteButSuffixFromElseReplace(source: String, search: Seq[String],
        prefix: String, without: Boolean, from: String, replace: String): Unit = {
      if (source.isEmpty) return
      var done = false
      val it = search.iterator
      while (!done && it.hasNext) {
        val s = it.next()
        if (source.endsWith(prefix + s)) {
          sb = sb.substring(0, sb.length - (prefix.length + s.length))
          modified = true
          done = true
          setStrings()
        } else if (from.nonEmpty && from.endsWith(prefix + s)) {
          sb = sb.substring(0, sb.length - (prefix.length + s.length)) + replace
          modified = true
          done = true
          setStrings()
        } else if (without && source.endsWith(s)) {
          sb = sb.substring(0, sb.length - s.length)
          modified = true
          done = true
          setStrings()
        }
      }
    }

    // --- steps (FrenchStemmer.cpp:77-235) ---

    private def step1(): Unit = {
      deleteFrom(R2, Seq("ances", "iqUes", "ismes", "ables", "istes",
        "ance", "iqUe", "isme", "able", "iste"))
      replaceFrom(R2, Seq("logies", "logie"), "log")
      replaceFrom(R2, Seq("usions", "utions", "usion", "ution"), "u")
      replaceFrom(R2, Seq("ences", "ence"), "ent")
      val search = Seq("atrices", "ateurs", "ations", "atrice", "ateur", "ation")
      deleteButSuffixFromElseReplace(R2, search, "ic", true, R0, "iqU")
      deleteButSuffixFromElseReplace(R2, Seq("ements", "ement"), "eus", false, R0, "eux")
      deleteButSuffixFrom(R2, Seq("ements", "ement"), "ativ", false)
      deleteButSuffixFrom(R2, Seq("ements", "ement"), "iv", false)
      deleteButSuffixFrom(R2, Seq("ements", "ement"), "abl", false)
      deleteButSuffixFrom(R2, Seq("ements", "ement"), "iqU", false)
      deleteFromIfTestVowelBeforeIn(R1, Seq("issements", "issement"), false, R0)
      deleteFrom(RV, Seq("ements", "ement"))
      deleteButSuffixFromElseReplace(R2, Seq("ités", "ité"), "abil", false, R0, "abl")
      deleteButSuffixFromElseReplace(R2, Seq("ités", "ité"), "ic", false, R0, "iqU")
      deleteButSuffixFrom(R2, Seq("ités", "ité"), "iv", true)
      val autre = Seq("ifs", "ives", "if", "ive")
      deleteButSuffixFromElseReplace(R2, autre, "icat", false, R0, "iqU")
      deleteButSuffixFromElseReplace(R2, autre, "at", true, R2, "iqU")
      replaceFrom(R0, Seq("eaux"), "eau")
      replaceFrom(R1, Seq("aux"), "al")
      deleteButSuffixFromElseReplace(R2, Seq("euses", "euse"), "", true, R1, "eux")
      deleteFrom(R2, Seq("eux"))
      if (replaceFrom(RV, Seq("amment"), "ant")) suite = true
      if (replaceFrom(RV, Seq("emment"), "ent")) suite = true
      if (deleteFromIfTestVowelBeforeIn(RV, Seq("ments", "ment"), true, RV)) suite = true
    }

    private val step2aSearch = Seq(
      "îmes", "îtes", "iraIent", "irait", "irais", "irai", "iras", "ira",
      "irent", "iriez", "irez", "irions", "irons", "iront", "issaIent",
      "issais", "issantes", "issante", "issants", "issant", "issait",
      "issais", "issions", "issons", "issiez", "issez", "issent", "isses",
      "isse", "ir", "is", "ît", "it", "ies", "ie", "i")

    private def step2a(): Boolean =
      deleteFromIfTestVowelBeforeIn(RV, step2aSearch, false, RV)

    private def step2b(): Unit = {
      deleteFrom(RV, Seq("eraIent", "erais", "erait", "erai", "eras", "erions",
        "eriez", "erons", "eront", "erez", "èrent", "era", "ées", "iez",
        "ée", "és", "er", "ez", "é"))
      deleteButSuffixFrom(RV, Seq("assions", "assiez", "assent", "asses",
        "asse", "aIent", "antes", "aIent", "Aient", "ante", "âmes", "âtes",
        "ants", "ant", "ait", "aît", "ais", "Ait", "Aît", "Ais", "ât",
        "as", "ai", "Ai", "a"), "e", true)
      deleteFrom(R2, Seq("ions"))
    }

    private def step3(): Unit = {
      if (sb.nonEmpty) {
        sb.charAt(sb.length - 1) match {
          case 'Y' => sb = sb.substring(0, sb.length - 1) + "i"; setStrings()
          case 'ç' => sb = sb.substring(0, sb.length - 1) + "c"; setStrings()
          case _ =>
        }
      }
    }

    private def step4(): Unit = {
      if (sb.length > 1 && sb.charAt(sb.length - 1) == 's') {
        val b = sb.charAt(sb.length - 2)
        if (b != 'a' && b != 'i' && b != 'o' && b != 'u' && b != 'è' && b != 's') {
          sb = sb.substring(0, sb.length - 1)
          setStrings()
        }
      }
      if (!deleteFromIfPrecededIn(R2, Seq("ion"), RV, "s"))
        deleteFromIfPrecededIn(R2, Seq("ion"), RV, "t")
      replaceFrom(RV, Seq("Ière", "ière", "Ier", "ier"), "i")
      deleteFrom(RV, Seq("e"))
      deleteFromIfPrecededIn(RV, Seq("ë"), R0, "gu")
    }

    private def step5(): Unit = {
      if (R0.nonEmpty && (R0.endsWith("enn") || R0.endsWith("onn") ||
        R0.endsWith("ett") || R0.endsWith("ell") || R0.endsWith("eill"))) {
        sb = sb.substring(0, sb.length - 1)
        setStrings()
      }
    }

    private def step6(): Unit = {
      if (R0.nonEmpty) {
        var seenVowel = false
        var seenConson = false
        var pos = -1
        var i = R0.length - 1
        var break = false
        while (i > -1 && !break) {
          val ch = R0.charAt(i)
          if (isVowel(ch)) {
            if (!seenVowel && (ch == 'é' || ch == 'è')) {
              pos = i
              break = true
            }
            if (!break) seenVowel = true
          } else {
            if (seenVowel) break = true
            else seenConson = true
          }
          i -= 1
        }
        if (pos > -1 && seenConson && !seenVowel) {
          // pos is an index into R0, a suffix of sb: convert
          val off = sb.length - R0.length
          sb = sb.substring(0, off + pos) + "e" + sb.substring(off + pos + 1)
          // (no setStrings: final step)
        }
      }
    }
  }

  // ---- Dutch (nl/DutchStemmer.cpp) ---------------------------------------

  final class DutchStemmer {
    private var buf: StringBuilder = _
    private var R1 = 0
    private var R2 = 0
    private var removedE = false

    private def isVowel(c: Char) = "eaoiuyè".contains(c)

    def stem(term: String): String = {
      buf = new StringBuilder(term.toLowerCase)
      if (!buf.forall(Character.isLetterOrDigit)) return buf.toString
      substitute()
      storeYandI()
      R1 = math.max(3, getRIndex(0))
      step1()
      step2()
      R2 = getRIndex(R1)
      step3a()
      step3b()
      step4()
      buf.toString.replace('I', 'i').replace('Y', 'y')
    }

    private def substitute(): Unit = {
      var i = 0
      while (i < buf.length) {
        buf.charAt(i) match {
          case 'ä' | 'á' => buf.setCharAt(i, 'a')
          case 'ë' | 'é' => buf.setCharAt(i, 'e')
          case 'ü' | 'ú' => buf.setCharAt(i, 'u')
          case 'ï' => buf.setCharAt(i, 'i')
          case 'ö' | 'ó' => buf.setCharAt(i, 'o')
          case _ =>
        }
        i += 1
      }
    }

    private def storeYandI(): Unit = {
      if (buf.charAt(0) == 'y') buf.setCharAt(0, 'Y')
      val last = buf.length - 1
      var i = 1
      while (i < last) {
        buf.charAt(i) match {
          case 'i' if isVowel(buf.charAt(i - 1)) && isVowel(buf.charAt(i + 1)) =>
            buf.setCharAt(i, 'I')
          case 'y' if isVowel(buf.charAt(i - 1)) =>
            buf.setCharAt(i, 'Y')
          case _ =>
        }
        i += 1
      }
      if (last > 0 && buf.charAt(last) == 'y' && isVowel(buf.charAt(last - 1)))
        buf.setCharAt(last, 'Y')
    }

    private def getRIndex(start0: Int): Int = {
      var i = math.max(1, start0)
      while (i < buf.length &&
        !(!isVowel(buf.charAt(i)) && isVowel(buf.charAt(i - 1)))) i += 1
      i + 1
    }

    private def ends(s: String): Boolean = buf.endsWith(s)

    private def isValidSEnding(index: Int): Boolean = {
      val c = buf.charAt(index)
      !(isVowel(c) || c == 'j')
    }

    private def isValidEnEnding(index: Int): Boolean = {
      val c = buf.charAt(index)
      if (isVowel(c)) return false
      if (c < 3) return false // reference quirk (char-vs-int compare), kept
      !(c == 'm' && index >= 2 && buf.charAt(index - 2) == 'g' && buf.charAt(index - 1) == 'e')
    }

    private def unDouble(endIndex: Int): Unit = {
      val s = buf.substring(0, endIndex)
      if (s.endsWith("kk") || s.endsWith("tt") || s.endsWith("dd") ||
        s.endsWith("nn") || s.endsWith("mm") || s.endsWith("ff"))
        buf.setLength(endIndex - 1)
    }
    private def unDouble(): Unit = unDouble(buf.length)

    private def enEnding(): Boolean = {
      for (end <- Seq("ene", "en")) {
        val index = buf.length - end.length
        if (ends(end) && index >= R1 && isValidEnEnding(index - 1)) {
          buf.delete(index, index + end.length)
          unDouble(index)
          return true
        }
      }
      false
    }

    private def step1(): Unit = {
      if (R1 >= buf.length) return
      val lengthR1 = buf.length - R1
      if (ends("heden")) {
        val repl = buf.substring(R1, R1 + lengthR1).replace("heden", "heid")
        buf.replace(R1, R1 + lengthR1, repl)
        return
      }
      if (enEnding()) return
      var index = buf.length - 2
      if (ends("se") && index >= R1 && isValidSEnding(index - 1)) {
        buf.delete(index, index + 2)
        return
      }
      index = buf.length - 1
      if (ends("s") && index >= R1 && isValidSEnding(index - 1))
        buf.deleteCharAt(index)
    }

    private def step2(): Unit = {
      removedE = false
      if (R1 >= buf.length) return
      val index = buf.length - 1
      if (index >= R1 && ends("e") && !isVowel(buf.charAt(index - 1))) {
        buf.deleteCharAt(index)
        unDouble()
        removedE = true
      }
    }

    private def step3a(): Unit = {
      if (R2 >= buf.length) return
      val index = buf.length - 4
      if (ends("heid") && index >= R2 && buf.charAt(index - 1) != 'c') {
        buf.delete(index, index + 4)
        enEnding()
      }
    }

    private def step3b(): Unit = {
      if (R2 >= buf.length) return
      var index = buf.length - 3
      if ((ends("end") || ends("ing")) && index >= R2) {
        buf.delete(index, index + 3)
        if (buf.charAt(index - 2) == 'i' && buf.charAt(index - 1) == 'g') {
          if (buf.charAt(index - 3) != 'e' && index - 2 >= R2) {
            buf.delete(index - 2, index)
          }
        } else unDouble(index)
        return
      }
      index = buf.length - 2
      if (ends("ig") && index >= R2) {
        if (buf.charAt(index - 1) != 'e') buf.delete(index, index + 2)
        return
      }
      index = buf.length - 4
      if (ends("lijk") && index >= R2) {
        buf.delete(index, index + 4)
        step2()
        return
      }
      index = buf.length - 4
      if (ends("baar") && index >= R2) {
        buf.delete(index, index + 4)
        return
      }
      index = buf.length - 3
      if (ends("bar") && index >= R2) {
        if (removedE) buf.delete(index, index + 3)
        return
      }
    }

    private def step4(): Unit = {
      if (buf.length < 4) return
      val end = buf.substring(buf.length - 4)
      if (end.charAt(1) == end.charAt(2) && end.charAt(3) != 'I' &&
        end.charAt(1) != 'i' && isVowel(end.charAt(1)) &&
        !isVowel(end.charAt(3)) && !isVowel(end.charAt(0)))
        buf.deleteCharAt(buf.length - 2)
    }
  }

  // ---- Russian (ru/RussianStemmer.cpp) -----------------------------------

  object RussianStemmer {
    // Cyrillic letters by the reference's names (RussianStemmer.cpp:14-34)
    private val A = 'а'; private val V = 'в'; private val G = 'г'
    private val E = 'е'; private val I = 'и'; private val IShort = 'й'
    private val L = 'л'; private val M = 'м'; private val N = 'н'
    private val O = 'о'; private val S = 'с'; private val T = 'т'
    private val U = 'у'; private val X = 'х'; private val SH = 'ш'
    private val SHCH = 'щ'; private val Y = 'ы'; private val SOFT = 'ь'
    private val AE = 'э'; private val IU = 'ю'; private val IA = 'я'

    private val vowels = Set(A, E, I, O, U, Y, AE, IU, IA)
    private def isVowel(c: Char) = vowels.contains(c)

    private def w(cs: Char*): String = new String(cs.toArray)

    private val perfectiveGerundEndings1 = Seq(w(V), w(V, SH, I), w(V, SH, I, S, SOFT))
    private val perfectiveGerund1Predessors = Seq(w(A), w(IA))
    private val perfectiveGerundEndings2 = Seq(w(I, V), w(Y, V), w(I, V, SH, I),
      w(Y, V, SH, I), w(I, V, SH, I, S, SOFT), w(Y, V, SH, I, S, SOFT))
    private val adjectiveEndings = Seq(w(E, E), w(I, E), w(Y, E), w(O, E),
      w(E, IShort), w(I, IShort), w(Y, IShort), w(O, IShort), w(E, M), w(I, M),
      w(Y, M), w(O, M), w(I, X), w(Y, X), w(U, IU), w(IU, IU), w(A, IA),
      w(IA, IA), w(O, IU), w(E, IU), w(I, M, I), w(Y, M, I), w(E, G, O),
      w(O, G, O), w(E, M, U), w(O, M, U))
    private val participleEndings1 = Seq(w(SHCH), w(E, M), w(N, N), w(V, SH), w(IU, SHCH))
    private val participleEndings2 = Seq(w(I, V, SH), w(Y, V, SH), w(U, IU, SHCH))
    private val participle1Predessors = Seq(w(A), w(IA))
    private val reflexiveEndings = Seq(w(S, IA), w(S, SOFT))
    private val verbEndings1 = Seq(w(IShort), w(L), w(N), w(L, O), w(N, O),
      w(E, T), w(IU, T), w(L, A), w(N, A), w(L, I), w(E, M), w(N, Y),
      w(E, T, E), w(IShort, T, E), w(T, SOFT), w(E, SH, SOFT), w(N, N, O))
    private val verbEndings2 = Seq(w(IU), w(U, IU), w(E, N), w(E, IShort),
      w(IA, T), w(U, IShort), w(I, L), w(Y, L), w(I, M), w(Y, M), w(I, T),
      w(Y, T), w(I, L, A), w(Y, L, A), w(E, N, A), w(I, T, E), w(I, L, I),
      w(Y, L, I), w(I, L, O), w(Y, L, O), w(E, N, O), w(U, E, T), w(U, IU, T),
      w(E, N, Y), w(I, T, SOFT), w(Y, T, SOFT), w(I, SH, SOFT),
      w(E, IShort, T, E), w(U, IShort, T, E))
    private val verb1Predessors = Seq(w(A), w(IA))
    private val nounEndings = Seq(w(A), w(U), w(IShort), w(O), w(U), w(E),
      w(Y), w(I), w(SOFT), w(IA), w(E, V), w(O, V), w(I, E), w(SOFT, E),
      w(IA, X), w(I, IU), w(E, I), w(I, I), w(E, IShort), w(O, IShort),
      w(E, M), w(A, M), w(O, M), w(A, X), w(SOFT, IU), w(I, IA), w(SOFT, IA),
      w(I, IShort), w(IA, M), w(IA, M, I), w(A, M, I), w(I, E, IShort),
      w(I, IA, M), w(I, E, M), w(I, IA, X), w(I, IA, M, I))
    private val superlativeEndings = Seq(w(E, IShort, SH), w(E, IShort, SH, E))
    private val derivationalEndings = Seq(w(O, S, T), w(O, S, T, SOFT))
    private val doubleN = Seq(w(N, N))

    def stem(input: String): String = {
      val (rv, _, r2) = markPositions(input)
      if (rv == 0) return input
      var zone = input.substring(rv)

      // Step 1
      def apply1(): Unit = {
        val afterPG = findAndRemoveEnding(zone, perfectiveGerundEndings1,
          perfectiveGerund1Predessors).orElse(
          findAndRemoveEnding(zone, perfectiveGerundEndings2))
        afterPG match {
          case Some(z) => zone = z
          case None =>
            findAndRemoveEnding(zone, reflexiveEndings).foreach(zone = _)
            findAndRemoveEnding(zone, adjectiveEndings) match {
              case Some(z1) =>
                zone = z1
                findAndRemoveEnding(zone, participleEndings1, participle1Predessors)
                  .orElse(findAndRemoveEnding(zone, participleEndings2))
                  .foreach(zone = _)
              case None =>
                findAndRemoveEnding(zone, verbEndings1, verb1Predessors)
                  .orElse(findAndRemoveEnding(zone, verbEndings2)) match {
                  case Some(z2) => zone = z2
                  case None => findAndRemoveEnding(zone, nounEndings).foreach(zone = _)
                }
            }
        }
      }
      apply1()

      // Step 2: remove trailing I
      if (zone.nonEmpty && zone.last == I) zone = zone.substring(0, zone.length - 1)

      // Step 3: derivational, only if the ending sits in R2
      val dl = findEnding(zone, zone.length - 1, derivationalEndings)
      if (dl != 0 && r2 - rv <= zone.length - dl)
        zone = zone.substring(0, zone.length - dl)

      // Step 4
      findAndRemoveEnding(zone, superlativeEndings).foreach(zone = _)
      if (findEnding(zone, zone.length - 1, doubleN) != 0)
        zone = zone.substring(0, zone.length - 1)
      if (zone.nonEmpty && zone.last == SOFT) zone = zone.substring(0, zone.length - 1)

      input.substring(0, rv) + zone
    }

    /** (RV, R1, R2) per RussianStemmer::markPositions. */
    private def markPositions(word: String): (Int, Int, Int) = {
      var i = 0
      while (i < word.length && !isVowel(word.charAt(i))) i += 1
      i += 1
      if (word.length - 1 < i) return (0, 0, 0)
      val rv = i
      while (i < word.length && isVowel(word.charAt(i))) i += 1
      i += 1
      if (word.length - 1 < i) return (rv, 0, 0)
      val r1 = i
      while (i < word.length && !isVowel(word.charAt(i))) i += 1
      i += 1
      if (word.length - 1 < i) return (rv, r1, 0)
      while (i < word.length && isVowel(word.charAt(i))) i += 1
      i += 1
      if (word.length - 1 < i) return (rv, r1, 0)
      (rv, r1, i)
    }

    /** Matched ending length at `startIndex` (scanning the class from its
      * END, as the reference does — later entries win). */
    private def findEnding(zone: String, startIndex: Int, endings: Seq[String]): Int = {
      var i = endings.length - 1
      while (i >= 0) {
        val e = endings(i)
        if (startIndex >= e.length - 1) {
          var m = true
          var si = startIndex
          var j = e.length - 1
          while (m && j >= 0) {
            if (zone.charAt(si) != e.charAt(j)) m = false
            si -= 1
            j -= 1
          }
          if (m) return e.length
        }
        i -= 1
      }
      0
    }

    private def findAndRemoveEnding(zone: String, endings: Seq[String]): Option[String] = {
      val n = findEnding(zone, zone.length - 1, endings)
      if (n == 0) None else Some(zone.substring(0, zone.length - n))
    }

    private def findAndRemoveEnding(zone: String, endings: Seq[String],
        predecessors: Seq[String]): Option[String] = {
      val n = findEnding(zone, zone.length - 1, endings)
      if (n == 0) None
      else if (findEnding(zone, zone.length - n - 1, predecessors) == 0) None
      else Some(zone.substring(0, zone.length - n))
    }
  }
}

/** FrenchAnalyzer (fr/FrenchAnalyzer.cpp:75-83): standard tokenizer →
  * standard filter → stop → French stem → LOWERCASE LAST (the reference
  * lowercases after stemming; the stemmer lowercases internally and leaves
  * unstemmable mixed-case terms for the final filter). */
final case class FrenchAnalyzer(exclusions: Set[String] = Set.empty) extends Analyzer {
  override def analyze(text: String): Iterator[Token] = {
    val stemmer = new Stemmers.FrenchStemmer
    Filters.lowerCaseFilter(
      Filters.stopFilter(LangStopWords.French)(
        Filters.standardFilter(ClassicScanner.tokenize(text, 255)))
        .map(t => if (exclusions.contains(t.term)) t else t.copy(term = stemmer.stem(t.term))))
  }
  override def name: String = "french"
}

/** DutchAnalyzer (nl/DutchAnalyzer.cpp:71-77): standard chain + Dutch
  * stop set + Dutch stemmer. */
final case class DutchAnalyzer(exclusions: Set[String] = Set.empty) extends Analyzer {
  override def analyze(text: String): Iterator[Token] = {
    val stemmer = new Stemmers.DutchStemmer
    Filters.stopFilter(LangStopWords.Dutch)(
      Filters.standardFilter(ClassicScanner.tokenize(text, 255)))
      .map(t => if (exclusions.contains(t.term)) t else t.copy(term = stemmer.stem(t.term)))
  }
  override def name: String = "dutch"
}

/** RussianAnalyzer (ru/RussianAnalyzer.cpp): letter-or-digit tokenizer →
  * lowercase → stop → Russian stem. */
case object RussianAnalyzer extends Analyzer {
  override def analyze(text: String): Iterator[Token] = {
    def tokChar(c: Char) = Character.isLetter(c) || Character.isDigit(c)
    val toks = new Iterator[Token] {
      private var i = 0
      private var nextTok: Token = null
      advance()
      private def advance(): Unit = {
        nextTok = null
        val n = text.length
        while (i < n && !tokChar(text.charAt(i))) i += 1
        if (i < n) {
          val start = i
          while (i < n && tokChar(text.charAt(i)) && i - start < 255) i += 1
          nextTok = Token(text.substring(start, i), 1, start, i, TokenType.ALPHANUM)
        }
      }
      override def hasNext: Boolean = nextTok != null
      override def next(): Token = { val t = nextTok; advance(); t }
    }
    Filters.stopFilter(LangStopWords.Russian)(Filters.lowerCaseFilter(toks))
      .map(t => t.copy(term = Stemmers.RussianStemmer.stem(t.term)))
  }
  override def name: String = "russian"
}
