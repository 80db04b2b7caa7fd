package graft.analysis

/** The reference's Brazilian Portuguese stemmer, ported rule-for-rule
  * (/root/reference/src/contrib/analyzers/common/analysis/br/
  * BrazilianStemmer.cpp; the step tables are transcribed verbatim,
  * including its discarded-result "logias" branch). */
final class BrazilianStemmer {
  private var ct = ""
  private var r1 = ""
  private var r2 = ""
  private var rv = ""
  private var term = ""

  /** Returns the stem, "" when the term is not indexable (len outside
    * (2, 30)), or the changed term when not stemmable — exactly the
    * reference's contract (stem() → BrazilianStemFilter keeps the original
    * term when the stem comes back empty/equal). */
  def stem(term0: String): String = {
    createCT(term0)
    if (!(ct.length < 30 && ct.length > 2)) return ""
    if (!ct.forall(Character.isLetter)) return ct
    r1 = getR1(ct)
    r2 = getR1(r1)
    rv = getRV(ct)
    term = term0 + ";" + ct
    val altered = step1() || step2()
    if (altered) step3() else step4()
    step5()
    ct
  }

  private def isVowel(c: Char) =
    c == 'a' || c == 'e' || c == 'i' || c == 'o' || c == 'u'

  private def getR1(value: String): String = {
    if (value.isEmpty) return ""
    val i = value.length - 1
    var j = 0
    while (j < i && !isVowel(value.charAt(j))) j += 1
    if (j >= i) return ""
    while (j < i && isVowel(value.charAt(j))) j += 1
    if (j >= i) return ""
    value.substring(j + 1)
  }

  private def getRV(value: String): String = {
    if (value.isEmpty) return ""
    val i = value.length - 1
    if (i > 0 && !isVowel(value.charAt(1))) {
      var j = 2
      while (j < i && !isVowel(value.charAt(j))) j += 1
      if (j < i) return value.substring(j + 1)
    }
    if (i > 1 && isVowel(value.charAt(0)) && isVowel(value.charAt(1))) {
      var j = 2
      while (j < i && isVowel(value.charAt(j))) j += 1
      if (j < i) return value.substring(j + 1)
    }
    if (i > 2) value.substring(3) else ""
  }

  /** Accent folding (changeTerm; NOTE: the reference computes a lowercase
    * copy and then iterates the ORIGINAL chars — kept as-is; the analyzer
    * chain lowercases before stemming, so the quirk is invisible there). */
  private def changeTerm(value: String): String = {
    val sb = new StringBuilder(value.length)
    value.foreach {
      case '\u00e1' | '\u00e2' | '\u00e3' => sb += 'a'
      case '\u00e9' | '\u00ea' => sb += 'e'
      case '\u00ed' => sb += 'i'
      case '\u00f3' | '\u00f4' | '\u00f5' => sb += 'o'
      case '\u00fa' | '\u00fc' => sb += 'u'
      case '\u00e7' => sb += 'c'
      case '\u00f1' => sb += 'n'
      case c => sb += c
    }
    sb.toString
  }

  private def checkSuffix(value: String, suffix: String): Boolean =
    value.nonEmpty && suffix.nonEmpty && value.endsWith(suffix)

  private def removeSuffix(value: String, toRemove: String): String =
    if (value.isEmpty || toRemove.isEmpty || !checkSuffix(value, toRemove)) value
    else value.substring(0, value.length - toRemove.length)

  private def replaceSuffix(value: String, toReplace: String, changeTo: String): String = {
    if (value.isEmpty || toReplace.isEmpty || changeTo.isEmpty) return value
    val v = removeSuffix(value, toReplace)
    if (v == value) value else v + changeTo
  }

  private def suffixPreceded(value: String, suffix: String, preceded: String): Boolean =
    value.nonEmpty && suffix.nonEmpty && preceded.nonEmpty &&
      checkSuffix(value, suffix) && checkSuffix(removeSuffix(value, suffix), preceded)

  private def createCT(t: String): Unit = {
    ct = changeTerm(t)
    if (ct.length < 2) return
    val f = ct.charAt(0)
    if (f == '"' || f == '\'' || f == '-' || f == ',' || f == ';' ||
      f == '.' || f == '?' || f == '!') ct = ct.substring(1)
    if (ct.length < 2) return
    val l = ct.charAt(ct.length - 1)
    if (l == '-' || l == ',' || l == ';' || l == '.' || l == '?' ||
      l == '!' || l == '\'' || l == '"') ct = ct.substring(0, ct.length - 1)
  }

private def step1(): Boolean = {
    if (ct.isEmpty) {
        return false
    }

    // suffix length = 7
    if (checkSuffix(ct, "uciones") && checkSuffix(r2, "uciones")) {
        ct = replaceSuffix(ct, "uciones", "u")
        return true
    }

    // suffix length = 6
    if (ct.length >= 6) {
        if (checkSuffix(ct, "imentos") && checkSuffix(r2, "imentos")) {
            ct = removeSuffix(ct, "imentos")
            return true
        }
        if (checkSuffix(ct, "amentos") && checkSuffix(r2, "amentos")) {
            ct = removeSuffix(ct, "amentos")
            return true
        }
        if (checkSuffix(ct, "adores") && checkSuffix(r2, "adores")) {
            ct = removeSuffix(ct, "adores")
            return true
        }
        if (checkSuffix(ct, "adoras") && checkSuffix(r2, "adoras")) {
            ct = removeSuffix(ct, "adoras")
            return true
        }
        if (checkSuffix(ct, "logias") && checkSuffix(r2, "logias")) {
            replaceSuffix(ct, "logias", "log") // result discarded — reference quirk (BrazilianStemmer.cpp "logias" branch)
            return true
        }
        if (checkSuffix(ct, "encias") && checkSuffix(r2, "encias")) {
            ct = replaceSuffix(ct, "encias", "ente")
            return true
        }
        if (checkSuffix(ct, "amente") && checkSuffix(r1, "amente")) {
            ct = removeSuffix(ct, "amente")
            return true
        }
        if (checkSuffix(ct, "idades") && checkSuffix(r2, "idades")) {
            ct = removeSuffix(ct, "idades")
            return true
        }
    }

    // suffix length = 5
    if (ct.length >= 5) {
        if (checkSuffix(ct, "acoes") && checkSuffix(r2, "acoes")) {
            ct = removeSuffix(ct, "acoes")
            return true
        }
        if (checkSuffix(ct, "imento") && checkSuffix(r2, "imento")) {
            ct = removeSuffix(ct, "imento")
            return true
        }
        if (checkSuffix(ct, "amento") && checkSuffix(r2, "amento")) {
            ct = removeSuffix(ct, "amento")
            return true
        }
        if (checkSuffix(ct, "adora") && checkSuffix(r2, "adora")) {
            ct = removeSuffix(ct, "adora")
            return true
        }
        if (checkSuffix(ct, "ismos") && checkSuffix(r2, "ismos")) {
            ct = removeSuffix(ct, "ismos")
            return true
        }
        if (checkSuffix(ct, "istas") && checkSuffix(r2, "istas")) {
            ct = removeSuffix(ct, "istas")
            return true
        }
        if (checkSuffix(ct, "logia") && checkSuffix(r2, "logia")) {
            ct = replaceSuffix(ct, "logia", "log")
            return true
        }
        if (checkSuffix(ct, "ucion") && checkSuffix(r2, "ucion")) {
            ct = replaceSuffix(ct, "ucion", "u")
            return true
        }
        if (checkSuffix(ct, "encia") && checkSuffix(r2, "encia")) {
            ct = replaceSuffix(ct, "encia", "ente")
            return true
        }
        if (checkSuffix(ct, "mente") && checkSuffix(r2, "mente")) {
            ct = removeSuffix(ct, "mente")
            return true
        }
        if (checkSuffix(ct, "idade") && checkSuffix(r2, "idade")) {
            ct = removeSuffix(ct, "idade")
            return true
        }
    }

    // suffix length = 4
    if (ct.length >= 4) {
        if (checkSuffix(ct, "acao") && checkSuffix(r2, "acao")) {
            ct = removeSuffix(ct, "acao")
            return true
        }
        if (checkSuffix(ct, "ezas") && checkSuffix(r2, "ezas")) {
            ct = removeSuffix(ct, "ezas")
            return true
        }
        if (checkSuffix(ct, "icos") && checkSuffix(r2, "icos")) {
            ct = removeSuffix(ct, "icos")
            return true
        }
        if (checkSuffix(ct, "icas") && checkSuffix(r2, "icas")) {
            ct = removeSuffix(ct, "icas")
            return true
        }
        if (checkSuffix(ct, "ismo") && checkSuffix(r2, "ismo")) {
            ct = removeSuffix(ct, "ismo")
            return true
        }
        if (checkSuffix(ct, "avel") && checkSuffix(r2, "avel")) {
            ct = removeSuffix(ct, "avel")
            return true
        }
        if (checkSuffix(ct, "ivel") && checkSuffix(r2, "ivel")) {
            ct = removeSuffix(ct, "ivel")
            return true
        }
        if (checkSuffix(ct, "ista") && checkSuffix(r2, "ista")) {
            ct = removeSuffix(ct, "ista")
            return true
        }
        if (checkSuffix(ct, "osos") && checkSuffix(r2, "osos")) {
            ct = removeSuffix(ct, "osos")
            return true
        }
        if (checkSuffix(ct, "osas") && checkSuffix(r2, "osas")) {
            ct = removeSuffix(ct, "osas")
            return true
        }
        if (checkSuffix(ct, "ador") && checkSuffix(r2, "ador")) {
            ct = removeSuffix(ct, "ador")
            return true
        }
        if (checkSuffix(ct, "ivas") && checkSuffix(r2, "ivas")) {
            ct = removeSuffix(ct, "ivas")
            return true
        }
        if (checkSuffix(ct, "ivos") && checkSuffix(r2, "ivos")) {
            ct = removeSuffix(ct, "ivos")
            return true
        }
        if (checkSuffix(ct, "iras") && checkSuffix(rv, "iras") && suffixPreceded(ct, "iras", "e")) {
            ct = replaceSuffix(ct, "iras", "ir")
            return true
        }
    }

    // suffix length = 3
    if (ct.length >= 3) {
        if (checkSuffix(ct, "eza") && checkSuffix(r2, "eza")) {
            ct = removeSuffix(ct, "eza")
            return true
        }
        if (checkSuffix(ct, "ico") && checkSuffix(r2, "ico")) {
            ct = removeSuffix(ct, "ico")
            return true
        }
        if (checkSuffix(ct, "ica") && checkSuffix(r2, "ica")) {
            ct = removeSuffix(ct, "ica")
            return true
        }
        if (checkSuffix(ct, "oso") && checkSuffix(r2, "oso")) {
            ct = removeSuffix(ct, "oso")
            return true
        }
        if (checkSuffix(ct, "osa") && checkSuffix(r2, "osa")) {
            ct = removeSuffix(ct, "osa")
            return true
        }
        if (checkSuffix(ct, "iva") && checkSuffix(r2, "iva")) {
            ct = removeSuffix(ct, "iva")
            return true
        }
        if (checkSuffix(ct, "ivo") && checkSuffix(r2, "ivo")) {
            ct = removeSuffix(ct, "ivo")
            return true
        }
        if (checkSuffix(ct, "ira") && checkSuffix(rv, "ira") && suffixPreceded(ct, "ira", "e")) {
            ct = replaceSuffix(ct, "ira", "ir")
            return true
        }
    }

    // no ending was removed by step1
    return false
}

private def step2(): Boolean = {
    if (rv.isEmpty) {
        return false
    }

    // suffix lenght = 7
    if (rv.length >= 7) {
        if (checkSuffix(rv, "issemos")) {
            ct = removeSuffix(ct, "issemos")
            return true
        }
        if (checkSuffix(rv, "essemos")) {
            ct = removeSuffix(ct, "essemos")
            return true
        }
        if (checkSuffix(rv, "assemos")) {
            ct = removeSuffix(ct, "assemos")
            return true
        }
        if (checkSuffix(rv, "ariamos")) {
            ct = removeSuffix(ct, "ariamos")
            return true
        }
        if (checkSuffix(rv, "eriamos")) {
            ct = removeSuffix(ct, "eriamos")
            return true
        }
        if (checkSuffix(rv, "iriamos")) {
            ct = removeSuffix(ct, "iriamos")
            return true
        }
    }

    // suffix length = 6
    if (rv.length >= 6) {
        if (checkSuffix(rv, "iremos")) {
            ct = removeSuffix(ct, "iremos")
            return true
        }
        if (checkSuffix(rv, "eremos")) {
            ct = removeSuffix(ct, "eremos")
            return true
        }
        if (checkSuffix(rv, "aremos")) {
            ct = removeSuffix(ct, "aremos")
            return true
        }
        if (checkSuffix(rv, "avamos")) {
            ct = removeSuffix(ct, "avamos")
            return true
        }
        if (checkSuffix(rv, "iramos")) {
            ct = removeSuffix(ct, "iramos")
            return true
        }
        if (checkSuffix(rv, "eramos")) {
            ct = removeSuffix(ct, "eramos")
            return true
        }
        if (checkSuffix(rv, "aramos")) {
            ct = removeSuffix(ct, "aramos")
            return true
        }
        if (checkSuffix(rv, "asseis")) {
            ct = removeSuffix(ct, "asseis")
            return true
        }
        if (checkSuffix(rv, "esseis")) {
            ct = removeSuffix(ct, "esseis")
            return true
        }
        if (checkSuffix(rv, "isseis")) {
            ct = removeSuffix(ct, "isseis")
            return true
        }
        if (checkSuffix(rv, "arieis")) {
            ct = removeSuffix(ct, "arieis")
            return true
        }
        if (checkSuffix(rv, "erieis")) {
            ct = removeSuffix(ct, "erieis")
            return true
        }
        if (checkSuffix(rv, "irieis")) {
            ct = removeSuffix(ct, "irieis")
            return true
        }
    }

    // suffix length = 5
    if (rv.length >= 5) {
        if (checkSuffix(rv, "irmos")) {
            ct = removeSuffix(ct, "irmos")
            return true
        }
        if (checkSuffix(rv, "iamos")) {
            ct = removeSuffix(ct, "iamos")
            return true
        }
        if (checkSuffix(rv, "armos")) {
            ct = removeSuffix(ct, "armos")
            return true
        }
        if (checkSuffix(rv, "ermos")) {
            ct = removeSuffix(ct, "ermos")
            return true
        }
        if (checkSuffix(rv, "areis")) {
            ct = removeSuffix(ct, "areis")
            return true
        }
        if (checkSuffix(rv, "ereis")) {
            ct = removeSuffix(ct, "ereis")
            return true
        }
        if (checkSuffix(rv, "ireis")) {
            ct = removeSuffix(ct, "ireis")
            return true
        }
        if (checkSuffix(rv, "asses")) {
            ct = removeSuffix(ct, "asses")
            return true
        }
        if (checkSuffix(rv, "esses")) {
            ct = removeSuffix(ct, "esses")
            return true
        }
        if (checkSuffix(rv, "isses")) {
            ct = removeSuffix(ct, "isses")
            return true
        }
        if (checkSuffix(rv, "astes")) {
            ct = removeSuffix(ct, "astes")
            return true
        }
        if (checkSuffix(rv, "assem")) {
            ct = removeSuffix(ct, "assem")
            return true
        }
        if (checkSuffix(rv, "essem")) {
            ct = removeSuffix(ct, "essem")
            return true
        }
        if (checkSuffix(rv, "issem")) {
            ct = removeSuffix(ct, "issem")
            return true
        }
        if (checkSuffix(rv, "ardes")) {
            ct = removeSuffix(ct, "ardes")
            return true
        }
        if (checkSuffix(rv, "erdes")) {
            ct = removeSuffix(ct, "erdes")
            return true
        }
        if (checkSuffix(rv, "irdes")) {
            ct = removeSuffix(ct, "irdes")
            return true
        }
        if (checkSuffix(rv, "ariam")) {
            ct = removeSuffix(ct, "ariam")
            return true
        }
        if (checkSuffix(rv, "eriam")) {
            ct = removeSuffix(ct, "eriam")
            return true
        }
        if (checkSuffix(rv, "iriam")) {
            ct = removeSuffix(ct, "iriam")
            return true
        }
        if (checkSuffix(rv, "arias")) {
            ct = removeSuffix(ct, "arias")
            return true
        }
        if (checkSuffix(rv, "erias")) {
            ct = removeSuffix(ct, "erias")
            return true
        }
        if (checkSuffix(rv, "irias")) {
            ct = removeSuffix(ct, "irias")
            return true
        }
        if (checkSuffix(rv, "estes")) {
            ct = removeSuffix(ct, "estes")
            return true
        }
        if (checkSuffix(rv, "istes")) {
            ct = removeSuffix(ct, "istes")
            return true
        }
        if (checkSuffix(rv, "areis")) {
            ct = removeSuffix(ct, "areis")
            return true
        }
        if (checkSuffix(rv, "aveis")) {
            ct = removeSuffix(ct, "aveis")
            return true
        }
    }

    // suffix length = 4
    if (rv.length >= 4) {
        if (checkSuffix(rv, "aria")) {
            ct = removeSuffix(ct, "aria")
            return true
        }
        if (checkSuffix(rv, "eria")) {
            ct = removeSuffix(ct, "eria")
            return true
        }
        if (checkSuffix(rv, "iria")) {
            ct = removeSuffix(ct, "iria")
            return true
        }
        if (checkSuffix(rv, "asse")) {
            ct = removeSuffix(ct, "asse")
            return true
        }
        if (checkSuffix(rv, "esse")) {
            ct = removeSuffix(ct, "esse")
            return true
        }
        if (checkSuffix(rv, "isse")) {
            ct = removeSuffix(ct, "isse")
            return true
        }
        if (checkSuffix(rv, "aste")) {
            ct = removeSuffix(ct, "aste")
            return true
        }
        if (checkSuffix(rv, "este")) {
            ct = removeSuffix(ct, "este")
            return true
        }
        if (checkSuffix(rv, "iste")) {
            ct = removeSuffix(ct, "iste")
            return true
        }
        if (checkSuffix(rv, "arei")) {
            ct = removeSuffix(ct, "arei")
            return true
        }
        if (checkSuffix(rv, "erei")) {
            ct = removeSuffix(ct, "erei")
            return true
        }
        if (checkSuffix(rv, "irei")) {
            ct = removeSuffix(ct, "irei")
            return true
        }
        if (checkSuffix(rv, "aram")) {
            ct = removeSuffix(ct, "aram")
            return true
        }
        if (checkSuffix(rv, "eram")) {
            ct = removeSuffix(ct, "eram")
            return true
        }
        if (checkSuffix(rv, "iram")) {
            ct = removeSuffix(ct, "iram")
            return true
        }
        if (checkSuffix(rv, "avam")) {
            ct = removeSuffix(ct, "avam")
            return true
        }
        if (checkSuffix(rv, "arem")) {
            ct = removeSuffix(ct, "arem")
            return true
        }
        if (checkSuffix(rv, "erem")) {
            ct = removeSuffix(ct, "erem")
            return true
        }
        if (checkSuffix(rv, "irem")) {
            ct = removeSuffix(ct, "irem")
            return true
        }
        if (checkSuffix(rv, "ando")) {
            ct = removeSuffix(ct, "ando")
            return true
        }
        if (checkSuffix(rv, "endo")) {
            ct = removeSuffix(ct, "endo")
            return true
        }
        if (checkSuffix(rv, "indo")) {
            ct = removeSuffix(ct, "indo")
            return true
        }
        if (checkSuffix(rv, "arao")) {
            ct = removeSuffix(ct, "arao")
            return true
        }
        if (checkSuffix(rv, "erao")) {
            ct = removeSuffix(ct, "erao")
            return true
        }
        if (checkSuffix(rv, "irao")) {
            ct = removeSuffix(ct, "irao")
            return true
        }
        if (checkSuffix(rv, "adas")) {
            ct = removeSuffix(ct, "adas")
            return true
        }
        if (checkSuffix(rv, "idas")) {
            ct = removeSuffix(ct, "idas")
            return true
        }
        if (checkSuffix(rv, "aras")) {
            ct = removeSuffix(ct, "aras")
            return true
        }
        if (checkSuffix(rv, "eras")) {
            ct = removeSuffix(ct, "eras")
            return true
        }
        if (checkSuffix(rv, "iras")) {
            ct = removeSuffix(ct, "iras")
            return true
        }
        if (checkSuffix(rv, "avas")) {
            ct = removeSuffix(ct, "avas")
            return true
        }
        if (checkSuffix(rv, "ares")) {
            ct = removeSuffix(ct, "ares")
            return true
        }
        if (checkSuffix(rv, "eres")) {
            ct = removeSuffix(ct, "eres")
            return true
        }
        if (checkSuffix(rv, "ires")) {
            ct = removeSuffix(ct, "ires")
            return true
        }
        if (checkSuffix(rv, "ados")) {
            ct = removeSuffix(ct, "ados")
            return true
        }
        if (checkSuffix(rv, "idos")) {
            ct = removeSuffix(ct, "idos")
            return true
        }
        if (checkSuffix(rv, "amos")) {
            ct = removeSuffix(ct, "amos")
            return true
        }
        if (checkSuffix(rv, "emos")) {
            ct = removeSuffix(ct, "emos")
            return true
        }
        if (checkSuffix(rv, "imos")) {
            ct = removeSuffix(ct, "imos")
            return true
        }
        if (checkSuffix(rv, "iras")) {
            ct = removeSuffix(ct, "iras")
            return true
        }
        if (checkSuffix(rv, "ieis")) {
            ct = removeSuffix(ct, "ieis")
            return true
        }
    }

    // suffix length = 3
    if (rv.length >= 3) {
        if (checkSuffix(rv, "ada")) {
            ct = removeSuffix(ct, "ada")
            return true
        }
        if (checkSuffix(rv, "ida")) {
            ct = removeSuffix(ct, "ida")
            return true
        }
        if (checkSuffix(rv, "ara")) {
            ct = removeSuffix(ct, "ara")
            return true
        }
        if (checkSuffix(rv, "era")) {
            ct = removeSuffix(ct, "era")
            return true
        }
        if (checkSuffix(rv, "ira")) {
            ct = removeSuffix(ct, "ava")
            return true
        }
        if (checkSuffix(rv, "iam")) {
            ct = removeSuffix(ct, "iam")
            return true
        }
        if (checkSuffix(rv, "ado")) {
            ct = removeSuffix(ct, "ado")
            return true
        }
        if (checkSuffix(rv, "ido")) {
            ct = removeSuffix(ct, "ido")
            return true
        }
        if (checkSuffix(rv, "ias")) {
            ct = removeSuffix(ct, "ias")
            return true
        }
        if (checkSuffix(rv, "ais")) {
            ct = removeSuffix(ct, "ais")
            return true
        }
        if (checkSuffix(rv, "eis")) {
            ct = removeSuffix(ct, "eis")
            return true
        }
        if (checkSuffix(rv, "ira")) {
            ct = removeSuffix(ct, "ira")
            return true
        }
        if (checkSuffix(rv, "ear")) {
            ct = removeSuffix(ct, "ear")
            return true
        }
    }

    // suffix length = 2
    if (rv.length >= 2) {
        if (checkSuffix(rv, "ia")) {
            ct = removeSuffix(ct, "ia")
            return true
        }
        if (checkSuffix(rv, "ei")) {
            ct = removeSuffix(ct, "ei")
            return true
        }
        if (checkSuffix(rv, "am")) {
            ct = removeSuffix(ct, "am")
            return true
        }
        if (checkSuffix(rv, "em")) {
            ct = removeSuffix(ct, "em")
            return true
        }
        if (checkSuffix(rv, "ar")) {
            ct = removeSuffix(ct, "ar")
            return true
        }
        if (checkSuffix(rv, "er")) {
            ct = removeSuffix(ct, "er")
            return true
        }
        if (checkSuffix(rv, "ir")) {
            ct = removeSuffix(ct, "ir")
            return true
        }
        if (checkSuffix(rv, "as")) {
            ct = removeSuffix(ct, "as")
            return true
        }
        if (checkSuffix(rv, "es")) {
            ct = removeSuffix(ct, "es")
            return true
        }
        if (checkSuffix(rv, "is")) {
            ct = removeSuffix(ct, "is")
            return true
        }
        if (checkSuffix(rv, "eu")) {
            ct = removeSuffix(ct, "eu")
            return true
        }
        if (checkSuffix(rv, "iu")) {
            ct = removeSuffix(ct, "iu")
            return true
        }
        if (checkSuffix(rv, "iu")) {
            ct = removeSuffix(ct, "iu")
            return true
        }
        if (checkSuffix(rv, "ou")) {
            ct = removeSuffix(ct, "ou")
            return true
        }
    }

    // no ending was removed by step2
    return false
}

private def step3(): Unit = {
    if (rv.isEmpty) {
        return
    }

    if (checkSuffix(rv, "i") && suffixPreceded(rv, "i", "c")) {
        ct = removeSuffix(ct, "i")
    }
}

private def step4(): Unit = {
    if (rv.isEmpty) {
        return
    }

    if (checkSuffix(rv, "os")) {
        ct = removeSuffix(ct, "os")
        return
    }
    if (checkSuffix(rv, "a")) {
        ct = removeSuffix(ct, "a")
        return
    }
    if (checkSuffix(rv, "i")) {
        ct = removeSuffix(ct, "i")
        return
    }
    if (checkSuffix(rv, "o")) {
        ct = removeSuffix(ct, "o")
        return
    }
}

private def step5(): Unit = {
    if (rv.isEmpty) {
        return
    }

    if (checkSuffix(rv, "e")) {
        if (suffixPreceded(rv, "e", "gu")) {
            ct = removeSuffix(ct, "e")
            ct = removeSuffix(ct, "u")
            return
        }

        if (suffixPreceded(rv, "e", "ci")) {
            ct = removeSuffix(ct, "e")
            ct = removeSuffix(ct, "i")
            return
        }

        ct = removeSuffix(ct, "e")
        return
    }
}

}

/** BrazilianAnalyzer (br/BrazilianAnalyzer.cpp:73-79): standard tokenizer →
  * LOWERCASE (before StandardFilter here, unlike the other chains) →
  * standard filter → stop → Brazilian stem (keep the original term when the
  * stemmer declines, as BrazilianStemFilter does). */
final case class BrazilianAnalyzer(exclusions: Set[String] = Set.empty) extends Analyzer {
  override def analyze(text: String): Iterator[Token] = {
    val stemmer = new BrazilianStemmer
    Filters.stopFilter(LangStopWords.Brazilian)(
      Filters.standardFilter(
        Filters.lowerCaseFilter(ClassicScanner.tokenize(text, 255))))
      .map { t =>
        if (exclusions.contains(t.term)) t
        else {
          val s = stemmer.stem(t.term)
          if (s != null && s.nonEmpty && s != t.term) t.copy(term = s) else t
        }
      }
  }
  override def name: String = "brazilian"
}
