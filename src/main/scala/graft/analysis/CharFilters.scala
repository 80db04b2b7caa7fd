package graft.analysis

/** Character-level normalization applied BEFORE tokenization, with offset
  * correction back into the original text (reference CharFilter /
  * BaseCharFilter — /root/reference/src/core/analysis/CharFilter.cpp,
  * BaseCharFilter.cpp:24-62: a sorted array of (position, cumulative diff)
  * correction points; correct(off) adds the diff of the greatest point ≤
  * off). Re-expressed as a pure `String => (String, Int => Int)` so chains
  * stay serializable closures usable inside `mapPartitions`. */
trait CharFilter extends Serializable {
  /** Filtered text plus a corrector mapping FILTERED offsets to ORIGINAL
    * offsets. */
  def filter(text: String): (String, Int => Int)
}

object CharFilter {
  /** Build a corrector from (outputOffset, cumulativeDiff) points —
    * BaseCharFilter::correct semantics. */
  def corrector(points: IndexedSeq[(Int, Int)]): Int => Int = {
    if (points.isEmpty) identity
    else { off =>
      // greatest point with pos <= off (binary search)
      var lo = 0
      var hi = points.length - 1
      if (points(0)._1 > off) off
      else {
        while (lo < hi) {
          val mid = (lo + hi + 1) >>> 1
          if (points(mid)._1 <= off) lo = mid else hi = mid - 1
        }
        off + points(lo)._2
      }
    }
  }
}

/** Greedy longest-match mapping table (reference NormalizeCharMap —
  * /root/reference/src/core/analysis/NormalizeCharMap.cpp: a char trie). */
final class NormalizeCharMap extends Serializable {
  private[analysis] val children =
    scala.collection.mutable.Map.empty[Char, NormalizeCharMap]
  private[analysis] var replacement: String = null

  def add(singleMatch: String, repl: String): NormalizeCharMap = {
    require(singleMatch.nonEmpty, "empty match")
    var node = this
    singleMatch.foreach { c =>
      node = node.children.getOrElseUpdate(c, new NormalizeCharMap)
    }
    require(node.replacement == null, s"duplicate match: $singleMatch")
    node.replacement = repl
    this
  }

  /** Longest match starting at text(i): (matched length, replacement). */
  private[analysis] def longestMatch(text: String, i: Int): Option[(Int, String)] = {
    var node = this
    var j = i
    var best: Option[(Int, String)] = None
    var cont = true
    while (cont && j < text.length) {
      node.children.get(text.charAt(j)) match {
        case Some(next) =>
          j += 1
          if (next.replacement != null) best = Some((j - i, next.replacement))
          node = next
        case None => cont = false
      }
    }
    best
  }
}

/** The reference MappingCharFilter
  * (/root/reference/src/core/analysis/MappingCharFilter.cpp): replace
  * greedy-longest matches from the map; offset-correction points follow the
  * reference arithmetic so token offsets over the filtered text map to the
  * original exactly as its MappingCharFilterTest pins. */
final case class MappingCharFilter(map: NormalizeCharMap) extends CharFilter {
  override def filter(text: String): (String, Int => Int) = {
    val out = new StringBuilder(text.length)
    val points = Vector.newBuilder[(Int, Int)]
    var cum = 0 // cumulative diff at the latest point
    var i = 0
    while (i < text.length) {
      map.longestMatch(text, i) match {
        case Some((klen, repl)) =>
          val diff = klen - repl.length
          val nextCharCounter = i + klen // input chars consumed after this match
          if (diff > 0) { // shrink (e.g. "aa"->"a")
            points += ((nextCharCounter - diff - cum, cum + diff))
            cum += diff
          } else if (diff < 0) { // grow (e.g. "ll"->"llll")
            val outputStart = i - cum
            var extra = 0
            while (extra < -diff) {
              points += ((outputStart + klen + extra, cum - extra - 1))
              extra += 1
            }
            cum += diff
          }
          out ++= repl
          i += klen
        case None =>
          out += text.charAt(i)
          i += 1
      }
    }
    (out.toString, CharFilter.corrector(points.result()))
  }
}

/** Strip HTML/XML markup ahead of tokenization: tags (incl. attributes),
  * comments, script/style blocks removed; the basic character entities
  * decoded. The north-rule corpus carries raw `html` — this is its text
  * extraction front-end (Solr's HTMLStripCharFilter is the public analog;
  * the reference ships the same idea as its demo HTMLParser). Removed
  * regions become correction points exactly like mapping shrinks, so token
  * offsets still index into the ORIGINAL html. */
case object HtmlStripCharFilter extends CharFilter {

  private val entities = Map(
    "amp" -> "&", "lt" -> "<", "gt" -> ">", "quot" -> "\"",
    "apos" -> "'", "nbsp" -> " ")

  /** Case-insensitive close-tag scan from `from` — locale-independent
    * (regionMatches(ignoreCase) compares per char, no locale) and O(n) over
    * the remaining text; the earlier `text.toLowerCase.indexOf` re-lowered
    * the WHOLE string per block (O(n²) on script-heavy pages) and under a
    * Turkish default locale never matched '</SCRIPT>' (dotless-ı). */
  private def indexOfIgnoreCase(text: String, target: String, from: Int): Int = {
    val last = text.length - target.length
    var i = from
    while (i <= last) {
      if (text.regionMatches(true, i, target, 0, target.length)) return i
      i += 1
    }
    -1
  }

  override def filter(text: String): (String, Int => Int) = {
    val out = new StringBuilder(text.length)
    val points = Vector.newBuilder[(Int, Int)]
    var cum = 0
    def emitGap(inputEnd: Int, removed: Int, replacedBy: Int): Unit =
      if (removed != replacedBy) {
        val diff = removed - replacedBy
        points += ((inputEnd - diff - cum, cum + diff))
        cum += diff
      }
    var i = 0
    val n = text.length
    while (i < n) {
      val c = text.charAt(i)
      if (c == '<') {
        // comment / script / style / plain tag — find its end, drop it all
        val end =
          if (text.startsWith("<!--", i)) {
            val e = text.indexOf("-->", i); if (e < 0) n else e + 3
          } else if (text.regionMatches(true, i, "<script", 0, 7)) {
            val e = indexOfIgnoreCase(text, "</script>", i); if (e < 0) n else e + 9
          } else if (text.regionMatches(true, i, "<style", 0, 6)) {
            val e = indexOfIgnoreCase(text, "</style>", i); if (e < 0) n else e + 8
          } else {
            val e = text.indexOf('>', i); if (e < 0) n else e + 1
          }
        // a removed block separates words: emit one space
        out += ' '
        emitGap(end, end - i, 1)
        i = end
      } else if (c == '&') {
        val semi = text.indexOf(';', i)
        val decoded: Option[String] =
          if (semi < 0 || semi - i > 10) None
          else {
            val name = text.substring(i + 1, semi)
            if (name.startsWith("#x") || name.startsWith("#X"))
              scala.util.Try(Integer.parseInt(name.drop(2), 16))
                .toOption.map(cp => new String(Character.toChars(cp)))
            else if (name.startsWith("#"))
              scala.util.Try(name.drop(1).toInt)
                .toOption.map(cp => new String(Character.toChars(cp)))
            else entities.get(name)
          }
        decoded match {
          case Some(repl) =>
            out ++= repl
            emitGap(semi + 1, semi + 1 - i, repl.length)
            i = semi + 1
          case None =>
            out += c
            i += 1
        }
      } else {
        out += c
        i += 1
      }
    }
    (out.toString, CharFilter.corrector(points.result()))
  }
}

/** Analyzer wrapper running char filters before the inner chain and
  * correcting token offsets back into the original text (the reference's
  * Analyzer-with-CharReader composition). */
final case class CharFilteredAnalyzer(filters: Seq[CharFilter], inner: Analyzer,
    nameSuffix: String = "") extends Analyzer {
  override def analyze(text: String): Iterator[Token] = {
    var t = text
    var correct: Int => Int = identity
    filters.foreach { f =>
      val (t2, c2) = f.filter(t)
      val prev = correct
      t = t2
      correct = off => prev(c2(off))
    }
    val fix = correct
    inner.analyze(t).map(tok => tok.copy(start = fix(tok.start), end = fix(tok.end)))
  }
  override def name: String =
    (if (nameSuffix.nonEmpty) nameSuffix else "charfiltered") + "-" + inner.name
}

object HtmlStripAnalyzer {
  /** `html-<inner>` — registered in Analyzer.byName for index metadata
    * round-trips. */
  def apply(inner: Analyzer): CharFilteredAnalyzer =
    CharFilteredAnalyzer(Seq(HtmlStripCharFilter), inner, nameSuffix = "html")
}
