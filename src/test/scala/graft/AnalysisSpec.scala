package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.analysis._

/** Token goldens re-expressed from the reference's own suite
  * (/root/reference/src/test/analysis/standard/StandardAnalyzerTest.cpp). */
class AnalysisSpec extends AnyFunSuite {

  private val sa = StandardAnalyzer()

  private def terms(a: Analyzer, s: String): Seq[String] =
    a.analyze(s).map(_.term).toSeq

  private def incrs(a: Analyzer, s: String): Seq[Int] =
    a.analyze(s).map(_.posIncr).toSeq

  private def types(s: String): Seq[String] =
    ClassicScanner.tokenize(s).map(t => TokenType.names(t.tpe)).toSeq

  test("alphanumeric") { // StandardAnalyzerTest.cpp:36-41
    assert(terms(sa, "B2B") == Seq("b2b"))
    assert(terms(sa, "2B") == Seq("2b"))
  }

  test("underscores are delimiters outside emails") { // :43-48
    assert(terms(sa, "word_having_underscore") == Seq("word", "having", "underscore"))
    assert(terms(sa, "word_with_underscore_and_stopwords") == Seq("word", "underscore", "stopwords"))
  }

  test("delimiters") { // :50-56
    assert(terms(sa, "some-dashed-phrase") == Seq("some", "dashed", "phrase"))
    assert(terms(sa, "dogs,chase,cats") == Seq("dogs", "chase", "cats"))
    assert(terms(sa, "ac/dc") == Seq("ac", "dc"))
  }

  test("apostrophes") { // :58-68
    assert(terms(sa, "O'Reilly") == Seq("o'reilly"))
    assert(terms(sa, "you're") == Seq("you're"))
    assert(terms(sa, "she's") == Seq("she"))
    assert(terms(sa, "Jim's") == Seq("jim"))
    assert(terms(sa, "don't") == Seq("don't"))
    assert(terms(sa, "O'Reilly's") == Seq("o'reilly"))
  }

  test("t/s dash") { // :70-78
    assert(terms(sa, "s-class") == Seq("s", "class"))
    assert(terms(sa, "t-com") == Seq("t", "com"))
    assert(terms(sa, "a-class") == Seq("class")) // 'a' is a stopword
  }

  test("company names") { // :80-85
    assert(terms(sa, "AT&T") == Seq("at&t"))
    assert(terms(sa, "Excite@Home") == Seq("excite@home"))
  }

  test("domain names incl. trailing-dot ACRONYM_DEP fixup") { // :87-103
    assert(terms(sa, "www.nutch.org") == Seq("www.nutch.org"))
    assert(terms(sa, "www.nutch.org.") == Seq("www.nutch.org"))
    assert(types("www.nutch.org.") == Seq("<HOST>"))
  }

  test("email addresses") { // :105-111
    assert(terms(sa, "test@example.com") == Seq("test@example.com"))
    assert(terms(sa, "first.lastname@example.com") == Seq("first.lastname@example.com"))
    assert(terms(sa, "first_lastname@example.com") == Seq("first_lastname@example.com"))
    assert(types("test@example.com") == Seq("<EMAIL>"))
  }

  test("numeric") { // :113-123
    assert(terms(sa, "21.35") == Seq("21.35"))
    assert(terms(sa, "216.239.63.104") == Seq("216.239.63.104"))
    assert(terms(sa, "1-2-3") == Seq("1-2-3"))
    assert(terms(sa, "a1-b2-c3") == Seq("a1-b2-c3"))
    assert(terms(sa, "a1-b-c3") == Seq("a1-b-c3"))
    assert(terms(sa, "R2D2 C3PO") == Seq("r2d2", "c3po"))
  }

  test("text with numbers") { // :125-128
    assert(terms(sa, "David has 5000 bones") == Seq("david", "has", "5000", "bones"))
  }

  test("various text") { // :130-136
    assert(terms(sa, "C embedded developers wanted") == Seq("c", "embedded", "developers", "wanted"))
    assert(terms(sa, "foo bar FOO BAR") == Seq("foo", "bar", "foo", "bar"))
    assert(terms(sa, "foo      bar .  FOO <> BAR") == Seq("foo", "bar", "foo", "bar"))
    assert(terms(sa, "\"QUOTED\" word") == Seq("quoted", "word"))
  }

  test("acronyms have dots stripped") { // :138-142
    assert(terms(sa, "U.S.A.") == Seq("usa"))
    assert(types("U.S.A.") == Seq("<ACRONYM>"))
  }

  test("C++ / C#") { // :144-148
    assert(terms(sa, "C++") == Seq("c"))
    assert(terms(sa, "C#") == Seq("c"))
  }

  test("compliance: file names and numerics") { // :150-178
    assert(types("2004.jpg") == Seq("<HOST>"))
    assert(types("62.46") == Seq("<HOST>"))
    assert(terms(sa, "978-0-94045043-1") == Seq("978-0-94045043-1"))
    assert(types("978-0-94045043-1") == Seq("<NUM>"))
    assert(terms(sa, "78academyawards/rules/rule02.html") == Seq("78academyawards/rules/rule02.html"))
    assert(types("78academyawards/rules/rule02.html") == Seq("<NUM>"))
    assert(terms(sa, "2006-03-11t082958z_01_ban130523_rtridst_0_ozabs") ==
      Seq("2006-03-11t082958z_01_ban130523_rtridst_0_ozabs"))
    assert(terms(sa, "mid-20th") == Seq("mid-20th"))
    assert(types("mid-20th") == Seq("<NUM>"))
  }

  test("compliance: many tokens") { // :180-187
    assert(terms(sa,
      "/money.cnn.com/magazines/fortune/fortune_archive/2007/03/19/8402357/index.htm safari-0-sheikh-zayed-grand-mosque.jpg") ==
      Seq("money.cnn.com", "magazines", "fortune", "fortune", "archive/2007/03/19/8402357",
        "index.htm", "safari-0-sheikh", "zayed", "grand", "mosque.jpg"))
    assert(types("/money.cnn.com/magazines/fortune/fortune_archive/2007/03/19/8402357/index.htm safari-0-sheikh-zayed-grand-mosque.jpg") ==
      Seq("<HOST>", "<ALPHANUM>", "<ALPHANUM>", "<ALPHANUM>", "<NUM>", "<HOST>", "<NUM>",
        "<ALPHANUM>", "<ALPHANUM>", "<HOST>"))
  }

  test("max token length: skipped but posIncr bumped") { // :15-34
    val sa5 = StandardAnalyzer(maxTokenLength = 5)
    assert(terms(sa5, "ab cd toolong xy z") == Seq("ab", "cd", "xy", "z"))
    assert(incrs(sa5, "ab cd toolong xy z") == Seq(1, 1, 2, 1))
    val long255 = "a" * 255
    assert(terms(sa, s"ab cd $long255 xy z") == Seq("ab", "cd", long255, "xy", "z"))
    assert(terms(sa, s"ab cd ${long255}a xy z") == Seq("ab", "cd", "xy", "z"))
  }

  test("stop words accumulate position increments") {
    // StopFilter.cpp:36-50 — gap spans the removed stop words
    assert(incrs(sa, "the quick and the dead") == Seq(2, 3))
    assert(terms(sa, "the quick and the dead") == Seq("quick", "dead"))
  }

  test("CJK chars tokenize one per char") {
    assert(terms(sa, "中文abc") == Seq("中", "文", "abc"))
    assert(types("中文") == Seq("<CJ>", "<CJ>"))
  }

  test("offsets") {
    val toks = sa.analyze("foo U.S.A. bar").toSeq
    assert(toks.map(t => (t.start, t.end)) == Seq((0, 3), (4, 10), (11, 14)))
  }

  test("whitespace analyzer") {
    assert(terms(WhitespaceAnalyzer, "Dogs dogs  like\tcats") == Seq("Dogs", "dogs", "like", "cats"))
  }

  test("simple analyzer: letter runs lowercased") {
    assert(terms(SimpleAnalyzer, "a b c d e") == Seq("a", "b", "c", "d", "e"))
    assert(terms(SimpleAnalyzer, "Foo2Bar, baz!") == Seq("foo", "bar", "baz"))
  }

  test("porter stemmer: published algorithm goldens (Porter 1980 + departures)") {
    val st = new PorterStemmer
    val goldens = Seq(
      // step 1
      "caresses" -> "caress", "ponies" -> "poni", "ties" -> "ti",
      "caress" -> "caress", "cats" -> "cat", "feed" -> "feed",
      "agreed" -> "agre", "plastered" -> "plaster", "bled" -> "bled",
      "motoring" -> "motor", "sing" -> "sing", "conflated" -> "conflat",
      "troubled" -> "troubl", "sized" -> "size", "hopping" -> "hop",
      "tanned" -> "tan", "falling" -> "fall", "hissing" -> "hiss",
      "fizzed" -> "fizz", "failing" -> "fail", "filing" -> "file",
      "happy" -> "happi", "sky" -> "sky",
      // step 2 (incl. the reference's bli/logi departures)
      "relational" -> "relat", "conditional" -> "condit",
      "rational" -> "ration", "valenci" -> "valenc", "hesitanci" -> "hesit",
      "digitizer" -> "digit", "radically" -> "radic",
      "differently" -> "differ", "vileli" -> "vile", "analogousli" -> "analog",
      "vietnamization" -> "vietnam", "predication" -> "predic",
      "operator" -> "oper", "feudalism" -> "feudal",
      "decisiveness" -> "decis", "hopefulness" -> "hope",
      "callousness" -> "callous", "formaliti" -> "formal",
      "sensitiviti" -> "sensit", "sensibiliti" -> "sensibl",
      // step 3
      "triplicate" -> "triplic", "formative" -> "form", "formalize" -> "formal",
      "electriciti" -> "electr", "electrical" -> "electr",
      "hopeful" -> "hope", "goodness" -> "good",
      // step 4
      "revival" -> "reviv", "allowance" -> "allow", "inference" -> "infer",
      "airliner" -> "airlin", "gyroscopic" -> "gyroscop",
      "adjustable" -> "adjust", "defensible" -> "defens",
      "irritant" -> "irrit", "replacement" -> "replac",
      "adjustment" -> "adjust", "dependent" -> "depend",
      "adoption" -> "adopt", "communism" -> "commun", "activate" -> "activ",
      "angulariti" -> "angular", "homologous" -> "homolog",
      "effective" -> "effect", "bowdlerize" -> "bowdler",
      // step 5
      "probate" -> "probat", "rate" -> "rate", "cease" -> "ceas",
      "controll" -> "control", "roll" -> "roll",
      // length guard (DEPARTURE): 1-2 char words untouched
      "is" -> "is", "be" -> "be", "as" -> "as")
    goldens.foreach { case (in, out) =>
      assert(st.stem(in) == out, s"stem($in) = ${st.stem(in)}, expected $out")
    }
  }

  test("porter analyzer chain + keyword analyzer") {
    assert(terms(PorterAnalyzer(), "The Dogs are Running quickly")
      == Seq("dog", "run", "quickli"))
    assert(terms(KeywordAnalyzer, "Exact Match-ID 42") == Seq("Exact Match-ID 42"))
    assert(terms(KeywordAnalyzer, "") == Nil)
    assert(Analyzer.byName("porter").name == "porter")
    assert(Analyzer.byName("keyword").name == "keyword")
  }

  test("ngram tokenizers: reference NGram/EdgeNGramTokenizerTest goldens") {
    def toks(a: Analyzer, s: String) = a.analyze(s).toSeq
    // NGramTokenizerTest testDefaultGrams: min=1 max=2, start-major
    assert(toks(NGramAnalyzer(), "abc").map(t => (t.term, t.start, t.end)) ==
      Seq(("a", 0, 1), ("ab", 0, 2), ("b", 1, 2), ("bc", 1, 3), ("c", 2, 3)))
    // testMinMaxGrams
    assert(toks(NGramAnalyzer(2, 3), "abcde").map(_.term) ==
      Seq("ab", "abc", "bc", "bcd", "cd", "cde", "de"))
    // testPreservesCase
    assert(toks(NGramAnalyzer(2, 2), "AbC").map(_.term) == Seq("Ab", "bC"))
    // EdgeNGramTokenizerTest: default (1,1), min-max (1,3), oversized
    assert(toks(EdgeNGramAnalyzer(), "abc").map(t => (t.term, t.start, t.end)) ==
      Seq(("a", 0, 1)))
    assert(toks(EdgeNGramAnalyzer(1, 3), "abcde").map(t => (t.term, t.start, t.end)) ==
      Seq(("a", 0, 1), ("ab", 0, 2), ("abc", 0, 3)))
    assert(toks(EdgeNGramAnalyzer(6, 6), "abcde").isEmpty)
    assert(toks(EdgeNGramAnalyzer(1, 2, back = true), "abcde").map(_.term) == Seq("e", "de"))
    // invalid bounds rejected (testInvalidArguments)
    intercept[IllegalArgumentException](NGramAnalyzer(0, 1))
    intercept[IllegalArgumentException](NGramAnalyzer(3, 2))
    // metadata name round-trips with parameters
    assert(Analyzer.byName("ngram-2-3") == NGramAnalyzer(2, 3))
    assert(Analyzer.byName("edgengram-1-3-back") == EdgeNGramAnalyzer(1, 3, back = true))
  }

  test("length filter and ascii folding") {
    val toks = Filters.lengthFilter(2, 5)(WhitespaceAnalyzer.analyze("a ab abc abcdef")).toSeq
    assert(toks.map(_.term) == Seq("ab", "abc"))
    def fold(s: String): String =
      Filters.asciiFoldingFilter(Iterator(Token(s, 1, 0, s.length, 0))).next().term
    assert(fold("café") == "cafe")
    assert(fold("über") == "uber")
    assert(fold("ñandú") == "nandu")
    assert(fold("Ærø") == "AEro")
    assert(fold("straße") == "strasse")
    assert(fold("łódź") == "lodz")
    assert(fold("plain") == "plain")
  }

  test("mapping char filter: reference MappingCharFilterTest fixtures incl. offsets") {
    import graft.analysis.{CharFilteredAnalyzer, MappingCharFilter, NormalizeCharMap, WhitespaceAnalyzer}
    val map = new NormalizeCharMap
    map.add("aa", "a"); map.add("bbb", "b"); map.add("cccc", "cc")
    map.add("h", "i"); map.add("j", "jj"); map.add("k", "kkk"); map.add("ll", "llll")
    map.add("empty", "")
    val an = CharFilteredAnalyzer(Seq(MappingCharFilter(map)), WhitespaceAnalyzer)

    def toks(text: String): Seq[(String, Int, Int)] =
      an.analyze(text).map(t => (t.term, t.start, t.end)).toSeq

    // MappingCharFilterTest.cpp: terms + (start, end) offsets in the
    // ORIGINAL text
    assert(toks("x") == Seq(("x", 0, 1)))               // testNothingChange
    assert(toks("h") == Seq(("i", 0, 1)))               // test1to1
    assert(toks("j") == Seq(("jj", 0, 1)))              // test1to2
    assert(toks("k") == Seq(("kkk", 0, 1)))             // test1to3
    assert(toks("ll") == Seq(("llll", 0, 2)))           // test2to4
    assert(toks("aa") == Seq(("a", 0, 2)))              // test2to1
    assert(toks("bbb") == Seq(("b", 0, 3)))             // test3to1
    assert(toks("cccc") == Seq(("cc", 0, 4)))           // test4to2
    assert(toks("empty") == Seq.empty)                  // test5to0

    // testTokenStream: "h i j k ll cccc bbb aa" (offsets from the
    // commented table at the bottom of MappingCharFilterTest.cpp)
    assert(toks("h i j k ll cccc bbb aa") == Seq(
      ("i", 0, 1), ("i", 2, 3), ("jj", 4, 5), ("kkk", 6, 7),
      ("llll", 8, 10), ("cc", 11, 15), ("b", 16, 19), ("a", 20, 22)))
  }

  test("html strip char filter: tags, entities, script/comment blocks, offsets") {
    import graft.analysis.{HtmlStripAnalyzer, WhitespaceAnalyzer}
    val an = HtmlStripAnalyzer(WhitespaceAnalyzer)
    def terms(text: String): Seq[String] = an.analyze(text).map(_.term).toSeq

    assert(terms("<p>hello world</p>") == Seq("hello", "world"))
    assert(terms("<a href=\"x.html\">link</a> text") == Seq("link", "text"))
    assert(terms("a<!-- hidden comment -->b c") == Seq("a", "b", "c"))
    assert(terms("x <script>var a = \"<p>\";</script> y") == Seq("x", "y"))
    assert(terms("x <style>.c { color: red }</style> y") == Seq("x", "y"))
    assert(terms("fish &amp; chips &lt;3") == Seq("fish", "&", "chips", "<3"))
    assert(terms("&#65;&#x42;C") == Seq("ABC"))
    assert(terms("unterminated &am p") == Seq("unterminated", "&am", "p"))

    // offsets index the ORIGINAL html: "link" sits at 18..22 in
    // <a href="x.html">link</a>
    val html = "<a href=\"x.html\">link</a>"
    val tok = an.analyze(html).next()
    assert(tok.term == "link")
    assert(html.substring(tok.start, tok.end) == "link")

    // byName round-trip for index metadata
    assert(graft.analysis.Analyzer.byName("html-whitespace").analyze(
      "<b>bold</b> move").map(_.term).toSeq == Seq("bold", "move"))
  }
}
