package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.analysis._

/** French/Dutch/Russian stemmers vs the reference's own fixtures —
  * including the Russian 49k-word golden corpus shipped in its test data
  * (/root/reference/src/test/testfiles/russian/). */
class StemmerSpec extends AnyFunSuite {

  private def toks(a: Analyzer, text: String): Seq[String] =
    a.analyze(text).map(_.term).toSeq

  test("french: FrenchAnalyzerTest fixtures") {
    val fa = FrenchAnalyzer()
    assert(toks(fa, "") == Seq.empty)
    assert(toks(fa, "chien chat cheval") == Seq("chien", "chat", "cheval"))
    assert(toks(fa, "chien CHAT CHEVAL") == Seq("chien", "chat", "cheval"))
    assert(toks(fa, "  chien  ,? + = -  CHAT /: > CHEVAL") == Seq("chien", "chat", "cheval"))
    assert(toks(fa, "chien++") == Seq("chien"))
    assert(toks(fa, "mot \"entreguillemet\"") == Seq("mot", "entreguillemet"))
    assert(toks(fa, "Jean-François") == Seq("jean", "françois"))
    // stop words
    assert(toks(fa, "le la chien les aux chat du des à cheval") ==
      Seq("chien", "chat", "cheval"))
    // stemming
    assert(toks(fa, "lances chismes habitable chiste éléments captifs") ==
      Seq("lanc", "chism", "habit", "chist", "élément", "captif"))
    assert(toks(fa, "finissions souffrirent rugissante") == Seq("fin", "souffr", "rug"))
    assert(toks(fa, "C3PO aujourd'hui oeuf ïâöûàä anticonstitutionnellement Java++ ") ==
      Seq("c3po", "aujourd'hui", "oeuf", "ïâöûàä", "anticonstitutionnel", "jav"))
    assert(toks(fa, "33Bis 1940-1945 1940:1945 (---i+++)*") ==
      Seq("33bis", "1940-1945", "1940", "1945", "i"))
  }

  test("dutch: DutchStemmerTest fixtures") {
    val st = new Stemmers.DutchStemmer
    val cases = Seq(
      "lichaamsziek" -> "lichaamsziek", "lichamelijk" -> "licham",
      "lichamelijke" -> "licham", "lichamelijkheden" -> "licham",
      "lichamen" -> "licham", "lichere" -> "licher", "licht" -> "licht",
      "lichtbeeld" -> "lichtbeeld", "lichtbruin" -> "lichtbruin",
      "lichtdoorlatende" -> "lichtdoorlat", "lichte" -> "licht",
      "lichten" -> "licht", "lichtende" -> "lichtend",
      "lichtenvoorde" -> "lichtenvoord", "lichter" -> "lichter",
      "lichtere" -> "lichter", "lichters" -> "lichter",
      "lichtgevoeligheid" -> "lichtgevoel", "lichtgewicht" -> "lichtgewicht",
      "lichtgrijs" -> "lichtgrijs", "lichthoeveelheid" -> "lichthoevel",
      "lichtintensiteit" -> "lichtintensiteit", "lichtje" -> "lichtj",
      "lichtjes" -> "lichtjes", "lichtkranten" -> "lichtkrant",
      "lichtkring" -> "lichtkring", "lichtkringen" -> "lichtkring",
      "lichtregelsystemen" -> "lichtregelsystem", "lichtste" -> "lichtst",
      "lichtstromende" -> "lichtstrom", "lichtte" -> "licht",
      "lichtten" -> "licht", "lichttoetreding" -> "lichttoetred",
      "lichtverontreinigde" -> "lichtverontreinigd", "lichtzinnige" -> "lichtzinn",
      "lid" -> "lid", "lidia" -> "lidia", "lidmaatschap" -> "lidmaatschap",
      "lidstaten" -> "lidstat", "lidvereniging" -> "lidveren",
      "opgingen" -> "opging", "opglanzing" -> "opglanz",
      "opglanzingen" -> "opglanz", "opglimlachten" -> "opglimlacht",
      "opglimpen" -> "opglimp", "opglimpende" -> "opglimp",
      "opglimping" -> "opglimp", "opglimpingen" -> "opglimp",
      "opgraven" -> "opgrav", "opgrijnzen" -> "opgrijnz",
      "opgrijzende" -> "opgrijz", "opgroeien" -> "opgroei",
      "opgroeiende" -> "opgroei", "opgroeiplaats" -> "opgroeiplat",
      "ophaal" -> "ophal", "ophaaldienst" -> "ophaaldienst",
      "ophaalkosten" -> "ophaalkost", "ophaalsystemen" -> "ophaalsystem",
      "ophaalt" -> "ophaalt", "ophaaltruck" -> "ophaaltruck",
      "ophalen" -> "ophal", "ophalend" -> "ophal", "ophalers" -> "ophaler",
      "ophef" -> "ophef", "opheffen" -> "ophef", "opheffende" -> "ophef",
      "opheffing" -> "ophef", "opheldering" -> "ophelder",
      "ophemelde" -> "ophemeld", "ophemelen" -> "ophemel",
      "opheusden" -> "opheusd", "ophief" -> "ophief", "ophield" -> "ophield",
      "ophieven" -> "ophiev", "ophoepelt" -> "ophoepelt", "ophoog" -> "ophog",
      "ophoogzand" -> "ophoogzand", "ophopen" -> "ophop",
      "ophoping" -> "ophop", "ophouden" -> "ophoud")
    cases.foreach { case (in, out) => assert(st.stem(in) == out, s"$in") }
    // analyzer end-to-end: stop words drop, stems apply
    assert(toks(DutchAnalyzer(), "de lichamen en de lichtkranten") ==
      Seq("licham", "lichtkrant"))
  }

  test("russian: the reference's full 49k-word golden stem corpus") {
    val words = scala.io.Source.fromFile(
      "/root/reference/src/test/testfiles/russian/wordsUTF8.txt", "UTF-8")
      .getLines().toVector
    val stems = scala.io.Source.fromFile(
      "/root/reference/src/test/testfiles/russian/stemsUTF8.txt", "UTF-8")
      .getLines().toVector
    assert(words.size == stems.size && words.nonEmpty)
    var bad = 0
    words.zip(stems).foreach { case (w0, expected) =>
      val got = Stemmers.RussianStemmer.stem(w0)
      if (got != expected) {
        bad += 1
        if (bad <= 5) info(s"MISMATCH: $w0 -> $got (want $expected)")
      }
    }
    assert(bad == 0, s"$bad of ${words.size} mismatched")
  }

  test("russian analyzer: tokenize, stop, stem; byName round-trips for stemmer analyzers") {
    assert(toks(RussianAnalyzer, "Вместе с тем о силе электромагнитной энергии")
      .nonEmpty)
    // "и" is a stop word; digits tokenize
    assert(toks(RussianAnalyzer, "и 1234") == Seq("1234"))
    for (n <- Seq("french", "dutch", "russian"))
      assert(Analyzer.byName(n).name == n)
  }
}
