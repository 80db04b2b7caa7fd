package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.analysis._

/** BrazilianStemmer vs the reference's BrazilianStemmerTest fixtures
  * (checkOneTerm through the full BrazilianAnalyzer, as the reference
  * does — incl. the diacritic-folding departures from Snowball its test
  * comments call out). */
class BrazilianSpec extends AnyFunSuite {

  private def one(a: Analyzer, text: String): String = {
    val ts = a.analyze(text).map(_.term).toSeq
    assert(ts.size == 1, s"'$text' -> $ts")
    ts.head
  }

  test("brazilian: all reference fixtures through the analyzer") {
    val a = BrazilianAnalyzer()
    val cases = Seq(
      "boa" -> "boa",
      "boainain" -> "boainain",
      "boas" -> "boas",
      "b\u00f4as" -> "boas",
      "boassu" -> "boassu",
      "boataria" -> "boat",
      "boate" -> "boat",
      "boates" -> "boat",
      "boatos" -> "boat",
      "bob" -> "bob",
      "boba" -> "bob",
      "bobagem" -> "bobag",
      "bobagens" -> "bobagens",
      "bobalh\u00f5es" -> "bobalho",
      "bobear" -> "bob",
      "bobeira" -> "bobeir",
      "bobinho" -> "bobinh",
      "bobinhos" -> "bobinh",
      "bobo" -> "bob",
      "bobs" -> "bobs",
      "boca" -> "boc",
      "bocadas" -> "boc",
      "bocadinho" -> "bocadinh",
      "bocado" -> "boc",
      "bocai\u00fava" -> "bocaiuv",
      "bo\u00e7al" -> "bocal",
      "bocarra" -> "bocarr",
      "bocas" -> "boc",
      "bode" -> "bod",
      "bodoque" -> "bodoqu",
      "body" -> "body",
      "boeing" -> "boeing",
      "boem" -> "boem",
      "boemia" -> "boem",
      "bo\u00eamio" -> "boemi",
      "bogot\u00e1" -> "bogot",
      "boi" -> "boi",
      "b\u00f3ia" -> "boi",
      "boiando" -> "boi",
      "quiabo" -> "quiab",
      "quicaram" -> "quic",
      "quickly" -> "quickly",
      "quieto" -> "quiet",
      "quietos" -> "quiet",
      "quilate" -> "quilat",
      "quilates" -> "quilat",
      "quilinhos" -> "quilinh",
      "quilo" -> "quil",
      "quilombo" -> "quilomb",
      "quilom\u00e9tricas" -> "quilometr",
      "quilom\u00e9tricos" -> "quilometr",
      "quil\u00f4metro" -> "quilometr",
      "quil\u00f4metros" -> "quilometr",
      "quilos" -> "quil",
      "quimica" -> "quimic",
      "quimicas" -> "quimic",
      "quimico" -> "quimic",
      "quimicos" -> "quimic",
      "quimioterapia" -> "quimioterap",
      "quimioter\u00e1picos" -> "quimioterap",
      "quimono" -> "quimon",
      "quincas" -> "quinc",
      "quinh\u00e3o" -> "quinha",
      "quinhentos" -> "quinhent",
      "quinn" -> "quinn",
      "quino" -> "quin",
      "quinta" -> "quint",
      "quintal" -> "quintal",
      "quintana" -> "quintan",
      "quintanilha" -> "quintanilh",
      "quint\u00e3o" -> "quinta",
      "quintess\u00eancia" -> "quintessente",
      "quintino" -> "quintin",
      "quinto" -> "quint",
      "quintos" -> "quint",
      "quintuplicou" -> "quintuplic",
      "quinze" -> "quinz",
      "quinzena" -> "quinzen",
      "quiosque" -> "quiosqu",
      "Brasil" -> "brasil",
      "Bras\u00edlia" -> "brasil",
      "quimio5ter\u00e1picos" -> "quimio5terapicos",
      "\u00e1\u00e1" -> "\u00e1\u00e1",
      "\u00e1\u00e1\u00e1" -> "aaa")
    cases.foreach { case (in, out) => assert(one(a, in) == out, s"'$in'") }
  }

  test("brazilian analyzer: exclusions, stop words, byName") {
    // the reference's exclusion-table test: excluded words pass unchanged
    assert(one(BrazilianAnalyzer(exclusions = Set("quintess\u00eancia")),
      "quintess\u00eancia") == "quintess\u00eancia")
    assert(BrazilianAnalyzer().analyze("o boato e as boas").map(_.term).toSeq ==
      Seq("boat", "boas")) // "o"/"e"/"as" are Brazilian stop words
    assert(Analyzer.byName("brazilian").name == "brazilian")
  }
}
