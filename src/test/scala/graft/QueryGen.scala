package graft

import graft.search._

/** Shared random query-tree generator (FuzzSpec's whole-algebra shapes),
  * reused by the explanation-consistency spec. */
object QueryGen {

  val vocab = Vector("fz1", "fz2", "fz3", "fz4", "fz5", "gq1", "gq2", "hx1")

  def randSpan(rnd: scala.util.Random, depth: Int): SpanQuery = {
    if (depth >= 2 || rnd.nextInt(3) == 0) SpanTermQ(vocab(rnd.nextInt(vocab.size)))
    else rnd.nextInt(4) match {
      case 0 => SpanNearQ(Seq.fill(2)(randSpan(rnd, depth + 1)), rnd.nextInt(4),
        inOrder = rnd.nextBoolean())
      case 1 => SpanOrQ(Seq.fill(1 + rnd.nextInt(2))(randSpan(rnd, depth + 1)))
      case 2 => SpanNotQ(randSpan(rnd, depth + 1), randSpan(rnd, depth + 1))
      case 3 => SpanFirstQ(randSpan(rnd, depth + 1), 1 + rnd.nextInt(6))
    }
  }

  def randQuery(rnd: scala.util.Random, depth: Int): Query = {
    def term() = TermQ(vocab(rnd.nextInt(vocab.size)),
      Seq(0.25f, 1f, 2f)(rnd.nextInt(3)))
    if (depth >= 3) term()
    else rnd.nextInt(12) match {
      case 0 | 1 => term()
      case 2 =>
        val n = 2 + rnd.nextInt(2)
        PhraseQ(Seq.fill(n)(vocab(rnd.nextInt(vocab.size))), rnd.nextInt(3))
      case 3 =>
        MultiPhraseQ(Seq.fill(2)(Seq.fill(1 + rnd.nextInt(2))(vocab(rnd.nextInt(vocab.size)))))
      case 4 => randSpan(rnd, depth)
      case 5 => ConstantScoreQ(randQuery(rnd, depth + 1), Seq(0.5f, 1f, 3f)(rnd.nextInt(3)))
      case 6 => DisMaxQ(Seq.fill(1 + rnd.nextInt(2))(randQuery(rnd, depth + 1)),
        Seq(0f, 0.5f)(rnd.nextInt(2)))
      case 7 => FilteredQ(randQuery(rnd, depth + 1), randQuery(rnd, depth + 1))
      case 8 => FilteredQ(randQuery(rnd, depth + 1), CachedQ(randQuery(rnd, depth + 1)))
      case 9 => CustomScoreQ(randQuery(rnd, depth + 1),
        Seq(Seq(DocLenVS), Seq(ConstVS(2.0)), Nil)(rnd.nextInt(3)))
      case 10 => PrefixQ("fz", constantScore = rnd.nextBoolean())
      case _ =>
        val shoulds = Seq.fill(1 + rnd.nextInt(3))(randQuery(rnd, depth + 1))
        BoolQ(
          must = Seq.fill(rnd.nextInt(2))(randQuery(rnd, depth + 1)),
          should = shoulds,
          mustNot = Seq.fill(rnd.nextInt(2))(randQuery(rnd, depth + 1)),
          minShouldMatch = if (rnd.nextInt(3) == 0) rnd.nextInt(shoulds.size + 1) else 0)
    }
  }

}
