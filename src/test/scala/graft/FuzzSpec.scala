package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.analysis.Analyzer
import graft.index.LocalIndex
import graft.score.{BM25, BM25Exact, ClassicTFIDF, Similarity}
import graft.search._

/** Whole-algebra fuzz: random query trees mixing EVERY node type the engine
  * supports (boolean shapes with minShouldMatch, exact/sloppy/multi
  * phrases, spans, multi-term, constant/dismax/filtered/cached, function
  * scoring) run against a multi-segment index and compared bit-for-bit with
  * the brute-force executable spec — the QueryUtils/CheckHits randomized
  * discipline of the reference test suite
  * (/root/reference/src/test/search/QueryUtils.cpp) applied to the full
  * query ADT at once. */
class FuzzSpec extends AnyFunSuite {

  private val vocab = Vector("fz1", "fz2", "fz3", "fz4", "fz5", "gq1", "gq2", "hx1")

  private def randSpan(rnd: scala.util.Random, depth: Int): SpanQuery = {
    if (depth >= 2 || rnd.nextInt(3) == 0) SpanTermQ(vocab(rnd.nextInt(vocab.size)))
    else rnd.nextInt(4) match {
      case 0 => SpanNearQ(Seq.fill(2)(randSpan(rnd, depth + 1)), rnd.nextInt(4),
        inOrder = rnd.nextBoolean())
      case 1 => SpanOrQ(Seq.fill(1 + rnd.nextInt(2))(randSpan(rnd, depth + 1)))
      case 2 => SpanNotQ(randSpan(rnd, depth + 1), randSpan(rnd, depth + 1))
      case 3 => SpanFirstQ(randSpan(rnd, depth + 1), 1 + rnd.nextInt(6))
    }
  }

  private def randQuery(rnd: scala.util.Random, depth: Int): Query = {
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

  test("800 random mixed query trees: engine == spec bit-for-bit") {
    val rnd = new scala.util.Random(777)
    val texts = (0 until 250).map { _ =>
      (0 until (3 + rnd.nextInt(10))).map(_ => vocab(rnd.nextInt(vocab.size))).mkString(" ")
    }
    val dir = Files.createTempDirectory("graft-fuzz").toString
    LocalIndex.build(dir, texts.zipWithIndex.map { case (t, i) => (i.toLong, t) },
      "whitespace", docsPerSegment = 41)
    val corpus = BruteForce.analyzeCorpus(Analyzer.byName("whitespace"),
      texts.zipWithIndex.map { case (t, i) => (i.toLong, t) })
    graft.search.ReaderCache.clear()

    val sims = Seq[Similarity](BM25(), ClassicTFIDF, BM25Exact())
    var nonEmpty = 0
    for (run <- 0 until 800) {
      val q = randQuery(rnd, 0)
      val sim = sims(run % sims.size)
      val k = 1 + rnd.nextInt(12)
      val engine =
        try LocalIndex.search(dir, q, k, sim, useWand = rnd.nextBoolean())
        catch { case e: Throwable => fail(s"run=$run q=$q threw $e") }
      val spec = BruteForce.search(corpus, q, k, sim)
      assert(engine.map(_.docId).toSeq == spec.map(_.docId).toSeq,
        s"run=$run sim=$sim k=$k q=$q\n engine=${engine.toSeq}\n spec=${spec.toSeq}")
      engine.zip(spec).foreach { case (e, s) =>
        assert(e.score == s.score, s"run=$run sim=$sim doc ${e.docId}: ${e.score} != ${s.score}\n q=$q")
      }
      if (engine.nonEmpty) nonEmpty += 1
    }
    // the generator must actually exercise matching queries
    assert(nonEmpty > 400, s"only $nonEmpty of 800 queries matched anything")
  }
}
