package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.analysis.{Analyzer, StandardAnalyzer, WhitespaceAnalyzer}
import graft.corpus.SyntheticCorpus
import graft.index.{IndexBuilder, IndexConfig, LocalIndex}
import graft.score.BM25
import graft.search._

/** Contrib-surface analogs: MemoryIndex (percolation), Highlighter,
  * TimeLimitingCollector (reference: src/contrib/memory/MemoryIndex.cpp,
  * src/contrib/highlighter/, src/core/search/TimeLimitingCollector.cpp). */
class ContribSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("memory index: percolation over one doc, all query families") {
    val mi = new MemoryIndex("the quick brown fox jumps over the lazy dog", StandardAnalyzer())
    assert(mi.matches(TermQ("quick")))
    assert(!mi.matches(TermQ("cat")))
    assert(mi.matches(PhraseQ(Seq("quick", "brown"))))
    assert(!mi.matches(PhraseQ(Seq("brown", "quick"))))
    assert(mi.matches(SpanNearQ(Seq(SpanTermQ("quick"), SpanTermQ("fox")), 1, inOrder = true)))
    assert(mi.matches(PrefixQ("jum")))
    assert(mi.matches(BoolQ(must = Seq(TermQ("fox")), mustNot = Seq(TermQ("cat")))))
    assert(!mi.matches(BoolQ(must = Seq(TermQ("fox")), mustNot = Seq(TermQ("dog")))))
    assert(mi.score(TermQ("quick")) > 0.0)
    assert(mi.score(TermQ("missing")) == 0.0)
    // scores equal the engine's on an equivalent one-doc index
    val dir = Files.createTempDirectory("graft-mi").toString
    LocalIndex.build(dir, Seq((0L, "the quick brown fox jumps over the lazy dog")), "standard")
    val engine = LocalIndex.search(dir, TermQ("quick"), 1, BM25())
    assert(engine.head.score == mi.score(TermQ("quick")))
  }

  test("highlighter: fragments, tags, scoring by distinct terms") {
    val text = "Spark builds the index fast. The index is searched with BM25. " +
      "Unrelated filler sentence here. More filler without matches."
    val q = BoolQ(should = Seq(TermQ("index"), TermQ("bm25")))
    val frags = Highlighter.bestFragments(q, StandardAnalyzer(), text,
      fragmentSize = 70, maxFragments = 2)
    assert(frags.nonEmpty)
    // best fragment contains both tagged terms (distinct-term scoring)
    assert(frags.head.contains("<B>index</B>"))
    assert(frags.forall(f => f.contains("<B>")))
    assert(!frags.mkString.contains("filler sentence here. More"))

    // one-fragment whole-text case with custom tags
    val f2 = Highlighter.bestFragments(TermQ("fox"), WhitespaceAnalyzer,
      "the fox ran", fragmentSize = 100, pre = "[", post = "]")
    assert(f2 == Seq("the [fox] ran"))

    // phrase + span terms highlight; prohibited terms do not
    val f3 = Highlighter.bestFragments(
      BoolQ(must = Seq(PhraseQ(Seq("fox", "ran"))), mustNot = Seq(TermQ("the"))),
      WhitespaceAnalyzer, "the fox ran", fragmentSize = 100)
    assert(f3 == Seq("the <B>fox</B> <B>ran</B>"))

    // no query terms in text -> no fragments
    assert(Highlighter.bestFragments(TermQ("zzz"), WhitespaceAnalyzer, "a b c").isEmpty)
  }

  test("time-limited search: immediate deadline times out with partial results") {
    val dir = Files.createTempDirectory("graft-tlc").toString
    val corpus = SyntheticCorpus.generate(spark, 400, seed = 7, avgLen = 30, vocab = 50)
    IndexBuilder.build(spark, corpus, IndexConfig(dir, docsPerSegment = 100, writeDocMap = false))
    val searcher = new IndexSearcher(spark, dir)
    val q = BoolQ(should = Seq(TermQ("w1"), TermQ("w2"), TermQ("w3")))

    // generous budget: full results, no timeout
    val (full, timedOut) = searcher.searchWithTimeout(q, 10, BM25(), timeoutMs = 60000)
    assert(!timedOut)
    assert(full.toSeq == searcher.search(q, 10, BM25(), useWand = false).toSeq)

    // zero budget: flagged as timed out, returns whatever was collected
    val (partial, timedOut0) = searcher.searchWithTimeout(q, 10, BM25(), timeoutMs = -1)
    assert(timedOut0)
    assert(partial.length <= 10)
  }
}
