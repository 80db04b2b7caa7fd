package graft.tools

import graft.analysis.{Analyzer, StandardAnalyzer, WhitespaceAnalyzer}
import graft.corpus.SyntheticCorpus
import graft.index.IndexBuilder

/** Single-threaded tokenizer micro-benchmark (not part of the contract). */
object TokBench {
  def main(args: Array[String]): Unit = {
    val docs = (0L until 20000L).map(i => SyntheticCorpus.docText(42, i, 120, 50000))
    val totalChars = docs.map(_.length.toLong).sum
    def run(name: String, analyzer: Analyzer): Unit = {
      var tokens = 0L
      // warmup
      docs.take(2000).foreach(d => analyzer.analyze(d).foreach(_ => tokens += 1))
      tokens = 0
      val t0 = System.nanoTime()
      docs.foreach(d => analyzer.analyze(d).foreach(_ => tokens += 1))
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"[tok] $name: ${tokens / sec / 1e6}%.2f M tokens/s, ${totalChars / sec / 1e6}%.1f MB-chars/s ($tokens tokens in $sec%.2f s)")
    }
    run("standard", StandardAnalyzer())
    run("whitespace", WhitespaceAnalyzer)
    run("standard-2", StandardAnalyzer())

    // full tokenizeDoc path (hash agg + row construction)
    val a = StandardAnalyzer()
    var rows = 0L
    docs.take(2000).zipWithIndex.foreach { case (d, i) =>
      rows += IndexBuilder.tokenizeDoc(a, 0, i.toLong, d, storePositions = false).size
    }
    val t0 = System.nanoTime()
    rows = 0
    docs.zipWithIndex.foreach { case (d, i) =>
      rows += IndexBuilder.tokenizeDoc(a, 0, i.toLong, d, storePositions = false).size
    }
    val sec = (System.nanoTime() - t0) / 1e9
    println(f"[tok] tokenizeDoc: ${docs.size / sec}%.0f docs/s single-thread ($rows rows in $sec%.2f s)")
  }
}
