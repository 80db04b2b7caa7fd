package graft.search

import graft.analysis.Analyzer
import graft.score.{BM25, Similarity}

/** Single-document in-memory index — the reference's contrib MemoryIndex
  * (/root/reference/src/contrib/memory/MemoryIndex.cpp) for percolation /
  * query-routing: analyze one document once, then run many queries against
  * it without touching any segment. Backed by the brute-force executable
  * spec, so every query family the engine supports (spans, phrases,
  * multi-term, function scoring) works here with identical scores. */
final class MemoryIndex(text: String, analyzer: Analyzer) {

  private val doc = BruteForce.analyzeCorpus(analyzer, Seq((0L, text))).head
  private val corpus = Seq(doc)

  /** Relevance score of `q` against this document; 0.0 when it does not
    * match (reference MemoryIndex::search contract). */
  def score(q: Query, sim: Similarity = BM25()): Double = {
    val hits = BruteForce.search(corpus, q, 1, sim)
    if (hits.isEmpty) 0.0 else hits(0).score
  }

  def matches(q: Query): Boolean =
    BruteForce.search(corpus, q, 1, BM25()).nonEmpty
}
