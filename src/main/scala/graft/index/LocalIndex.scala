package graft.index

import graft.analysis.Analyzer
import graft.score.Similarity
import graft.search.{Query, ScoredDoc, SegmentSearch}

/** Single-process build/search over the same segment format — used by unit
  * tests (fast, no SparkSession) and as the 1-partition baseline that the
  * distributed build must byte-match (MultiSearcherRankingTest pattern,
  * SURVEY.md §5.1). */
object LocalIndex {

  /** docs = (docId, text) with dense ids 0..n-1 in order. */
  def build(indexDir: String, docs: Seq[(Long, String)], analyzerName: String,
      docsPerSegment: Int = Int.MaxValue, storePositions: Boolean = true,
      storeTermVectors: Boolean = false, storePayloads: Boolean = false): IndexMeta = {
    new java.io.File(indexDir).mkdirs()
    val analyzer = Analyzer.byName(analyzerName)
    val numDocs = docs.size.toLong
    val rows = docs.iterator.flatMap { case (id, text) =>
      IndexBuilder.tokenizeDoc(analyzer, IndexBuilder.segIdOf(id, docsPerSegment),
        id, text, storePositions, storePayloads)
    }.toVector.sortBy(r => (r.segId, r.term, r.docId))(
      Ordering.Tuple3(Ordering.Int, TermOrder.ordering, Ordering.Long))

    val metas = scala.collection.mutable.ArrayBuffer.empty[SegmentMeta]
    var writer: SegmentWriter = null
    var curSeg = -1
    var docBase = 0L
    rows.foreach { r =>
      if (r.segId != curSeg) {
        if (writer != null) metas += writer.finish()
        curSeg = r.segId
        docBase = curSeg.toLong * docsPerSegment
        val docCount = math.min(docsPerSegment.toLong, numDocs - docBase).toInt
        writer = new SegmentWriter(indexDir, curSeg, docBase, docCount, analyzerName,
          storePositions, storeTermVectors, storePayloads)
        if (storeTermVectors) {
          // doc-ordered vector sidecar from each doc's own analysis
          docs.filter(d => d._1 >= docBase && d._1 < docBase + docCount)
            .sortBy(_._1).foreach { case (id, text) =>
              val entries = IndexBuilder.tokenizeDoc(analyzer, curSeg, id, text, storePositions)
                .filter(_.term.nonEmpty).toArray.sortBy(_.term)(TermOrder.ordering)
              writer.addDocVector((id - docBase).toInt, entries.map(_.term),
                entries.map(_.freq), entries.map(_.positions))
            }
        }
      }
      val localDoc = (r.docId - docBase).toInt
      if (r.term.isEmpty) writer.addDocLength(localDoc, r.dl)
      else writer.addPosting(r.term, localDoc, r.freq, r.positions, 0, r.payloads)
    }
    if (writer != null) metas += writer.finish()

    val meta = IndexMeta(analyzerName, metas.map(_.docCount.toLong).sum,
      metas.map(_.sumDocLength).sum, storePositions, metas.toSeq.sortBy(_.segId))
    IndexMetaIO.writeCommit(indexDir, meta)
    meta
  }

  /** Sequential search across all segments + merge (drop-in comparable with
    * the distributed IndexSearcher). */
  def search(indexDir: String, q0: Query, k: Int, sim: Similarity,
      useWand: Boolean = true): Array[ScoredDoc] = {
    val meta = IndexMetaIO.readLatest(indexDir).get
    val readers = meta.segments.map(m =>
      new SegmentReader(new java.io.File(indexDir, SegmentFormat.segDirName(m.segId))))
    val q =
      if (!graft.search.Query.hasMultiTerm(q0)) q0
      else {
        // merged dictionary view: union of per-segment sorted term streams
        val termsFrom = (lower: Option[String]) => {
          val its = readers.map(_.termsFrom(lower).map(_.term))
          its.foldLeft(Iterator.empty: Iterator[String])(_ ++ _).toSeq.distinct
            .sorted(TermOrder.ordering).iterator
        }
        graft.search.MultiTerm.expand(q0, termsFrom)
      }
    val terms = Query.allTerms(q)
    val dfm = terms.map(t => t -> readers.flatMap(_.termInfo(t)).map(_.df.toLong).sum).toMap
    val stats = graft.score.CorpusStats(meta.numDocs, meta.avgDocLength)
    readers.flatMap(r => SegmentSearch.topK(r, q, k, sim, stats, t => dfm.getOrElse(t, 0L), useWand))
      .sortBy(h => (-h.score, h.docId))
      .take(k)
      .toArray
  }

  /** Explain `q0`'s score for one doc (reference Searcher::explain). The
    * value is bit-identical to what [[search]] collects for a hit, and 0
    * with matched=false for a non-hit. */
  def explain(indexDir: String, q0: Query, docId: Long,
      sim: Similarity): graft.search.Explanation = {
    val meta = IndexMetaIO.readLatest(indexDir).get
    val readers = meta.segments.map(m =>
      new SegmentReader(new java.io.File(indexDir, SegmentFormat.segDirName(m.segId))))
    val q =
      if (!graft.search.Query.hasMultiTerm(q0)) q0
      else {
        val termsFrom = (lower: Option[String]) => {
          val its = readers.map(_.termsFrom(lower).map(_.term))
          its.foldLeft(Iterator.empty: Iterator[String])(_ ++ _).toSeq.distinct
            .sorted(TermOrder.ordering).iterator
        }
        graft.search.MultiTerm.expand(q0, termsFrom)
      }
    val terms = Query.allTerms(q)
    val dfm = terms.map(t => t -> readers.flatMap(_.termInfo(t)).map(_.df.toLong).sum).toMap
    val stats = graft.score.CorpusStats(meta.numDocs, meta.avgDocLength)
    val reader = readers.find(r =>
      docId >= r.meta.docBase && docId < r.meta.docBase + r.meta.docCount)
      .getOrElse(return graft.search.Explanation(0.0, s"doc $docId not in index",
        matched = false))
    val local = (docId - reader.meta.docBase).toInt
    val view = graft.search.Explain.docView(reader, local, graft.search.Explain.viewTerms(q))
    val qn = sim.queryNorm(SegmentSearch.sumOfSquaredWeights(
      Query.rewrite(q), sim, stats, t => dfm.getOrElse(t, 0L)))
    graft.search.Explain.explainDoc(q, view, sim, stats, dfm, qn)
  }
}
