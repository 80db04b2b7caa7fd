package graft.search

import java.io.File

import org.apache.spark.sql.SparkSession

import graft.index.{IndexMeta, IndexMetaIO, SegmentFormat, SegmentReader}
import graft.score.{CorpusStats, Similarity}

/** Per-executor segment reader cache — segments are immutable, so a
  * process-wide map keyed by path is safe; the mmap'd buffers are shared by
  * all tasks on the executor (reference analog: one SegmentReader per open
  * index — /root/reference/src/core/index/DirectoryReader.cpp). */
object ReaderCache {
  /** Bounded: an executor touching 10^5+ segments across many indexes must
    * not accumulate mmaps without limit; evicted readers' buffers are
    * unmapped by GC once their scorers finish. */
  private val MaxReaders = 4096
  private val cache =
    java.util.Collections.synchronizedMap(
      new java.util.LinkedHashMap[String, SegmentReader](256, 0.75f, true) {
        override def removeEldestEntry(
            e: java.util.Map.Entry[String, SegmentReader]): Boolean =
          size() > MaxReaders
      })
  /** `segDir` may carry a `#<delGen>` suffix: the filesystem path is
    * everything before '#', the full string is the cache key — a delete
    * batch bumps the generation so every executor re-opens the segment and
    * sees the new del bitset (the reference's reopen-to-see-deletes
    * semantics). The generation is also the reader's del-file BOUND: the
    * reader loads the newest `del_<g>.bin` with g ≤ delGen, so a bitset
    * written ahead of its commit (updateDocuments) stays invisible until
    * the commit that references its generation lands. No suffix = snapshot
    * at generation 0 (no committed deletes). */
  def get(segDir: String): SegmentReader = {
    val hit = cache.get(segDir)
    if (hit != null) hit
    else {
      val h = segDir.indexOf('#')
      val path = if (h < 0) segDir else segDir.substring(0, h)
      val bound = if (h < 0) 0 else segDir.substring(h + 1).toInt
      val r = new SegmentReader(new File(path), bound)
      cache.put(segDir, r)
      r
    }
  }
  def clear(): Unit = { cache.clear(); FilterCache.clear() }
}

/** Per-(segment, filter) memoized match bitsets — the reference's
  * CachingWrapperFilter per-reader cache
  * (/root/reference/src/core/search/CachingWrapperFilter.cpp:1-155)
  * keyed by segment directory (segments are immutable). Bounded LRU so a
  * long-lived executor holding many indexes cannot grow without limit. */
object FilterCache {
  private val MaxEntries = 256
  private val hitCount = new java.util.concurrent.atomic.AtomicLong
  private val missCount = new java.util.concurrent.atomic.AtomicLong
  private val cache =
    java.util.Collections.synchronizedMap(
      new java.util.LinkedHashMap[(String, Query), java.util.BitSet](64, 0.75f, true) {
        override def removeEldestEntry(
            e: java.util.Map.Entry[(String, Query), java.util.BitSet]): Boolean =
          size() > MaxEntries
      })

  def getOrCompute(segDir: String, q: Query)(compute: => java.util.BitSet): java.util.BitSet = {
    val key = (segDir, q)
    val hit = cache.get(key)
    if (hit != null) { hitCount.incrementAndGet(); hit }
    else {
      missCount.incrementAndGet()
      val bits = compute
      cache.put(key, bits)
      bits
    }
  }

  def hits: Long = hitCount.get
  def misses: Long = missCount.get
  def clear(): Unit = { cache.clear(); hitCount.set(0); missCount.set(0) }
}

/** Distributed BM25 top-k over the committed segment set.
  *
  * This IS the reference's ParallelMultiSearcher re-expressed on Spark
  * (/root/reference/src/core/search/ParallelMultiSearcher.cpp:32-90;
  * SURVEY.md §3.2): the per-subreader scatter loop becomes a task per
  * segment, docBase offsets come from the lineage table, global weights
  * (df, N, avgdl) are computed once driver-side and broadcast, and the
  * final merge is a driver heap over ≤ k hits per segment.
  *
  * Queries are executed in BATCHES: one Spark job computes global df for
  * all query terms (tiny shuffle: |terms| rows), one job scores all queries
  * against all segments. Per-query driver work is O(segments · k).
  *
  * `commitGen` opens a POINT-IN-TIME snapshot at that commit generation
  * instead of the latest — the reference's IndexCommit / IndexReader::open
  * (commit) (/root/reference/src/core/index/IndexReader.cpp, DirectoryReader
  * over a SegmentInfos generation): the searcher sees exactly the segment
  * set and deletion generation that commit recorded, regardless of later
  * appends, deletes, or updates. Valid until a compaction retires segments
  * the commit references (the same lifetime the reference gives non-latest
  * commits under its default deletion policy). Enumerate openable
  * generations with `IndexMetaIO.commitGens(dir)`. */
final class IndexSearcher(spark: SparkSession, val indexDir: String,
    commitGen: Option[Int]) extends Serializable {

  def this(spark: SparkSession, indexDir: String) = this(spark, indexDir, None)

  private val snapshot: (IndexMeta, Map[String, String]) = commitGen match {
    case Some(g) => IndexMetaIO.readSnapshot(indexDir, g)
      .getOrElse(throw new IllegalStateException(s"no commit generation $g at $indexDir"))
    case None => IndexMetaIO.readLatestWithExtra(indexDir)
      // readLatest's legacy fallback (reconstruct from segment dirs when
      // the binary snapshot is unreadable), with no commit extras
      .orElse(IndexMetaIO.readLatest(indexDir).map((_, Map.empty[String, String])))
      .getOrElse(throw new IllegalStateException(s"no committed index at $indexDir"))
  }
  val meta: IndexMeta = snapshot._1
  val stats: CorpusStats = CorpusStats(meta.numDocs, meta.avgDocLength)

  /** Deletion generation of the snapshot this searcher opened — baked into
    * every reader-cache key so executors re-open segments after a delete
    * batch. Scoring stats (df, N, avgdl) deliberately keep counting
    * tombstoned docs until a merge reclaims them, as the reference does. */
  private val delGen: Int = snapshot._2.get("delgen").map(_.toInt).getOrElse(0)

  private def cacheKey(path: String): String =
    if (delGen == 0) path else s"$path#$delGen"

  private val segDirs: Seq[String] =
    meta.segments.map(m =>
      cacheKey(new File(indexDir, SegmentFormat.segDirName(m.segId)).getPath))

  /** Global document frequencies for a term set: sum of per-segment df.
    * Exact (the reference's df is exact too — SURVEY.md §2.4). */
  def globalDf(terms: Set[String]): Map[String, Long] = {
    if (terms.isEmpty) return Map.empty
    val sc = spark.sparkContext
    val bcTerms = sc.broadcast(terms.toSeq)
    val dfs = sc.parallelize(segDirs, math.max(1, segDirs.size))
      .flatMap { dir =>
        val r = ReaderCache.get(dir)
        bcTerms.value.flatMap(t => r.termInfo(t).map(ti => (t, ti.df.toLong)))
      }
      .reduceByKey(_ + _)
      .collect()
      .toMap
    bcTerms.destroy()
    dfs
  }

  def search(q: Query, k: Int, sim: Similarity, useWand: Boolean = true): Array[ScoredDoc] =
    searchBatch(Seq("q" -> q), k, sim, useWand)("q")

  /** Time-budgeted search: each segment task stops collecting once its
    * share of `timeoutMs` elapses and returns what it gathered — partial
    * top-k plus a timed-out flag (the reference's TimeLimitingCollector
    * semantics, applied per task: each executor enforces the budget with
    * its own clock). */
  def searchWithTimeout(q0: Query, k: Int, sim: Similarity,
      timeoutMs: Long): (Array[ScoredDoc], Boolean) = {
    val q = Query.rewrite(expandQueries(Seq("q" -> q0)).head._2)
    val dfMap = globalDf(Query.allTerms(q))
    val sc = spark.sparkContext
    val bcDf = sc.broadcast(dfMap)
    val bcQ = sc.broadcast(q)
    val st = stats
    val budgetNanos = timeoutMs * 1000000L
    val perSegment = sc.parallelize(segDirs, math.max(1, segDirs.size))
      .map { dir =>
        val reader = ReaderCache.get(dir)
        val df = (t: String) => bcDf.value.getOrElse(t, 0L)
        SegmentSearch.topKTimed(reader, bcQ.value, k, sim, st, df,
          useWand = false, System.nanoTime() + budgetNanos)
      }
      .collect()
    bcQ.destroy()
    bcDf.destroy()
    val hits = perSegment.iterator.flatMap(_._1).toArray
      .sortBy(h => (-h.score, h.docId)).take(k)
    (hits, perSegment.exists(_._2))
  }

  /** Expand multi-term nodes against the distributed term dictionary: one
    * job collects each node's matching terms per segment (seek + bounded
    * scan), the driver unions them and rewrites the plan. Per-node match
    * is a pure function of term text, so the union is exactly the global
    * dictionary expansion (MultiTerm scaladoc). */
  private def expandQueries(queries: Seq[(String, Query)]): Seq[(String, Query)] = {
    if (!queries.exists { case (_, q) => Query.hasMultiTerm(q) }) return queries
    val nodes: Seq[MultiTermQ] =
      queries.flatMap { case (_, q) => IndexSearcher.collectMultiTermNodes(q) }.distinct
    if (nodes.isEmpty) return queries
    IndexSearcher.rewriteWithTermSets(queries, multiTermMatches(nodes))
  }

  /** Matched dictionary terms per multi-term node, collected across this
    * index's segments (the distributed half of expansion — exposed so a
    * cross-index MultiSearcher can union the sets before rewriting once,
    * like the reference's rewrite against the combined reader). */
  private[search] def multiTermMatches(
      nodes: Seq[MultiTermQ]): Map[MultiTermQ, Seq[String]] = {
    val sc = spark.sparkContext
    val bcNodes = sc.broadcast(nodes)
    val matched: Map[MultiTermQ, Seq[String]] = sc
      .parallelize(segDirs, math.max(1, segDirs.size))
      .flatMap { dir =>
        val r = ReaderCache.get(dir)
        bcNodes.value.flatMap { node =>
          val it = r.termsFrom(MultiTerm.seekLowerBound(node))
          val out = scala.collection.mutable.ArrayBuffer.empty[(MultiTermQ, String)]
          var done = false
          while (!done && it.hasNext) {
            val t = it.next().term
            if (MultiTerm.pastUpperBound(node, t)) done = true
            else if (MultiTerm.matchBoost(node, t).isDefined) out += ((node, t))
          }
          out
        }
      }
      .distinct()
      .collect()
      .groupBy(_._1)
      .map { case (n, ts) => n -> ts.map(_._2).toSeq.sorted }
    bcNodes.destroy()
    matched
  }

  /** ALL matching docIds as a DataFrame — the match-set path. Matches are
    * enumerated inside tasks (one per segment) and returned as a distributed
    * result; nothing is materialized on the driver, so a stop-word phrase
    * over 10^12 docs streams straight to the sink. Scoring is skipped:
    * only the scorer tree's matching behavior runs. */
  def matchingDocs(q0: Query): org.apache.spark.sql.DataFrame = {
    val q = Query.rewrite(expandQueries(Seq("q" -> q0)).head._2)
    val dfMap = globalDf(Query.allTerms(q))
    val sc = spark.sparkContext
    val bcDf = sc.broadcast(dfMap)
    val bcQ = sc.broadcast(q)
    val st = stats
    val sim: Similarity = graft.score.BM25()
    val rdd = sc.parallelize(segDirs, math.max(1, segDirs.size))
      .flatMap { dir =>
        val reader = ReaderCache.get(dir)
        val df = (t: String) => bcDf.value.getOrElse(t, 0L)
        val docBase = reader.meta.docBase
        val qn = sim.queryNorm(SegmentSearch.sumOfSquaredWeights(bcQ.value, sim, st, df))
        SegmentSearch.scorer(bcQ.value, reader, sim, st, df, qn) match {
          case None => Iterator.empty
          case Some(s) =>
            Iterator.continually(s.nextDoc())
              .takeWhile(_ != Scorer.NoMoreDocs)
              .filter(d => !reader.deleted(d))
              .map(d => docBase + d)
        }
      }
    val sp = spark
    import sp.implicits._
    rdd.toDF("doc_id")
  }

  /** Explain the score of one (query, doc) — the reference's
    * Searcher::explain (Explanation value == the score search collects for
    * a hit; matched=false and 0 for a non-hit). Runs as a one-task Spark
    * job on the executor side, where the segment files live; only the
    * explanation tree comes back. */
  def explain(q0: Query, docId: Long, sim: Similarity): Explanation = {
    val q = Query.rewrite(expandQueries(Seq("q" -> q0)).head._2)
    val dfMap = globalDf(Query.allTerms(q))
    val segMeta = meta.segments.find(m =>
      docId >= m.docBase && docId < m.docBase + m.docCount)
      .getOrElse(return Explanation(0.0, s"doc $docId not in index", matched = false))
    val segDir = cacheKey(new File(indexDir,
      graft.index.SegmentFormat.segDirName(segMeta.segId)).getPath)
    val st = stats
    val sc = spark.sparkContext
    val bcQ = sc.broadcast(q)
    val bcDf = sc.broadcast(dfMap)
    val out = sc.parallelize(Seq(segDir), 1).map { dir =>
      val reader = ReaderCache.get(dir)
      val local = (docId - reader.meta.docBase).toInt
      val df = (t: String) => bcDf.value.getOrElse(t, 0L)
      val view = Explain.docView(reader, local, Explain.viewTerms(bcQ.value))
      val qn = sim.queryNorm(SegmentSearch.sumOfSquaredWeights(bcQ.value, sim, st, df))
      Explain.explainDoc(bcQ.value, view, sim, st, bcDf.value, qn)
    }.collect().head
    bcQ.destroy()
    bcDf.destroy()
    out
  }

  /** Batched [[explain]]: every (query, doc) explanation in ONE Spark job
    * (one task per touched segment, one shared df job and broadcast pair)
    * instead of a df job + a one-task job per doc. Same per-doc tree as
    * [[explain]] — identical Explanation values; order follows `docIds`. */
  def explainMany(q0: Query, docIds: Seq[Long], sim: Similarity): Seq[Explanation] = {
    val q = Query.rewrite(expandQueries(Seq("q" -> q0)).head._2)
    val dfMap = globalDf(Query.allTerms(q))
    val st = stats
    val sc = spark.sparkContext
    val bySeg = docIds.distinct.flatMap { docId =>
      meta.segments.find(m => docId >= m.docBase && docId < m.docBase + m.docCount)
        .map(m => cacheKey(new File(indexDir,
          graft.index.SegmentFormat.segDirName(m.segId)).getPath) -> docId)
    }.groupBy(_._1).view.mapValues(_.map(_._2)).toSeq
    val results: Map[Long, Explanation] =
      if (bySeg.isEmpty) Map.empty
      else {
        val bcQ = sc.broadcast(q)
        val bcDf = sc.broadcast(dfMap)
        val out = sc.parallelize(bySeg, bySeg.size).flatMap { case (dir, ids) =>
          val reader = ReaderCache.get(dir)
          val df = (t: String) => bcDf.value.getOrElse(t, 0L)
          val qn = sim.queryNorm(SegmentSearch.sumOfSquaredWeights(bcQ.value, sim, st, df))
          ids.map { docId =>
            val local = (docId - reader.meta.docBase).toInt
            val view = Explain.docView(reader, local, Explain.viewTerms(bcQ.value))
            docId -> Explain.explainDoc(bcQ.value, view, sim, st, bcDf.value, qn)
          }
        }.collect().toMap
        bcQ.destroy()
        bcDf.destroy()
        out
      }
    docIds.map(id => results.getOrElse(id,
      Explanation(0.0, s"doc $id not in index", matched = false)))
  }

  /** Delete every doc matching `q` — the reference's
    * IndexReader::deleteDocuments re-expressed: one task per segment ORs
    * the match set into the segment's del bitset (atomic write), the
    * driver then snapshots a bumped deletion generation so subsequently
    * OPENED searchers see the deletes (this searcher's snapshot is
    * unchanged, like the reference's point-in-time readers). DocIDs stay
    * stable; space is reclaimed at the next merge. Returns the number of
    * docs newly deleted. */
  def deleteDocs(q0: Query): Long = deleteDocs(q0, commit = true)

  /** Tombstone every doc matching `q0`. With `commit = false` the del
    * bitsets are written but the delgen snapshot is left to the caller —
    * updateDocuments uses this to fold deletes and appends into ONE
    * commit (the reference's IndexWriter::updateDocument,
    * /root/reference/src/core/index/IndexWriter.cpp:981-1004). */
  def deleteDocs(q0: Query, commit: Boolean): Long = {
    val q = Query.rewrite(expandQueries(Seq("q" -> q0)).head._2)
    val dfMap = globalDf(Query.allTerms(q))
    val sc = spark.sparkContext
    val bcDf = sc.broadcast(dfMap)
    val bcQ = sc.broadcast(q)
    val st = stats
    // the CURRENT committed generation (not this searcher's open-time
    // snapshot — a second batch through the same instance must seed from
    // the first batch's committed bitsets), and the generation the new
    // bitsets will be committed under: files are written as
    // del_<targetGen>.bin and stay invisible to every reader until the
    // commit recording delgen=targetGen lands (crash ⇒ ignored orphans)
    val (commitMeta, commitExtra) = IndexMetaIO.readLatestWithExtra(indexDir).get
    val committedGen = commitExtra.get("delgen").map(_.toInt).getOrElse(0)
    val targetGen = committedGen + 1
    // Purge orphan generations (> committedGen) left by a batch that
    // crashed pre-commit, across the CURRENT commit's segments — a
    // superset of anywhere orphans can live, and deliberately not just
    // this searcher's (possibly stale) snapshot. Without this, committing
    // delgen=targetGen below would retroactively adopt a crashed
    // updateDocuments' del_<targetGen>.bin in segments this batch didn't
    // write: its deletes would apply without its adds.
    locally {
      val idxDir = indexDir
      val allSegs = commitMeta.segments
        .map(m => new File(idxDir, SegmentFormat.segDirName(m.segId)).getPath)
      sc.parallelize(allSegs, math.max(1, allSegs.size))
        .foreach(p => SegmentFormat.purgeOrphanDeletes(new File(p), committedGen))
    }
    val newly = sc.parallelize(segDirs, math.max(1, segDirs.size))
      .map { dir =>
        val reader = ReaderCache.get(dir)
        val df = (t: String) => bcDf.value.getOrElse(t, 0L)
        val sim: Similarity = graft.score.BM25()
        // seed from the CURRENT COMMITTED bitset, NOT the cached reader's
        // open-time snapshot: this searcher's reader-cache key is pinned to
        // its open-time delGen, so a second delete batch through the same
        // searcher instance would otherwise OR into a pre-first-batch bitset
        // and silently resurrect the first batch's committed tombstones
        val bits = SegmentFormat.readDeletes(reader.dir, committedGen)
        val before = bits.cardinality()
        val qn = sim.queryNorm(SegmentSearch.sumOfSquaredWeights(bcQ.value, sim, st, df))
        SegmentSearch.scorer(bcQ.value, reader, sim, st, df, qn).foreach { s =>
          var d = s.nextDoc()
          while (d != Scorer.NoMoreDocs) { bits.set(d); d = s.nextDoc() }
        }
        val added = bits.cardinality() - before
        if (added > 0) SegmentFormat.writeDeletes(reader.dir, bits, targetGen)
        added.toLong
      }
      .collect().sum
    bcQ.destroy()
    bcDf.destroy()
    if (newly > 0 && commit) {
      // publish: a fresh snapshot (meta unchanged) whose delgen references
      // the just-written generation — readers flip atomically to it
      IndexMetaIO.writeCommit(indexDir, commitMeta,
        commitExtra + ("delgen" -> targetGen.toString))
    }
    newly
  }

  /** Live (non-tombstoned) doc count — numDocs minus deletions. */
  def liveDocCount(): Long = {
    val sc = spark.sparkContext
    meta.numDocs - sc.parallelize(segDirs, math.max(1, segDirs.size))
      .map(dir => ReaderCache.get(dir).delCount.toLong).collect().sum
  }

  def searchBatch(queries0: Seq[(String, Query)], k: Int, sim: Similarity,
      useWand: Boolean = true): Map[String, Array[ScoredDoc]] = {
    val queries = expandQueries(queries0)
    val allTerms = queries.flatMap { case (_, q) => Query.allTerms(q) }.toSet
    searchBatchWith(queries, k, sim, useWand, stats, globalDf(allTerms), 0L)
  }

  /** The post-expansion scatter/merge with CALLER-SUPPLIED scoring stats,
    * document frequencies, and a docId offset — the hook a cross-index
    * MultiSearcher uses so every sub-index scores with the combined
    * corpus's weights (reference MultiSearcher::createWeight +
    * CachedDfSource, /root/reference/src/core/search/MultiSearcher.cpp). */
  private[search] def searchBatchWith(queries: Seq[(String, Query)], k: Int,
      sim: Similarity, useWand: Boolean, st0: CorpusStats,
      dfMap: Map[String, Long], docIdOffset: Long): Map[String, Array[ScoredDoc]] = {
    val st = st0
    val sc = spark.sparkContext
    val bcDf = sc.broadcast(dfMap)
    val bcQueries = sc.broadcast(queries)

    val perSegment = sc.parallelize(segDirs, math.max(1, segDirs.size))
      .flatMap { dir =>
        val reader = ReaderCache.get(dir)
        val df = (t: String) => bcDf.value.getOrElse(t, 0L)
        bcQueries.value.iterator.map { case (id, q) =>
          (id, SegmentSearch.topK(reader, q, k, sim, st, df, useWand))
        }
      }

    val mergeTopK: (Array[ScoredDoc], Array[ScoredDoc]) => Array[ScoredDoc] =
      (a, b) => (a ++ b).sortBy(h => (-h.score, h.docId)).take(k)

    // merge with the reference tie-break (score desc, docId asc). Above a
    // segment-count threshold the merge goes through reduceByKey — the
    // map-side combiners fold each partition's hits first, so the driver
    // receives O(queries · k) rows instead of O(segments · k)
    val collected =
      if (segDirs.size <= 256) perSegment.collect()
      else perSegment.reduceByKey(mergeTopK, math.max(1, queries.size)).collect()

    bcQueries.destroy()
    bcDf.destroy()

    collected.groupBy(_._1).map { case (id, hits) =>
      val merged = hits.iterator.flatMap(_._2).toArray
        .sortBy(h => (-h.score, h.docId)).take(k)
      id -> (if (docIdOffset == 0L) merged
             else merged.map(h => h.copy(docId = h.docId + docIdOffset)))
    }
  }
}

/** Cross-index searcher — the reference's MultiSearcher over several
  * physical indexes (/root/reference/src/core/search/MultiSearcher.cpp):
  * docFreq sums across sub-indexes, scoring stats come from the combined
  * corpus (so scores are comparable across indexes — MultiSearcher's
  * CachedDfSource weight creation), result docIds are offset by each
  * sub-index's start (starts[] remapping), and multi-term expansion
  * rewrites ONCE against the union of the sub-dictionaries. */
final class MultiIndexSearcher(subs: Seq[IndexSearcher]) {
  require(subs.nonEmpty, "MultiIndexSearcher needs at least one sub-index")

  /** docId offset per sub-index, in order (MultiSearcher starts[]). */
  val starts: Seq[Long] = subs.scanLeft(0L)(_ + _.meta.numDocs).init

  val stats: CorpusStats = {
    val docs = subs.map(_.meta.numDocs).sum
    val sumDl = subs.map(_.meta.sumDocLength).sum
    CorpusStats(docs, if (docs == 0) 0.0 else sumDl.toDouble / docs)
  }

  def globalDf(terms: Set[String]): Map[String, Long] =
    subs.map(_.globalDf(terms)).foldLeft(Map.empty[String, Long]) { (acc, m) =>
      m.foldLeft(acc) { case (a, (t, df)) => a.updated(t, a.getOrElse(t, 0L) + df) }
    }

  def search(q: Query, k: Int, sim: Similarity,
      useWand: Boolean = true): Array[ScoredDoc] =
    searchBatch(Seq("q" -> q), k, sim, useWand)("q")

  def searchBatch(queries0: Seq[(String, Query)], k: Int, sim: Similarity,
      useWand: Boolean = true): Map[String, Array[ScoredDoc]] = {
    // union multi-term expansion across every sub-dictionary, then one
    // rewrite — per-index expansion would pick different fuzzy/budget
    // subsets and make scores incomparable
    val nodes = queries0
      .flatMap { case (_, q) => IndexSearcher.collectMultiTermNodes(q) }.distinct
    val queries =
      if (nodes.isEmpty) queries0
      else {
        val union = subs.map(_.multiTermMatches(nodes))
          .foldLeft(Map.empty[MultiTermQ, Seq[String]]) { (acc, m) =>
            m.foldLeft(acc) { case (a, (n, ts)) =>
              a.updated(n, (a.getOrElse(n, Nil) ++ ts).distinct.sorted)
            }
          }
        IndexSearcher.rewriteWithTermSets(queries0, union)
      }
    val allTerms = queries.flatMap { case (_, q) => Query.allTerms(q) }.toSet
    val dfMap = globalDf(allTerms)
    val perSub = subs.zip(starts).map { case (s, base) =>
      s.searchBatchWith(queries, k, sim, useWand, stats, dfMap, base)
    }
    queries.map { case (id, _) =>
      id -> perSub.iterator.flatMap(_.getOrElse(id, Array.empty[ScoredDoc]))
        .toArray.sortBy(h => (-h.score, h.docId)).take(k)
    }.toMap
  }
}

object IndexSearcher {

  private[search] def collectMultiTermNodes(q: Query): Seq[MultiTermQ] = q match {
    case mt: MultiTermQ => Seq(mt)
    case BoolQ(m, s, n, _) => (m ++ s ++ n).flatMap(collectMultiTermNodes)
    case ConstantScoreQ(inner, _) => collectMultiTermNodes(inner)
    case CachedQ(inner) => collectMultiTermNodes(inner)
    case CustomScoreQ(sub, _, _, _) => collectMultiTermNodes(sub)
    case DisMaxQ(ds, _, _) => ds.flatMap(collectMultiTermNodes)
    case FilteredQ(q2, f) => collectMultiTermNodes(q2) ++ collectMultiTermNodes(f)
    case _ => Nil
  }

  /** Rewrite with per-node term sets (expand consumes a term iterator; feed
    * it the node's own matched list by re-dispatching per node). */
  private[search] def rewriteWithTermSets(queries: Seq[(String, Query)],
      termSets: Map[MultiTermQ, Seq[String]]): Seq[(String, Query)] = {
    def rewriteTree(q: Query): Query = q match {
      case mt: MultiTermQ =>
        val terms = termSets.getOrElse(mt, Nil)
        MultiTerm.expand(mt, _ => terms.iterator)
      case BoolQ(m, s, n, msm) =>
        BoolQ(m.map(rewriteTree), s.map(rewriteTree), n.map(rewriteTree), msm)
      case ConstantScoreQ(inner, boost) => ConstantScoreQ(rewriteTree(inner), boost)
      case CachedQ(inner) => CachedQ(rewriteTree(inner))
      case cs: CustomScoreQ => cs.copy(sub = rewriteTree(cs.sub))
      case DisMaxQ(ds, tie, boost) => DisMaxQ(ds.map(rewriteTree), tie, boost)
      case FilteredQ(q2, f) => FilteredQ(rewriteTree(q2), rewriteTree(f))
      case other => other
    }
    queries.map { case (id, q) => id -> rewriteTree(q) }
  }
}
