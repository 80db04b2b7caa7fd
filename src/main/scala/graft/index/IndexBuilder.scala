package graft.index

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

import graft.analysis.Analyzer

/** One shuffled row of the build: either a posting (term, docId, freq,
  * positions) or — when `term` is the empty-string sentinel, which sorts
  * before every real term — a doc-length row carrying `dl`. Folding norms
  * into the postings shuffle means ONE wide shuffle total. */
final case class PostingRow(
    segId: Int,
    term: String,
    docId: Long,
    freq: Int,
    positions: Array[Int],
    dl: Int,
    payloads: Array[Array[Byte]] = null)

final case class IndexConfig(
    indexDir: String,
    analyzer: String = "standard",
    /** Segment = contiguous docId range; bounds per-task memory and is the
      * unit of parallel search AND of resume. At 10^12 docs you'd run ~1M
      * docs/segment over thousands of executors; tests shrink it. */
    docsPerSegment: Int = 1 << 20,
    storePositions: Boolean = true,
    /** Shuffle partitions for the postings sort; 0 → one per segment. */
    buildPartitions: Int = 0,
    /** Also persist a (docId, url) map table next to the index. */
    writeDocMap: Boolean = true,
    /** Store per-doc term vectors (doc-ordered sidecar; invert mode only —
      * the sort-shuffle path never sees a whole doc at once). */
    storeTermVectors: Boolean = false,
    /** Store per-position payloads (requires storePositions and a
      * payload-producing analyzer, e.g. "delimited"; invert mode only). */
    storePayloads: Boolean = false,
    /** "invert" (default): shuffle raw docs by segId, invert each segment
      * in task RAM (the reference's DocumentsWriter architecture; memory
      * bounded by docsPerSegment). "sortshuffle": shuffle posting rows
      * through an external sort (unbounded segments, flat task memory).
      * Both produce byte-identical segments. */
    buildMode: String = "invert")

final case class BuildReport(
    numDocs: Long,
    numSegments: Int,
    builtSegments: Int,
    resumedSegments: Int,
    meta: IndexMeta)

/** Distributed inverted-index build (SURVEY.md §7).
  *
  * Shape of the job — designed for 10^12 docs / 1000 executors:
  *
  *  1. deterministic dense docIDs: sort the URLS ONLY (key-sized shuffle),
  *     rank them via per-partition counts + exclusive scan (the one place
  *     we drop to the RDD API — the scan has no Dataset equivalent), and
  *     hash-join ids back onto the text. Rank-identical output across
  *     cluster sizes requires ids that do not depend on partitioning; a
  *     total order + rank is the only assignment with that property
  *     (SURVEY.md §7.4-2). The corpus text is never sorted and never
  *     cached — at 10^12 docs either would be a corpus-sized sort/spill.
  *  2. resume filter: docs inside any committed segment's [docBase,
  *     docBase+docCount) range are skipped BEFORE tokenization (range, not
  *     segId, so compacted segments resume correctly — north rule
  *     resumability).
  *  3. tokenize in `mapPartitions` (per-doc hash-agg of term freqs: tf
  *     needs no shuffle — SURVEY.md §2.4), emitting posting rows keyed by
  *     segId = docId / docsPerSegment.
  *  4. ONE shuffle: `repartition($"segId")` + `sortWithinPartitions(segId,
  *     term, docId)`. Partitioning by doc-range (not term!) is the skew
  *     story: every segment gets ~docsPerSegment docs' worth of postings
  *     regardless of term distribution, so stop-word-class terms cannot
  *     skew a reducer (the "salted groupBy" of the north rule, with the
  *     doc-range bucket as the salt — SURVEY.md §4.4); Spark's sort-based
  *     shuffle spills, so per-task memory stays bounded.
  *  5. stream each sorted run into a SegmentWriter; atomic per-segment
  *     publish = per-partition lineage commit; driver snapshot at the end.
  */
object IndexBuilder {

  def segIdOf(docId: Long, docsPerSegment: Int): Int = (docId / docsPerSegment).toInt

  /** corpus must have `url` and `text` string columns. */
  def build(spark: SparkSession, corpus: DataFrame, cfg: IndexConfig): BuildReport = {
    import spark.implicits._
    new java.io.File(cfg.indexDir).mkdirs()

    val analyzer = Analyzer.byName(cfg.analyzer)
    IndexMetaIO.readLatestWithExtra(cfg.indexDir).foreach { case (_, extra) =>
      require(extra.get("format").contains(IndexMetaIO.FormatVersion),
        s"${cfg.indexDir} was written with segment format ${extra.getOrElse("format", "1")} " +
          s"(current ${IndexMetaIO.FormatVersion}); delete it and rebuild")
    }
    val committed = IndexMetaIO.committedSegments(cfg.indexDir)
      .filter(m => m.analyzer == cfg.analyzer && m.hasPositions == cfg.storePositions)
    val dps0 = cfg.docsPerSegment
    // Resume skips by committed DOC RANGE, not segId: compaction produces
    // fresh segIds covering several original ranges, and a segId-based skip
    // would rebuild those docs alongside the merged segment (overlapping
    // ranges, duplicate docIds). Ranges must stay aligned to docsPerSegment
    // so the remaining docs form whole buildable segments.
    val committedRanges: Array[(Long, Long)] =
      committed.map(m => (m.docBase, m.docBase + m.docCount)).sortBy(_._1).toArray
    committedRanges.foreach { case (s, _) =>
      require(s % dps0 == 0,
        s"cannot resume: committed segment docBase $s is not aligned to docsPerSegment=$dps0")
    }

    // (1) deterministic dense docIDs: global url order → rank. Only the
    // URLS are sorted (a key-sized shuffle); per-partition counts + an
    // exclusive scan turn the sort into dense ranks, and a hash join
    // attaches ids back to the text. The corpus text is therefore NEVER
    // sorted and NEVER cached — at 10^12 docs either would be a
    // corpus-sized sort/spill. Requires unique urls (one doc per url —
    // the web-crawl snapshot contract; also what the docmap assumes).
    val sortedUrls = corpus.select($"url").as[String].orderBy($"url").rdd
    val partCounts: Array[Long] = sortedUrls
      .mapPartitionsWithIndex { (i, it) =>
        var n = 0L
        while (it.hasNext) { it.next(); n += 1 }
        Iterator((i, n))
      }.collect().sortBy(_._1).map(_._2)
    val offsets: Array[Long] = partCounts.scanLeft(0L)(_ + _)
    val idsDF = sortedUrls.mapPartitionsWithIndex { (i, it) =>
      var id = offsets(i) - 1
      it.map { url => id += 1; (url, id) }
    }.toDF("url", "docId")
    // shuffle-hash over sort-merge (the ids are the small, fixed-width
    // side; SMJ would re-sort the text); AQE still upgrades this to a
    // broadcast join when the id side is small enough
    val sorted = corpus.select($"url", $"text")
      .join(idsDF.hint("shuffle_hash"), Seq("url"))
      .select($"docId", $"url", $"text").as[(Long, String, String)]
      .rdd

    {
      val numDocs = offsets.last
      val dps = cfg.docsPerSegment
      val numSegments = math.max(1, ((numDocs + dps - 1) / dps).toInt)
      committedRanges.foreach { case (_, e) =>
        require(e % dps == 0 || e == numDocs,
          s"cannot resume: committed segment end $e is not aligned to docsPerSegment=$dps")
      }

      if (cfg.writeDocMap) {
        val docMapPath = new java.io.File(cfg.indexDir, "docmap").getPath
        if (!new java.io.File(docMapPath, "_SUCCESS").exists()) {
          idsDF.select($"docId", $"url")
            .write.mode("overwrite").parquet(docMapPath)
        }
      }

      // (2) resume: skip committed doc-ranges before any tokenize work
      val ranges = committedRanges
      val todo =
        if (ranges.isEmpty) sorted
        else sorted.filter { case (id, _, _) => !inRanges(ranges, id) }

      val posStore = cfg.storePositions
      val indexDir = cfg.indexDir
      val analyzerName = cfg.analyzer
      val totalDocs = numDocs

      require(!cfg.storeTermVectors || cfg.buildMode == "invert",
        "term vectors require buildMode=invert")
      require(!cfg.storePayloads || (cfg.buildMode == "invert" && cfg.storePositions),
        "payloads require buildMode=invert and storePositions")
      val storeVecs = cfg.storeTermVectors
      val storePays = cfg.storePayloads
      val metas: Seq[SegmentMeta] = if (cfg.buildMode == "invert") {
        // (3a) DEFAULT "invert" mode — the reference's own architecture
        // (in-RAM inversion per segment, DocumentsWriter.cpp) re-expressed:
        // shuffle RAW DOCS grouped by segId (corpus-sized shuffle, ~10x
        // smaller than shuffling posting rows) and invert one segment at a
        // time in task memory. docsPerSegment bounds task memory (2048-doc
        // test segments ≈ MBs; at cluster scale keep ≤ ~256k docs/segment
        // per 4 GB executor, or switch buildMode to "sortshuffle").
        val parts = if (cfg.buildPartitions > 0) cfg.buildPartitions
          else math.min(numSegments, math.max(1, 4 * spark.sparkContext.defaultParallelism))
        val partitioner = new org.apache.spark.Partitioner {
          override def numPartitions: Int = parts
          override def getPartition(key: Any): Int = {
            val s = key.asInstanceOf[(Int, Long)]._1
            val m = s % parts
            if (m < 0) m + parts else m
          }
        }
        todo.map { case (docId, _, text) => ((segIdOf(docId, dps), docId), text) }
          .repartitionAndSortWithinPartitions(partitioner)
          .mapPartitions { it =>
            invertPartitionSegments(it, indexDir, analyzerName, dps, totalDocs, posStore,
              storeVectors = storeVecs, storePayloads = storePays)
          }.collect().toSeq
      } else {
        // (3b) "sortshuffle" mode — posting rows through one doc-range-
        // partitioned external sort (unbounded segment sizes; Spark's
        // sort-based shuffle spills, per-task memory stays flat).
        val rows = todo.mapPartitions { docs =>
          docs.flatMap { case (docId, _, text) =>
            val segId = segIdOf(docId, dps)
            tokenizeDoc(analyzer, segId, docId, text, posStore)
          }
        }.toDS()
        val parts = if (cfg.buildPartitions > 0) cfg.buildPartitions else numSegments
        rows.repartition(parts, $"segId")
          .sortWithinPartitions($"segId", $"term", $"docId")
          .mapPartitions { it =>
            writePartitionSegments(it, indexDir, analyzerName, dps, totalDocs, posStore)
          }.collect().toSeq
      }

      val allSegs = (committed ++ metas).sortBy(m => (m.docBase, m.segId))
      val meta = IndexMeta(cfg.analyzer,
        allSegs.map(_.docCount.toLong).sum,
        allSegs.map(_.sumDocLength).sum,
        cfg.storePositions,
        allSegs)
      IndexMetaIO.writeCommit(cfg.indexDir, meta)
      BuildReport(numDocs, numSegments, metas.size, committed.size, meta)
    }
  }

  /** Binary search over sorted, non-overlapping [start, end) ranges. */
  private[graft] def inRanges(ranges: Array[(Long, Long)], id: Long): Boolean = {
    var lo = 0
    var hi = ranges.length - 1
    while (lo <= hi) {
      val mid = (lo + hi) >>> 1
      val (s, e) = ranges(mid)
      if (id < s) hi = mid - 1
      else if (id >= e) lo = mid + 1
      else return true
    }
    false
  }

  /** Analyze one doc into posting rows + the doc-length sentinel row.
    * Position counter follows the reference: starts at -1, advances by each
    * token's positionIncrement (DocInverterPerField.cpp:119-176); doc length
    * counts emitted tokens only (FieldInvertState length semantics). */
  def tokenizeDoc(analyzer: Analyzer, segId: Int, docId: Long, text: String,
      storePositions: Boolean, storePayloads: Boolean = false): Iterator[PostingRow] = {
    val tf = new java.util.HashMap[String, scala.collection.mutable.ArrayBuffer[Int]]()
    val pf: java.util.HashMap[String, scala.collection.mutable.ArrayBuffer[Array[Byte]]] =
      if (storePayloads) new java.util.HashMap() else null
    var pos = -1
    var length = 0
    val toks = analyzer.analyze(if (text == null) "" else text)
    while (toks.hasNext) {
      val t = toks.next()
      pos += t.posIncr
      length += 1
      var buf = tf.get(t.term)
      if (buf == null) { buf = new scala.collection.mutable.ArrayBuffer[Int](4); tf.put(t.term, buf) }
      buf += pos
      if (storePayloads) {
        var pb = pf.get(t.term)
        if (pb == null) { pb = new scala.collection.mutable.ArrayBuffer[Array[Byte]](4); pf.put(t.term, pb) }
        pb += t.payload
      }
    }
    val out = new scala.collection.mutable.ArrayBuffer[PostingRow](tf.size + 1)
    out += PostingRow(segId, "", docId, 0, Array.emptyIntArray, length)
    val it = tf.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val positions = if (storePositions) e.getValue.toArray else Array.emptyIntArray
      val payloads = if (storePayloads) pf.get(e.getKey).toArray else null
      out += PostingRow(segId, e.getKey, docId, e.getValue.size, positions, 0, payloads)
    }
    out.iterator
  }

  private final class IntBuf(initial: Int = 8) {
    var arr = new Array[Int](initial)
    var n = 0
    def add(v: Int): Unit = {
      if (n == arr.length) arr = java.util.Arrays.copyOf(arr, arr.length * 2)
      arr(n) = v
      n += 1
    }
  }

  private final class TermBuf {
    val docs = new IntBuf(4)
    val freqs = new IntBuf(4)
    var positions: IntBuf = null // lazily created when storing positions
    var payloads: scala.collection.mutable.ArrayBuffer[Array[Byte]] = null
  }

  /** "invert" mode consumer: docs arrive sorted by (segId, docId); invert
    * one segment at a time in memory, then stream term-sorted postings into
    * the shared SegmentWriter (identical bytes to the sort path). */
  private[graft] def invertPartitionSegments(
      it: Iterator[((Int, Long), String)],
      indexDir: String,
      analyzerName: String,
      docsPerSegment: Int,
      numDocs: Long,
      storePositions: Boolean,
      segIdOffset: Int = 0,
      docIdOffset: Long = 0L,
      storeVectors: Boolean = false,
      storePayloads: Boolean = false): Iterator[SegmentMeta] = {
    val analyzer = Analyzer.byName(analyzerName)
    val metas = scala.collection.mutable.ArrayBuffer.empty[SegmentMeta]

    var curSeg = -1
    var docBase = 0L
    var writer: SegmentWriter = null
    var inv: java.util.HashMap[String, TermBuf] = null

    def flushSegment(): Unit = {
      if (writer == null) return
      val terms = inv.keySet.toArray(new Array[String](0))
      // code-point order — the same order the sortshuffle path's UTF8String
      // sort produces (TermOrder scaladoc); java.util.Arrays.sort's natural
      // UTF-16 order would disagree on supplementary-plane terms
      java.util.Arrays.sort(terms, TermOrder.ordering)
      var t = 0
      while (t < terms.length) {
        val tb = inv.get(terms(t))
        var i = 0
        var posOff = 0
        while (i < tb.docs.n) {
          val f = tb.freqs.arr(i)
          val pays =
            if (tb.payloads == null) null
            else tb.payloads.slice(posOff, posOff + f).toArray
          writer.addPosting(terms(t), tb.docs.arr(i), f,
            if (storePositions) tb.positions.arr else Array.emptyIntArray,
            if (storePositions) posOff else 0, pays)
          posOff += f
          i += 1
        }
        t += 1
      }
      metas += writer.finish()
      writer = null
      inv = null
    }

    while (it.hasNext) {
      val ((segId, docId), text) = it.next()
      if (segId != curSeg) {
        flushSegment()
        curSeg = segId
        docBase = docIdOffset + (segId.toLong - segIdOffset) * docsPerSegment
        val docCount = math.min(docsPerSegment.toLong, docIdOffset + numDocs - docBase).toInt
        writer = new SegmentWriter(indexDir, segId, docBase, docCount, analyzerName,
          storePositions, storeVectors, storePayloads)
        inv = new java.util.HashMap[String, TermBuf]()
      }
      val localDoc = (docId - docBase).toInt
      // analyze + per-doc tf directly into the segment inversion; when term
      // vectors are on, also track this doc's own term map for the sidecar
      var pos = -1
      var len = 0
      val docMap: java.util.TreeMap[String, IntBuf] =
        if (storeVectors) new java.util.TreeMap[String, IntBuf]() else null
      val toks = analyzer.analyze(if (text == null) "" else text)
      while (toks.hasNext) {
        val tok = toks.next()
        pos += tok.posIncr
        len += 1
        var tb = inv.get(tok.term)
        if (tb == null) { tb = new TermBuf; inv.put(tok.term, tb) }
        if (tb.docs.n == 0 || tb.docs.arr(tb.docs.n - 1) != localDoc) {
          tb.docs.add(localDoc)
          tb.freqs.add(1)
        } else tb.freqs.arr(tb.freqs.n - 1) += 1
        if (storePositions) {
          if (tb.positions == null) tb.positions = new IntBuf(4)
          tb.positions.add(pos)
        }
        if (storePayloads) {
          if (tb.payloads == null) tb.payloads = new scala.collection.mutable.ArrayBuffer[Array[Byte]](4)
          tb.payloads += tok.payload
        }
        if (storeVectors) {
          var vb = docMap.get(tok.term)
          if (vb == null) { vb = new IntBuf(4); docMap.put(tok.term, vb) }
          vb.add(pos)
        }
      }
      if (storeVectors) {
        val n = docMap.size()
        val terms = new Array[String](n)
        val freqs = new Array[Int](n)
        val positions = new Array[Array[Int]](n)
        val eit = docMap.entrySet().iterator()
        var i = 0
        while (eit.hasNext) {
          val e = eit.next()
          terms(i) = e.getKey
          freqs(i) = e.getValue.n
          positions(i) = java.util.Arrays.copyOf(e.getValue.arr, e.getValue.n)
          i += 1
        }
        writer.addDocVector(localDoc, terms, freqs, positions)
      }
      writer.addDocLength(localDoc, len)
    }
    flushSegment()
    metas.iterator
  }

  /** Consume one sorted partition, writing a segment per segId run. */
  private def writePartitionSegments(
      it: Iterator[PostingRow],
      indexDir: String,
      analyzerName: String,
      docsPerSegment: Int,
      numDocs: Long,
      storePositions: Boolean): Iterator[SegmentMeta] = {
    val metas = scala.collection.mutable.ArrayBuffer.empty[SegmentMeta]
    var writer: SegmentWriter = null
    var curSeg = -1
    var docBase = 0L
    while (it.hasNext) {
      val r = it.next()
      if (r.segId != curSeg) {
        if (writer != null) metas += writer.finish()
        curSeg = r.segId
        docBase = curSeg.toLong * docsPerSegment
        val docCount = math.min(docsPerSegment.toLong, numDocs - docBase).toInt
        writer = new SegmentWriter(indexDir, curSeg, docBase, docCount,
          analyzerName, storePositions)
      }
      val localDoc = (r.docId - docBase).toInt
      if (r.term.isEmpty) writer.addDocLength(localDoc, r.dl)
      else writer.addPosting(r.term, localDoc, r.freq, r.positions)
    }
    if (writer != null) metas += writer.finish()
    metas.iterator
  }
}
