package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.index.{IndexBuilder, IndexConfig, IndexMetaIO}
import graft.score.{BM25Exact, Similarity}
import graft.search.{IndexSearcher, Query}

/** Engine-backed entries for the driver harness: build (once, cached) a
  * real segment index over the `documents` table with the whitespace
  * analyzer, so BM25 scores are reproducible by the DuckDB SQL oracle
  * (BM25Exact: exact doc lengths, double math — scores match the oracle's
  * CTE to 1e-15 and are compared at round(…, 4)). */
object EngineQueries {

  private val searchers = scala.collection.concurrent.TrieMap.empty[String, IndexSearcher]

  /** docIDs: the builder assigns docId = rank of url; urls are zero-padded
    * doc_ids, so engine docId == documents.doc_id. */
  def searcher(spark: SparkSession, sfDir: String): IndexSearcher =
    searchers.getOrElseUpdate(sfDir, {
      val dir = new java.io.File(sys.props("java.io.tmpdir"),
        "graft-index-" + sfDir.replaceAll("[^a-zA-Z0-9.]", "_")).getPath
      def expectedPerSeg(numDocs: Long): Int =
        math.min(15000L, math.max(256L, numDocs / 32)).toInt
      val committed = IndexMetaIO.readLatestWithExtra(dir)
        .filter { case (_, extra) => extra.get("format").contains(IndexMetaIO.FormatVersion) }
        .filter { case (m, _) => // stale segment layout → rebuild
          m.segments.nonEmpty &&
            m.segments.map(_.docCount).max ==
              math.min(expectedPerSeg(m.numDocs).toLong, m.numDocs)
        }
        .filter(_ => new java.io.File(dir, "docmap/_SUCCESS").exists())
      if (committed.isEmpty) {
        // stale or old-format cache: wipe and rebuild
        def rm(f: java.io.File): Unit = {
          if (f.isDirectory) f.listFiles().foreach(rm)
          f.delete()
        }
        if (new java.io.File(dir).exists()) rm(new java.io.File(dir))
        val docs = spark.read.parquet(s"$sfDir/documents.parquet")
        val corpus = docs.select(format_string("%012d", col("doc_id")).as("url"), col("text"))
        // one segment per core once the corpus is big enough (a 60k-doc
        // corpus in 256-doc segments is 234 tiny tasks per query job —
        // pure scheduling overhead); floor of 256 keeps the multi-segment
        // merge path exercised at sf0.001
        val perSeg = expectedPerSeg(docs.count())
        IndexBuilder.build(spark, corpus,
          IndexConfig(dir, analyzer = "whitespace", docsPerSegment = perSeg,
            storePositions = true, writeDocMap = true))
      }
      new IndexSearcher(spark, dir)
    })

  /** Payload-carrying twin of [[searcher]]: the same documents corpus with
    * each token annotated as "tok|p" (p = 1-based token position), indexed
    * through the delimited-payload analyzer. Token positions are
    * SQL-recoverable, so payload scoring gets a real DuckDB oracle. */
  def payloadSearcher(spark: SparkSession, sfDir: String): IndexSearcher =
    searchers.getOrElseUpdate("pay:" + sfDir, {
      val dir = new java.io.File(sys.props("java.io.tmpdir"),
        "graft-index-pay-" + sfDir.replaceAll("[^a-zA-Z0-9.]", "_")).getPath
      def expectedPerSeg(numDocs: Long): Int =
        math.min(15000L, math.max(256L, numDocs / 32)).toInt
      val committed = IndexMetaIO.readLatestWithExtra(dir)
        .filter { case (_, extra) => extra.get("format").contains(IndexMetaIO.FormatVersion) }
        .filter { case (m, _) =>
          m.segments.nonEmpty && m.segments.forall(_.hasPayloads) &&
            m.segments.map(_.docCount).max ==
              math.min(expectedPerSeg(m.numDocs).toLong, m.numDocs)
        }
      if (committed.isEmpty) {
        def rm(f: java.io.File): Unit = {
          if (f.isDirectory) f.listFiles().foreach(rm)
          f.delete()
        }
        if (new java.io.File(dir).exists()) rm(new java.io.File(dir))
        val docs = spark.read.parquet(s"$sfDir/documents.parquet")
        val toks = filter(split(col("text"), " "), t => t =!= "")
        val corpus = docs.select(
          format_string("%012d", col("doc_id")).as("url"),
          array_join(transform(toks,
            (t, i) => concat(t, lit("|"), (i + 1).cast("string"))), " ").as("text"))
        val perSeg = expectedPerSeg(docs.count())
        IndexBuilder.build(spark, corpus,
          IndexConfig(dir, analyzer = "delimited", docsPerSegment = perSeg,
            storePositions = true, writeDocMap = false, storePayloads = true))
      }
      new IndexSearcher(spark, dir)
    })

  /** Top-k through the payload index with float-decoding similarity. */
  def payloadTopK(spark: SparkSession, sfDir: String, q: Query, k: Int): DataFrame =
    toDF(spark, payloadSearcher(spark, sfDir)
      .search(q, k, graft.score.PayloadDecodingSimilarity()))

  /** Stored-field fetch: hits joined back to the (docId, url) map — the
    * "source table IS the doc store" pattern (SURVEY.md §2.1 stored-fields
    * scan = broadcast lookup join). */
  def topKWithUrls(spark: SparkSession, sfDir: String, q: Query, k: Int): DataFrame = {
    val s = searcher(spark, sfDir)
    val hits = toDF(spark, s.search(q, k, BM25Exact()))
    val docmap = spark.read.parquet(s.indexDir + "/docmap")
    hits.join(broadcast(docmap), hits("doc_id") === docmap("docId"))
      .select(hits("doc_id"), docmap("url"), hits("score"))
  }

  private def toDF(spark: SparkSession, hits: Array[graft.search.ScoredDoc]): DataFrame = {
    import spark.implicits._
    hits.map(h => (h.docId, BigDecimal(h.score).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble))
      .toSeq.toDF("doc_id", "score")
  }

  def topK(spark: SparkSession, sfDir: String, q: Query, k: Int,
      sim: Similarity = BM25Exact()): DataFrame = {
    val s = searcher(spark, sfDir)
    toDF(spark, s.search(q, k, sim))
  }

  /** All docs matching — for phrase/span/boolean match sets. Fully
    * distributed: match enumeration happens per segment task and the result
    * stays a DataFrame (IndexSearcher.matchingDocs — no driver collect). */
  def matchingDocs(spark: SparkSession, sfDir: String, q: Query): DataFrame =
    searcher(spark, sfDir).matchingDocs(q)

  /** Parse with metadata-field dispatch (`lang:en`, `source:src3`), run the
    * engine part as a distributed match set, and apply the metadata
    * predicates as Catalyst semi/anti-joins on the source table — the
    * single-field engine's field-dispatch semantics: index queries score,
    * metadata fields filter. Both sides stay distributed (the filter side
    * is a broadcastable narrow projection). */
  def parsedFieldMatch(spark: SparkSession, sfDir: String, raw: String): DataFrame = {
    val parsed = graft.search.QueryParser.parse(raw,
      graft.analysis.WhitespaceAnalyzer, metaFields = Set("lang", "source", "url"))
    val (engineQ, metaMust, metaNot) = Query.splitMetaFilters(parsed)
    var hits = matchingDocs(spark, sfDir, engineQ)
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    def pred(ms: Seq[graft.search.MetaFieldQ]) =
      ms.map(m => col(m.field) === lit(m.value)).reduce(_ && _)
    if (metaMust.nonEmpty)
      hits = hits.join(docs.filter(pred(metaMust)).select(col("doc_id")), "doc_id", "left_semi")
    if (metaNot.nonEmpty)
      hits = hits.join(docs.filter(pred(metaNot)).select(col("doc_id")), "doc_id", "left_anti")
    hits
  }
}
