package graft

import java.io.File
import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.corpus.SyntheticCorpus
import graft.index._
import graft.score.BM25
import graft.search._

class SparkIndexSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  private def tmpDir(): String = Files.createTempDirectory("graft-spark").toString

  private val N = 500
  private lazy val corpus = SyntheticCorpus.generate(spark, N, seed = 11, avgLen = 50, vocab = 400)
  // brute-force twin: docId = rank in url order (the builder's contract)
  private lazy val bfDocs = {
    val pages = SyntheticCorpus.localPages(N, seed = 11, avgLen = 50, vocab = 400)
      .sortBy(_.url)
    BruteForce.analyzeCorpus(graft.analysis.StandardAnalyzer(),
      pages.zipWithIndex.map { case (p, i) => (i.toLong, p.text) })
  }

  private def fileHashes(dir: String): Map[String, Long] = {
    def walk(f: File): Seq[File] =
      if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
    walk(new File(dir))
      .filter(f => f.getName.endsWith(".bin") || f.getName.endsWith(".idx"))
      .map { f =>
        val bytes = Files.readAllBytes(f.toPath)
        val rel = f.getPath.stripPrefix(dir)
        rel -> java.util.Arrays.hashCode(bytes).toLong
      }.toMap
  }

  test("distributed build + distributed search == brute force") {
    val dir = tmpDir()
    val report = IndexBuilder.build(spark, corpus,
      IndexConfig(dir, docsPerSegment = 64, writeDocMap = false))
    assert(report.numDocs == N)
    assert(report.builtSegments == 8)

    val searcher = new IndexSearcher(spark, dir)
    assert(searcher.meta.numDocs == N)

    val queries: Seq[(String, Query)] = Seq(
      "t1" -> TermQ("w3"),
      "or" -> BoolQ(should = Seq(TermQ("w1"), TermQ("w7"), TermQ("w31"))),
      "and" -> BoolQ(must = Seq(TermQ("w2"), TermQ("w5"))),
      "not" -> BoolQ(must = Seq(TermQ("w1")), mustNot = Seq(TermQ("w9"))),
      // multi-term nodes distributed-expanded, incl. inside a filter
      "prefix" -> PrefixQ("w1", constantScore = false),
      "filtered" -> FilteredQ(TermQ("w2"), TermRangeQ(Some("w1"), Some("w4"))))
    val got = searcher.searchBatch(queries, 10, BM25())
    queries.foreach { case (id, q) =>
      val spec = BruteForce.search(bfDocs, q, 10, BM25())
      assert(got(id).toSeq == spec.toSeq, s"query $id")
    }
  }

  test("distributed merge path (>256 segments) matches driver merge and spec") {
    val dir = tmpDir()
    // 500 single-doc segments force the reduceByKey top-k merge
    IndexBuilder.build(spark, corpus, IndexConfig(dir, docsPerSegment = 1, writeDocMap = false))
    val searcher = new IndexSearcher(spark, dir)
    assert(searcher.meta.segments.size == N)
    val queries: Seq[(String, Query)] = Seq(
      "t" -> TermQ("w3"),
      "or" -> BoolQ(should = Seq(TermQ("w1"), TermQ("w7"), TermQ("w31"))))
    val got = searcher.searchBatch(queries, 10, BM25())
    queries.foreach { case (id, q) =>
      val spec = BruteForce.search(bfDocs, q, 10, BM25())
      assert(got(id).toSeq == spec.toSeq, s"query $id")
    }
  }

  test("build output is byte-identical across shuffle partitioning AND build modes") {
    val d4 = tmpDir(); val d8 = tmpDir(); val ds = tmpDir()
    IndexBuilder.build(spark, corpus, IndexConfig(d4, docsPerSegment = 64,
      buildPartitions = 2, writeDocMap = false))
    IndexBuilder.build(spark, corpus, IndexConfig(d8, docsPerSegment = 64,
      buildPartitions = 8, writeDocMap = false))
    IndexBuilder.build(spark, corpus, IndexConfig(ds, docsPerSegment = 64,
      buildPartitions = 8, writeDocMap = false, buildMode = "sortshuffle"))
    val h4 = fileHashes(d4)
    val h8 = fileHashes(d8)
    val hs = fileHashes(ds)
    assert(h4.nonEmpty && h4 == h8)
    assert(h4 == hs, "invert and sortshuffle modes must write identical segments")
  }

  test("resume: killed build restarts from committed segments only") {
    val full = tmpDir(); val resumed = tmpDir()
    IndexBuilder.build(spark, corpus, IndexConfig(full, docsPerSegment = 64, writeDocMap = false))

    // simulate a partial run: build, then delete 3 segments + snapshot
    IndexBuilder.build(spark, corpus, IndexConfig(resumed, docsPerSegment = 64, writeDocMap = false))
    Seq(1, 4, 7).foreach { s =>
      val f = new File(resumed, SegmentFormat.segDirName(s))
      f.listFiles().foreach(_.delete()); f.delete()
    }
    new File(resumed, "commits").listFiles().foreach(_.delete())

    val report = IndexBuilder.build(spark, corpus, IndexConfig(resumed, docsPerSegment = 64, writeDocMap = false))
    assert(report.resumedSegments == 5, report)
    assert(report.builtSegments == 3, report)
    assert(fileHashes(full) == fileHashes(resumed))

    // the resumed index answers queries identically
    val a = new IndexSearcher(spark, full).search(TermQ("w2"), 10, BM25())
    val b = new IndexSearcher(spark, resumed).search(TermQ("w2"), 10, BM25())
    assert(a.toSeq == b.toSeq)
  }

  test("supplementary-plane terms: invert and sortshuffle builds agree on order") {
    import spark.implicits._
    val sup1 = new String(Character.toChars(0x10000))
    val sup2 = new String(Character.toChars(0x1D11E))
    val texts = Seq(s"alpha $sup1 common", s"\uFFFB zeta common", s"$sup2 \uE000 common",
      "plain common words")
    val df = texts.zipWithIndex
      .map { case (t, i) => (f"u$i%04d", t) }.toDF("url", "text")
    def termsOf(dir: String): Seq[String] = {
      val meta = IndexMetaIO.readLatest(dir).get
      meta.segments.flatMap { m =>
        val r = new SegmentReader(new File(dir, SegmentFormat.segDirName(m.segId)))
        val ts = r.allTerms.map(_.term).toSeq
        assert(ts == ts.sorted(TermOrder.ordering), s"dict order in $dir: $ts")
        ts
      }
    }
    val d1 = tmpDir(); val d2 = tmpDir()
    IndexBuilder.build(spark, df, IndexConfig(d1, analyzer = "whitespace",
      docsPerSegment = 2, writeDocMap = false, buildMode = "invert"))
    IndexBuilder.build(spark, df, IndexConfig(d2, analyzer = "whitespace",
      docsPerSegment = 2, writeDocMap = false, buildMode = "sortshuffle"))
    assert(termsOf(d1) == termsOf(d2))
    // both searchable across the surrogate boundary
    Seq(d1, d2).foreach { d =>
      val s2 = new IndexSearcher(spark, d)
      val hits = s2.search(TermRangeQ(Some("\uFFFB"), None,
        includeLower = true, includeUpper = true), 10, BM25())
      assert(hits.map(_.docId).toSet == Set(0L, 1L, 2L), s"$d: ${hits.toSeq}")
    }
  }
}
