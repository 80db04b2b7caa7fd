package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.score.BM25
import graft.search.{IndexSearcher, TermQ}
import graft.streaming.StreamingIndexer

class StreamingSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-stream-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  test("appendBatch grows the index; snapshots stay queryable") {
    val dir = Files.createTempDirectory("graft-stream").toString
    val b1 = Seq(("u1", "spark streaming index"), ("u2", "batch append")).toDF("url", "text")
    val b2 = Seq(("u3", "more spark docs"), ("u4", "spark again")).toDF("url", "text")

    val m1 = StreamingIndexer.appendBatch(spark, b1, dir, docsPerSegment = 2, batchId = 0)
    assert(m1.numDocs == 2)
    val m2 = StreamingIndexer.appendBatch(spark, b2, dir, docsPerSegment = 2, batchId = 1)
    assert(m2.numDocs == 4)
    assert(m2.segments.map(_.segId) == Seq(0, 1))
    // replayed batch is a no-op
    val m3 = StreamingIndexer.appendBatch(spark, b2, dir, docsPerSegment = 2, batchId = 1)
    assert(m3.numDocs == 4)

    val hits = new IndexSearcher(spark, dir).search(TermQ("spark"), 10, BM25())
    assert(hits.length == 3)
    assert(hits.map(_.docId).toSet == Set(0L, 2L, 3L))
  }

  test("foreachBatch streaming ingestion end-to-end") {
    val dir = Files.createTempDirectory("graft-stream2").toString
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(String, String)]
    val q = StreamingIndexer.start(spark, mem.toDF().toDF("url", "text"), dir,
      docsPerSegment = 4)
    try {
      mem.addData(("a1", "hello stream"), ("a2", "hello again"))
      q.processAllAvailable()
      mem.addData(("a3", "hello third"))
      q.processAllAvailable()
      val hits = new IndexSearcher(spark, dir).search(TermQ("hello"), 10, BM25())
      assert(hits.length == 3)
    } finally q.stop()
  }
}
