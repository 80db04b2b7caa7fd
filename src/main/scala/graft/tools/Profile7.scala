package graft.tools

import org.apache.spark.sql.SparkSession

import graft.index.{IndexBuilder, IndexConfig}
import graft.score.BM25
import graft.search.{BoolQ, IndexSearcher, Query, TermQ}

/** Segment-size query-cost probe: same corpus as one 480k-doc segment vs
  * 118 4k-doc segments, batch-queried single-core so the ratio isolates
  * per-segment advance/skip efficiency (not task parallelism). */
object Profile7 {
  def main(args: Array[String]): Unit = {
    val docs = 480000L
    val base = "/dev/shm/graft-spark"
    new java.io.File(base).mkdirs()
    val work = java.nio.file.Files.createTempDirectory(java.nio.file.Paths.get(base), "p7").toString

    def sess(c: Int) = {
      val s = SparkSession.builder().master(s"local[$c]")
        .config("spark.sql.shuffle.partitions", c.toString)
        .config("spark.serializer", "org.apache.spark.serializer.KryoSerializer")
        .config("spark.local.dir", base)
        .config("spark.ui.enabled", "false").getOrCreate()
      s.sparkContext.setLogLevel("WARN"); s
    }

    locally {
      val s = sess(32)
      graft.corpus.SyntheticCorpus.generate(s, docs, 42, 400, 50000)
        .write.mode("overwrite").parquet(s"$work/pages")
      IndexBuilder.build(s, s.read.parquet(s"$work/pages"),
        IndexConfig(s"$work/idx-small", docsPerSegment = 4096,
          storePositions = false, writeDocMap = false))
      IndexBuilder.build(s, s.read.parquet(s"$work/pages"),
        IndexConfig(s"$work/idx-big", docsPerSegment = 1 << 20,
          storePositions = false, writeDocMap = false))
      s.stop()
    }

    val spark = sess(1)
    val rnd = new scala.util.Random(42)
    def zipfTerm(): String = "w" + math.min(49999, math.pow(50000.0, rnd.nextDouble()).toInt)
    def rareTerm(): String = "w" + (5000 + rnd.nextInt(40000))
    val batch: Seq[(String, Query)] = (1 to 64).map { i =>
      s"q$i" -> (i % 2 match {
        case 0 => BoolQ(should = Seq.fill(2 + rnd.nextInt(3))(TermQ(zipfTerm())))
        case _ => BoolQ(should = Seq(TermQ(rareTerm()), TermQ(zipfTerm()), TermQ(zipfTerm())))
      })
    }
    def t(f: => Unit): Double = { val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9 }
    for (label <- Seq("idx-small", "idx-big"); wand <- Seq(true, false)) {
      val sr = new IndexSearcher(spark, s"$work/$label")
      sr.searchBatch(batch.take(4), 10, BM25(), useWand = wand) // warm
      val secs = (1 to 3).map(_ => t(sr.searchBatch(batch, 10, BM25(), useWand = wand))).min
      println(f"[p7] $label wand=$wand: ${batch.size / secs}%.1f q/s (segments=${sr.meta.segments.size})")
    }
    spark.stop()
  }
}
