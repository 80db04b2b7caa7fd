package graft.tools

import org.apache.spark.sql.SparkSession

import graft.index.{IndexBuilder, IndexConfig}

/** One measured index build in a fresh JVM — the unit of Bench's
  * bus-contention isolation experiment. args: corpusPath indexDir cpus
  * localDir [warmupDocs] [docsPerSegment]. Prints `[buildonce] <seconds>`
  * after a JIT warm-up build. */
object BuildOnce {
  def main(args: Array[String]): Unit = {
    val Array(corpusPath, indexDir, cpusS, localDir) = args.take(4)
    val cpus = cpusS.toInt
    val warmupDocs = if (args.length > 4) args(4).toInt else 60000
    val perSeg = if (args.length > 5) args(5).toInt else 4096
    val s = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName(s"graft-buildonce-$cpus")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.serializer", "org.apache.spark.serializer.KryoSerializer")
      .config("spark.local.dir", localDir)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    val corpus = s.read.parquet(corpusPath)
    val w0 = System.nanoTime()
    IndexBuilder.build(s, corpus.limit(warmupDocs),
      IndexConfig(s"$indexDir-warmup", docsPerSegment = 4096,
        storePositions = false, writeDocMap = false))
    println(f"[buildonce-warmup] ${(System.nanoTime() - w0) / 1e9}%.3f")
    val t0 = System.nanoTime()
    IndexBuilder.build(s, corpus,
      IndexConfig(indexDir, docsPerSegment = perSeg,
        storePositions = false, writeDocMap = false))
    println(f"[buildonce] ${(System.nanoTime() - t0) / 1e9}%.3f")
    s.stop()
  }
}
