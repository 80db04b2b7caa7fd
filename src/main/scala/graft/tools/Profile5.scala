package graft.tools

import org.apache.spark.sql.SparkSession

import graft.index.{IndexBuilder, IndexConfig}

/** Scaling probe for the persist-free build: interleaved 2/8-core builds
  * with per-phase job timing (not part of the contract). */
object Profile5 {
  def main(args: Array[String]): Unit = {
    val docs = sys.env.getOrElse("SPARK_GRAFT_BENCH_DOCS", "480000").toLong
    val base = "/dev/shm/graft-spark"
    new java.io.File(base).mkdirs()
    val work = java.nio.file.Files.createTempDirectory(java.nio.file.Paths.get(base), "p5").toString

    def sess(c: Int) = {
      val s = SparkSession.builder().master(s"local[$c]")
        .appName(s"p5-$c")
        .config("spark.sql.shuffle.partitions", c.toString)
        .config("spark.serializer", "org.apache.spark.serializer.KryoSerializer")
        .config("spark.local.dir", base)
        .config("spark.ui.enabled", "false").getOrCreate()
      s.sparkContext.setLogLevel("WARN"); s
    }

    def gcMillis: Long = {
      import scala.jdk.CollectionConverters._
      java.lang.management.ManagementFactory.getGarbageCollectorMXBeans.asScala
        .map(_.getCollectionTime).sum
    }

    def t[A](n: String)(f: => A): (A, Double) = {
      val g0 = gcMillis
      val t0 = System.nanoTime(); val a = f
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"[p5] $n: $sec%.2f s (gc ${(gcMillis - g0) / 1000.0}%.2f s)"); (a, sec)
    }

    locally {
      val s = sess(32)
      graft.corpus.SyntheticCorpus.generate(s, docs, 42, 400, 50000)
        .write.mode("overwrite").parquet(s"$work/pages")
      IndexBuilder.build(s, s.read.parquet(s"$work/pages").limit(60000),
        IndexConfig(s"$work/w", docsPerSegment = 4096, storePositions = false, writeDocMap = false))
      s.stop()
    }

    val levels = sys.env.getOrElse("P5_LEVELS", "2,8").split(",").map(_.trim.toInt).toSeq
    val nRounds = sys.env.getOrElse("P5_ROUNDS", "3").toInt
    var r = 0
    val times = scala.collection.mutable.Map.empty[Int, List[Double]].withDefaultValue(Nil)
    for (round <- 1 to nRounds; c <- levels) {
      r += 1
      val s = sess(c)
      val (_, sec) = t(s"build c=$c round=$round") {
        IndexBuilder.build(s, s.read.parquet(s"$work/pages"),
          IndexConfig(s"$work/idx-$r", docsPerSegment = 4096,
            storePositions = false, writeDocMap = false))
      }
      times(c) = sec :: times(c)
      s.stop()
    }
    val lo = times(levels.head).min
    val hi = times(levels.last).min
    val ratio = levels.last.toDouble / levels.head
    println(f"[p5] min c=${levels.head}: $lo%.2f  min c=${levels.last}: $hi%.2f  " +
      f"eff=${(docs / hi) / (docs / lo) / ratio}%.3f")
  }
}
