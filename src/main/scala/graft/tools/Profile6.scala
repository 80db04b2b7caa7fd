package graft.tools

import org.apache.spark.sql.SparkSession

import graft.index.{IndexBuilder, IndexConfig}

/** Per-phase timing of the build pipeline at one parallelism level
  * (replicates IndexBuilder.build's jobs; not part of the contract). */
object Profile6 {
  def main(args: Array[String]): Unit = {
    val docs = sys.env.getOrElse("SPARK_GRAFT_BENCH_DOCS", "480000").toLong
    val base = "/dev/shm/graft-spark"
    new java.io.File(base).mkdirs()
    val work = java.nio.file.Files.createTempDirectory(java.nio.file.Paths.get(base), "p6").toString

    def sess(c: Int) = {
      val s = SparkSession.builder().master(s"local[$c]")
        .appName(s"p6-$c")
        .config("spark.sql.shuffle.partitions", c.toString)
        .config("spark.serializer", "org.apache.spark.serializer.KryoSerializer")
        .config("spark.local.dir", base)
        .config("spark.ui.enabled", "false").getOrCreate()
      s.sparkContext.setLogLevel("WARN"); s
    }

    def t[A](n: String)(f: => A): A = {
      val t0 = System.nanoTime(); val a = f
      println(f"[p6] $n: ${(System.nanoTime() - t0) / 1e9}%.2f s"); a
    }

    locally {
      val s = sess(32)
      graft.corpus.SyntheticCorpus.generate(s, docs, 42, 400, 50000)
        .write.mode("overwrite").parquet(s"$work/pages")
      IndexBuilder.build(s, s.read.parquet(s"$work/pages").limit(60000),
        IndexConfig(s"$work/w", docsPerSegment = 4096, storePositions = false, writeDocMap = false))
      s.stop()
    }

    val levels = sys.env.getOrElse("P6_LEVELS", "8,32,8,32").split(",").map(_.trim.toInt).toSeq
    for ((c, li) <- levels.zipWithIndex) {
      val s = sess(c)
      import s.implicits._
      val corpus = s.read.parquet(s"$work/pages")
      println(s"[p6] ==== level c=$c ====")
      val sortedUrls = corpus.select($"url").as[String].orderBy($"url").rdd
      val partCounts = t(s"c=$c urls sort+count") {
        sortedUrls.mapPartitionsWithIndex { (i, it) =>
          var n = 0L; while (it.hasNext) { it.next(); n += 1 }; Iterator((i, n))
        }.collect().sortBy(_._1).map(_._2)
      }
      val offsets = partCounts.scanLeft(0L)(_ + _)
      val idsDF = sortedUrls.mapPartitionsWithIndex { (i, it) =>
        var id = offsets(i) - 1
        it.map { url => id += 1; (url, id) }
      }.toDF("url", "docId")
      val sorted = corpus.select($"url", $"text")
        .join(idsDF.hint("shuffle_hash"), Seq("url"))
        .select($"docId", $"url", $"text").as[(Long, String, String)].rdd
      val dps = 4096
      val numSegments = ((docs + dps - 1) / dps).toInt
      val parts = math.min(numSegments, 4 * s.sparkContext.defaultParallelism)
      val partitioner = new org.apache.spark.Partitioner {
        override def numPartitions: Int = parts
        override def getPartition(key: Any): Int = {
          val m = key.asInstanceOf[(Int, Long)]._1 % parts
          if (m < 0) m + parts else m
        }
      }
      val shuffled = t(s"c=$c join+pairshuffle (count)") {
        sorted.map { case (d, _, text) => ((IndexBuilder.segIdOf(d, dps), d), text) }
          .repartitionAndSortWithinPartitions(partitioner)
          .mapPartitions(it => Iterator(it.size))
          .collect().sum
      }
      require(shuffled == docs, s"$shuffled")
      // full build for reference
      t(s"c=$c full build") {
        IndexBuilder.build(s, corpus, IndexConfig(s"$work/idx-$c-$li",
          docsPerSegment = dps, storePositions = false, writeDocMap = false))
      }
      s.stop()
    }
  }
}
