package graft.tools

import org.apache.spark.sql.SparkSession

import graft.index.{IndexBuilder, IndexConfig}
import graft.score.BM25
import graft.search.{BoolQ, IndexSearcher, Query, TermQ}

/** Consolidated ad-hoc profiler (not part of the driver contract).
  *
  * Modes (first arg):
  *  - `scaling`: interleaved low/high-core builds, min per level, scaling
  *    efficiency (P5_LEVELS, P5_ROUNDS env)
  *  - `phases`:  per-phase timing of the build pipeline's jobs at each
  *    level in P6_LEVELS
  *  - `segsize`: query cost of one big segment vs many 4k-doc segments,
  *    single core (isolates advance/skip efficiency from parallelism)
  * See also: QueryProfile (raw WAND-vs-exhaustive scorer loop),
  * IsolationBench (executor-interference experiment), TokBench
  * (analyzer throughput).
  */
object Profile {
  def main(args: Array[String]): Unit = args.headOption.getOrElse("scaling") match {
    case "scaling" => scaling()
    case "phases" => phases()
    case "segsize" => segsize()
    case other =>
      System.err.println(s"unknown mode '$other' (scaling|phases|segsize)")
      sys.exit(2)
  }

  private def scaling(): Unit = {

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

  private def phases(): Unit = {

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

  private def segsize(): Unit = {

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
