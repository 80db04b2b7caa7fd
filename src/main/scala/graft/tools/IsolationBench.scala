package graft.tools

import org.apache.spark.sql.SparkSession

import graft.index.{IndexBuilder, IndexConfig}

/** Executor-isolation experiment (standalone on purpose — see BASELINE.md):
  * one index build in a JVM pinned to cores 0-7, then two concurrent builds
  * in JVMs pinned to DISJOINT 8-core sets (0-7 and 8-15). The ratio
  * solo/concurrent is the weak-scaling efficiency across real separate
  * executor processes; on clean-state runs it measures ~0.90 (interference
  * ~1.1x), evidencing that the in-JVM local[8]→local[32] shortfall is the
  * shared box, not the engine. Run it on a QUIET box: this VM's DAMON/
  * kcompactd proactive reclaim intermittently stalls all allocation 2-10x
  * when large resident JVMs are present (see BASELINE.md environment note).
  */
object IsolationBench {
  def main(args: Array[String]): Unit = {
    val docs = sys.env.getOrElse("SPARK_GRAFT_BENCH_DOCS", "480000").toLong
    val base = "/dev/shm/graft-spark"
    new java.io.File(base).mkdirs()
    val work = java.nio.file.Files.createTempDirectory(java.nio.file.Paths.get(base), "iso").toString

    locally {
      val s = SparkSession.builder().master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.serializer", "org.apache.spark.serializer.KryoSerializer")
        .config("spark.local.dir", base)
        .config("spark.ui.enabled", "false").getOrCreate()
      s.sparkContext.setLogLevel("WARN")
      graft.corpus.SyntheticCorpus.generate(s, docs, 42, 400, 50000)
        .write.mode("overwrite").parquet(s"$work/pages")
      s.stop()
    }

    val javaBin = sys.props("java.home") + "/bin/java"
    val cp = sys.props("java.class.path")
    val opens = java.lang.management.ManagementFactory.getRuntimeMXBean
      .getInputArguments.toArray.map(_.toString)
      .filter(a => a.startsWith("--add-opens") || a.startsWith("--add-exports"))

    def spawn(cores: String, idx: String): Process = {
      val cmd = Seq("taskset", "-c", cores, javaBin) ++ opens ++ Seq(
        "-Xmx4g", "-XX:ReservedCodeCacheSize=512m",
        "-cp", cp, "graft.tools.BuildOnce",
        s"$work/pages", s"$work/$idx", "8", base)
      new ProcessBuilder(cmd: _*).redirectErrorStream(true).start()
    }
    def measure(p: Process): Double = {
      val out = scala.io.Source.fromInputStream(p.getInputStream).getLines()
        .find(_.startsWith("[buildonce] "))
      p.waitFor()
      out.map(_.stripPrefix("[buildonce] ").trim.toDouble).getOrElse(Double.NaN)
    }

    val iters = sys.env.getOrElse("ISO_ITERS", "3").toInt
    val results = (1 to iters).map { r =>
      val solo = measure(spawn("0-7", s"solo-$r"))
      val pa = spawn("0-7", s"a-$r")
      val pb = spawn("8-15", s"b-$r")
      val conc = math.max(measure(pa), measure(pb))
      println(f"[iso] iter=$r solo=$solo%.2f concurrent=$conc%.2f")
      (solo, conc)
    }
    val solo = results.map(_._1).min
    val conc = results.map(_._2).min
    println(f"[iso] min solo=$solo%.2f min concurrent=$conc%.2f " +
      f"interference=${conc / solo}%.2f executor_weak_scaling=${solo / conc}%.2f")
  }
}
