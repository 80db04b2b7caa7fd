package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ExplainMode

import graft.{EngineQueries, SparkEntry}

/** Optimization-round helper bench (guide §1): times INDIVIDUAL battery
  * entries with the frozen Bench methodology (same session config, same
  * `.count()` action, min over interleaved rounds after a warm round) and
  * dumps each entry's `.explain("formatted")` to plans/<tag>/<name>_<suffix>.txt
  * so plan-shape claims are committable evidence. This main is ADDITIVE —
  * `graft.Bench` itself is frozen for measurement.
  *
  * Usage: runMain graft.tools.BenchExtra <suffix> [query names...]
  *   suffix  e.g. "before" / "after" — appended to plan file names
  *   names   battery entries to run; empty = all
  * Env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS, SPARK_GRAFT_ROUNDS (default 3),
  *      SPARK_GRAFT_PLANS_DIR (default plans/r06; "skip" disables dumps). */
object BenchExtra {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val rounds = sys.env.getOrElse("SPARK_GRAFT_ROUNDS", "3").toInt
    val plansDir = sys.env.getOrElse("SPARK_GRAFT_PLANS_DIR", "plans/r06")
    val suffix = args.headOption.getOrElse("now")
    val wanted = args.drop(1).toSet

    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-bench-extra")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.serializer", "org.apache.spark.serializer.KryoSerializer")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }

    // same warm-up the frozen battery does
    EngineQueries.searcher(spark, sfDir)

    val battery = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => wanted.isEmpty || wanted.contains(n) }

    if (plansDir != "skip") new java.io.File(plansDir).mkdirs()

    // warm round first (round-1 semantics of the frozen battery), then
    // `rounds` timed rounds interleaved across entries, min per entry
    val all = scala.collection.mutable.LinkedHashMap.empty[String, Double]
    battery.foreach { case (name, fn) =>
      spark.sparkContext.setJobDescription(s"warm:$name")
      try fn(spark, sfDir).count() catch { case _: Throwable => () }
    }
    (1 to rounds).foreach { r =>
      battery.foreach { case (name, fn) =>
        spark.sparkContext.setJobDescription(s"r$r:$name")
        val sec = time { try fn(spark, sfDir).count() catch { case _: Throwable => () } }
        all(name) = all.get(name).fold(sec)(math.min(_, sec))
      }
    }
    spark.sparkContext.setJobDescription(null)

    if (plansDir != "skip") battery.foreach { case (name, fn) =>
      try {
        val df = fn(spark, sfDir)
        val txt = df.queryExecution.explainString(ExplainMode.fromString("formatted"))
        java.nio.file.Files.write(
          java.nio.file.Paths.get(s"$plansDir/${name}_$suffix.txt"),
          txt.getBytes("UTF-8"))
      } catch { case e: Throwable =>
        System.err.println(s"plan dump failed for $name: ${e.getMessage}")
      }
    }

    val total = all.values.sum
    println(all.map { case (k, v) => f""""$k":$v%.3f""" }
      .mkString(f"""{"metric":"extra","value":$total%.3f,"unit":"sec","queries":{""", ",", "}}"))
    spark.stop()
  }
}
