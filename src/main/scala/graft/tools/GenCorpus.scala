package graft.tools

import org.apache.spark.sql.SparkSession

import graft.corpus.SyntheticCorpus

/** Write a deterministic synthetic webtext corpus to parquet — the
  * standalone twin of the corpus Bench generates inline, for isolating
  * build-throughput measurements (tools.BuildOnce) from the bench
  * harness. args: outPath numDocs [seed] [avgLen] [vocab]. */
object GenCorpus {
  def main(args: Array[String]): Unit = {
    val out = args(0)
    val numDocs = args(1).toLong
    val seed = if (args.length > 2) args(2).toLong else 43L
    val avgLen = if (args.length > 3) args(3).toInt else 400
    val vocab = if (args.length > 4) args(4).toInt else 50000
    val s = SparkSession.builder()
      .master(s"local[${Runtime.getRuntime.availableProcessors()}]")
      .appName("graft-gencorpus")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    SyntheticCorpus.generate(s, numDocs, seed = seed, avgLen = avgLen, vocab = vocab)
      .write.mode("overwrite").parquet(out)
    println(s"[gencorpus] wrote $numDocs docs to $out")
    s.stop()
  }
}
