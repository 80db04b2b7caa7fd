package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.storage.StorageLevel

import graft.analysis.Analyzer
import graft.corpus.SyntheticCorpus
import graft.index.{IndexBuilder, IndexConfig}

/** Ad-hoc phase profiler for the index build (not part of the contract). */
object Profile {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val docs = sys.env.getOrElse("SPARK_GRAFT_BENCH_DOCS", "60000").toLong
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val a = f
      println(f"[profile] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s"); a
    }

    val work = java.nio.file.Files.createTempDirectory("graft-prof").toString
    t("gen+write corpus") {
      SyntheticCorpus.generate(spark, docs, seed = 42, avgLen = 120, vocab = 50000)
        .write.mode("overwrite").parquet(s"$work/pages")
    }
    val corpus = spark.read.parquet(s"$work/pages")

    val sorted = t("sort+zipWithIndex+persist+count") {
      val s = corpus.select($"url", $"text").as[(String, String)]
        .orderBy($"url").rdd.zipWithIndex()
        .map { case ((url, text), id) => (id, url, text) }
        .persist(StorageLevel.MEMORY_AND_DISK_SER)
      s.count(); s
    }

    val analyzer = Analyzer.byName("standard")
    t("tokenize only (count rows)") {
      println("rows=" + sorted.mapPartitions(_.flatMap { case (docId, _, text) =>
        IndexBuilder.tokenizeDoc(analyzer, (docId / 4096).toInt, docId, text, false)
      }).count())
    }
    val rows = sorted.mapPartitions(_.flatMap { case (docId, _, text) =>
      IndexBuilder.tokenizeDoc(analyzer, (docId / 4096).toInt, docId, text, false)
    }).toDS()
    t("shuffle+sort+count") {
      println("rows=" + rows.repartition(cpus, $"segId")
        .sortWithinPartitions($"segId", $"term", $"docId").count())
    }
    t("full build") {
      IndexBuilder.build(spark, corpus, IndexConfig(s"$work/idx",
        docsPerSegment = 1024, storePositions = false, writeDocMap = false))
    }
    spark.stop()
  }
}
