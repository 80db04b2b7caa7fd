package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.storage.StorageLevel
import graft.index.IndexBuilder
object Profile3 {
  def main(args: Array[String]): Unit = {
    val docs = 240000L
    val work = java.nio.file.Files.createTempDirectory("graft-p3").toString
    val s = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    import s.implicits._
    graft.corpus.SyntheticCorpus.generate(s, docs, 42, 120, 50000)
      .write.mode("overwrite").parquet(s"$work/pages")
    def t[A](n: String)(f: => A): A = { val t0=System.nanoTime(); val a=f; println(f"[p3] $n: ${(System.nanoTime()-t0)/1e9}%.2f s"); a }
    for (round <- 1 to 3) {
      val corpus = s.read.parquet(s"$work/pages")
      val base = t(s"r$round sort+persist+count") {
        val b = corpus.select($"url", $"text").as[(String,String)].orderBy($"url").rdd
          .persist(StorageLevel.MEMORY_AND_DISK_SER)
        b.count(); b
      }
      val sorted = base.zipWithIndex().map { case ((u,x),id) => (id,u,x) }
      t(s"r$round zip+map+count") { sorted.count() }
      val parts = 128
      val part = new org.apache.spark.Partitioner {
        def numPartitions = parts
        def getPartition(key: Any) = { val k=key.asInstanceOf[(Int,Long)]._1 % parts; if (k<0) k+parts else k }
      }
      t(s"r$round repart+sort+invert") {
        val metas = sorted.map { case (id,_,x) => ((IndexBuilder.segIdOf(id, 2048), id), x) }
          .repartitionAndSortWithinPartitions(part)
          .mapPartitions { it =>
            // tokenize-only consume (no file writes) to isolate compute
            var n = 0L
            val an = graft.analysis.StandardAnalyzer()
            it.foreach { case (_, text) => val t2 = an.analyze(text); while (t2.hasNext) { t2.next(); n += 1 } }
            Iterator(n)
          }.sum()
      }
      base.unpersist()
    }
    s.stop()
  }
}
