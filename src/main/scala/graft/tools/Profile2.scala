package graft.tools
import org.apache.spark.sql.SparkSession
import graft.index.{IndexBuilder, IndexConfig}
object Profile2 {
  def main(args: Array[String]): Unit = {
    val docs = 240000L
    val work = java.nio.file.Files.createTempDirectory("graft-p2").toString
    def sess(c: Int) = {
      val s = SparkSession.builder().master(s"local[$c]")
        .config("spark.sql.shuffle.partitions", c.toString)
        .config("spark.ui.enabled", "false").getOrCreate()
      s.sparkContext.setLogLevel("WARN"); s
    }
    locally {
      val s = sess(32)
      graft.corpus.SyntheticCorpus.generate(s, docs, 42, 120, 50000)
        .write.mode("overwrite").parquet(s"$work/pages")
      s.stop()
    }
    def stats(): String = {
      import scala.jdk.CollectionConverters._
      val gc = java.lang.management.ManagementFactory.getGarbageCollectorMXBeans.asScala
        .map(b => s"${b.getName}:${b.getCollectionCount}/${b.getCollectionTime}ms").mkString(" ")
      val comp = java.lang.management.ManagementFactory.getCompilationMXBean.getTotalCompilationTime
      val mem = java.lang.management.ManagementFactory.getMemoryMXBean
      val meta = java.lang.management.ManagementFactory.getMemoryPoolMXBeans.asScala
        .find(_.getName.contains("Metaspace")).map(_.getUsage.getUsed / 1048576).getOrElse(-1L)
      val threads = java.lang.management.ManagementFactory.getThreadMXBean.getThreadCount
      s"gc=[$gc] jitMs=$comp metaspaceMB=$meta heapMB=${mem.getHeapMemoryUsage.getUsed/1048576} threads=$threads"
    }
    def t[A](n: String)(f: => A): A = { val t0=System.nanoTime(); val a=f; println(f"[p2] $n: ${(System.nanoTime()-t0)/1e9}%.2f s  ${stats()}"); a }
    for ((c, tag) <- Seq((8,"low1"), (8,"low2"), (32,"high1"), (32,"high2"))) {
      val s = sess(c)
      t(s"build@$c($tag)") {
        IndexBuilder.build(s, s.read.parquet(s"$work/pages"),
          IndexConfig(s"$work/idx-$tag", docsPerSegment=2048, storePositions=false, writeDocMap=false))
      }
      s.stop()
    }
  }
}
