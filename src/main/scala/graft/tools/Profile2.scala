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
    def t[A](n: String)(f: => A): A = { val t0=System.nanoTime(); val a=f; println(f"[p2] $n: ${(System.nanoTime()-t0)/1e9}%.2f s"); a }
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
