package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.storage.StorageLevel
import graft.index.IndexBuilder
object Profile4 {
  def main(args: Array[String]): Unit = {
    val docs = 480000L
    val work = java.nio.file.Files.createTempDirectory(java.nio.file.Paths.get("/dev/shm/graft-spark"), "p4").toString
    def sess(c: Int) = {
      val s = SparkSession.builder().master(s"local[$c]")
        .config("spark.sql.shuffle.partitions", c.toString)
        .config("spark.serializer", "org.apache.spark.serializer.KryoSerializer")
        .config("spark.local.dir", "/dev/shm/graft-spark")
        .config("spark.ui.enabled", "false").getOrCreate()
      s.sparkContext.setLogLevel("WARN"); s
    }
    locally {
      val s = sess(32)
      graft.corpus.SyntheticCorpus.generate(s, docs, 42, 400, 50000)
        .write.mode("overwrite").parquet(s"$work/pages")
      // warm
      IndexBuilder.build(s, s.read.parquet(s"$work/pages").limit(60000),
        graft.index.IndexConfig(s"$work/w", docsPerSegment=2048, storePositions=false, writeDocMap=false))
      s.stop()
    }
    def t[A](n: String)(f: => A): A = { val t0=System.nanoTime(); val a=f; println(f"[p4] $n: ${(System.nanoTime()-t0)/1e9}%.2f s"); a }
    for (c <- Seq(8, 32, 8, 32)) {
      val s = sess(c)
      import s.implicits._
      val corpus = s.read.parquet(s"$work/pages")
      val base = t(s"sort+persist+count@$c") {
        val b = corpus.select($"url", $"text").as[(String,String)].orderBy($"url").rdd
          .persist(StorageLevel.MEMORY_AND_DISK_SER)
        b.count(); b
      }
      val dps = 4096
      val parts = 4 * c
      val partn = new org.apache.spark.Partitioner {
        def numPartitions = parts
        def getPartition(key: Any) = { val k=key.asInstanceOf[(Int,Long)]._1 % parts; if (k<0) k+parts else k }
      }
      t(s"zip+shuffle+invert+write@$c") {
        base.zipWithIndex().map { case ((u,x),id) => ((IndexBuilder.segIdOf(id, dps), id), x) }
          .repartitionAndSortWithinPartitions(partn)
          .mapPartitions { it =>
            graft.index.IndexBuilder.invertPartitionSegments(it, s"$work/idx-$c-" + System.nanoTime(), "standard", dps, docs, false)
          }.count()
      }
      base.unpersist()
      s.stop()
    }
  }
}
