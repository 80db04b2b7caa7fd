package graft.tools
import org.apache.spark.sql.SparkSession
import graft.pipeline.Ann

/** Probe (guide §1): isolate the PQ/IVF train and encode costs — the
  * full-corpus passes that run once per index build. At sf the bench
  * amortizes them behind the warm round + memo caches; at 100 TB the
  * encode pass is the dominant PQ-index-build cost, so its per-row
  * kernel matters independently of the battery numbers. */
object ProbeEncode {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .appName("probe-encode").config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def t[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime(); val a = f
      println(f"$tag%-26s ${(System.nanoTime() - t0) / 1e9}%.3f s"); a
    }
    val e = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val n = e.count()
    println(s"vectors: $n")
    (1 to 3).foreach { r =>
      println(s"--- round $r")
      val books = t("trainPq (4 iters)")(Ann.trainPq(e))
      val cents = t("trainIvf (4 iters)")(Ann.trainIvf(e))
      t("encodePq noop")(Ann.encodePq(e, books)
        .write.format("noop").mode("overwrite").save())
      t("encodeIvfPq noop")(Ann.encodeIvfPq(e, cents, books)
        .write.format("noop").mode("overwrite").save())
    }
    spark.stop()
  }
}
