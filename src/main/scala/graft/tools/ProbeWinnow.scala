package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.pipeline.TextOps

/** Probe (guide §1): native winnow_fps vs the interpreted HOF composition
  * it replaced, same JVM and host window, noop sink. */
object ProbeWinnow {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .appName("probe-winnow").config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def t[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime(); val a = f
      println(f"$tag%-22s ${(System.nanoTime() - t0) / 1e9}%.3f s"); a
    }
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    (1 to 3).foreach { r =>
      println(s"--- round $r")
      t("fps native noop")(noop(TextOps.winnowFingerprints(docs)))
      t("fps spec noop")(noop(TextOps.winnowFingerprintsSpec(docs)))
      t("pairs native count")(TextOps.winnowPairs(docs).count())
    }
    spark.stop()
  }
}
