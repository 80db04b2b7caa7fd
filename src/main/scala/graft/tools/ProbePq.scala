package graft.tools
import org.apache.spark.sql.SparkSession
object ProbePq {
  def main(args: Array[String]): Unit = {
    val sfDir = "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .appName("probe").config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def t[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime(); val a = f
      println(f"$tag%-22s ${(System.nanoTime() - t0) / 1e9}%.3f s"); a
    }
    val fn = graft.SparkEntry.queries("ann_pq")
    val fn2 = graft.SparkEntry.queries("ann_ivfpq")
    fn(spark, sfDir).count(); fn2(spark, sfDir).count() // warm (train+encode)
    (1 to 3).foreach { r =>
      println(s"--- round $r")
      val df = t("pq build fn")(fn(spark, sfDir))
      t("pq plan")(df.queryExecution.executedPlan)
      t("pq count")(df.count())
      val df2 = t("ivfpq build fn")(fn2(spark, sfDir))
      t("ivfpq plan")(df2.queryExecution.executedPlan)
      t("ivfpq count")(df2.count())
    }
    spark.stop()
  }
}
