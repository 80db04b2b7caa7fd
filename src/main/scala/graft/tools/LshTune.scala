package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.pipeline.Ann
object LshTune {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions","16").config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (sf <- Seq("0.01", "0.1")) {
      val e = spark.read.parquet(s"/root/testdata/sf$sf/embeddings.parquet").cache()
      val q = e.filter(col("vec_id") < 5)
      val exact = Ann.bruteForceTopK(e, q, k = 5).cache(); exact.count()
      for ((bits, tables, mp) <- Seq((8,8,1),(8,8,2),(6,12,1),(6,12,2),(6,16,2))) {
        val approx = Ann.lshTopK(e, q, k = 5, bits = bits, tables = tables, multiprobe = mp)
        val rec = Ann.recallAtK(exact, approx, k = 5)
          .agg(avg("recall"), min("recall")).collect()(0)
        println(f"[lshtune] sf=$sf bits=$bits tables=$tables mp=$mp avg=${rec.getDouble(0)}%.3f min=${rec.getDouble(1)}%.3f")
      }
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
