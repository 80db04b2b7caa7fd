package graft.tools

import org.apache.spark.sql.SparkSession

object MinHashBench {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .appName("minhash-bench").getOrCreate()
    val docs = graft.corpus.SyntheticCorpus
      .generate(spark, 100000, seed = 7, avgLen = 60, vocab = 20000)
      .selectExpr("url as doc_id", "text")
      .cache()
    docs.count()
    def time(label: String)(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; val s = (System.nanoTime() - t0) / 1e9
      println(f"[mhb] $label: $s%.3f s"); s
    }
    import org.apache.spark.sql.functions.{col, sum, xxhash64}
    def consume(df: org.apache.spark.sql.DataFrame): Unit = {
      // hash the signature so the projection cannot be pruned away
      df.select(xxhash64(col("sig")).as("h")).selectExpr("bit_xor(h)").collect()
      ()
    }
    // warm both paths, then min-of-3 interleaved
    consume(graft.pipeline.Dedup.minHashSignatures(docs))
    consume(graft.pipeline.Dedup.minHashSignaturesSpec(docs))
    val n = (1 to 3).map(_ => time("native")(
      consume(graft.pipeline.Dedup.minHashSignatures(docs)))).min
    val b = (1 to 3).map(_ => time("builtin")(
      consume(graft.pipeline.Dedup.minHashSignaturesSpec(docs)))).min
    println(f"[mhb] min native=$n%.3f builtin=$b%.3f speedup=${b / n}%.2fx")
    spark.stop()
  }
}
