package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Physical-plan hygiene for the round-4 pipeline operators: column
  * pruning reaches the parquet scan, the contamination eval side is
  * broadcast, and no narrow-map op introduces a shuffle or Window. */
class PlanHygieneSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-plan-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private lazy val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")

  private def plan(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("narrow-map ops have no shuffle and prune the scan to used columns") {
    for ((name, df) <- Seq(
      "repetition" -> pipeline.TextOps.repetitionSignals(docs),
      "quality_filter" -> pipeline.TextOps.qualityFilter(docs),
      "pii_scrub" -> pipeline.TextOps.piiScrub(docs, org.apache.spark.sql.functions.col("text")))) {
      val p = plan(df)
      assert(!p.contains("Exchange"), s"$name plan shuffles:\n$p")
      assert(!p.contains("Window"), s"$name plan sorts a window:\n$p")
      val readSchema = p.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
      assert(!readSchema.contains("source") && !readSchema.contains("n_chars"),
        s"$name reads unused columns: $readSchema")
    }
  }

  test("char_entropy is a shuffle-free narrow map with a pruned scan") {
    val df = docs.select(org.apache.spark.sql.functions.col("doc_id"),
      graft.functions.CharEntropy.charEntropy(
        org.apache.spark.sql.functions.col("text")).as("h"))
    val p = plan(df)
    assert(!p.contains("Exchange"), s"char_entropy shuffles:\n$p")
    // "*(n)" marks a WholeStageCodegen span in executedPlan.toString
    assert(p.contains("*("), s"char_entropy fell out of codegen:\n$p")
    val readSchema = p.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(!readSchema.contains("source") && !readSchema.contains("lang"),
      s"char_entropy reads unused columns: $readSchema")
  }

  test("lm_quality: bounded model broadcast, partial aggs, no full sort") {
    val p = plan(pipeline.TextOps.lmQuality(docs, vocabSize = 16))
    assert(p.contains("BroadcastHashJoin"), p) // top-V model joins broadcast
    assert(p.contains("TakeOrderedAndProject"), p) // vocab cutoff, not a global sort
    assert(p.contains("partial"), p) // map-side combine on token counts
  }

  test("keyword_extract: no forced broadcast of the corpus-scale df side") {
    // at this sf the optimizer may still CHOOSE broadcast; the assertion is
    // that the per-doc window partitions by doc_id (bounded state) and both
    // aggregates combine map-side
    val p = plan(pipeline.TextOps.keywordExtract(docs, k = 3))
    assert(p.contains("Window"), p)
    assert(p.contains("partial"), p)
  }

  test("contamination broadcasts the eval gram set into a semi-join") {
    val p = plan(pipeline.TextOps.contamination(docs, 5, 50))
    assert(p.contains("BroadcastHashJoin") && p.contains("LeftSemi"), p)
  }

  test("contamination falls back to a shuffled semi-join over the broadcast limit") {
    // limit 0 forces the over-limit regime: the eval side must join via a
    // shuffle (merge/shuffled-hash), never a corpus-sized broadcast
    val p = plan(pipeline.TextOps.contamination(docs, 5, 50, broadcastGramLimit = 0L))
    val semiLine = p.linesIterator.filter(_.contains("LeftSemi")).mkString("\n")
    assert(semiLine.nonEmpty, p)
    assert(!semiLine.contains("BroadcastHashJoin"), s"eval side still broadcast:\n$p")
  }

  test("dup_span_scrub: the cut is a narrow map — no corpus-token shuffle") {
    // r6 shape: the only aggregate below the final join is the per-doc
    // span roll-up; the token stream itself is never exploded or shuffled
    // (the pre-r6 plan anti-joined every (doc_id, pos) token row)
    val p = plan(pipeline.TextOps.scrubDupSpans(docs))
    assert(!p.contains("posexplode(filter(split("),
      s"token stream exploded again:\n$p")
    assert(!p.contains("collect_list(struct(pos"),
      s"per-token rebuild aggregate returned:\n$p")
  }

  test("cross_dup_grams: partial-agg gram count, semi-join, no doc lists") {
    val p = plan(pipeline.TextOps.crossDocDupGrams(docs))
    assert(p.contains("partial"), p) // map-side combine on the gram key
    assert(p.contains("LeftSemi"), p)
    // the scale guarantee: never a per-gram doc list and never a window
    assert(!p.contains("collect_set") && !p.contains("collect_list"), p)
    assert(!p.contains("Window"), p)
    val readSchema = p.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(!readSchema.contains("source") && !readSchema.contains("lang"),
      s"cross_dup_grams reads unused columns: $readSchema")
  }

  test("source_mix aggregates with partial aggregation and broadcasts the total") {
    val p = plan(pipeline.TextOps.sourceMix(docs))
    assert(p.contains("partial"), p) // map-side combine before the shuffle
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"), p)
  }

  test("mix_sample is a shuffle-free filter with a pruned scan") {
    val p = plan(pipeline.TextOps.mixSample(docs, Map("src0" -> 0.5)))
    assert(!p.contains("Exchange"), s"mix_sample shuffles:\n$p")
    val readSchema = p.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(!readSchema.contains("text"),
      s"mix_sample reads the corpus text for an id/source decision: $readSchema")
  }
}
