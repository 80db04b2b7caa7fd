package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.analysis.Filters

/** Text-analysis operators for large-scale training-data pipelines, built
  * entirely from codegen'd `org.apache.spark.sql.functions` (no UDFs — the
  * whole stage stays inside WholeStageCodegen; every one of these is a
  * narrow map over the scan, so they parallelize embarrassingly at 100 TB).
  * Each has a DuckDB-expressible twin in SparkEntry.oracleSql. */
object TextOps {

  /** Whitespace tokens with empties dropped (mirrors WhitespaceAnalyzer for
    * single-spaced corpora — the SQL-oracle-friendly tokenizer). */
  def tokens(text: Column): Column =
    filter(split(text, " "), t => t =!= lit(""))

  val stopArray: Column = array(Filters.EnglishStopWords.toSeq.sorted.map(lit): _*)

  /** doc_id, term, freq — term frequencies. */
  def termFreqs(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), explode(tokens(col("text"))).as("term"))
      .groupBy("doc_id", "term").agg(count(lit(1)).as("freq"))

  /** term, df — document frequencies (map-side combine handles the
    * stop-word head; the shuffle key is the term but cardinality per key is
    * 1 row after partial agg, so no skew). */
  def docFreqs(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), explode(array_distinct(tokens(col("text")))).as("term"))
      .groupBy("term").agg(count(lit(1)).as("df"))

  /** doc_id, dl. */
  def docLengths(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), size(tokens(col("text"))).cast("long").as("dl"))

  /** Heuristic language id: ratio of English stop words among tokens. */
  def langId(docs: DataFrame): DataFrame = {
    val toks = tokens(col("text"))
    val stopCnt = size(filter(toks, t => array_contains(stopArray, t)))
    val ratio = when(size(toks) > 0, stopCnt.cast("double") / size(toks).cast("double"))
      .otherwise(lit(0.0))
    docs.select(col("doc_id"), round(ratio, 4).as("stop_ratio"),
      when(ratio >= 0.1, lit("en")).otherwise(lit("other")).as("lang_guess"))
  }

  /** Quality signals: token count, distinct ratio, mean token length,
    * non-alnum char ratio — the standard web-text quality gates. */
  def qualityScore(docs: DataFrame): DataFrame = {
    val toks = tokens(col("text"))
    val n = size(toks)
    val distinctRatio = when(n > 0, size(array_distinct(toks)).cast("double") / n).otherwise(0.0)
    val meanLen = when(n > 0,
      aggregate(toks, lit(0L), (acc, t) => acc + length(t)).cast("double") / n).otherwise(0.0)
    val punct = length(regexp_replace(col("text"), "[a-zA-Z0-9\\s]", ""))
    val punctRatio = when(length(col("text")) > 0,
      punct.cast("double") / length(col("text"))).otherwise(0.0)
    docs.select(col("doc_id"),
      n.cast("long").as("n_tokens"),
      round(distinctRatio, 4).as("distinct_ratio"),
      round(meanLen, 4).as("mean_token_len"),
      round(punctRatio, 4).as("punct_ratio"))
  }

  /** Whitespace vs regex ("BPE-ish" letter/digit/symbol runs) token counts. */
  def tokenCounts(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      size(tokens(col("text"))).cast("long").as("ws_tokens"),
      size(regexp_extract_all(lower(col("text")), lit("[a-z]+|[0-9]+|[^a-z0-9\\s]"), lit(0)))
        .cast("long").as("re_tokens"))

  /** Token counts of raw HTML documents through the strip-and-tokenize
    * front-end (HtmlStripCharFilter + whitespace chain) — the text
    * extraction step of the north-rule schema's `html` column. Typed
    * `mapPartitions` with per-partition analyzer init (same shape as the
    * index build's tokenize stage): a narrow map, no shuffle, scales
    * embarrassingly. */
  def htmlTokenCounts(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id"), col("html")).as[(Long, String)]
      .mapPartitions { it =>
        val an = graft.analysis.HtmlStripAnalyzer(graft.analysis.WhitespaceAnalyzer)
        it.map { case (id, html) => (id, an.analyze(html).size.toLong) }
      }.toDF("doc_id", "html_tokens")
  }

  /** Content fingerprint: md5 of whitespace-normalized lowercased text —
    * exact-dedup key (md5 is identical in Spark and DuckDB). */
  def fingerprint(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      md5(regexp_replace(lower(col("text")), "\\s+", " ")).as("fp"))

  /** Exact dedup over the fingerprint: group id + representative. */
  def dedupExact(docs: DataFrame): DataFrame =
    fingerprint(docs)
      .groupBy("fp")
      .agg(min("doc_id").as("keeper"), count(lit(1)).as("group_size"))
}
