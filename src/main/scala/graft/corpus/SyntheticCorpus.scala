package graft.corpus

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.analysis.Filters

/** The input table of the north rule (BASELINE.json input_hint):
  * Common-Crawl-style web pages `(url, warc_ts, html, text, lang)`. */
final case class Page(
    url: String,
    warc_ts: Timestamp,
    html: Array[Byte],
    text: String,
    lang: String)

/** Deterministic synthetic web-page corpus (FIXTURES.md §1): seeded Zipfian
  * vocabulary with the 33 English stop words at head frequencies (the skew
  * lever), log-normal-ish doc lengths, and injected token-class edge cases.
  * Pure function of (seed, docIdx) → generation parallelism never changes
  * content. */
object SyntheticCorpus {

  private val stops = Filters.EnglishStopWords.toArray.sorted
  private val edgeCases = Array(
    "a@b.com", "www.example.com", "U.S.A.", "O'Neil's", "3.14", "AT&T",
    "mid-20th", "excite@home", "216.239.63.104", "don't")

  /** Zipf-ish rank sample in [0, v): inverse-CDF of 1/k over v ranks. */
  @inline private def zipfRank(u: Double, v: Int): Int = {
    val k = math.pow(v.toDouble, u).toInt
    if (k >= v) v - 1 else k
  }

  def docText(seed: Long, idx: Long, avgLen: Int, vocab: Int): String = {
    val rnd = new java.util.Random(seed * 1000003L ^ (idx * 2654435761L))
    // log-normal-ish length: exp of gaussian around ln(avgLen)
    val len = math.max(3, math.min(avgLen * 8,
      math.exp(math.log(avgLen.toDouble) + 0.6 * rnd.nextGaussian()).toInt))
    val sb = new StringBuilder(len * 6)
    var i = 0
    while (i < len) {
      if (i > 0) sb.append(' ')
      val r = rnd.nextDouble()
      if (r < 0.25) sb.append(stops(rnd.nextInt(stops.length))) // heavy stop-word head
      else if (r < 0.253) sb.append(edgeCases(rnd.nextInt(edgeCases.length)))
      else sb.append("w").append(zipfRank(rnd.nextDouble(), vocab))
      i += 1
    }
    sb.toString
  }

  def page(seed: Long, idx: Long, avgLen: Int, vocab: Int): Page = {
    val text = docText(seed, idx, avgLen, vocab)
    val host = s"site${(idx * 48271) % 997}.example.com"
    Page(
      url = f"https://$host/p/$idx%012d",
      warc_ts = new Timestamp(1700000000000L + (idx % 86400000L)),
      html = s"<html><body>$text</body></html>".getBytes(java.nio.charset.StandardCharsets.UTF_8),
      text = text,
      lang = if (idx % 10 == 9) "de" else "en")
  }

  def generate(spark: SparkSession, numDocs: Long, seed: Long = 42L,
      avgLen: Int = 120, vocab: Int = 50000, partitions: Int = 0): DataFrame = {
    import spark.implicits._
    val p = if (partitions > 0) partitions else spark.sparkContext.defaultParallelism
    spark.range(0, numDocs, 1, p).map(i => page(seed, i, avgLen, vocab)).toDF()
  }

  /** Small in-memory corpus for unit tests / brute-force oracles. */
  def localPages(numDocs: Int, seed: Long = 42L, avgLen: Int = 60,
      vocab: Int = 2000): Seq[Page] =
    (0L until numDocs.toLong).map(i => page(seed, i, avgLen, vocab))
}
