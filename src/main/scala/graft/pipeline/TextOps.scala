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
    * single-spaced corpora — the SQL-oracle-friendly tokenizer). Native
    * codegen expression (r6, [[graft.functions.WsTokens]]); the built-in
    * composition stays as [[tokensSpec]], pinned identical in
    * PipelineSpec (same values, null text → null, containsNull=false). */
  def tokens(text: Column): Column =
    graft.functions.WordGrams.wsTokens(text)

  /** The pre-r6 built-in composition of [[tokens]]. */
  private[graft] def tokensSpec(text: Column): Column =
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
    // Σ token lengths == count of non-space characters (tokens split on
    // 0x20, empties dropped — every non-space char is in exactly one
    // token), and an integer sum is order-free, so this equals the
    // previous interpreted `aggregate(toks, 0L, acc + length(t))` fold
    // exactly while staying in whole-stage codegen (pinned in
    // PipelineSpec).
    val meanLen = when(n > 0,
      length(translate(col("text"), " ", ""))
        .cast("long").cast("double") / n).otherwise(0.0)
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

  /** Word n-grams of the whitespace tokens, joined back with spaces —
    * empty array when the doc is shorter than n. Native codegen expression
    * ([[graft.functions.WordGrams]]): the previous sequence+slice+concat_ws
    * higher-order composition re-ran the `filter(split(text))` tokenize for
    * every window position (no cross-lambda CSE — O(tokens²) per doc) and
    * was the dominant cost of every gram-based operator. */
  def wordGrams(text: Column, n: Int): Column =
    graft.functions.WordGrams.wordGrams(text, n)

  /** The pre-r6 built-in composition of [[wordGrams]] — kept as the
    * executable spec the native expression is pinned value-identical to
    * (PipelineSpec). */
  private[graft] def wordGramsSpec(text: Column, n: Int): Column = {
    val toks = tokens(text)
    when(size(toks) >= n,
      transform(sequence(lit(1), size(toks) - lit(n - 1)),
        i => concat_ws(" ", slice(toks, i, lit(n)))))
      .otherwise(array().cast("array<string>"))
  }

  /** Gopher-style repetition signals: fraction of duplicated word 2- and
    * 3-grams per document (Rae et al. 2021 §A1.1 repetition filters).
    * Narrow map — no shuffle, no per-doc quadratic work. */
  def repetitionSignals(docs: DataFrame): DataFrame = {
    def dupFrac(n: Int): Column = {
      val g = wordGrams(col("text"), n)
      when(size(g) > 0,
        (size(g) - size(array_distinct(g))).cast("double") / size(g).cast("double"))
        .otherwise(lit(0.0))
    }
    docs.select(col("doc_id"),
      size(tokens(col("text"))).cast("long").as("n_tokens"),
      round(dupFrac(2), 4).as("dup_2gram_frac"),
      round(dupFrac(3), 4).as("dup_3gram_frac"))
  }

  /** Benchmark-contamination check: for every training document, how many
    * of its distinct word n-grams appear in the held-out eval set
    * (doc_id % evalMod == 0 plays the benchmark suite). The eval gram set
    * is small by construction (a benchmark, not the corpus), so Spark
    * broadcasts it — at 100 TB the train side stays a narrow scan plus a
    * broadcast-hash semi-join; no corpus-sized shuffle exists. GUARDED:
    * an eval side that is secretly corpus-sized (a mis-configured mod, a
    * benchmark dump that grew) would make the "broadcast" a multi-TB
    * ship-to-every-executor, so the gram set is size-bounded first (a
    * narrow per-doc-count scan — NOT a second explode+distinct shuffle)
    * and above `broadcastGramLimit` the join falls back to a shuffled
    * semi-join (logged) — slower, never fatal. The bound over-counts
    * cross-doc repeats, so it can only fall back too early, never
    * broadcast too much. */
  def contamination(docs: DataFrame, n: Int = 5, evalMod: Int = 50,
      broadcastGramLimit: Long = 5000000L): DataFrame = {
    val grams = docs.select(col("doc_id"),
      explode(array_distinct(wordGrams(col("text"), n))).as("gram"))
    val evalGrams = grams.filter(col("doc_id") % evalMod === 0)
      .select(col("gram")).distinct()
    val train = grams.filter(col("doc_id") % evalMod =!= 0)
    // upper bound on |evalGrams| without executing the explode+distinct
    // pipeline twice: sum of per-doc distinct gram counts, one narrow scan
    val evalGramBound = docs.filter(col("doc_id") % evalMod === 0)
      .agg(coalesce(sum(size(array_distinct(wordGrams(col("text"), n))).cast("long")),
        lit(0L)))
      .first().getLong(0)
    val evalSide =
      if (evalGramBound <= broadcastGramLimit) broadcast(evalGrams)
      else {
        org.slf4j.LoggerFactory.getLogger(getClass).warn(
          s"contamination: eval gram set exceeds $broadcastGramLimit — " +
            "falling back to a shuffled semi-join")
        evalGrams.hint("shuffle_merge")
      }
    train.join(evalSide, Seq("gram"), "left_semi")
      .groupBy("doc_id").agg(count(lit(1)).as("overlap_grams"))
      .join(
        docs.filter(col("doc_id") % evalMod =!= 0)
          .select(col("doc_id"),
            size(array_distinct(wordGrams(col("text"), n))).cast("long").as("total_grams")),
        Seq("doc_id"), "right_outer")
      .select(col("doc_id"), coalesce(col("overlap_grams"), lit(0L)).as("overlap_grams"),
        col("total_grams"))
  }

  /** Training-mix accounting: per (source, lang) document and token
    * counts plus each cell's share of the corpus token budget — the
    * mixture-weight table a data pipeline samples from. One partial-agg
    * shuffle on a low-cardinality key; the share join is a broadcast of
    * one total. */
  def sourceMix(docs: DataFrame): DataFrame = {
    val perCell = docs
      .select(col("source"), col("lang"), size(tokens(col("text"))).cast("long").as("toks"))
      .groupBy("source", "lang")
      .agg(count(lit(1)).as("docs"), sum("toks").as("tokens"))
    val total = perCell.agg(sum("tokens").as("total_tokens"))
    perCell.crossJoin(broadcast(total))
      .select(col("source"), col("lang"), col("docs"), col("tokens"),
        round(col("tokens").cast("double") / col("total_tokens"), 6).as("token_share"))
  }

  /** Deterministic stratified sampling for training-mix targeting: keep a
    * per-source fraction of documents, decided by a content-independent
    * hash of the doc id rather than a random draw — the same doc is kept
    * or dropped on every run, on every cluster size, under every
    * partitioning (Spark's sample()/sampleBy() are seed-deterministic only
    * per partition layout, which reshuffles under AQE/scale-up). The
    * predicate compares the first 4 hex chars of md5(doc_id as string)
    * against a per-source threshold string: lowercase-hex lexicographic
    * order IS numeric order, so the SQL twin is the identical expression.
    * Narrow map, no shuffle; quota resolution is a broadcast-free CASE
    * chain (the quota table is a handful of literals). Sources absent
    * from `quotas` fall back to `defaultQuota`. */
  def mixSample(docs: DataFrame, quotas: Map[String, Double],
      defaultQuota: Double = 0.0): DataFrame = {
    def thr(q: Double): String = {
      val v = math.max(0L, math.min(65536L, math.round(q * 65536)))
      if (v >= 65536L) "g" else f"$v%04x" // "g" > any hex digit: keep-all
    }
    val thrExpr = quotas.foldLeft(lit(thr(defaultQuota))) {
      case (acc, (s, q)) => when(col("source") === s, lit(thr(q))).otherwise(acc)
    }
    docs.select(col("doc_id"), col("source"))
      .where(substring(md5(col("doc_id").cast("string")), 1, 4) < thrExpr)
  }

  /** C4-style keep/drop gate: token-count window, punctuation ceiling,
    * repetition ceiling, language allow-list. Emits the decision and the
    * first failed rule so downstream can audit filter attrition. Narrow
    * map — the decision never shuffles. */
  def qualityFilter(docs: DataFrame, minTokens: Int = 10, maxTokens: Int = 100000,
      maxPunct: Double = 0.2, maxDup3: Double = 0.3,
      langs: Seq[String] = Seq("en")): DataFrame = {
    val toks = tokens(col("text"))
    val n = size(toks)
    val punct = when(length(col("text")) > 0,
      length(regexp_replace(col("text"), "[a-zA-Z0-9\\s]", "")).cast("double") /
        length(col("text"))).otherwise(0.0)
    val g3 = wordGrams(col("text"), 3)
    val dup3 = when(size(g3) > 0,
      (size(g3) - size(array_distinct(g3))).cast("double") / size(g3)).otherwise(0.0)
    val reason = when(n < minTokens, "too_short")
      .when(n > maxTokens, "too_long")
      .when(punct > maxPunct, "punct")
      .when(dup3 > maxDup3, "repetition")
      .when(!col("lang").isin(langs: _*), "lang")
      .otherwise("")
    docs.select(col("doc_id"), (reason === "").as("keep"), reason.as("drop_reason"))
  }

  /** Cross-document duplicate n-gram signal (Lee et al. 2022,
    * "Deduplicating Training Data Makes Language Models Better"): for every
    * document, how many of its distinct word n-grams also occur in at least
    * one OTHER document, and the fraction of its distinct grams those
    * shared grams make up — the per-doc boilerplate load a span-dedup pass
    * would remove. Completes the dup-measurement triangle: within-doc
    * ([[repetitionSignals]]), train-vs-eval ([[contamination]]), and this —
    * doc-vs-rest-of-corpus.
    *
    * Shape at 100 TB: grams are per-doc distinct BEFORE the explode, so the
    * per-gram `count(*)` IS the distinct-doc count — no count_distinct, no
    * per-gram doc lists (a collect_set would explode on boilerplate grams).
    * The gram stream shuffles once into the per-gram aggregate; the probe
    * side of the semi-join either broadcasts the shared set (small regime)
    * or sort-merges on the same gram partitioning (corpus-scale regime,
    * AQE's call) — never more than the aggregate + join + one per-doc agg.
    * The gram STRING is the key here for oracle exactness; at petabyte
    * scale the shuffle key would be a 128-bit gram fingerprint (64 bits
    * birthday-collides above ~10^9 distinct grams). */
  def crossDocDupGrams(docs: DataFrame, n: Int = 8): DataFrame = {
    val grams = docs.select(col("doc_id"),
      explode(array_distinct(wordGrams(col("text"), n))).as("gram"))
    val shared = grams.groupBy("gram").agg(count(lit(1)).as("nd"))
      .filter(col("nd") >= 2).select("gram")
    val perDocShared = grams.join(shared, Seq("gram"), "left_semi")
      .groupBy("doc_id").agg(count(lit(1)).as("shared_grams"))
    val sharedCnt = coalesce(col("shared_grams"), lit(0L))
    docs.select(col("doc_id"),
        size(array_distinct(wordGrams(col("text"), n))).cast("long").as("total_grams"))
      .join(perDocShared, Seq("doc_id"), "left_outer")
      .select(col("doc_id"), col("total_grams"), sharedCnt.as("shared_grams"),
        when(col("total_grams") > 0,
          round(sharedCnt.cast("double") / col("total_grams"), 4))
          .otherwise(lit(0.0)).as("shared_frac"))
  }

  /** Maximal cross-document duplicated token spans — the "what to cut"
    * complement of [[crossDocDupGrams]]'s per-doc load number. A token
    * position starts a duplicated gram when the n-gram beginning there
    * also occurs in at least one other document; maximal runs of
    * consecutive duplicated gram starts [a..b] merge into one span of
    * tokens [a, b+n-1] (1-based, inclusive) — exactly the spans a Lee et
    * al. 2022 span-dedup pass would excise. Emits one row per span.
    *
    * Shape at 100 TB: the shared-gram set is built per-doc-distinct (same
    * trick as [[crossDocDupGrams]]); positions survive on the probe side
    * only. The islands step is a window partitioned BY DOCUMENT — state is
    * one doc's hit list, never corpus-scale, so the sort inside each
    * partition is bounded by doc length and skew is impossible by
    * construction. */
  def crossDocDupSpans(docs: DataFrame, n: Int = 8): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val gramsPos = docs.select(col("doc_id"),
      posexplode(wordGrams(col("text"), n)).as(Seq("pos0", "gram")))
      .select(col("doc_id"), (col("pos0") + 1).cast("long").as("pos"), col("gram"))
    // shared set from per-doc-distinct arrays (the [[crossDocDupGrams]]
    // trick): the per-gram count(*) IS the distinct-doc count, so the
    // (doc_id, gram) distinct — a full extra Exchange of every gram
    // string — is unnecessary (guide §2.4: remove shuffles outright)
    val shared = docs.select(
        explode(array_distinct(wordGrams(col("text"), n))).as("gram"))
      .groupBy("gram").agg(count(lit(1)).as("nd"))
      .filter(col("nd") >= 2).select("gram")
    val hits = gramsPos.join(shared, Seq("gram"), "left_semi")
    val w = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    hits.select(col("doc_id"), col("pos"),
        (col("pos") - row_number().over(w)).as("grp"))
      .groupBy(col("doc_id"), col("grp"))
      .agg(min(col("pos")).as("span_start"),
        (max(col("pos")) + lit(n - 1)).as("span_end"))
      .select(col("doc_id"), col("span_start"), col("span_end"),
        (col("span_end") - col("span_start") + 1).as("span_tokens"))
  }

  /** Apply the span-dedup cut: delete every token covered by a
    * [[crossDocDupSpans]] span and re-emit the document (as a count plus an
    * md5 of the scrubbed text, [[piiScrub]]-style — the driver compare
    * never ships full text).
    *
    * Shape at 100 TB (r6, guide §2.4 — remove shuffles outright): the
    * pre-r6 version exploded EVERY corpus token and anti-join-shuffled
    * the whole token stream by (doc_id, pos), then rebuilt each doc
    * through a collect_list aggregate — two corpus-token exchanges plus
    * an object aggregate for a per-document decision. Now the spans are
    * rolled up to one small array per affected doc (the only shuffle —
    * span rows are a tiny fraction of the corpus), joined back by
    * doc_id, and the cut is a narrow per-row expression: keep token i+1
    * unless a span covers it. Spans are maximal and therefore disjoint
    * per doc; docs with no spans keep every token (null-spans branch). */
  def scrubDupSpans(docs: DataFrame, n: Int = 8): DataFrame = {
    val spansPerDoc = crossDocDupSpans(docs, n)
      .groupBy("doc_id")
      .agg(collect_list(struct(col("span_start"), col("span_end"))).as("spans"))
    val toks = tokens(col("text"))
    val kept = when(col("spans").isNull, toks).otherwise(
      filter(toks, (_, i) => !exists(col("spans"), s =>
        (i + 1).cast("long").between(s.getField("span_start"), s.getField("span_end")))))
    docs.join(spansPerDoc, Seq("doc_id"), "left_outer")
      .select(col("doc_id"), size(toks).cast("long").as("n_tokens"),
        (size(toks) - size(kept)).cast("long").as("removed_tokens"),
        md5(concat_ws(" ", kept)).as("scrubbed_md5"))
  }

  /** CCNet-style unigram-LM quality score: each document's mean negative
    * log-probability under the corpus's own unigram distribution, with the
    * model truncated to the `vocabSize` most frequent tokens and every
    * out-of-vocabulary token floored at probability 1/N (N = corpus token
    * count). Low scores = head-heavy fluent text, high scores = rare-token
    * soup — the ranking CCNet buckets web text by (Wenzek et al. 2020 use a
    * 5-gram KenLM; the unigram truncation is the same filter shape with a
    * closed-form, oracle-exact model).
    *
    * Shape at 100 TB: token counts are one partial-agg shuffle on the token
    * key (1 row per key after combine); the MODEL — top-V rows — is
    * bounded by `vocabSize`, not the corpus, so it broadcasts (TakeOrdered,
    * never a full sort); scoring is then a narrow broadcast-hash join over
    * the exploded token stream plus one per-doc partial agg. Deterministic:
    * the vocabulary cutoff tie-breaks on (count desc, token asc). */
  def lmQuality(docs: DataFrame, vocabSize: Int = 65536): DataFrame = {
    val toks = docs.select(col("doc_id"), explode(tokens(col("text"))).as("term"))
    val counts = toks.groupBy("term").agg(count(lit(1)).as("cnt"))
    // N = corpus token count — identical to sum(cnt) over the term counts,
    // but a narrow per-doc size() scan instead of a third corpus explode +
    // aggregate pipeline (guide §2.3: aggregate before you shuffle; here
    // the whole explode disappears)
    val total = docs.agg(
      sum(size(tokens(col("text"))).cast("long")).as("n_total"))
    val vocab = counts.orderBy(col("cnt").desc, col("term").asc).limit(vocabSize)
    toks.join(broadcast(vocab), Seq("term"), "left_outer")
      .crossJoin(broadcast(total))
      .select(col("doc_id"),
        (-log(coalesce(col("cnt"), lit(1L)).cast("double") /
          col("n_total").cast("double"))).as("nll"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tokens"), round(avg(col("nll")), 4).as("avg_neg_logprob"))
  }

  /** Per-document keyword extraction: top `k` terms by tf·idf with
    * idf = ln(N/df) — the corpus-statistics view of a document that search
    * snippets, routing, and topic labeling read. Deterministic tie-break
    * (tfidf desc, term asc).
    *
    * Shape at 100 TB: tf and df are both partial-agg shuffles; the tf↔df
    * join keys on the term with NO forced broadcast — a web-scale vocabulary
    * (typos, ids) outgrows any broadcast, and after per-doc aggregation the
    * join is 1:1 per tf row, so AQE's sort-merge with skew splitting is the
    * right plan (at sf the optimizer auto-broadcasts the tiny df side). The
    * final top-k is a per-doc window — state bounded by one document's
    * vocabulary, skew impossible by construction. */
  def keywordExtract(docs: DataFrame, k: Int = 3): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val nDocs = docs.agg(count(lit(1)).as("n_docs"))
    // note (r6): deriving df FROM the tf aggregate was tried and reverted —
    // column pruning specializes the two tf subtrees (the df branch drops
    // the count), so the exchange is NOT reused and the rewrite just added
    // an aggregation level; docFreqs' per-doc-distinct-before-explode shape
    // is the better two-pass plan at any scale
    val scored = termFreqs(docs).join(docFreqs(docs), Seq("term"))
      .crossJoin(broadcast(nDocs))
      .select(col("doc_id"), col("term"),
        (col("freq").cast("double") *
          log(col("n_docs").cast("double") / col("df").cast("double"))).as("tfidf"))
    val w = Window.partitionBy("doc_id").orderBy(col("tfidf").desc, col("term").asc)
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
      .select(col("doc_id"), col("rank").cast("long").as("rank"), col("term"),
        round(col("tfidf"), 4).as("tfidf"))
  }

  private val EmailRe = "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}"
  private val Ipv4Re = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"

  /** PII scrubbing: redact emails and IPv4 addresses, report per-doc
    * redaction counts plus a digest of the scrubbed text. The regexes use
    * only syntax shared by Java regex and RE2 so the DuckDB twin is exact.
    * The synthetic corpus carries no PII, so the driver entry injects a
    * deterministic email + IP per doc before scrubbing (non-vacuous). */
  def piiScrub(docs: DataFrame, textCol: Column): DataFrame = {
    val scrubbed = regexp_replace(
      regexp_replace(textCol, EmailRe, "<EMAIL>"), Ipv4Re, "<IP>")
    docs.select(col("doc_id"),
      size(regexp_extract_all(textCol, lit(EmailRe), lit(0))).cast("long").as("n_emails"),
      size(regexp_extract_all(textCol, lit(Ipv4Re), lit(0))).cast("long").as("n_ips"),
      md5(scrubbed).as("scrubbed_md5"))
  }

  /** Bigram collocations by pointwise mutual information —
    * pmi = ln(p(ab) / (p(a)·p(b))) with a `minCount` occurrence floor
    * (Church & Hanks 1990), the standard multi-word-expression miner a
    * tokenizer/vocabulary-induction pass runs over a corpus. Returns the
    * global top `topK` by (pmi desc, bigram asc); pmi is rounded BEFORE
    * ranking so the cut boundary is deterministic across engines.
    *
    * Shape at 100 TB: unigram and bigram counts are partial-agg shuffles;
    * the min-count floor prunes the bigram tail BEFORE the unigram joins
    * (the tail is the mass — zipf), and those joins key on the term with
    * no forced broadcast (web vocabulary outgrows one; AQE broadcasts at
    * small sf). The final top-k is a TakeOrdered over the floored
    * survivors, never a full sort. */
  def collocations(docs: DataFrame, minCount: Long = 5L, topK: Int = 20): DataFrame = {
    // uni feeds three consumers (the total + both term joins) and the
    // grouped bigram counts two (the total + the floored join side) —
    // persist both so the corpus is tokenized once per stream, not five
    // times, and release them once the (tiny) top-k materializes
    val uni = docs.select(explode(tokens(col("text"))).as("term"))
      .groupBy("term").agg(count(lit(1)).as("c1")).persist()
    val bgCounts = docs.select(explode(wordGrams(col("text"), 2)).as("bigram"))
      .groupBy("bigram").agg(count(lit(1)).as("c2")).persist()
    val nUni = uni.agg(sum("c1").as("n_uni"))
    val nBg = bgCounts.agg(sum("c2").as("n_bg"))
    val bg = bgCounts.filter(col("c2") >= minCount)
    val out = bg.select(col("bigram"), col("c2"),
        split(col("bigram"), " ").getItem(0).as("ta"),
        split(col("bigram"), " ").getItem(1).as("tb"))
      .join(uni.select(col("term").as("ta"), col("c1").as("ca")), Seq("ta"))
      .join(uni.select(col("term").as("tb"), col("c1").as("cb")), Seq("tb"))
      .crossJoin(broadcast(nUni)).crossJoin(broadcast(nBg))
      .select(col("bigram"), col("c2").as("n_pairs"),
        round(log((col("c2").cast("double") * col("n_uni") * col("n_uni")) /
          (col("n_bg").cast("double") * col("ca") * col("cb"))), 4).as("pmi"))
      .orderBy(col("pmi").desc, col("bigram").asc).limit(topK)
    Dedup.materialized(out, Seq(uni, bgCounts))
  }

  /** Winnowing document fingerprints (Schleimer, Wilkerson & Aiken, SIGMOD
    * 2003 — the MOSS algorithm): hash every k-token gram, slide a window
    * of w consecutive gram hashes, select each window's minimum hash
    * (rightmost position on ties), and keep the distinct selected hashes
    * as the document's fingerprint set. The winnowing guarantee: any token
    * run of length >= w+k-1 shared by two documents produces at least one
    * SHARED selected fingerprint, while expected density is only 2/(w+1)
    * of the grams — the bounded-size sketch that makes near-dup candidate
    * generation tractable when full gram inversion
    * ([[crossDocDupGrams]]) is too expensive.
    *
    * Shape at 100 TB: selection happens INSIDE one native codegen
    * expression per document ([[graft.functions.WinnowFps]]: tokenize →
    * gram → md5 → rightmost-min windows → distinct, one pass over the
    * bytes) — a narrow map with no explode, no per-gram shuffle and no
    * window-function sort; only the selected ~2/(w+1) fraction survives
    * to the explode. md5 is the gram hash, so hash order (lowercase-hex
    * lexicographic) and therefore the selected set are bit-identical in
    * the DuckDB twin. The pre-r6 HOF composition — which evaluated
    * interpreted, one boxed md5 lambda per gram plus an O(windows·w)
    * boxed argmin fold — is retained as [[winnowFingerprintsSpec]] and
    * the native expression is pinned value- and order-identical to it in
    * PipelineSpec. Returns distinct (doc_id, fp) rows; docs shorter than
    * k+w-1 tokens emit none. */
  def winnowFingerprints(docs: DataFrame, k: Int = 4, w: Int = 4): DataFrame =
    docs.select(col("doc_id"),
      explode(graft.functions.WinnowFps.winnowFps(col("text"), k, w)).as("fp"))

  /** The pre-r6 built-in composition of [[winnowFingerprints]] — the
    * executable spec the native expression is pinned against
    * (PipelineSpec). [[winnowFpArrSpec]] exposes the pre-explode array so
    * the pin covers element ORDER, not just the exploded rowset. */
  private[graft] def winnowFingerprintsSpec(docs: DataFrame, k: Int = 4,
      w: Int = 4): DataFrame = {
    // the gram-hash array materializes ONCE per doc in its OWN projection:
    // the selection below reads it with one element_at per window probe,
    // and higher-order functions evaluate interpreted with no cross-lambda
    // CSE — inlined, every probe would re-run the whole tokenize→gram→md5
    // pipeline (observed: O(tokens·windows·w) re-splits, ~1000× slower).
    // CollapseProject keeps a non-cheap multi-referenced alias in its own
    // projection.
    val hashed = docs.select(col("doc_id"),
      transform(wordGrams(col("text"), k), g => md5(g)).as("hs"))
    hashed.select(col("doc_id"),
      explode(winnowFpArrSpec(col("hs"), w)).as("fp"))
  }

  /** Spec selection over a materialized gram-hash array column: rightmost
    * argmin over each full window of w consecutive hashes — fold positions
    * p..p+w-1 keeping the later position on <= (ties go right, per the
    * paper's rule — both engines compare the same hex). */
  private[graft] def winnowFpArrSpec(hs: Column, w: Int): Column = {
    val selPos = when(size(hs) >= w,
      array_distinct(transform(sequence(lit(1), size(hs) - lit(w - 1)), p =>
        aggregate(sequence(p, p + lit(w - 1)), p,
          (best, q) => when(element_at(hs, q) <= element_at(hs, best), q)
            .otherwise(best)))))
      .otherwise(array().cast("array<int>"))
    array_distinct(transform(selPos, p => element_at(hs, p)))
  }

  /** Near-duplicate candidate pairs over winnowing fingerprints: document
    * pairs sharing at least `minShared` selected fingerprints, with the
    * shared count as evidence weight. Fingerprints selected by more than
    * `maxDf` documents are boilerplate (a stop-gram analog) and are
    * dropped BEFORE the self-join — the same agg + broadcast-anti-join
    * hot-key cap as the LSH dedup paths, bounding per-key join fan-out so
    * one viral snippet cannot quadratically explode a corpus-scale run.
    * The join key carries ids only; no text or gram arrays shuffle. */
  def winnowPairs(docs: DataFrame, k: Int = 4, w: Int = 4,
      minShared: Long = 2L, maxDf: Long = 50L): DataFrame = {
    // the fingerprint relation feeds three consumers (hot count + both
    // join sides); persist it for the run, keep only the (small) pair
    // list pinned afterwards — Dedup.materialized's cache-release
    // discipline, shared with the other pair operators
    val fp = winnowFingerprints(docs, k, w).persist()
    val hot = fp.groupBy("fp").agg(count(lit(1)).as("df"))
      .filter(col("df") > maxDf).select("fp")
    val cold = fp.join(broadcast(hot), Seq("fp"), "left_anti")
    val out = cold.select(col("fp"), col("doc_id").as("doc_a"))
      .join(cold.select(col("fp"), col("doc_id").as("doc_b")), Seq("fp"))
      .filter(col("doc_a") < col("doc_b"))
      .groupBy("doc_a", "doc_b").agg(count(lit(1)).as("shared_fps"))
      .filter(col("shared_fps") >= minShared)
    Dedup.materialized(out, Seq(fp))
  }
}
