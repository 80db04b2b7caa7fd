package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Near-duplicate detection for web-scale corpora. All stages are Catalyst
  * expressions (zip_with / transform / aggregate / xxhash64 — codegen'd, no
  * UDFs) so MinHash signatures are computed in a single narrow projection:
  * at 100 TB the only shuffles are the band-bucket join (keys are 64-bit
  * hashes — uniformly distributed, no skew) and the final pair dedup. */
object Dedup {

  /** Run a pair-finding plan to completion, keep only its (small, bounded)
    * result pinned, and release every intermediate cache. The banded
    * operators below persist corpus-sized-but-narrow intermediates
    * (signatures, buckets) that both the hot-bucket count and the capped
    * join read; left cached after the call they would accrete across a
    * long-lived session until an external clearCache(). The pair list
    * itself is the one thing worth keeping warm (and is what repeated
    * invocations of the same plan re-read). */
  private[pipeline] def materialized(out: DataFrame,
      intermediates: Seq[DataFrame]): DataFrame = {
    val cached = out.cache()
    cached.count()
    intermediates.foreach(_.unpersist())
    cached
  }

  /** Word w-shingles of the whitespace token stream, as a distinct array
    * per doc (no shuffle). array_distinct over the native
    * [[graft.functions.WordGrams]] — value-identical to the previous
    * sequence+slice+concat_ws composition (same grams, same first-
    * occurrence order) but tokenizes once per doc instead of once per
    * window position (the O(tokens²) interpreted-HOF hazard). */
  def shingles(docs: DataFrame, w: Int = 3): DataFrame =
    docs.select(col("doc_id"),
      array_distinct(TextOps.wordGrams(col("text"), w)).as("shingles"))

  /** All pairs (a < b) with shingle-set Jaccard >= minJaccard via an
    * inverted shingle self-join. EXACT but quadratic in per-shingle df (one
    * boilerplate shingle shared by 10^6 docs → 10^12 candidate rows): this
    * is the TEST-ORACLE path only. The scale-safe exact path is
    * [[exactJaccardPairs]] (banded candidates + exact verify). */
  def jaccardPairs(docs: DataFrame, w: Int = 3, minJaccard: Double = 0.8): DataFrame = {
    val sh = shingles(docs, w).cache()
    val exploded = sh.select(col("doc_id"), explode(col("shingles")).as("sh"))
    val inter = exploded.as("a").join(exploded.as("b"),
        col("a.sh") === col("b.sh") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("ic"))
    val sizes = sh.select(col("doc_id"), size(col("shingles")).as("n"))
    val j = inter
      .join(sizes.as("sa"), col("doc_a") === col("sa.doc_id"))
      .join(sizes.as("sb"), col("doc_b") === col("sb.doc_id"))
      .select(col("doc_a"), col("doc_b"),
        (col("ic").cast("double") / (col("sa.n") + col("sb.n") - col("ic"))).as("jac"))
    j.filter(col("jac") >= minJaccard)
      .select(col("doc_a"), col("doc_b"), round(col("jac"), 4).as("jac"))
  }

  /** Exact Jaccard pairs at 100 TB scale: banded MinHash candidate
    * generation with a threshold far below minJaccard, then exact
    * verification over shingle sets. With 32 bands × 2 rows the candidate
    * recall at j >= 0.8 is 1 − (1 − 0.8²)³² ≈ 1 − 4·10⁻¹⁵ — numerically
    * exact — while candidate volume stays bounded by the bucket joins
    * instead of per-shingle df². */
  def exactJaccardPairs(docs: DataFrame, w: Int = 3, minJaccard: Double = 0.8): DataFrame =
    minHashPairs(docs, w, minJaccard, bands = 32, rowsPerBand = 2)

  /** MinHash signature: perms[p] = min over shingles of xxhash64(sh, p).
    * One projection, no shuffle, and ONE pass over the shingle array: the
    * accumulator is the 64-wide signature itself (the per-perm formulation
    * re-scanned the array numPerms times). The numPerms hashes per shingle
    * are inherent to MinHash. */
  def minHashSignatures(docs: DataFrame, w: Int = 3, numPerms: Int = 64): DataFrame =
    shingles(docs, w).select(col("doc_id"), col("shingles"),
      graft.functions.MinHashSignature.minhashSig(col("shingles"), numPerms).as("sig"))

  /** The pre-r4 built-in composition of [[minHashSignatures]] — kept as
    * the executable spec the native expression is pinned against
    * (PipelineSpec bit-identity test): same xxhash64 fold, but it hashes
    * the shingle bytes once per (shingle, perm) through the HOF chain. */
  private[graft] def minHashSignaturesSpec(docs: DataFrame, w: Int = 3,
      numPerms: Int = 64): DataFrame =
    shingles(docs, w).select(col("doc_id"), col("shingles"),
      aggregate(col("shingles"),
        array_repeat(lit(Long.MaxValue), numPerms),
        (acc, s) => zip_with(acc, sequence(lit(0), lit(numPerms - 1)),
          (a, p) => least(a, xxhash64(s, p)))).as("sig"))

  /** MinHash + LSH banding: candidates share a band; candidates are then
    * verified with exact Jaccard over shingle sets (array_intersect /
    * array_union — still no UDF). bands × rowsPerBand = numPerms.
    * 16×4 at j=0.8 → recall 1-(1-0.8^4)^16 ≈ 0.9998. */
  def minHashPairs(docs: DataFrame, w: Int = 3, minJaccard: Double = 0.8,
      bands: Int = 16, rowsPerBand: Int = 4): DataFrame = {
    val (out, caches) = minHashPairsPlan(docs, w, minJaccard, bands, rowsPerBand)
    materialized(out, caches)
  }

  /** The lazy plan behind [[minHashPairs]] plus its intermediate caches —
    * split out so plan-shape tests can inspect the pre-materialization
    * query. */
  private[graft] def minHashPairsPlan(docs: DataFrame, w: Int, minJaccard: Double,
      bands: Int, rowsPerBand: Int): (DataFrame, Seq[DataFrame]) = {
    // only ids + signatures are persisted (numPerms longs per doc); the
    // earlier version cached the full shingle arrays alongside — a
    // corpus-sized cache that is exactly the memory blowup this operator
    // must not have at 100 TB. Shingles for the verify step are recomputed
    // in one extra narrow pass over the source, restricted to candidate
    // docs (a semi-join against the candidate id set — tiny, AQE broadcasts
    // it when it fits).
    val sigs = minHashSignatures(docs, w, bands * rowsPerBand)
      .select(col("doc_id"), col("sig")).cache()
    val banded = sigs.select(col("doc_id"),
        posexplode(transform(sequence(lit(0), lit(bands - 1)),
          b => hash(slice(col("sig"), b * rowsPerBand + 1, lit(rowsPerBand)), b))))
      .toDF("doc_id", "band", "bucket")
    val cands = banded.as("a").join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.bucket") === col("b.bucket") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
    val candIds = cands.select(col("doc_a").as("doc_id"))
      .union(cands.select(col("doc_b").as("doc_id"))).distinct()
    // candidate-sized (NOT corpus-sized) cache: one source re-scan feeds
    // both sides of the pair join
    val candSh = shingles(docs, w).join(candIds, Seq("doc_id"), "left_semi").cache()
    val withSets = cands
      .join(candSh.select(col("doc_id").as("doc_a"), col("shingles").as("sha")), "doc_a")
      .join(candSh.select(col("doc_id").as("doc_b"), col("shingles").as("shb")), "doc_b")
    val verified = withSets.select(col("doc_a"), col("doc_b"),
      (size(array_intersect(col("sha"), col("shb"))).cast("double") /
        size(array_union(col("sha"), col("shb")))).as("jac"))
    (verified.filter(col("jac") >= minJaccard)
      .select(col("doc_a"), col("doc_b"), round(col("jac"), 4).as("jac")),
      Seq(sigs, candSh))
  }

  /** 64-bit SimHash over whitespace tokens: per bit, sign of the vote sum
    * of xxhash64(token) bits. Native codegen expression
    * ([[graft.functions.SimHash64]]) — one hash per token and one local
    * vote array, replacing the interpreted zip_with/aggregate fold that
    * allocated a fresh 64-long array per token; pinned value-identical to
    * the composition (kept below as [[simHashSpec]]) in PipelineSpec. */
  def simHash(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      graft.functions.SimHash64.simhash64(TextOps.tokens(col("text"))).as("simhash"))

  /** The pre-r6 built-in composition of [[simHash]] — the executable spec
    * the native expression is pinned against (PipelineSpec). */
  private[graft] def simHashSpec(docs: DataFrame): DataFrame = {
    val hashes = transform(TextOps.tokens(col("text")), t => xxhash64(t))
    val votes = aggregate(hashes, array_repeat(lit(0L), 64), (acc, h) =>
      zip_with(acc, sequence(lit(0), lit(63)), (a, b) =>
        a + when(call_function("getbit", h, b) === 1, lit(1L)).otherwise(lit(-1L))))
    val sim = aggregate(
      zip_with(votes, sequence(lit(0), lit(63)), (v, b) =>
        when(v > 0L, call_function("shiftleft", lit(1L), b)).otherwise(lit(0L))),
      lit(0L), (acc, x) => acc.bitwiseOR(x))
    docs.select(col("doc_id"), sim.as("simhash"))
  }

  /** Hamming-distance SimHash pairs (≤ maxDist) by exact comparison over a
    * band join on 16-bit chunks (any pair within distance d shares at least
    * one of 4 chunks when d ≤ 3). */
  def simHashPairs(docs: DataFrame, maxDist: Int = 3): DataFrame = {
    val (out, caches) = simHashPairsPlan(docs, maxDist)
    materialized(out, caches)
  }

  private[graft] def simHashPairsPlan(docs: DataFrame,
      maxDist: Int): (DataFrame, Seq[DataFrame]) = {
    val sh = simHash(docs).cache()
    val chunks = sh.select(col("doc_id"), col("simhash"),
      posexplode(array((0 until 4).map(c =>
        shiftright(col("simhash"), c * 16).bitwiseAND(lit(0xffffL))): _*)))
      .toDF("doc_id", "simhash", "chunk", "val")
    val cands = chunks.as("a").join(chunks.as("b"),
        col("a.chunk") === col("b.chunk") && col("a.val") === col("b.val") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        col("a.simhash").as("ha"), col("b.simhash").as("hb"))
      .distinct()
    (cands.select(col("doc_a"), col("doc_b"),
        bit_count(col("ha").bitwiseXOR(col("hb"))).as("dist"))
      .filter(col("dist") <= maxDist), Seq(sh))
  }

  /** Embedding-cosine near-duplicate pairs — the fifth dedup family of the
    * training-pipeline brief: hyperplane-LSH candidate generation
    * (all-pairs within shared buckets across tables, like [[minHashPairs]]'
    * banding) then EXACT cosine verification, keeping pairs >= `minCos`.
    * Designed operating point is true near-dups (minCos >= ~0.9): at
    * cos 0.95 the per-table collision prob is (1 - acos(0.95)/pi)^bits ~
    * 0.43, so 8 tables give ~0.99 recall; low thresholds are not a
    * near-dup question and are out of design (use ann for retrieval).
    * Scale shape: bucketed self-join on 64-bit signatures, ids-only until
    * the verify step re-attaches embeddings — no quadratic all-pairs. */
  def embeddingPairs(embeddings: DataFrame, minCos: Double = 0.95,
      dim: Int = 64, bits: Int = 8, tables: Int = 8,
      maxBucket: Long = 100000L): DataFrame = {
    val (out, caches) = embeddingPairsPlan(embeddings, minCos, dim, bits, tables, maxBucket)
    materialized(out, caches)
  }

  private[graft] def embeddingPairsPlan(embeddings: DataFrame, minCos: Double,
      dim: Int, bits: Int, tables: Int, maxBucket: Long): (DataFrame, Seq[DataFrame]) = {
    // ids+buckets only (3 longs × tables per vector — bounded at any
    // scale), cached because BOTH the hot-bucket count and the capped side
    // read it: uncached, the hyperplane dot products run twice per vector
    val sig = embeddings.select(col("vec_id"),
        posexplode(array((0 until tables).map(t =>
          Ann.lshSignature(col("embedding"), dim, bits, t)): _*)))
      .toDF("vec_id", "table", "bucket").cache()
    // hot-bucket cap via aggregation + broadcast anti-join: partial (map-
    // side) aggregation shrinks the degenerate key before the shuffle and
    // the over-cap bucket list is tiny. The earlier Window.partitionBy cap
    // shuffle-SORTED every signature row with the hot bucket concentrated
    // in one partition — creating the straggler the cap exists to prevent.
    val hot = sig.groupBy("table", "bucket").agg(count(lit(1)).as("bn"))
      .filter(col("bn") > maxBucket).select("table", "bucket")
    val sigCapped = sig.select("vec_id", "table", "bucket")
      .join(broadcast(hot), Seq("table", "bucket"), "left_anti")
    val candIds = sigCapped.as("a").join(sigCapped.as("b"),
        col("a.table") === col("b.table") && col("a.bucket") === col("b.bucket") &&
          col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("id_a"), col("b.vec_id").as("id_b"))
      .distinct()
    (candIds
      .join(embeddings.select(col("vec_id").as("id_a"), col("embedding").as("ea")), "id_a")
      .join(embeddings.select(col("vec_id").as("id_b"), col("embedding").as("eb")), "id_b")
      .select(col("id_a"), col("id_b"), Ann.cosine(col("ea"), col("eb")).as("cs"))
      .filter(col("cs") >= minCos)
      .select(col("id_a"), col("id_b"), round(col("cs"), 4).as("cos_sim")), Seq(sig))
  }

  /** Duplicate-cluster resolution — the "keep one per near-dup cluster"
    * step a training-data pipeline runs after pair generation: connected
    * components over the near-dup pair graph, each doc labeled with its
    * component's smallest doc_id (the canonical representative a
    * keep/drop pass then filters on). Iterative smallest-label
    * propagation: labels start as each node's own id; every round each
    * node adopts the minimum label in its closed neighborhood; converged
    * when no label changes. Rounds = O(component diameter) — near-dup
    * components are shallow (every pair member shares a bucket with its
    * neighbors), so a handful of rounds even at 100 TB; each round is one
    * key-partitioned join + partial-agg min, nothing corpus-sized ever
    * reaches the driver (the loop condition is a count, not a collect).
    * Docs in no pair are singleton clusters by definition and are not
    * returned. Expects pair columns (doc_a, doc_b). */
  def dupClusters(pairs: DataFrame): DataFrame = {
    val fwd = pairs.select(col("doc_a").as("src"), col("doc_b").as("dst"))
    val edges = fwd.union(pairs.select(col("doc_b").as("src"), col("doc_a").as("dst")))
      .cache()
    // Each round's result is LOCAL-CHECKPOINTED, not merely cached:
    // `labels` feeds the next round twice (propagation join +
    // neighborhood agg), so without lineage truncation the logical plan
    // doubles per round — a 40-hop chain graph OOMs the driver on plan
    // strings alone long before any data is big (caught by the
    // PipelineSpec fuzz). Checkpointing makes every round's plan
    // constant-size; superseded checkpoint RDDs are reaped by the
    // ContextCleaner once unreferenced. LAZY checkpoints (r6): the
    // `changed` count is the one action per round and materializes the
    // checkpoint as it runs — the eager variant ran a second, redundant
    // materialization job per round (guide §1.2: per-task work after the
    // job shape; here the job COUNT was the shape).
    var labels = edges.select(col("src").as("id")).distinct()
      .select(col("id"), col("id").as("label"))
      .localCheckpoint(false)
    var changed = 1L
    var rounds = 0
    while (changed > 0 && rounds < 64) { // 64 = runaway guard; the require
      // below turns an over-diameter graph into a loud failure, never a
      // silently-partial clustering
      val nbrMin = edges.join(labels.withColumnRenamed("id", "dst"), "dst")
        .groupBy(col("src").as("id")).agg(min(col("label")).as("nlabel"))
      // change detection rides the propagation join (nlabel < label IS
      // "this round changed something") — no second labels join per round
      val next = labels.join(nbrMin, "id")
        .select(col("id"), least(col("label"), col("nlabel")).as("label"),
          (col("nlabel") < col("label")).as("chg"))
        .localCheckpoint(false)
      changed = next.filter(col("chg")).count()
      labels = next.select(col("id"), col("label"))
      rounds += 1
    }
    edges.unpersist() // before the require: a throw must not pin the cache
    require(changed == 0,
      s"dupClusters did not converge in $rounds rounds — component diameter " +
        "exceeds the guard; raise the bound or pre-shard the pair graph")
    labels.select(col("id").as("doc_id"), col("label").as("cluster_rep"))
  }
}
