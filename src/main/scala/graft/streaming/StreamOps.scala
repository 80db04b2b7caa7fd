package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.analysis.Analyzer

/** Streaming analytics over the web-page / event streams — the Structured
  * Streaming shapes a crawl pipeline needs beyond index ingestion
  * (StreamingIndexer): watermarked event-time window aggregation and
  * custom session state via flatMapGroupsWithState. Both are pure
  * plan-builders: callers plug any streaming source/sink. */
object StreamOps {

  /** Event-time windowed term frequencies over a streaming pages table
    * `(url, warc_ts timestamp, text)`: tokenize with the engine's analyzer
    * (per-partition init, same as the index build), then a watermarked
    * tumbling-window count. Late rows beyond `watermark` are dropped by
    * Spark's state eviction — state stays bounded no matter how long the
    * stream runs, which is what makes this viable on an endless crawl. */
  def windowedTermCounts(pages: DataFrame, analyzerName: String = "standard",
      windowDur: String = "10 minutes", watermark: String = "5 minutes"): DataFrame = {
    val spark = pages.sparkSession
    import spark.implicits._
    val toks = pages.select(col("warc_ts"), col("text")).as[(Timestamp, String)]
      .mapPartitions { it =>
        val analyzer = Analyzer.byName(analyzerName)
        it.flatMap { case (ts, text) => analyzer.analyze(text).map(t => (ts, t.term)) }
      }.toDF("warc_ts", "term")
    toks
      .withWatermark("warc_ts", watermark)
      .groupBy(window(col("warc_ts"), windowDur), col("term"))
      .agg(count(lit(1)).as("freq"))
      .select(col("window.start").as("win_start"), col("term"), col("freq"))
  }

  final case class Page(url: String, text: String)
  final case class SeenState(firstUrl: String, dups: Long)
  final case class DedupedPage(url: String, text: String, fp: String)

  /** Streaming exact dedup: across ALL micro-batches, emit only the first
    * page carrying each content fingerprint (md5 of whitespace-normalized
    * lowercased text — the same key as the batch dedup_exact operator).
    * State is one tiny record per distinct fingerprint, partitioned by the
    * fingerprint hash, so an endless crawl shards its seen-set over the
    * cluster instead of accreting it anywhere central. Updates/duplicates
    * within one batch keep the lexicographically-first url
    * (deterministic under batch reordering). */
  def dedupStream(pages: Dataset[Page]): Dataset[DedupedPage] = {
    val spark = pages.sparkSession
    import spark.implicits._
    pages
      .map { p =>
        val norm = p.text.toLowerCase(java.util.Locale.ROOT)
          .replaceAll("\\s+", " ")
        val md = java.security.MessageDigest.getInstance("MD5")
          .digest(norm.getBytes("UTF-8")).map("%02x".format(_)).mkString
        (md, p.url, p.text)
      }
      .groupByKey(_._1)
      .flatMapGroupsWithState[SeenState, DedupedPage](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        case (fp, rows, state: GroupState[SeenState]) =>
          val batch = rows.toSeq.sortBy(_._2)
          if (state.exists) {
            state.update(SeenState(state.get.firstUrl,
              state.get.dups + batch.size))
            Iterator.empty
          } else {
            val first = batch.head
            state.update(SeenState(first._2, batch.size - 1L))
            Iterator(DedupedPage(first._2, first._3, fp))
          }
      }
  }

  /** Local twin of the batch `Dedup.simHash` expression — BIT-IDENTICAL:
    * per whitespace token (empties dropped), xxhash64 with Spark's seed 42;
    * per bit, the sign of the vote sum (ties → 0). Pinned against the
    * batch column in StreamingSpec. */
  private[graft] def simHash64(text: String): Long = {
    val votes = new Array[Long](64)
    text.split(" ").foreach { t =>
      if (t.nonEmpty) {
        val b = t.getBytes("UTF-8")
        val h = org.apache.spark.sql.catalyst.expressions.XXH64.hashUnsafeBytes(
          b, org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET, b.length, 42L)
        var j = 0
        while (j < 64) {
          votes(j) += (if (((h >>> j) & 1L) == 1L) 1L else -1L)
          j += 1
        }
      }
    }
    var fp = 0L
    var j = 0
    while (j < 64) { if (votes(j) > 0L) fp |= (1L << j); j += 1 }
    fp
  }

  final case class NearDupPair(url: String, firstUrl: String, dist: Int)
  final case class BucketState(firstUrl: String, fp: Long)

  /** Streaming NEAR-dup detection across all micro-batches — the
    * approximate sibling of [[dedupStream]]'s exact fingerprint filter:
    * each page's 64-bit SimHash splits into four 16-bit chunks (any pair
    * within Hamming distance ≤ 3 shares at least one chunk — the same
    * banding as the batch `Dedup.simHashPairs`), each chunk bucket keeps
    * the FIRST page it saw (url + full fingerprint, one tiny record per
    * distinct bucket, sharded by bucket hash — bounded like the exact
    * seen-set), and a later page whose full fingerprint sits within
    * `maxDist` of its bucket's representative emits a pair.
    *
    * Approximation contract, stated plainly: pairs are detected against
    * bucket REPRESENTATIVES only (two later pages that match each other
    * but not their bucket's first page are missed), and the same pair can
    * emit from up to 4 chunks (consumers dedup on (url, firstUrl) or
    * route through the batch verifier). Exact-recall near-dup over a
    * bounded window belongs to the batch path; this is the unbounded-
    * stream suppressor. */
  def nearDupPairsStream(pages: Dataset[Page], maxDist: Int = 3): Dataset[NearDupPair] = {
    val spark = pages.sparkSession
    import spark.implicits._
    pages
      .flatMap { p =>
        val fp = simHash64(p.text)
        (0 until 4).map { c =>
          ((c.toLong << 16) | ((fp >>> (16 * c)) & 0xffffL), p.url, fp)
        }
      }
      .groupByKey(_._1)
      .flatMapGroupsWithState[BucketState, NearDupPair](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        case (_, rows, state: GroupState[BucketState]) =>
          // lexicographic order makes the representative deterministic
          // under batch reordering, like dedupStream
          val batch = rows.toSeq.sortBy(_._2)
          val out = scala.collection.mutable.ListBuffer.empty[NearDupPair]
          var st = state.getOption
          batch.foreach { case (_, url, fp) =>
            st match {
              case None => st = Some(BucketState(url, fp))
              case Some(s) if url != s.firstUrl =>
                val d = java.lang.Long.bitCount(s.fp ^ fp)
                if (d <= maxDist) out += NearDupPair(url, s.firstUrl, d)
              case _ => ()
            }
          }
          st.foreach(state.update)
          out.iterator
      }
  }

  final case class Event(userId: Long, ts: Timestamp)
  final case class SessionState(start: Long, end: Long, events: Int)
  final case class Session(userId: Long, startMs: Long, endMs: Long,
      events: Int, closed: Boolean)

  /** Sessionize a user event stream: events of one user belong to the same
    * session while gaps stay under `gapMs`; a session closes when the
    * event-time watermark passes its end + gap (GroupStateTimeout
    * .EventTimeTimeout — the mapGroupsWithState pattern for custom state
    * the brief calls out). Emits a closed Session per timeout; in-progress
    * sessions emit nothing (Append semantics). */
  def sessionize(events: Dataset[Event], gapMs: Long,
      watermark: String = "10 seconds"): Dataset[Session] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .withWatermark("ts", watermark)
      .groupByKey(_.userId)
      .flatMapGroupsWithState[SessionState, Session](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        case (userId, rows, state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator(Session(userId, s.start, s.end, s.events, closed = true))
          } else {
            val times = rows.map(_.ts.getTime).toSeq.sorted
            var closed = List.empty[Session]
            var st = state.getOption.getOrElse(
              SessionState(times.head, times.head, 0))
            times.foreach { t =>
              if (t - st.end > gapMs) {
                // gap inside the batch: the old session closes immediately
                closed = Session(userId, st.start, st.end, st.events,
                  closed = true) :: closed
                st = SessionState(t, t, 1)
              } else {
                st = SessionState(math.min(st.start, t), math.max(st.end, t),
                  st.events + 1)
              }
            }
            state.update(st)
            // clamp past the watermark: flatMapGroupsWithState does NOT
            // auto-drop rows older than the watermark, so a late event can
            // leave st.end + gapMs at/below it — setTimeoutTimestamp throws
            // on that and would kill the whole streaming query
            state.setTimeoutTimestamp(
              math.max(state.getCurrentWatermarkMs() + 1, st.end + gapMs))
            closed.reverseIterator
          }
      }
  }

  /** Batch twin of [[sessionize]] — gaps-and-islands over the columnar
    * events table: a session boundary is any per-user gap > `gapUs`
    * microseconds, the session id is the running sum of boundary flags,
    * and one partial-aggregated groupBy folds each island into
    * (start, end, count). Pure Catalyst window + agg — at 100 TB this is
    * one shuffle on user_id (the window) feeding a co-partitioned agg; no
    * state store, no driver-side anything. The streaming path computes
    * the same sessions incrementally (StreamingSpec pins batch/stream
    * agreement on closed sessions). */
  def sessionizeBatch(events: DataFrame, gapUs: Long): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy(col("tu"), col("event_id"))
    val wRun = w.rowsBetween(
      org.apache.spark.sql.expressions.Window.unboundedPreceding,
      org.apache.spark.sql.expressions.Window.currentRow)
    val prev = lag(col("tu"), 1).over(w)
    events
      // the events table stores TIMESTAMP_NTZ; the session timezone is
      // pinned UTC everywhere, so the cast is the identity instant
      .select(col("user_id"), col("event_id"),
        unix_micros(col("ts").cast("timestamp")).as("tu"))
      .withColumn("nf", when(prev.isNull || col("tu") - prev > gapUs, 1L).otherwise(0L))
      .withColumn("session_id", sum(col("nf")).over(wRun))
      .groupBy(col("user_id"), col("session_id"))
      .agg(min(col("tu")).as("start_us"), max(col("tu")).as("end_us"),
        count(lit(1)).as("n_events"))
  }
}
