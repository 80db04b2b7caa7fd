package graft.pipeline

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

/** Multimodal-column plumbing: opaque `binary` payloads + typed metadata,
  * processed in batched `mapPartitions` (the Scala-side analog of
  * `mapInPandas` — one decoder instance per partition, rows streamed
  * through it). The decode itself is STUBBED with a deterministic fake
  * (image/audio libs are not in this container); the Spark-side schema,
  * batching, and partition shape are real and tested. */
object Multimodal {

  final case class MediaRow(media_id: Long, payload: Array[Byte], kind: String)
  final case class MediaFeatures(
      media_id: Long,
      kind: String,
      byte_len: Long,
      /** STUB: stands in for a real decoded feature vector (e.g. CLIP
        * embedding / mel spectrogram stats) — deterministic so tests and
        * oracles can check the plumbing. */
      checksum: Long,
      first_byte: Int)

  /** Deterministic fake "decode": FNV-1a over the payload. A real decoder
    * (JPEG → pixels, PCM → frames) drops in here, one instance per
    * partition, without touching the plan shape. */
  private def stubDecode(r: MediaRow): MediaFeatures = {
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < r.payload.length) {
      h ^= (r.payload(i) & 0xffL)
      h *= 0x100000001b3L
      i += 1
    }
    MediaFeatures(r.media_id, r.kind, r.payload.length.toLong, h,
      if (r.payload.isEmpty) -1 else r.payload(0) & 0xff)
  }

  /** Batched feature extraction over a binary column. Partitioning note:
    * media blobs are large — repartition by size budget upstream, not here;
    * this stage is narrow. */
  def extractFeatures(spark: SparkSession, media: DataFrame): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.select("media_id", "payload", "kind").as[MediaRow]
      .mapPartitions { rows =>
        // per-partition decoder init happens here (codec tables, model, …)
        rows.map(stubDecode)
      }
  }

  /** Adapt the events table to a media table (props as an opaque payload)
    * so the plumbing is exercised against real driver-generated data. */
  def eventsAsMedia(events: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions._
    events.select(col("event_id").as("media_id"),
      col("props").cast("binary").as("payload"),
      col("event_type").as("kind"))
  }
}
