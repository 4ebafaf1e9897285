package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** One media item: opaque bytes + typed metadata. The schema a 100 TB
  * multimodal corpus would carry — content stays an opaque binary column
  * (never parsed by Catalyst), metadata is columnar and prunable. */
case class MediaRecord(
    media_id: Long,
    modality: String,         // "image" | "audio" | "video" | "text"
    content: Array[Byte],
    source: String,
    n_bytes: Long)

/** Deterministic stand-in features for a decoded media item. */
case class MediaFeatures(
    media_id: Long,
    modality: String,
    n_bytes: Long,
    head_byte: Int,
    tail_byte: Int,
    byte_checksum: Long)

/**
 * Multimodal-column handling: treat image/audio/video payloads as opaque
 * `binary` columns with typed metadata, and run decode / feature-extract
 * as a partition-parallel typed transformation.
 *
 * The actual media decode is STUBBED (this container ships no image/audio
 * codecs): [[fakeDecode]] derives deterministic features from the raw
 * bytes. The Spark-side plumbing — binary schema, `Dataset[T]` encoders,
 * `mapPartitions` batching, partition-count control — is real and is what
 * a codec-backed implementation would reuse by swapping the decode fn.
 */
object Multimodal {

  /** Wrap a text corpus as a binary media table (text bytes as payload) —
    * lets the binary pipeline be exercised against checkable inputs. */
  def fromDocuments(docs: DataFrame): Dataset[MediaRecord] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(
        col("doc_id").as("media_id"),
        lit("text").as("modality"),
        col("text").cast("binary").as("content"),
        col("source").as("source"),
        octet_length(col("text").cast("binary")).cast("long").as("n_bytes"))
      .as[MediaRecord]
  }

  /** STUB decode: deterministic features from raw bytes. A real pipeline
    * replaces this body with the codec call (e.g. JPEG decode → resize →
    * embed); everything around it stays identical. */
  def fakeDecode(r: MediaRecord): MediaFeatures = {
    val bytes = r.content
    var sum = 0L
    var i = 0
    while (i < bytes.length) { sum += bytes(i) & 0xff; i += 1 }
    MediaFeatures(
      media_id = r.media_id,
      modality = r.modality,
      n_bytes = bytes.length.toLong,
      head_byte = if (bytes.nonEmpty) bytes(0) & 0xff else -1,
      tail_byte = if (bytes.nonEmpty) bytes(bytes.length - 1) & 0xff else -1,
      byte_checksum = sum % 1000000007L)
  }

  /** Partition-parallel feature extraction. `mapPartitions` (not `map`)
    * so a real decoder can amortize per-partition setup (codec contexts,
    * model weights) across rows — the batch shape a Pandas-UDF-style
    * decoder needs. */
  def extractFeatures(media: Dataset[MediaRecord]): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { it =>
      // per-partition setup would go here (open codec, load weights, …)
      it.map(fakeDecode)
    }
  }

  case class MediaFrame(
      media_id: Long,
      frame_idx: Int,
      frame_bytes: Array[Byte])

  /** STUB frame sampler: treats the payload as fixed-size frames and
    * emits every `everyNth` one. A real video pipeline swaps the chunking
    * for a demuxer; the fan-out shape (one row → many frame rows,
    * partition-parallel, no shuffle) is what matters at scale. */
  def frameSample(media: Dataset[MediaRecord], frameSize: Int,
                  everyNth: Int): Dataset[MediaFrame] = {
    require(frameSize > 0 && everyNth > 0)
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { it =>
      it.flatMap { r =>
        r.content.grouped(frameSize).zipWithIndex.collect {
          case (chunk, i) if i % everyNth == 0 =>
            MediaFrame(r.media_id, i, chunk)
        }
      }
    }
  }

  /** STUB resize: deterministically shrinks the payload to at most
    * `maxBytes` (a real image pipeline decodes + rescales + re-encodes
    * here); metadata stays consistent with the new payload. */
  def resizeStub(media: Dataset[MediaRecord], maxBytes: Int): Dataset[MediaRecord] = {
    require(maxBytes > 0)
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { it =>
      it.map { r =>
        val content = if (r.content.length <= maxBytes) r.content
                      else r.content.take(maxBytes)
        r.copy(content = content, n_bytes = content.length.toLong)
      }
    }
  }
}
