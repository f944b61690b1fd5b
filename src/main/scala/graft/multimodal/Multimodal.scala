package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal (image/audio/video) columns for training-data pipelines
  * (NOT-IN-REFERENCE extension).
  *
  * Design: media payloads are opaque `binary` columns with a typed metadata
  * struct; per-item compute (decode, feature-extract, resize, frame-sample)
  * runs as `mapPartitions` over a typed Dataset — the JVM analogue of
  * arrow-batched Python `mapInPandas`: one task per partition, items
  * streamed through without materializing the partition, output batched by
  * the encoder. At 100 TB the binary column dominates IO, so every operator
  * here projects the minimum columns first (payload + id), keeps results
  * columnar, and never shuffles payload bytes (joins carry ids + features
  * only).
  *
  * The actual codecs are STUBBED (this container ships no image/audio libs):
  * [[Codecs]] produces deterministic fake decodes derived from the payload
  * hash. The Spark-side plumbing — schema, partitioning, signatures, batch
  * shape — is real and tested; swap [[Codecs]] for a JNI/ImageIO-backed
  * implementation to go live.
  */
object Multimodal {

  final case class MediaMeta(format: String, width: Int, height: Int,
      channels: Int, durationMs: Long)
  final case class MediaRow(media_id: Long, kind: String,
      payload: Array[Byte], meta: MediaMeta)
  final case class ImageFeatures(media_id: Long, width: Int, height: Int,
      embedding: Array[Float])
  final case class FrameSample(media_id: Long, frame_index: Int, offsetMs: Long,
      frame: Array[Byte])

  /** STUB codec layer — deterministic fakes keyed on payload content. A real
    * deployment replaces exactly this object. */
  object Codecs {
    /** "Decode" → per-channel mean vector of length `dim`, derived from a
      * rolling hash of the payload. Deterministic in payload bytes. */
    def decodeToEmbedding(payload: Array[Byte], dim: Int): Array[Float] = {
      val out = new Array[Float](dim)
      var h = 1125899906842597L
      var i = 0
      while (i < payload.length) {
        h = 31 * h + payload(i)
        out(i % dim) += ((h >>> 33) % 1000) / 1000.0f
        i += 1
      }
      val n = math.max(1, payload.length / dim)
      out.map(_ / n)
    }

    /** "Resize": deterministic byte subsample to the target byte budget. */
    def resize(payload: Array[Byte], targetBytes: Int): Array[Byte] =
      if (payload.length <= targetBytes) payload
      else Array.tabulate(targetBytes)(i =>
        payload((i.toLong * payload.length / targetBytes).toInt))
  }

  /** Schema-bearing reader: parquet with (media_id, kind, payload, meta). */
  def readMedia(spark: SparkSession, path: String): Dataset[MediaRow] = {
    import spark.implicits._
    spark.read.parquet(path).as[MediaRow]
  }

  /** Feature extraction: projects (id, payload) ONLY — metadata and any
    * sibling columns are pruned before the scan — then streams partitions
    * through the stub decoder. Output carries no payload: safe to shuffle. */
  def extractImageFeatures(media: Dataset[MediaRow], dim: Int = 64): Dataset[ImageFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.map { m =>
        ImageFeatures(m.media_id, m.meta.width, m.meta.height,
          Codecs.decodeToEmbedding(m.payload, dim))
      }
    }
  }

  /** Resize pass: payload-in payload-out, partition-local, no shuffle. */
  def resizeImages(media: Dataset[MediaRow], targetBytes: Int): Dataset[MediaRow] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.map(m =>
      m.copy(payload = Codecs.resize(m.payload, targetBytes))))
  }

  /** Frame sampling for video rows: `everyMs` stride over the duration,
    * emitting one (deterministically faked) frame per offset — a flatMap, so
    * output cardinality = Σ duration/stride without collecting any video. */
  def sampleFrames(media: Dataset[MediaRow], everyMs: Long,
      frameBytes: Int = 256): Dataset[FrameSample] = {
    import media.sparkSession.implicits._
    media.filter(col("kind") === "video").flatMap { m =>
      val n = math.max(1, (m.meta.durationMs / everyMs).toInt)
      (0 until n).iterator.map { i =>
        val offset = i * everyMs
        // fake frame: resized payload slice keyed by offset
        val start = ((offset.toDouble / math.max(1, m.meta.durationMs)) *
          math.max(1, m.payload.length - frameBytes)).toInt
        val slice = m.payload.slice(start, math.min(m.payload.length, start + frameBytes))
        FrameSample(m.media_id, i, offset, Codecs.resize(slice, frameBytes))
      }
    }
  }

  /** Join features back to a metadata table by id — payload never shuffles. */
  def joinFeatures(features: Dataset[ImageFeatures], metaTable: DataFrame,
      idCol: String): DataFrame =
    metaTable.join(features.toDF(), metaTable(idCol) === features("media_id"))
}
