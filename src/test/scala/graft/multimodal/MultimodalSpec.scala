package graft.multimodal

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {
  import spark.implicits._
  import Multimodal._

  private def media = Seq(
    MediaRow(1L, "image", Array.tabulate(4096)(_.toByte), MediaMeta("png", 64, 64, 3, 0L)),
    MediaRow(2L, "image", Array.tabulate(2048)(i => (i * 7).toByte), MediaMeta("jpg", 32, 32, 3, 0L)),
    MediaRow(3L, "video", Array.tabulate(8192)(i => (i * 3).toByte), MediaMeta("mp4", 128, 96, 3, 5000L))
  ).toDS()

  test("media parquet round-trip preserves binary payloads and typed meta") {
    val dir = java.nio.file.Files.createTempDirectory("graft-media").toString + "/m"
    media.write.mode("overwrite").parquet(dir)
    val back = readMedia(spark, dir)
    val row = back.filter($"media_id" === 1L).head()
    assert(row.payload.toSeq == Array.tabulate(4096)(_.toByte).toSeq)
    assert(row.meta == MediaMeta("png", 64, 64, 3, 0L))
  }

  test("feature extraction is deterministic and payload-free downstream") {
    val f1 = extractImageFeatures(media, dim = 16).collect().map(f => f.media_id -> f.embedding.toSeq).toMap
    val f2 = extractImageFeatures(media, dim = 16).collect().map(f => f.media_id -> f.embedding.toSeq).toMap
    assert(f1 == f2)
    assert(f1(1L).length == 16)
    assert(f1(1L) != f1(2L)) // different payloads → different embeddings
    assert(!extractImageFeatures(media).schema.fieldNames.contains("payload"))
  }

  test("resize caps payload size, smaller payloads pass through") {
    val resized = resizeImages(media, targetBytes = 1024).collect()
    assert(resized.forall(_.payload.length <= 1024))
    val small = resizeImages(media.filter($"media_id" === 2L), 4096).head()
    assert(small.payload.length == 2048)
  }

  test("frame sampling: one frame per stride, only video rows") {
    val frames = sampleFrames(media, everyMs = 1000, frameBytes = 64).collect()
    assert(frames.forall(_.media_id == 3L))
    assert(frames.length == 5) // 5000ms / 1000ms
    assert(frames.map(_.offsetMs).toSeq == Seq(0L, 1000L, 2000L, 3000L, 4000L))
    assert(frames.forall(_.frame.length <= 64))
  }

  test("features join back to a metadata table without payload shuffle") {
    val meta = Seq((1L, "catalog-a"), (2L, "catalog-b")).toDF("id", "source")
    val joined = joinFeatures(extractImageFeatures(media), meta, "id")
    assert(joined.count() == 2)
    assert(joined.columns.contains("embedding") && !joined.columns.contains("payload"))
  }
}
