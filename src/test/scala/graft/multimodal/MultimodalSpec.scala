package graft.multimodal

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {
  import spark.implicits._
  import Multimodal._

  private def readFixture(name: String): Array[Byte] = {
    val in = getClass.getResourceAsStream(s"/graft/fixtures/$name")
    try in.readAllBytes() finally in.close()
  }

  // real media: a gray-gradient PNG, a colored PNG, and a 3-frame PNG "video"
  private def gradientPng = Codecs.grayPng(Array.tabulate(16)(_ * 17), 4, 4)
  private def colorPng = {
    val img = new java.awt.image.BufferedImage(2, 2, java.awt.image.BufferedImage.TYPE_INT_RGB)
    img.setRGB(0, 0, 0xff0000); img.setRGB(1, 0, 0x00ff00)
    img.setRGB(0, 1, 0x0000ff); img.setRGB(1, 1, 0xffffff)
    Codecs.encodePng(img)
  }
  private def videoPayload = (0 until 3).toArray.flatMap(f =>
    Codecs.grayPng(Array.fill(4)(f * 100), 2, 2))

  private def media = Seq(
    MediaRow(1L, "image", gradientPng, MediaMeta("png", 4, 4, 3, 0L)),
    MediaRow(2L, "image", colorPng, MediaMeta("png", 2, 2, 3, 0L)),
    MediaRow(3L, "video", videoPayload, MediaMeta("pngseq", 2, 2, 3, 3000L))
  ).toDS()

  test("media parquet round-trip preserves binary payloads and typed meta") {
    val dir = java.nio.file.Files.createTempDirectory("graft-media").toString + "/m"
    media.write.mode("overwrite").parquet(dir)
    val back = readMedia(spark, dir)
    val row = back.filter($"media_id" === 1L).head()
    assert(row.payload.toSeq == gradientPng.toSeq)
    assert(row.meta == MediaMeta("png", 4, 4, 3, 0L))
  }

  test("checked-in PNG fixture decodes to known exact pixel stats") {
    val img = Codecs.decodeImage(readFixture("gradient4x4.png")).get
    assert(img.getWidth == 4 && img.getHeight == 4)
    // pixel i = i*17 gray: dim=1 mean = 17 * (0+..+15)/16 = 127.5
    assert(Codecs.gridEmbedding(img, 1).toSeq == Seq(127.5f))
    // dim=4 → 4-pixel bins: means 17*(1.5, 5.5, 9.5, 13.5)
    assert(Codecs.gridEmbedding(img, 4).toSeq == Seq(25.5f, 93.5f, 161.5f, 229.5f))
  }

  test("checked-in JPEG fixture decodes with real dimensions and stats") {
    val img = Codecs.decodeImage(readFixture("gray8x8.jpg")).get
    assert(img.getWidth == 8 && img.getHeight == 8)
    // constant-gray JPEG is DC-only: decodes back to exactly 128
    assert(Codecs.gridEmbedding(img, 1).toSeq == Seq(128.0f))
  }

  test("feature extraction decodes real pixels; payload-free downstream") {
    val f = extractImageFeatures(media, dim = 1).collect()
      .map(r => r.media_id -> r).toMap
    // gradient: mean gray = 127.5 exactly (lossless PNG round-trip)
    assert(f(1L).width == 4 && f(1L).height == 4)
    assert(f(1L).embedding.toSeq == Seq(127.5f))
    // colored 2x2: mean luminance = (85 + 85 + 85 + 255)/4 = 127.5
    assert(f(2L).embedding.toSeq == Seq(127.5f))
    assert(!extractImageFeatures(media).schema.fieldNames.contains("payload"))
  }

  test("undecodable payloads are dropped, not fatal") {
    val withJunk = media.union(Seq(
      MediaRow(9L, "image", Array.tabulate(64)(_.toByte), MediaMeta("?", 0, 0, 0, 0L))).toDS())
    val ids = extractImageFeatures(withJunk, dim = 1).collect().map(_.media_id).toSet
    // 3L decodes too: a PNG-sequence payload starts with a PNG, so ImageIO
    // reads frame 0; only the genuinely undecodable row is dropped
    assert(ids == Set(1L, 2L, 3L))
    assert(!ids.contains(9L))
  }

  test("resize: nearest-neighbor downscale, smaller images pass through") {
    val img16 = Codecs.grayPng(Array.tabulate(256)(i => i % 256), 16, 16)
    val src = Seq(MediaRow(7L, "image", img16, MediaMeta("png", 16, 16, 3, 0L))).toDS()
    val resized = resizeImages(src, maxDim = 8).head()
    val back = Codecs.decodeImage(resized.payload).get
    assert(back.getWidth == 8 && back.getHeight == 8)
    assert(resized.meta.width == 8 && resized.meta.height == 8)
    // nearest-neighbor: dst(x,y) = src(2x, 2y) = gray value (2y*16 + 2x)
    assert((back.getRGB(3, 2) & 0xff) == (4 * 16 + 6))
    // already-small image passes through byte-identical
    val small = resizeImages(media.filter($"media_id" === 2L), 8).head()
    assert(small.payload.toSeq == colorPng.toSeq)
  }

  test("frame sampling: real decodable PNG frames at each stride") {
    val frames = sampleFrames(media, everyMs = 1000).collect().sortBy(_.frame_index)
    assert(frames.forall(_.media_id == 3L))
    assert(frames.length == 3) // 3000ms / 1000ms
    assert(frames.map(_.offsetMs).toSeq == Seq(0L, 1000L, 2000L))
    // each sampled frame decodes standalone to its constant gray value
    frames.zipWithIndex.foreach { case (fr, i) =>
      val img = Codecs.decodeImage(fr.frame).get
      assert(img.getWidth == 2 && img.getHeight == 2)
      assert(Codecs.gridEmbedding(img, 1).toSeq == Seq((i * 100).toFloat))
    }
  }

  test("features join back to a metadata table without payload shuffle") {
    val meta = Seq((1L, "catalog-a"), (2L, "catalog-b")).toDF("id", "source")
    val joined = joinFeatures(extractImageFeatures(media), meta, "id")
    assert(joined.count() == 2)
    assert(joined.columns.contains("embedding") && !joined.columns.contains("payload"))
  }

  test("textToPngPayload: lossless round-trip, bin mean = char-code mean") {
    val text = "Hello, Spark! " * 30 // > 256 chars, ASCII
    val img = Codecs.decodeImage(textToPngPayload(text)).get
    assert(img.getWidth == 16 && img.getHeight == 16)
    val e = Codecs.gridEmbedding(img, 8)
    val padded = text.substring(0, 256)
    val expected0 = padded.take(32).map(_.toInt).sum / 32.0f
    assert(e(0) == expected0)
    // non-ASCII chars are stripped before rendering
    val img2 = Codecs.decodeImage(textToPngPayload("caf\u00e9" + " " * 300)).get
    val e2 = Codecs.gridEmbedding(img2, 8)
    val exp2 = ("caf" + " " * 29).map(_.toInt).sum / 32.0f
    assert(e2(0) == exp2)
  }

  test("WAV round-trip: canonical PCM16 encode decodes through the real " +
      "AudioSystem to the same samples") {
    val samples = Array(0, 100, -100, 32767, -32768, 12345, -1)
    val wav = AudioCodecs.pcm16Wav(samples, 8000)
    val (rate, back) = AudioCodecs.decodeWav(wav).get
    assert(rate == 8000)
    assert(back.toSeq == samples.toSeq)
    // corrupt bytes drop, not fail
    assert(AudioCodecs.decodeWav("not audio".getBytes).isEmpty)
    assert(AudioCodecs.decodeWav(gradientPng).isEmpty)
  }

  test("non-canonical but valid WAV falls back to javax.sound (fast path declines)") {
    val samples = Array(7, -7, 300, -300)
    val wav = AudioCodecs.pcm16Wav(samples, 8000)
    // insert a LIST chunk (8-byte header + 4 bytes) between fmt and data:
    // the canonical-layout fast path must decline, javax.sound must parse
    val list = Array[Byte]('L', 'I', 'S', 'T', 4, 0, 0, 0, 'I', 'N', 'F', 'O')
    val shifted = java.nio.ByteBuffer
      .allocate(wav.length + list.length)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    shifted.put(wav, 0, 4)
    shifted.putInt(java.nio.ByteBuffer.wrap(wav, 4, 4)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN).getInt + list.length)
    shifted.put(wav, 8, 28) // WAVE + fmt chunk
    shifted.put(list)
    shifted.put(wav, 36, wav.length - 36) // data chunk
    val (rate, back) = AudioCodecs.decodeWav(shifted.array()).get
    assert(rate == 8000)
    assert(back.toSeq == samples.toSeq)
    // truncated data chunk: header claims more than the payload carries —
    // the fast path must decline rather than read garbage
    val truncated = wav.dropRight(2)
    // (javax.sound may still decode the shortened stream; the contract
    // here is only "no crash, no out-of-bounds read")
    AudioCodecs.decodeWav(truncated)
  }

  test("audio features: integer energy bins from the decoded samples, " +
      "payload-free downstream") {
    val m = Seq(
      MediaRow(1L, "audio", AudioCodecs.pcm16Wav(Array(2, -3, 4, 5), 8000),
        MediaMeta("wav", 0, 0, 1, 1L)),
      MediaRow(2L, "audio", "junk".getBytes, MediaMeta("wav", 0, 0, 1, 0L))
    ).toDS()
    val feats = extractAudioFeatures(m, dim = 2).collect()
    assert(feats.length == 1, "undecodable audio must drop")
    val f = feats.head
    assert(f.media_id == 1L && f.sample_rate == 8000 && f.n_samples == 4)
    // bins of floor(i*2/4): {2,-3} and {4,5}
    assert(f.energy.toSeq == Seq(4L + 9L, 16L + 25L))
  }

  test("downsample: decimation halves the samples and the rate, " +
      "non-audio passes through") {
    val m = Seq(MediaRow(1L, "audio",
      AudioCodecs.pcm16Wav(Array(10, 20, 30, 40, 50), 8000),
      MediaMeta("wav", 0, 0, 1, 1L))).toDS()
    val down = downsampleAudio(m, 2).collect().head
    val (rate, samples) = AudioCodecs.decodeWav(down.payload).get
    assert(rate == 4000)
    assert(samples.toSeq == Seq(10, 30, 50))
  }

  test("textToWavPayload: energy bin 0 = exact char-code arithmetic") {
    val text = "Hello, audio! " * 50 // > 512 printable chars
    val (rate, samples) = AudioCodecs.decodeWav(textToWavPayload(text)).get
    assert(rate == 8000 && samples.length == 512)
    val e = AudioCodecs.energyBins(samples, 8)
    val expected0 = text.substring(0, 64).map(c => {
      val v = (c - 64) * 256L; v * v }).sum
    assert(e(0) == expected0)
  }

  test("voicedSegments: hand-built frame pattern → exact islands census") {
    import spark.implicits._
    // 8 frames of 64 samples; frames 1,2 and 5 loud, rest silent →
    // 2 segments, 3 voiced, longest run 2
    val loud = Array.fill(64)(10000)
    val quiet = Array.fill(64)(0)
    val pattern = Array(quiet, loud, loud, quiet, quiet, loud, quiet, quiet)
    val samples = pattern.flatten
    val wav = AudioCodecs.pcm16Wav(samples, 8000)
    val media = Seq((7L, wav)).toDF("media_id", "payload")
      .as[(Long, Array[Byte])]
      .map { case (id, p) =>
        MediaRow(id, "audio", p, MediaMeta("wav", 0, 0, 1, 64L)) }
    val r = Multimodal.voicedSegments(media, frameSize = 64,
        threshold = 1000000L)
      .as[(Long, Long, Long, Long, Long)].head()
    assert(r == ((7L, 8L, 3L, 2L, 2L)))
    // corrupt payload drops
    val bad = Seq((8L, Array[Byte](1, 2, 3))).toDF("media_id", "payload")
      .as[(Long, Array[Byte])]
      .map { case (id, p) =>
        MediaRow(id, "audio", p, MediaMeta("wav", 0, 0, 1, 0L)) }
    assert(Multimodal.voicedSegments(bad, 64, 0L).count() == 0L)
  }

  test("imageNearDupPairs: identical payloads hit cos 1.0, disjoint texts don't pair") {
    import spark.implicits._
    val texts = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta"),
      (2L, "alpha beta gamma delta epsilon zeta eta theta"), // exact dup
      (3L, "%%%%%%%% ######## @@@@@@@@ !!!!!!!! ________"))
    val media = texts.toDF("doc_id", "text").as[(Long, String)]
      .map { case (id, t) =>
        MediaRow(id, "image", textToPngPayload(t), MediaMeta("png", 16, 16, 3, 0L)) }
    val r = imageNearDupPairs(media, dim = 8, idWindow = 25, minCos = 0.9999)
      .as[(Long, Long, Double)].collect().toSeq
    assert(r.contains((1L, 2L, 1.0)))
    assert(!r.exists(t => t._2 == 3L))
  }

  test("gridSums: integer bin sums from known gray pixels") {
    import Multimodal.Codecs
    // 16×16 all-'a' (97): 256 px, bin = 32 px, sum = 3·97·32 = 9312
    val png = Multimodal.textToPngPayload("a" * 256)
    val img = Codecs.decodeImage(png).get
    assert(Codecs.gridSums(img, 8).toSeq == Seq.fill(8)(9312L))
  }

  test("shotCensus: hand-computed L1 distances, threshold, islands") {
    import Multimodal.{Codecs, MediaMeta, MediaRow}
    // frames: 'a'*256, 'a'*256 (dist 0), 'b'*256 (per-bin |3·32·1| = 96,
    // L1 over 8 bins = 768), 'b'*256 (dist 0)
    val fa = Multimodal.textToPngPayload("a" * 256)
    val fb = Multimodal.textToPngPayload("b" * 256)
    val video = Seq(fa, fa, fb, fb).reduce(_ ++ _)
    val media = Seq(MediaRow(1L, "video", video,
      MediaMeta("png", 16, 16, 3, 0L))).toDS()
    val low = Multimodal.shotCensus(media, dim = 8, threshold = 700L)
      .as[(Long, Long, Long, Long, Long, Long)].head()
    assert(low == ((1L, 4L, 1L, 2L, 768L, 768L)), low.toString)
    val high = Multimodal.shotCensus(media, dim = 8, threshold = 800L)
      .as[(Long, Long, Long, Long, Long, Long)].head()
    assert(high == ((1L, 4L, 0L, 1L, 768L, 768L)), high.toString)
    // single-frame container: no transition evidence → dropped
    val one = Seq(MediaRow(2L, "video", fa,
      MediaMeta("png", 16, 16, 3, 0L))).toDS()
    assert(Multimodal.shotCensus(one, 8, 0L).count() == 0L)
  }
}
