package graft.multimodal

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.imageio.ImageIO

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal (image/audio/video) columns for training-data pipelines
  * (NOT-IN-REFERENCE extension).
  *
  * Design: media payloads are opaque `binary` columns with a typed metadata
  * struct; per-item compute (decode, feature-extract, resize, frame-sample)
  * runs as `mapPartitions`/`flatMap` over a typed Dataset — the JVM analogue
  * of arrow-batched Python `mapInPandas`: one task per partition, items
  * streamed through without materializing the partition, output batched by
  * the encoder. At 100 TB the binary column dominates IO, so every operator
  * here projects the minimum columns first (payload + id), keeps results
  * columnar, and never shuffles payload bytes (joins carry ids + features
  * only).
  *
  * Image codecs are REAL: [[Codecs]] decodes PNG/JPEG/GIF/BMP through the
  * JDK's `javax.imageio` (no external deps) and computes grid-pooled
  * luminance embeddings from actual decoded pixels. Gray-PNG round-trips are
  * lossless and the bin means are exact dyadic rationals, so the feature
  * query (`x1`) is oracle-able bit-for-bit in SQL. Video remains a
  * frame-container convention (concatenated PNG frames — the JDK ships no
  * video codec): [[Codecs.splitPngFrames]] splits the container and each
  * sampled frame is itself a real decodable PNG.
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
  final case class VoicedSegments(media_id: Long, n_frames: Long,
      n_voiced: Long, n_segments: Long, longest_run: Long)
  final case class ShotCensus(media_id: Long, n_frames: Long,
      n_boundaries: Long, n_shots: Long, max_dist: Long, total_dist: Long)

  /** Real JDK-ImageIO codec layer. Every function is deterministic in the
    * payload bytes: decode is exact for lossless formats (PNG/BMP/GIF),
    * resize uses integer nearest-neighbor (no AA/interpolation jitter), and
    * embeddings are integer-sum bin means. */
  object Codecs {
    // ImageIO defaults to a FILE-backed stream cache: every decode/encode
    // creates (and deletes) a temp file, which turns a 200k-frame codec
    // pass into an IO-bound super-linear crawl (measured: x7 16.8× for
    // 10× data isolated). Byte-array payloads gain nothing from disk
    // caching — keep the streams in memory.
    ImageIO.setUseCache(false)

    /** Decode any ImageIO-supported payload (PNG, JPEG, GIF, BMP).
      * None for bytes that are not a supported image. */
    def decodeImage(payload: Array[Byte]): Option[BufferedImage] =
      try Option(ImageIO.read(new ByteArrayInputStream(payload)))
      catch { case _: java.io.IOException => None }

    /** Grid-pooled luminance embedding from DECODED pixels: flatten
      * row-major, bin pixel i into `floor(i*dim/n)`, mean luminance
      * `(r+g+b)/3` per bin. For grayscale pixels the luminance is the exact
      * sample value, and when the bin size is a power of two the mean is an
      * exact dyadic rational — representable identically in Float, Double,
      * and SQL (the `x1` oracle depends on this). */
    def gridEmbedding(img: BufferedImage, dim: Int): Array[Float] = {
      val w = img.getWidth; val h = img.getHeight
      val n = w.toLong * h
      val sums = new Array[Double](dim)
      val counts = new Array[Int](dim)
      var i = 0L; var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val rgb = img.getRGB(x, y)
          val lum = (((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff)) / 3.0
          val b = (i * dim / n).toInt
          sums(b) += lum; counts(b) += 1
          i += 1; x += 1
        }
        y += 1
      }
      Array.tabulate(dim)(b => if (counts(b) == 0) 0f else (sums(b) / counts(b)).toFloat)
    }

    /** Grid-pooled INTEGER luminance sums: bin pixel i (row-major) into
      * `floor(i*dim/n)`, per-bin Σ(r+g+b) — the all-integer sibling of
      * [[gridEmbedding]] (no division at all), so frame-difference
      * arithmetic downstream is pure LONG and replays exactly. */
    def gridSums(img: BufferedImage, dim: Int): Array[Long] = {
      val w = img.getWidth; val h = img.getHeight
      val n = w.toLong * h
      val sums = new Array[Long](dim)
      var i = 0L; var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val rgb = img.getRGB(x, y)
          val b = (i * dim / n).toInt
          sums(b) += ((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff)
          i += 1; x += 1
        }
        y += 1
      }
      sums
    }

    /** Encode as PNG (lossless; the only JDK writer that round-trips RGB
      * exactly). */
    def encodePng(img: BufferedImage): Array[Byte] = {
      val out = new ByteArrayOutputStream()
      ImageIO.write(img, "png", out)
      out.toByteArray
    }

    /** Build a w×h gray image (stored as RGB so `getRGB` returns the raw
      * sample — TYPE_BYTE_GRAY would colorspace-convert) from row-major
      * byte values, and encode it as PNG. */
    def grayPng(values: Array[Int], w: Int, h: Int): Array[Byte] = {
      require(values.length == w * h, s"need ${w * h} values, got ${values.length}")
      val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
      var i = 0
      while (i < values.length) {
        val v = values(i) & 0xff
        img.setRGB(i % w, i / w, (v << 16) | (v << 8) | v)
        i += 1
      }
      encodePng(img)
    }

    /** Deterministic integer nearest-neighbor resize (src pixel
      * `(x*srcW)/dstW` — no Graphics2D interpolation, which varies with
      * rendering hints). */
    def resizeImage(img: BufferedImage, dstW: Int, dstH: Int): BufferedImage = {
      val out = new BufferedImage(dstW, dstH, BufferedImage.TYPE_INT_RGB)
      var y = 0
      while (y < dstH) {
        val sy = (y.toLong * img.getHeight / dstH).toInt
        var x = 0
        while (x < dstW) {
          val sx = (x.toLong * img.getWidth / dstW).toInt
          out.setRGB(x, y, img.getRGB(sx, sy) & 0xffffff)
          x += 1
        }
        y += 1
      }
      out
    }

    private val PngSig: Array[Byte] =
      Array(0x89.toByte, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a)

    /** Split a concatenated-PNG frame container into individual PNG byte
      * arrays (our "video" convention — MJPEG-style, but lossless). */
    def splitPngFrames(payload: Array[Byte]): IndexedSeq[Array[Byte]] = {
      val starts = scala.collection.mutable.ArrayBuffer[Int]()
      var i = 0
      while (i <= payload.length - PngSig.length) {
        if (payload(i) == PngSig(0) && PngSig.indices.forall(j => payload(i + j) == PngSig(j))) {
          starts += i
          i += PngSig.length
        } else i += 1
      }
      starts.toIndexedSeq.zipWithIndex.map { case (s, k) =>
        val end = if (k + 1 < starts.length) starts(k + 1) else payload.length
        java.util.Arrays.copyOfRange(payload, s, end)
      }
    }
  }

  final case class AudioFeatures(media_id: Long, sample_rate: Int,
      n_samples: Int, energy: Array[Long])

  /** Real JDK audio codec layer (`javax.sound.sampled` — no external
    * deps): canonical PCM16 mono WAV write, AudioSystem decode, and
    * integer-exact features. Deterministic in the payload bytes, like
    * [[Codecs]]. */
  object AudioCodecs {
    /** Encode signed 16-bit mono samples as a canonical 44-byte-header
      * RIFF/WAVE payload (PCM, little-endian). */
    def pcm16Wav(samples: Array[Int], sampleRate: Int): Array[Byte] = {
      val dataLen = samples.length * 2
      val buf = java.nio.ByteBuffer.allocate(44 + dataLen)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      buf.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
        .put("WAVE".getBytes("US-ASCII"))
        .put("fmt ".getBytes("US-ASCII")).putInt(16)
        .putShort(1).putShort(1) // PCM, mono
        .putInt(sampleRate).putInt(sampleRate * 2)
        .putShort(2).putShort(16) // block align, bits
        .put("data".getBytes("US-ASCII")).putInt(dataLen)
      samples.foreach(s => buf.putShort(s.toShort))
      buf.array()
    }

    /** REAL decode through `javax.sound.sampled.AudioSystem`: returns
      * (sampleRate, samples) for PCM-signed 16-bit mono payloads, None
      * for bytes that are not decodable audio (corrupt media filters,
      * not fails — same contract as [[Codecs.decodeImage]]). */
    /** Fast path for OUR canonical PCM16 layout ([[pcm16Wav]]'s exact
      * 44-byte header: fmt chunk of 16, PCM, mono, 16-bit, data chunk
      * immediately after). `AudioSystem.getAudioInputStream` walks the
      * provider registry per call (~140 µs for a 1 KB payload — measured
      * as the whole x2/x6 sf1 tail); a strict header check + direct
      * little-endian sample read is ~100× cheaper and byte-identical on
      * this layout. ANY deviation falls through to javax.sound, so
      * foreign-but-valid WAVs still decode and corrupt payloads still
      * drop through the same guarded path. */
    private def decodeCanonicalPcm16(payload: Array[Byte]): Option[(Int, Array[Int])] = {
      if (payload.length < 44) return None
      val bb = java.nio.ByteBuffer.wrap(payload)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      def tag(off: Int, s: String): Boolean =
        s.indices.forall(i => payload(off + i) == s.charAt(i).toByte)
      if (!tag(0, "RIFF") || !tag(8, "WAVE") || !tag(12, "fmt ") ||
        !tag(36, "data")) return None
      if (bb.getInt(16) != 16 || bb.getShort(20) != 1 /* PCM */ ||
        bb.getShort(22) != 1 /* mono */ || bb.getShort(34) != 16) return None
      val rate = bb.getInt(24)
      val dataLen = bb.getInt(40)
      if (rate <= 0 || dataLen < 0 || 44 + dataLen > payload.length ||
        (dataLen & 1) == 1) return None
      val out = new Array[Int](dataLen / 2)
      var i = 0
      while (i < out.length) { out(i) = bb.getShort(44 + i * 2).toInt; i += 1 }
      Some((rate, out))
    }

    def decodeWav(payload: Array[Byte]): Option[(Int, Array[Int])] = {
      val fast = decodeCanonicalPcm16(payload)
      if (fast.isDefined) return fast
      try {
        val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
          new ByteArrayInputStream(payload))
        try {
          val f = ais.getFormat
          if (f.getEncoding != javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED
              || f.getSampleSizeInBits != 16 || f.getChannels != 1) None
          else {
            val bytes = ais.readAllBytes()
            val bb = java.nio.ByteBuffer.wrap(bytes).order(
              if (f.isBigEndian) java.nio.ByteOrder.BIG_ENDIAN
              else java.nio.ByteOrder.LITTLE_ENDIAN)
            val out = new Array[Int](bytes.length / 2)
            var i = 0
            while (i < out.length) { out(i) = bb.getShort(i * 2).toInt; i += 1 }
            Some((f.getSampleRate.toInt, out))
          }
        } finally ais.close()
      } catch {
        case _: javax.sound.sampled.UnsupportedAudioFileException => None
        case _: java.io.IOException => None
      }
    }

    /** Per-bin ENERGY (sum of squared samples) with the same
      * `floor(i*dim/n)` binning as [[Codecs.gridEmbedding]] — pure Long
      * arithmetic, so the value replays exactly in SQL (no FP
      * association anywhere). */
    def energyBins(samples: Array[Int], dim: Int): Array[Long] = {
      val n = samples.length.toLong
      val out = new Array[Long](dim)
      var i = 0
      while (i < samples.length) {
        out((i * dim / n).toInt) += samples(i).toLong * samples(i)
        i += 1
      }
      out
    }

    /** Integer decimation resample: keep every `factor`-th sample. */
    def decimate(samples: Array[Int], factor: Int): Array[Int] = {
      require(factor > 0)
      Array.tabulate((samples.length + factor - 1) / factor)(i => samples(i * factor))
    }
  }

  /** Render printable-ASCII text into a real mono PCM16 WAV: char i maps
    * to sample `(code - 64) * 256` (signed, within int16), padded or
    * truncated to `n` samples. The `x2` counterpart of
    * [[textToPngPayload]] — the payload round-trips through a genuine
    * AudioSystem decode and the energy bins are exact integers. */
  def textToWavPayload(text: String, n: Int = 512,
      sampleRate: Int = 8000): Array[Byte] = {
    val clean = text.replaceAll("[^ -~]", "")
    val padded =
      if (clean.length >= n) clean.substring(0, n)
      else clean + (" " * (n - clean.length))
    AudioCodecs.pcm16Wav(padded.toCharArray.map(c => (c - 64) * 256), sampleRate)
  }

  /** Audio feature extraction: projects (id, payload), streams partitions
    * through the REAL AudioSystem decoder, emits integer energy bins.
    * Undecodable payloads drop; output carries no payload. */
  def extractAudioFeatures(media: Dataset[MediaRow],
      dim: Int = 8): Dataset[AudioFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.flatMap { m =>
      AudioCodecs.decodeWav(m.payload).map { case (rate, samples) =>
        AudioFeatures(m.media_id, rate, samples.length,
          AudioCodecs.energyBins(samples, dim))
      }
    })
  }

  /** Voice-activity-style segment census (the audio analogue of e20's
    * gaps-and-islands): decode → fixed `frameSize`-sample frames (full
    * frames only) → per-frame ENERGY (Σ sample², pure Long) → frames
    * above `threshold` are "voiced" → contiguous voiced frames merge
    * into segments, all inside ONE partition-local pass (the islands
    * run-length state is three ints; payloads never shuffle).
    * Undecodable payloads drop — the corrupt-media filter contract. */
  def voicedSegments(media: Dataset[MediaRow], frameSize: Int,
      threshold: Long): Dataset[VoicedSegments] = {
    require(frameSize > 0, "frameSize must be positive")
    import media.sparkSession.implicits._
    media.mapPartitions(_.flatMap { m =>
      AudioCodecs.decodeWav(m.payload).map { case (_, samples) =>
        val nf = samples.length / frameSize
        var seg = 0L; var voiced = 0L; var longest = 0L; var run = 0L
        var f = 0
        while (f < nf) {
          var e = 0L
          var i = f * frameSize
          val end = i + frameSize
          while (i < end) { e += samples(i).toLong * samples(i); i += 1 }
          if (e > threshold) {
            voiced += 1; run += 1
            if (run == 1L) seg += 1
            if (run > longest) longest = run
          } else run = 0L
          f += 1
        }
        VoicedSegments(m.media_id, nf.toLong, voiced, seg, longest)
      }
    })
  }

  /** Shot-boundary detection over concatenated-PNG frame containers (the
    * x3 video convention): decode every frame IN-PARTITION (payloads never
    * shuffle), per-frame integer grid sums ([[Codecs.gridSums]]), L1
    * distance between consecutive frames, a boundary wherever the distance
    * exceeds `threshold` — shots = boundaries + 1 (the e20 islands shape
    * applied in-codec, like x6 did for audio). Everything after decode is
    * pure LONG arithmetic. Videos with < 2 decodable frames carry no
    * transition evidence and drop. */
  def shotCensus(media: Dataset[MediaRow], dim: Int,
      threshold: Long): Dataset[ShotCensus] = {
    require(dim > 0, "dim must be positive")
    import media.sparkSession.implicits._
    media.mapPartitions(_.flatMap { m =>
      val frames = Codecs.splitPngFrames(m.payload)
        .flatMap(f => Codecs.decodeImage(f))
      if (frames.length < 2) None
      else {
        val sums = frames.map(f => Codecs.gridSums(f, dim))
        val dists = sums.sliding(2).map { pair =>
          val a = pair(0); val b = pair(1)
          var d = 0L; var i = 0
          while (i < dim) { d += math.abs(a(i) - b(i)); i += 1 }
          d
        }.toIndexedSeq
        val nb = dists.count(_ > threshold).toLong
        Some(ShotCensus(m.media_id, frames.length.toLong, nb, nb + 1,
          dists.max, dists.sum))
      }
    })
  }

  /** Downsample pass: decode → keep every `factor`-th sample → re-encode
    * WAV at the reduced rate. Payload-in payload-out, partition-local, no
    * shuffle; rows that don't decode pass through unchanged. */
  def downsampleAudio(media: Dataset[MediaRow], factor: Int): Dataset[MediaRow] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.map { m =>
      AudioCodecs.decodeWav(m.payload) match {
        case Some((rate, samples)) =>
          m.copy(payload = AudioCodecs.pcm16Wav(
            AudioCodecs.decimate(samples, factor), rate / factor))
        case None => m
      }
    })
  }

  /** Render printable-ASCII text into a real w×h gray PNG (pixel = char
    * code, row-major, space-padded/truncated to w·h chars). Used by `x1` so
    * the feature path exercises a genuine ImageIO encode→decode round-trip
    * while staying SQL-oracle-able (gray PNG is lossless; bin means are
    * exact). */
  def textToPngPayload(text: String, w: Int = 16, h: Int = 16): Array[Byte] = {
    val n = w * h
    val clean = text.replaceAll("[^ -~]", "")
    val padded =
      if (clean.length >= n) clean.substring(0, n)
      else clean + (" " * (n - clean.length))
    Codecs.grayPng(padded.toCharArray.map(_.toInt), w, h)
  }

  /** Schema-bearing reader: parquet with (media_id, kind, payload, meta). */
  def readMedia(spark: SparkSession, path: String): Dataset[MediaRow] = {
    import spark.implicits._
    spark.read.parquet(path).as[MediaRow]
  }

  /** Feature extraction: projects (id, payload) ONLY — metadata and any
    * sibling columns are pruned before the scan — then streams partitions
    * through the REAL ImageIO decoder. Width/height come from the decoded
    * image, not the metadata. Undecodable payloads are dropped (the 100 TB
    * behavior: corrupt media is filtered, not fatal). Output carries no
    * payload: safe to shuffle. */
  def extractImageFeatures(media: Dataset[MediaRow], dim: Int = 64): Dataset[ImageFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.flatMap { m =>
        Codecs.decodeImage(m.payload).map { img =>
          ImageFeatures(m.media_id, img.getWidth, img.getHeight,
            Codecs.gridEmbedding(img, dim))
        }
      }
    }
  }

  /** ViT-style PATCHIFY: decode → split into p×p-pixel tiles in row-major
    * grid order → re-encode every tile as its own lossless PNG MediaRow
    * (composite id `parent·100 + row·10 + col` — grids up to 10×10). The
    * downstream contract is the ViT ingestion shape: a patch-token stream
    * whose payloads are independently decodable, so embedding/masking
    * stages shard over patches, not images. Tiles are drawn into fresh
    * buffers (a subimage VIEW shares the parent raster — encoding views
    * drags the whole image through every tile). Partition-local map, no
    * shuffle; undecodable parents drop (corrupt media is filtered, not
    * fatal); edge remainders smaller than p are cropped away (the ViT
    * convention). Parents whose grid exceeds the 10×10 the composite id
    * can address DROP like corrupt media does (filtered, not fatal —
    * a distributed map must never fail the whole job over one row). */
  def patchGrid(media: Dataset[MediaRow], patch: Int): Dataset[MediaRow] = {
    require(patch >= 1, s"patch must be positive, got $patch")
    import media.sparkSession.implicits._
    media.mapPartitions(_.flatMap { m =>
      Codecs.decodeImage(m.payload).iterator.flatMap { img =>
        val rows = img.getHeight / patch; val cols = img.getWidth / patch
        if (rows > 10 || cols > 10) Iterator.empty
        else for (pr <- 0 until rows; pc <- 0 until cols) yield {
          val tile = new BufferedImage(patch, patch, BufferedImage.TYPE_INT_RGB)
          val g = tile.createGraphics()
          try g.drawImage(img.getSubimage(pc * patch, pr * patch, patch, patch),
            0, 0, null)
          finally g.dispose()
          // channels = 3 always: the tile buffer is forced TYPE_INT_RGB and
          // re-encoded as RGB PNG regardless of the parent's channel count.
          MediaRow(m.media_id * 100L + pr * 10L + pc, "image",
            Codecs.encodePng(tile),
            MediaMeta("png", patch, patch, 3, 0L))
        }
      }
    })
  }

  /** Resize pass: decode → nearest-neighbor downscale so the longest edge is
    * ≤ maxDim → re-encode PNG. Payload-in payload-out, partition-local, no
    * shuffle. Rows that don't decode, or already fit, pass through
    * unchanged (a resize pass must not drop data). */
  def resizeImages(media: Dataset[MediaRow], maxDim: Int): Dataset[MediaRow] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.map { m =>
      Codecs.decodeImage(m.payload) match {
        case Some(img) if math.max(img.getWidth, img.getHeight) > maxDim =>
          val scale = maxDim.toDouble / math.max(img.getWidth, img.getHeight)
          val dw = math.max(1, math.round(img.getWidth * scale).toInt)
          val dh = math.max(1, math.round(img.getHeight * scale).toInt)
          m.copy(payload = Codecs.encodePng(Codecs.resizeImage(img, dw, dh)),
            meta = m.meta.copy(width = dw, height = dh))
        case _ => m
      }
    })
  }

  /** Frame sampling for video rows (concatenated-PNG container): `everyMs`
    * stride over the duration, emitting the REAL PNG frame nearest each
    * offset — a flatMap, so output cardinality = Σ duration/stride without
    * collecting any video. Each emitted frame decodes standalone. */
  def sampleFrames(media: Dataset[MediaRow], everyMs: Long): Dataset[FrameSample] = {
    import media.sparkSession.implicits._
    media.filter(col("kind") === "video").flatMap { m =>
      val frames = Codecs.splitPngFrames(m.payload)
      if (frames.isEmpty) Iterator.empty
      else {
        val n = math.max(1, (m.meta.durationMs / everyMs).toInt)
        (0 until n).iterator.map { i =>
          val offset = i * everyMs
          val idx = math.min(frames.length - 1,
            (offset * frames.length / math.max(1L, m.meta.durationMs)).toInt)
          FrameSample(m.media_id, i, offset, frames(idx))
        }
      }
    }
  }

  /** Join features back to a metadata table by id — payload never shuffles. */
  def joinFeatures(features: Dataset[ImageFeatures], metaTable: DataFrame,
      idCol: String): DataFrame =
    metaTable.join(features.toDF(), metaTable(idCol) === features("media_id"))

  /** Image near-duplicate pairs — the multimodal dedup pass: decode +
    * grid-embed in-partition ([[extractImageFeatures]] — payloads never
    * shuffle), then pair rank-adjacent ids with the banded id-block join
    * (the d4 trick: left side exploded into its two reachable blocks →
    * shuffle hash join, ~2·window partners per embedding, never all
    * pairs) and keep pairs whose embedding cosine clears `minCos`
    * (rounded to 6 BEFORE the threshold — the d17 replay rule).
    *
    * Only the `dim`-float embeddings enter the join; 16×16 gray payloads
    * with power-of-two bins make every embedding value an exact dyadic
    * rational, so the cosine tree replays bit-for-bit. */
  def imageNearDupPairs(media: Dataset[MediaRow], dim: Int = 8,
      idWindow: Long = 25, minCos: Double = 0.9999): DataFrame = {
    import org.apache.spark.sql.functions._
    val emb = extractImageFeatures(media, dim).toDF()
      .select(col("media_id").as("id"),
        col("embedding").cast("array<double>").as("v"))
    val a = emb.select(col("id"), col("v"),
      explode(array((col("id") / idWindow).cast("long"),
        (col("id") / idWindow).cast("long") + 1)).as("block")).alias("a")
    val b = emb.withColumn("block", (col("id") / idWindow).cast("long")).alias("b")
    val cos = graft.sim.Embeddings.cosine(col("a.v"), col("b.v"))
    a.join(b, col("a.block") === col("b.block") &&
        col("b.id") > col("a.id") && col("b.id") <= col("a.id") + idWindow)
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        round(cos, 6).as("cos"))
      .where(col("cos") >= minCos)
      .orderBy(col("id_a"), col("id_b"))
  }
}
