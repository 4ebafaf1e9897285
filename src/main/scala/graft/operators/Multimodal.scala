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

/** Decoded-image features: dimensions, channel count, exact per-channel
  * pixel sums (integers — partitioning-independent and oracle-exact). */
case class ImageFeatures(
    media_id: Long,
    width: Long,
    height: Long,
    n_channels: Long,
    sum_r: Long,
    sum_g: Long,
    sum_b: Long)

/** A nearest-neighbor-resized image: stats of the RESIZED frame plus
  * the losslessly re-encoded payload (PNG). */
case class ResizedImage(
    media_id: Long,
    src_width: Long,
    src_height: Long,
    width: Long,
    height: Long,
    sum_r: Long,
    sum_g: Long,
    sum_b: Long,
    content: Array[Byte])

/** Perceptual difference-hash of a decoded image, split into two 32-bit
  * halves so neither engine touches the BIGINT sign bit. */
case class ImageDHash(
    media_id: Long,
    width: Long,
    height: Long,
    dhash_hi: Long,
    dhash_lo: Long)

/** Perceptual energy-contour fingerprint of a decoded audio clip, split
  * into two 32-bit halves like [[ImageDHash]]. */
case class AudioFingerprint(
    media_id: Long,
    n_samples: Long,
    fp_hi: Long,
    fp_lo: Long)

/** One decoded frame of a multi-frame (video-style) media item: temporal
  * index + dimensions + exact gray-channel pixel sum. */
case class FrameFeatures(
    media_id: Long,
    frame_idx: Long,
    width: Long,
    height: Long,
    sum_gray: Long)

/** Decoded-audio features: container format fields + exact integer
  * sample statistics (partitioning-independent and oracle-exact). */
case class AudioFeatures(
    media_id: Long,
    sample_rate: Long,
    n_channels: Long,
    bits_per_sample: Long,
    n_samples: Long,
    sum_samples: Long,
    min_sample: Long,
    max_sample: Long)

/** A nearest-neighbor-resampled audio clip: stats of the RESAMPLED
  * samples plus the re-encoded 16-bit mono WAV at the target rate. */
case class ResampledAudio(
    media_id: Long,
    src_rate: Long,
    dst_rate: Long,
    n_samples: Long,
    sum_samples: Long,
    min_sample: Long,
    max_sample: Long,
    content: Array[Byte])

/**
 * Multimodal-column handling: treat image/audio/video payloads as opaque
 * `binary` columns with typed metadata, and run decode / feature-extract
 * as a partition-parallel typed transformation.
 *
 * IMAGE decode is REAL: [[decodeImages]] runs the JDK's `javax.imageio`
 * PNG codec inside `mapPartitions` ([[syntheticPng]] provides
 * deterministic closed-form fixtures so the decoded stats are
 * SQL-computable by an engine with no image codec at all).
 *
 * AUDIO decode is REAL for WAV/PCM: [[decodeAudio]] parses the RIFF
 * container + PCM frames through the JDK's `javax.sound.sampled`
 * ([[syntheticWav]] provides closed-form 16-bit mono fixtures for the
 * same codec-free oracle trick).
 *
 * MULTI-FRAME (video-shape) decode is REAL for animated GIF:
 * [[decodeFrames]] walks every frame via `javax.imageio`
 * ([[syntheticGif]] provides closed-form grayscale animations) — the
 * one-row→many-frame-rows temporal fan-out a video pipeline has, with a
 * real codec in the loop.
 *
 * COMPRESSED audio (mp3/ogg) and true video codecs (h264 etc.) remain
 * STUBBED ([[fakeDecode]], [[frameSample]]) — the JDK ships no codec
 * for those and this container has no media libraries; the plumbing
 * (binary schema, `Dataset[T]` encoders, `mapPartitions` batching) is
 * identical and real.
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

  // ---- real image path (JDK javax.imageio, no external codecs) -------

  /** Deterministic synthetic PNG: dimensions and every pixel are a
    * closed-form function of `id`, so an engine with NO image codec (the
    * DuckDB oracle) can independently compute what a REAL decode of these
    * bytes must yield. PNG is lossless — encode→decode round-trips the
    * exact channel values. Formulas (Long arithmetic, id kept small):
    *   w = 8 + id%16, h = 8 + id%12
    *   r = (id*31 + x*7  + y*13) % 256
    *   g = (id*17 + x*11 + y*5 ) % 256
    *   b = (id*29 + x*3  + y*19) % 256
    */
  def syntheticPng(id: Long): Array[Byte] = syntheticImage(id, "png")

  /** Same closed-form pixels, any LOSSLESS `javax.imageio` writer format
    * ("png", "bmp", "gif" — gif only for ≤256-color images, not used
    * here). Lossless is what makes the exact-channel-sum oracle valid. */
  def syntheticImage(id: Long, format: String): Array[Byte] = {
    val w = (8 + id % 16).toInt
    val h = (8 + id % 12).toInt
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val r = ((id * 31 + x * 7 + y * 13) % 256).toInt
        val g = ((id * 17 + x * 11 + y * 5) % 256).toInt
        val b = ((id * 29 + x * 3 + y * 19) % 256).toInt
        img.setRGB(x, y, (r << 16) | (g << 8) | b)
        x += 1
      }
      y += 1
    }
    val out = new java.io.ByteArrayOutputStream()
    val ok = javax.imageio.ImageIO.write(img, format, out)
    require(ok, s"no $format image writer available in this JDK")
    out.toByteArray
  }

  /** Synthetic PNG media table keyed by the documents table's ids —
    * payload generation is partition-parallel (no driver-side loop). */
  def pngMedia(docs: DataFrame, maxId: Long): Dataset[MediaRecord] =
    imageMedia(docs, maxId, "png")

  /** Synthetic image media in any lossless `javax.imageio` format —
    * [[decodeImages]] is codec-generic (`ImageIO.read` sniffs the
    * container), so the same decode path serves every format. */
  def imageMedia(docs: DataFrame, maxId: Long,
                 format: String): Dataset[MediaRecord] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id")).filter(col("doc_id") < maxId)
      .as[Long]
      .mapPartitions(_.map { id =>
        val bytes = syntheticImage(id, format)
        MediaRecord(id, "image", bytes, s"synthetic_$format", bytes.length.toLong)
      })
  }

  /** REAL image decode: `javax.imageio` PNG codec in `mapPartitions`,
    * emitting dimensions, channel count and exact per-channel sums.
    * `getRGB` converts to packed sRGB regardless of the decoder's
    * internal raster layout, so the sums are layout-independent. */
  def decodeImages(media: Dataset[MediaRecord]): Dataset[ImageFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { it =>
      // ImageIO plugin lookup is per-JVM; per-partition reuse is free
      it.map { rec =>
        val img = javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(rec.content))
        require(img != null, s"undecodable image payload for media_id=${rec.media_id}")
        val (w, h) = (img.getWidth, img.getHeight)
        var (sr, sg, sb) = (0L, 0L, 0L)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val rgb = img.getRGB(x, y)
            sr += (rgb >> 16) & 0xff
            sg += (rgb >> 8) & 0xff
            sb += rgb & 0xff
            x += 1
          }
          y += 1
        }
        ImageFeatures(rec.media_id, w.toLong, h.toLong,
          img.getRaster.getNumBands.toLong, sr, sg, sb)
      }
    }
  }

  /**
   * NEAREST-NEIGHBOR image resize — the vision-training preprocessing
   * step (every pipeline normalizes images to a fixed input size before
   * feature extraction). Decode (real codec, `ImageIO.read`), sample
   * destination pixel (x, y) from source pixel
   * `(x·srcW div dstW, y·srcH div dstH)` — EXACT integer index math, no
   * interpolation kernel, no float — then RE-ENCODE losslessly (PNG)
   * and emit the resized frame's channel sums. The index math being
   * pure integer division is what lets a codec-free engine replay the
   * whole op over a closed-form pixel grid (the `mm_resize_nn` oracle);
   * bilinear/bicubic kernels would put floats between the engines.
   * Runs in `mapPartitions` like [[decodeImages]]: per-image work only,
   * embarrassingly parallel at any corpus size.
   */
  def resizeImages(media: Dataset[MediaRecord], dstW: Int,
                   dstH: Int): Dataset[ResizedImage] = {
    require(dstW >= 1 && dstH >= 1, "target dimensions must be >= 1")
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { it =>
      it.map { rec =>
        val img = javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(rec.content))
        require(img != null, s"undecodable image payload for media_id=${rec.media_id}")
        val (sw, sh) = (img.getWidth, img.getHeight)
        val out = new java.awt.image.BufferedImage(
          dstW, dstH, java.awt.image.BufferedImage.TYPE_INT_RGB)
        var (sr, sg, sb) = (0L, 0L, 0L)
        var y = 0
        while (y < dstH) {
          val sy = y * sh / dstH
          var x = 0
          while (x < dstW) {
            val rgb = img.getRGB(x * sw / dstW, sy)
            out.setRGB(x, y, rgb)
            sr += (rgb >> 16) & 0xff
            sg += (rgb >> 8) & 0xff
            sb += rgb & 0xff
            x += 1
          }
          y += 1
        }
        val buf = new java.io.ByteArrayOutputStream()
        require(javax.imageio.ImageIO.write(out, "png", buf),
          "no png image writer available in this JDK")
        ResizedImage(rec.media_id, sw.toLong, sh.toLong,
          dstW.toLong, dstH.toLong, sr, sg, sb, buf.toByteArray)
      }
    }
  }

  /**
   * Perceptual DIFFERENCE HASH (dHash) — the standard image near-dup
   * fingerprint: downsample to a 9×8 brightness grid, emit one bit per
   * horizontally adjacent cell pair (left brighter than right), 64 bits
   * total. This implementation is EXACT-INTEGER end to end so an engine
   * with no image codec can replay it: the "downsample" is block
   * SUMMING (pixel x maps to grid column `x*9 div w`, y to row
   * `y*8 div h`; gray = r+g+b, no division anywhere) and the
   * brightness comparison cross-multiplies the block sums by the
   * opposing block's pixel COUNT (`sumL·nR > sumR·nL` ⟺ meanL > meanR,
   * exactly) — no resampling kernel, no float, no rounding to disagree
   * about. Bit (row j, col i) lands at position j·8+i; bits 0-31 in
   * `dhash_lo`, 32-63 in `dhash_hi` (two halves keep both engines off
   * the BIGINT sign bit). Decode runs in `mapPartitions` like
   * [[decodeImages]]; everything after is per-image arithmetic.
   */
  def imageDHash(media: Dataset[MediaRecord]): Dataset[ImageDHash] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { it =>
      it.map { rec =>
        val img = javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(rec.content))
        require(img != null, s"undecodable image payload for media_id=${rec.media_id}")
        val (w, h) = (img.getWidth, img.getHeight)
        // narrower-than-grid images leave trailing cells EMPTY (count
        // 0); the cross-multiplied comparison treats them consistently
        // (0 > 0 is false) so the hash stays deterministic + replayable
        val sums = Array.ofDim[Long](8, 9)
        val counts = Array.ofDim[Long](8, 9)
        var y = 0
        while (y < h) {
          val j = y * 8 / h
          var x = 0
          while (x < w) {
            val i = x * 9 / w
            val rgb = img.getRGB(x, y)
            sums(j)(i) += ((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff)
            counts(j)(i) += 1
            x += 1
          }
          y += 1
        }
        var hi = 0L; var lo = 0L
        var j = 0
        while (j < 8) {
          var i = 0
          while (i < 8) {
            val bit = sums(j)(i) * counts(j)(i + 1) >
              sums(j)(i + 1) * counts(j)(i)
            if (bit) {
              val pos = j * 8 + i
              if (pos < 32) lo |= 1L << pos else hi |= 1L << (pos - 32)
            }
            i += 1
          }
          j += 1
        }
        ImageDHash(rec.media_id, w.toLong, h.toLong, hi, lo)
      }
    }
  }

  /**
   * Image NEAR-duplicate pairs over [[imageDHash]] fingerprints via
   * banded blocking (never all-pairs): each 64-bit hash splits into
   * four 16-bit quarters; by pigeonhole, two hashes within Hamming
   * distance ≤ 3 agree on at least one quarter — candidate pairs come
   * ONLY from a self-join on (quarter index, quarter value), then exact
   * Hamming (`bit_count(xor)`) filters. Same bucket-local shape as the
   * MinHash LSH family; `maxHamming` > 3 would need more/wider bands
   * (rejected loudly rather than silently losing recall). Returns
   * (a_id, b_id, hamming), a_id < b_id.
   */
  def dhashNearPairs(hashes: Dataset[ImageDHash], maxHamming: Int): DataFrame =
    hashPairs64(hashes.toDF(), "media_id", "dhash_hi", "dhash_lo", maxHamming)

  /** [[dhashNearPairs]] for audio fingerprints — same banding, same
    * guarantee. */
  def audioNearPairs(fps: Dataset[AudioFingerprint],
                     maxHamming: Int): DataFrame =
    hashPairs64(fps.toDF(), "media_id", "fp_hi", "fp_lo", maxHamming)

  /** The generic banded 64-bit-fingerprint pair generator both
    * modalities share (hash in two 32-bit halves). */
  private def hashPairs64(df0: DataFrame, idCol: String, hiCol: String,
                          loCol: String, maxHamming: Int): DataFrame = {
    require(maxHamming >= 0 && maxHamming <= 3,
      s"4x16-bit banding guarantees recall only to Hamming 3, got $maxHamming")
    import org.apache.spark.sql.functions._
    val df = df0.select(col(idCol).as("media_id"),
      col(hiCol).as("dhash_hi"), col(loCol).as("dhash_lo"))
    // quarters: lo bits 0-15 / 16-31, hi bits 0-15 / 16-31
    val quarters = df.select(col("media_id"),
      col("dhash_hi"), col("dhash_lo"),
      explode(array(
        struct(lit(0).as("q"), (col("dhash_lo") % 65536).as("qv")),
        struct(lit(1).as("q"), (col("dhash_lo") / 65536).cast("long").as("qv")),
        struct(lit(2).as("q"), (col("dhash_hi") % 65536).as("qv")),
        struct(lit(3).as("q"), (col("dhash_hi") / 65536).cast("long").as("qv"))))
        .as("b"))
      .select(col("media_id"), col("dhash_hi"), col("dhash_lo"),
        col("b.q").as("q"), col("b.qv").as("qv"))
    val a = quarters.select(col("media_id").as("a_id"),
      col("dhash_hi").as("a_hi"), col("dhash_lo").as("a_lo"),
      col("q"), col("qv"))
    val b = quarters.select(col("media_id").as("b_id"),
      col("dhash_hi").as("b_hi"), col("dhash_lo").as("b_lo"),
      col("q"), col("qv"))
    a.join(b, Seq("q", "qv")).filter(col("a_id") < col("b_id"))
      .select(col("a_id"), col("b_id"),
        (bit_count(col("a_hi").bitwiseXOR(col("b_hi"))) +
          bit_count(col("a_lo").bitwiseXOR(col("b_lo")))).cast("long")
          .as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }

  /** Synthetic NEAR-DUP image media: ids below `half` are
    * [[syntheticImage]] verbatim; ids in [half, 2·half) re-render id -
    * half with ONE pixel's red channel bumped (+1 mod 256 at (0,0)) —
    * a closed-form perturbation an oracle can replay, giving every
    * high id exactly one near-duplicate partner. */
  def nearDupImageMedia(docs: DataFrame, half: Long,
                        format: String): Dataset[MediaRecord] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id")).filter(col("doc_id") < 2 * half)
      .as[Long]
      .mapPartitions(_.map { id =>
        val bytes =
          if (id < half) syntheticImage(id, format)
          else syntheticPerturbedImage(id - half, format)
        MediaRecord(id, "image", bytes, s"synthetic_$format", bytes.length.toLong)
      })
  }

  /** [[syntheticImage]] with the (0,0) red channel bumped +1 mod 256. */
  private def syntheticPerturbedImage(id: Long, format: String): Array[Byte] = {
    val base = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(syntheticImage(id, format)))
    val rgb = base.getRGB(0, 0)
    val r2 = (((rgb >> 16) & 0xff) + 1) % 256
    base.setRGB(0, 0, (r2 << 16) | (rgb & 0xffff))
    val out = new java.io.ByteArrayOutputStream()
    val ok = javax.imageio.ImageIO.write(base, format, out)
    require(ok, s"no $format image writer available in this JDK")
    out.toByteArray
  }

  // ---- real multi-frame path (animated GIF via javax.imageio) --------

  /** Deterministic synthetic ANIMATED GIF: frame count, dimensions and
    * every pixel are a closed form of `id`. Frames are 8-bit grayscale —
    * at most 256 distinct colors, so the GIF palette encodes them
    * LOSSLESSLY and an engine with no codec at all can compute what a
    * real decode must yield. Formulas (Long arithmetic, id kept small):
    *   frames = 2 + id%4,  w = 8 + id%8,  h = 8 + id%6
    *   gray(f, x, y) = (id*31 + f*59 + x*7 + y*13) % 256
    */
  def syntheticGif(id: Long): Array[Byte] = {
    val frames = (2 + id % 4).toInt
    val w = (8 + id % 8).toInt
    val h = (8 + id % 6).toInt
    val out = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(out)
    val writers = javax.imageio.ImageIO.getImageWritersByFormatName("gif")
    require(writers.hasNext, "no GIF image writer available in this JDK")
    val wr = writers.next()
    wr.setOutput(ios)
    wr.prepareWriteSequence(null)
    var f = 0
    while (f < frames) {
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          img.getRaster.setSample(x, y, 0,
            ((id * 31 + f * 59 + x * 7 + y * 13) % 256).toInt)
          x += 1
        }
        y += 1
      }
      wr.writeToSequence(new javax.imageio.IIOImage(img, null, null), null)
      f += 1
    }
    wr.endWriteSequence()
    ios.close()
    out.toByteArray
  }

  /** Synthetic animated-GIF media table keyed by the documents table's
    * ids — payload generation is partition-parallel. */
  def gifMedia(docs: DataFrame, maxId: Long): Dataset[MediaRecord] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id")).filter(col("doc_id") < maxId)
      .as[Long]
      .mapPartitions(_.map { id =>
        val bytes = syntheticGif(id)
        MediaRecord(id, "video", bytes, "synthetic_gif", bytes.length.toLong)
      })
  }

  /** REAL multi-frame decode (the video shape: one media row fans out to
    * many frame rows, partition-parallel, no shuffle): `javax.imageio`
    * walks every frame of an animated container and emits per-frame
    * dimensions + the exact gray-channel pixel sum. Works for any
    * multi-frame format the JDK can read (animated GIF in practice —
    * the JDK ships no real video codec, which is exactly why the
    * fixtures are GIF); an undecodable payload fails loudly. */
  def decodeFrames(media: Dataset[MediaRecord]): Dataset[FrameFeatures] =
    framesImpl(media, every = 1)

  /** FRAME-RATE SAMPLING — the temporal downsampling step a video
    * pipeline runs before featurization (train on every k-th frame, not
    * all of them): identical decode path, but only frame indexes
    * divisible by `every` are DECODED at all — the skip happens at the
    * reader (indexes never passed to `read`), so the saved work is
    * real, not a post-decode filter. `frame_idx` keeps the ORIGINAL
    * index (temporal position survives sampling). */
  def sampleFrames(media: Dataset[MediaRecord],
                   every: Int): Dataset[FrameFeatures] = {
    require(every >= 1, "sampling stride must be >= 1")
    framesImpl(media, every)
  }

  private def framesImpl(media: Dataset[MediaRecord],
                         every: Int): Dataset[FrameFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { it =>
      it.flatMap { rec =>
        val iis = javax.imageio.ImageIO.createImageInputStream(
          new java.io.ByteArrayInputStream(rec.content))
        val readers = javax.imageio.ImageIO.getImageReaders(iis)
        require(readers.hasNext,
          s"undecodable multi-frame payload for media_id=${rec.media_id}")
        val rd = readers.next()
        rd.setInput(iis)
        val n = rd.getNumImages(true) // force a full frame count scan
        (0 until n by every).map { f =>
          val img = rd.read(f)
          val (w, h) = (img.getWidth, img.getHeight)
          var sum = 0L
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              sum += (img.getRGB(x, y) >> 16) & 0xff // gray: r == g == b
              x += 1
            }
            y += 1
          }
          FrameFeatures(rec.media_id, f.toLong, w.toLong, h.toLong, sum)
        }
      }
    }
  }

  // ---- real audio path (JDK javax.sound.sampled, WAV/PCM only) -------

  /** Deterministic synthetic WAV (RIFF container, 16-bit signed mono PCM
    * at 8 kHz): sample count and every sample are a closed form of `id`,
    * so an engine with NO audio codec can compute what a REAL decode
    * must yield. PCM is lossless — encode→decode round-trips exactly.
    * Formulas (Long arithmetic, id kept small):
    *   n = 64 + id%64 samples
    *   s(i) = (id*31 + i*17) % 65536 - 32768
    */
  def syntheticWav(id: Long): Array[Byte] = {
    val n = (64 + id % 64).toInt
    val pcm = new Array[Byte](n * 2)
    var i = 0
    while (i < n) {
      val s = ((id * 31 + i * 17) % 65536 - 32768).toInt
      pcm(2 * i) = (s & 0xff).toByte          // little-endian per fmt below
      pcm(2 * i + 1) = ((s >> 8) & 0xff).toByte
      i += 1
    }
    val fmt = new javax.sound.sampled.AudioFormat(
      javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED,
      8000f, 16, 1, 2, 8000f, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, n.toLong)
    val out = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, out): Unit
    out.toByteArray
  }

  /** Synthetic WAV media table keyed by the documents table's ids —
    * payload generation is partition-parallel (no driver-side loop). */
  def wavMedia(docs: DataFrame, maxId: Long): Dataset[MediaRecord] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id")).filter(col("doc_id") < maxId)
      .as[Long]
      .mapPartitions(_.map { id =>
        val bytes = syntheticWav(id)
        MediaRecord(id, "audio", bytes, "synthetic_wav", bytes.length.toLong)
      })
  }

  /** REAL audio decode: the JDK's `javax.sound.sampled` parses the RIFF
    * header and hands back PCM frames; integer sample stats (count, sum,
    * min, max) are exact and layout-independent. PCM_SIGNED 8/16-bit is
    * supported (both endiannesses); anything else — compressed codecs,
    * float PCM — fails loudly rather than guessing. */
  def decodeAudio(media: Dataset[MediaRecord]): Dataset[AudioFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { it =>
      it.map { rec =>
        val ais =
          try javax.sound.sampled.AudioSystem.getAudioInputStream(
            new java.io.ByteArrayInputStream(rec.content))
          catch {
            case e: javax.sound.sampled.UnsupportedAudioFileException =>
              throw new IllegalArgumentException(
                s"undecodable audio payload for media_id=${rec.media_id}", e)
          }
        val fmt = ais.getFormat
        require(fmt.getEncoding ==
            javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED,
          s"media_id=${rec.media_id}: only PCM_SIGNED is decodable " +
            s"without external codecs, got ${fmt.getEncoding}")
        val bits = fmt.getSampleSizeInBits
        require(bits == 8 || bits == 16,
          s"media_id=${rec.media_id}: unsupported sample width $bits")
        val bytes = ais.readAllBytes()
        val bytesPerSample = bits / 8
        require(bytes.length % bytesPerSample == 0,
          s"media_id=${rec.media_id}: truncated PCM payload")
        val n = bytes.length / bytesPerSample
        var (sum, mn, mx) = (0L, Long.MaxValue, Long.MinValue)
        var i = 0
        while (i < n) {
          val s: Int =
            if (bits == 8) bytes(i).toInt
            else if (fmt.isBigEndian)
              (bytes(2 * i) << 8) | (bytes(2 * i + 1) & 0xff)
            else
              (bytes(2 * i + 1) << 8) | (bytes(2 * i) & 0xff)
          sum += s
          if (s < mn) mn = s
          if (s > mx) mx = s
          i += 1
        }
        AudioFeatures(rec.media_id, fmt.getSampleRate.toLong,
          fmt.getChannels.toLong, bits.toLong,
          n.toLong / fmt.getChannels, sum,
          if (n == 0) 0L else mn, if (n == 0) 0L else mx)
      }
    }
  }

  /**
   * NEAREST-NEIGHBOR audio resample — the rate-normalization step every
   * audio-training pipeline runs (batch to one sample rate before
   * featurization). Decode (real RIFF/PCM codec), output sample j reads
   * input sample `j·srcRate div dstRate` (output length
   * `n·dstRate div srcRate`) — EXACT integer index math like
   * [[resizeImages]], no interpolation filter, so a codec-free engine
   * replays it over the closed-form sample grid — then RE-ENCODE as a
   * 16-bit mono WAV at the target rate. Mono 16-bit PCM_SIGNED (the
   * fixture envelope); per-clip work only, `mapPartitions`-parallel.
   */
  def resampleAudio(media: Dataset[MediaRecord],
                    dstRate: Int): Dataset[ResampledAudio] = {
    require(dstRate >= 1, "target sample rate must be >= 1")
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { it =>
      it.map { rec =>
        val ais =
          try javax.sound.sampled.AudioSystem.getAudioInputStream(
            new java.io.ByteArrayInputStream(rec.content))
          catch {
            case e: javax.sound.sampled.UnsupportedAudioFileException =>
              throw new IllegalArgumentException(
                s"undecodable audio payload for media_id=${rec.media_id}", e)
          }
        val fmt = ais.getFormat
        require(fmt.getEncoding ==
            javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED &&
            fmt.getSampleSizeInBits == 16 && fmt.getChannels == 1,
          s"media_id=${rec.media_id}: resample supports 16-bit mono " +
            s"PCM_SIGNED, got ${fmt.getEncoding}/${fmt.getSampleSizeInBits}" +
            s"-bit/${fmt.getChannels}ch")
        val bytes = ais.readAllBytes()
        val n = bytes.length / 2
        def sampleAt(i: Int): Int =
          if (fmt.isBigEndian) (bytes(2 * i) << 8) | (bytes(2 * i + 1) & 0xff)
          else (bytes(2 * i + 1) << 8) | (bytes(2 * i) & 0xff)
        val srcRate = fmt.getSampleRate.toLong
        val m = (n.toLong * dstRate / srcRate).toInt
        val out = new Array[Byte](m * 2)
        var (sum, mn, mx) = (0L, Long.MaxValue, Long.MinValue)
        var j = 0
        while (j < m) {
          val s = sampleAt((j.toLong * srcRate / dstRate).toInt)
          out(2 * j) = (s & 0xff).toByte
          out(2 * j + 1) = ((s >> 8) & 0xff).toByte
          sum += s
          if (s < mn) mn = s
          if (s > mx) mx = s
          j += 1
        }
        val outFmt = new javax.sound.sampled.AudioFormat(
          javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED,
          dstRate.toFloat, 16, 1, 2, dstRate.toFloat, false)
        val buf = new java.io.ByteArrayOutputStream()
        javax.sound.sampled.AudioSystem.write(
          new javax.sound.sampled.AudioInputStream(
            new java.io.ByteArrayInputStream(out), outFmt, m.toLong),
          javax.sound.sampled.AudioFileFormat.Type.WAVE, buf): Unit
        ResampledAudio(rec.media_id, srcRate, dstRate.toLong, m.toLong,
          sum, if (m == 0) 0L else mn, if (m == 0) 0L else mx,
          buf.toByteArray)
      }
    }
  }

  /**
   * Perceptual AUDIO fingerprint — the energy-contour analog of
   * [[imageDHash]] (the Shazam-family shape reduced to its replayable
   * core): the clip's samples split into 65 time windows
   * (`sample i → window i*65 div n`), per-window ENERGY (Σ s², exact
   * BIGINT), and one bit per adjacent window pair (left louder than
   * right) via the cross-multiplied comparison — 64 bits, exact-integer
   * end to end over the REAL WAV decode, packed into two 32-bit halves.
   * A one-sample edit can move at most the two bits touching its
   * window, so near-duplicate clips land within Hamming 2 and
   * [[audioNearPairs]]' banding finds them without all-pairs. Mono
   * PCM_SIGNED 8/16-bit (the [[decodeAudio]] envelope).
   */
  def audioFingerprint(media: Dataset[MediaRecord]): Dataset[AudioFingerprint] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { it =>
      it.map { rec =>
        val ais =
          try javax.sound.sampled.AudioSystem.getAudioInputStream(
            new java.io.ByteArrayInputStream(rec.content))
          catch {
            case e: javax.sound.sampled.UnsupportedAudioFileException =>
              throw new IllegalArgumentException(
                s"undecodable audio payload for media_id=${rec.media_id}", e)
          }
        val fmt = ais.getFormat
        require(fmt.getEncoding ==
            javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED,
          s"media_id=${rec.media_id}: only PCM_SIGNED is decodable " +
            s"without external codecs, got ${fmt.getEncoding}")
        val bits = fmt.getSampleSizeInBits
        require(bits == 8 || bits == 16,
          s"media_id=${rec.media_id}: unsupported sample width $bits")
        require(fmt.getChannels == 1,
          s"media_id=${rec.media_id}: fingerprint expects mono, got " +
            s"${fmt.getChannels} channels")
        val bytes = ais.readAllBytes()
        val bytesPerSample = bits / 8
        val n = bytes.length / bytesPerSample
        val energy = new Array[Long](65)
        val counts = new Array[Long](65)
        var i = 0
        while (i < n) {
          val s: Int =
            if (bits == 8) bytes(i).toInt
            else if (fmt.isBigEndian)
              (bytes(2 * i) << 8) | (bytes(2 * i + 1) & 0xff)
            else
              (bytes(2 * i + 1) << 8) | (bytes(2 * i) & 0xff)
          val w = (i.toLong * 65 / n).toInt
          energy(w) += s.toLong * s
          counts(w) += 1
          i += 1
        }
        var hi = 0L; var lo = 0L
        var w = 0
        while (w < 64) {
          if (energy(w) * counts(w + 1) > energy(w + 1) * counts(w)) {
            if (w < 32) lo |= 1L << w else hi |= 1L << (w - 32)
          }
          w += 1
        }
        AudioFingerprint(rec.media_id, n.toLong, hi, lo)
      }
    }
  }

  /** Deterministic synthetic CHIRP: 16-bit mono PCM whose sample i is
    * the closed form `(id·31 + i²·911 + i·17) mod 65536 - 32768` — the
    * quadratic term scrambles the per-window energy contour per id
    * (unlike [[syntheticWav]]'s linear sweep, whose contour is the same
    * descending ramp for every id — useless as a FINGERPRINT fixture:
    * everything looks like a near-dup). `flipFirst` XORs sample 0's
    * lowest bit (always a valid PCM value, replayable). */
  def syntheticChirpWav(id: Long, flipFirst: Boolean = false): Array[Byte] = {
    val n = (64 + id % 64).toInt
    val pcm = new Array[Byte](n * 2)
    var i = 0
    while (i < n) {
      val base = ((id * 31 + i.toLong * i * 911 + i * 17) % 65536 - 32768).toInt
      val s = if (i == 0 && flipFirst) base ^ 1 else base
      pcm(2 * i) = (s & 0xff).toByte
      pcm(2 * i + 1) = ((s >> 8) & 0xff).toByte
      i += 1
    }
    val fmt = new javax.sound.sampled.AudioFormat(
      javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED,
      8000f, 16, 1, 2, 8000f, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, n.toLong)
    val out = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, out): Unit
    out.toByteArray
  }

  /** Synthetic chirp media (the fingerprint fixture). */
  def chirpWavMedia(docs: DataFrame, maxId: Long): Dataset[MediaRecord] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id")).filter(col("doc_id") < maxId)
      .as[Long]
      .mapPartitions(_.map { id =>
        val bytes = syntheticChirpWav(id)
        MediaRecord(id, "audio", bytes, "synthetic_wav", bytes.length.toLong)
      })
  }

  /** Synthetic NEAR-DUP audio media: ids below `half` are
    * [[syntheticChirpWav]] verbatim; ids in [half, 2·half) re-render
    * id - half with sample 0's lowest bit flipped. */
  def nearDupWavMedia(docs: DataFrame, half: Long): Dataset[MediaRecord] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id")).filter(col("doc_id") < 2 * half)
      .as[Long]
      .mapPartitions(_.map { id =>
        val bytes =
          if (id < half) syntheticChirpWav(id)
          else syntheticChirpWav(id - half, flipFirst = true)
        MediaRecord(id, "audio", bytes, "synthetic_wav", bytes.length.toLong)
      })
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
