package graft.pipeline

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.imageio.{IIOImage, ImageIO}
import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}

import org.apache.spark.sql.{Column, DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal columns: image/audio/video as opaque `BINARY` with typed
  * metadata, processed batch-wise.
  *
  * Decode, resize and frame-sampling are REAL: the bare JDK decodes
  * PNG/JPEG/GIF (and writes PNG/GIF) through `javax.imageio`, so the
  * image paths below do actual pixel work — `decodeImageFeatures`
  * (dimensions + exact per-channel sums/means), `decodeHistogram`
  * (luminance histogram feature vector), `resizeImages`
  * (nearest-neighbor pixel resize, re-encoded PNG), `sampleFrames`
  * (every `stride`-th frame of a multi-frame container, e.g. animated
  * GIF). AUDIO is real too: `javax.sound.sampled` parses WAV/AIFF/AU
  * containers in the bare JDK, so [[decodeAudioFeatures]] recovers
  * exact sample rate / channel count / frame count / integer amplitude
  * sums from PCM content. Only VIDEO decode remains out of scope — the
  * JDK ships no video codec — and video assets simply fall out as
  * `n_frames = 0` / null features rather than being faked.
  *
  * Everything is `mapPartitions` (the JVM analog of Python's
  * `mapInPandas` batch shape): one partition in, iterator out,
  * constant memory per row, no shuffle anywhere — the whole
  * decode / feature-extract stage is map-only, and `content` (the
  * heavy column) is pruned away the moment features are produced.
  * Store assets in parquet with a small row-group size so `content`
  * columns stream. Undecodable or null content never throws: it
  * yields null feature columns (filter them out downstream), because
  * at 100 TB a single corrupt blob must not kill the stage.
  */
object Multimodal {

  /** Asset schema: (asset_id, modality, content, mime). */
  val assetSchema: StructType = StructType(Seq(
    StructField("asset_id", LongType, nullable = false),
    StructField("modality", StringType, nullable = false),
    StructField("content", BinaryType, nullable = true),
    StructField("mime", StringType, nullable = true)))

  /** Container sniffing on magic bytes — pure codegen'd expressions
    * (no UDF): PNG/JPEG/GIF/RIFF else unknown.
    */
  def sniffFormat(content: Column): Column =
    when(hex(substring(content, 1, 4)) === "89504E47", "png")
      .when(hex(substring(content, 1, 2)) === "FFD8", "jpeg")
      .when(hex(substring(content, 1, 3)) === "474946", "gif")
      // RIFF is a container: bytes 8-11 name the payload (WAVE = wav)
      .when(hex(substring(content, 1, 4)) === "52494646" &&
        hex(substring(content, 9, 4)) === "57415645", "wav")
      .when(hex(substring(content, 1, 4)) === "52494646", "riff")
      .otherwise("unknown")

  /** Cheap per-asset metadata — byte length + content digest; map-only. */
  def contentMeta(df: DataFrame, idCol: String, contentCol: String): DataFrame =
    df.select(col(idCol),
      length(col(contentCol)).cast("long").as("byte_len"),
      md5(col(contentCol)).as("content_md5"),
      sniffFormat(col(contentCol)).as("format"))

  final case class Asset(asset_id: Long, modality: String, content: Array[Byte])
  final case class Feature(asset_id: Long, dim: Int, feature: Array[Float])
  final case class Frames(asset_id: Long, n_frames: Int, frames: Array[Array[Byte]])
  /** Exact integer pixel statistics of a decoded image; all-null past
    * `asset_id` when the content is null or not a decodable image.
    */
  final case class ImageFeature(asset_id: Long, width: Option[Int],
      height: Option[Int], sum_r: Option[Long], sum_g: Option[Long],
      sum_b: Option[Long])
  /** Exact integer statistics of a decoded PCM audio container
    * (`sum_abs` = Σ|sample| over every channel); all-null past
    * `asset_id` when the content is null or not decodable 16-bit PCM.
    */
  final case class AudioFeature(asset_id: Long, sample_rate: Option[Int],
      channels: Option[Int], n_frames: Option[Long], sum_abs: Option[Long])

  // ---- codec helpers (executor-side; ImageIO's disk cache off — the
  // blobs are already in memory and executor threads must not contend
  // on temp files). Set ONCE at object init: this object initializes
  // in every JVM (driver or executor) before any codec call below, so
  // both read AND write paths get memory-backed streams — a per-call
  // set would leave the first encodePng calls on the
  // FileCacheImageOutputStream path, a temp file per image.
  ImageIO.setUseCache(false)

  private def readImage(content: Array[Byte]): BufferedImage =
    if (content == null) null
    else try {
      ImageIO.read(new ByteArrayInputStream(content)) // null if no reader claims it
    } catch { case _: Exception => null }             // truncated/corrupt stream

  /** Shared decode preamble of every pixel operator: content →
    * (width, height, packed-ARGB row-major pixels), or None when the
    * content is null or no installed reader can decode it.
    */
  private def decodePixels(content: Array[Byte]): Option[(Int, Int, Array[Int])] = {
    val img = readImage(content)
    if (img == null) None
    else {
      val w = img.getWidth
      val h = img.getHeight
      Some((w, h, img.getRGB(0, 0, w, h, null, 0, w)))
    }
  }

  // Round-14 (guide §4.5 — initialise heavyweight state once per task,
  // not per row): `ImageIO.write`/`getImageWritersByFormatName` re-run
  // the plugin-registry lookup and construct a fresh writer per CALL;
  // across per-row encode paths (q71/q132/q133 corpus synth, q178's
  // per-frame PNG re-encode) that is one writer + lookup iterator per
  // image. Writers are reusable across images on one thread
  // (setOutput → write → reset), so each executor thread keeps one.
  // Same writer class, default params ⇒ byte-identical output.
  private val pngWriterTL = new ThreadLocal[javax.imageio.ImageWriter] {
    override def initialValue(): javax.imageio.ImageWriter =
      ImageIO.getImageWritersByFormatName("png").next()
  }
  private val gifWriterTL = new ThreadLocal[javax.imageio.ImageWriter] {
    override def initialValue(): javax.imageio.ImageWriter =
      ImageIO.getImageWritersByFormatName("gif").next()
  }

  private def pngBytes(img: BufferedImage): Array[Byte] = {
    val baos = new ByteArrayOutputStream()
    val w = pngWriterTL.get()
    val ios = ImageIO.createImageOutputStream(baos)
    try {
      w.setOutput(ios)
      w.write(img)
    } finally {
      w.reset() // detach the stream; keep the instance for the next row
      ios.close()
    }
    baos.toByteArray
  }

  /** Deterministic PNG synthesizer: a `w`×`h` RGB image with pixel
    * (x, y) = `rgb(x, y)` (packed 0xRRGGBB). PNG is lossless, so the
    * decode path recovers these exact values — which is what lets the
    * decode operators be gated against an arithmetic oracle.
    */
  def encodePng(w: Int, h: Int, rgb: (Int, Int) => Int): Array[Byte] = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    val px = new Array[Int](w * h)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) { px(y * w + x) = rgb(x, y); x += 1 }
      y += 1
    }
    img.setRGB(0, 0, w, h, px, 0, w)
    pngBytes(img)
  }

  /** Animated-GIF synthesizer (multi-frame container for
    * frame-sampling tests). GIF palettizes colors, so pixel values are
    * not round-trip-exact — frame COUNTS are.
    */
  def encodeGif(frames: Seq[BufferedImage]): Array[Byte] = {
    val baos = new ByteArrayOutputStream()
    val writer = gifWriterTL.get() // per-thread reuse, see pngWriterTL
    val ios = ImageIO.createImageOutputStream(baos)
    try {
      writer.setOutput(ios)
      writer.prepareWriteSequence(null)
      frames.foreach(f =>
        writer.writeToSequence(new IIOImage(f, null, null), writer.getDefaultWriteParam))
      writer.endWriteSequence()
    } finally {
      writer.reset()
      ios.close()
    }
    baos.toByteArray
  }

  /** Deterministic WAV synthesizer: mono 16-bit signed little-endian
    * PCM at `sampleRate`, written through the JDK's own WAVE writer
    * (`AudioSystem.write`), so the decode path exercises a real
    * container round trip. PCM is lossless — [[decodeAudioFeatures]]
    * recovers these exact samples, which is what lets the audio
    * operator be gated against an arithmetic oracle.
    */
  def encodeWav(sampleRate: Int, samples: Array[Short]): Array[Byte] = {
    val bytes = new Array[Byte](samples.length * 2)
    var i = 0
    while (i < samples.length) {
      bytes(2 * i) = (samples(i) & 0xFF).toByte
      bytes(2 * i + 1) = ((samples(i) >> 8) & 0xFF).toByte
      i += 1
    }
    val fmt = new AudioFormat(sampleRate.toFloat, 16, 1, true, false)
    val ais = new AudioInputStream(new ByteArrayInputStream(bytes), fmt,
      samples.length.toLong)
    val baos = new ByteArrayOutputStream()
    try AudioSystem.write(ais, AudioFileFormat.Type.WAVE, baos) finally ais.close()
    baos.toByteArray
  }

  def grayFrame(w: Int, h: Int, level: Int): BufferedImage = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    // identical pixels to a Graphics2D fillRect with Color(level³),
    // without allocating a Graphics2D + Color per frame (guide §4.5)
    val px = new Array[Int](w * h)
    val rgb = (level << 16) | (level << 8) | level
    java.util.Arrays.fill(px, rgb)
    img.setRGB(0, 0, w, h, px, 0, w)
    img
  }

  // ---- decode operators ----

  /** Real image decode → exact pixel statistics: dimensions plus
    * per-channel sums (integers — no float-order ambiguity, so results
    * are bit-stable under any partitioning). Null/undecodable content
    * → all-null stats.
    */
  def decodeImageFeatures(assets: Dataset[Asset]): Dataset[ImageFeature] = {
    implicit val enc = Encoders.product[ImageFeature]
    assets.mapPartitions { it =>
      it.map { a =>
        decodePixels(a.content) match {
          case None => ImageFeature(a.asset_id, None, None, None, None, None)
          case Some((w, h, px)) =>
            var sr = 0L; var sg = 0L; var sb = 0L
            var i = 0
            while (i < px.length) {
              val p = px(i)
              sr += (p >> 16) & 0xFF
              sg += (p >> 8) & 0xFF
              sb += p & 0xFF
              i += 1
            }
            ImageFeature(a.asset_id, Some(w), Some(h), Some(sr), Some(sg), Some(sb))
        }
      }
    }
  }

  /** 64-bit average-hash (aHash) image fingerprint — the classic
    * perceptual near-dup signature: decode, 8×8 nearest-neighbor
    * downsample (sample the pixel at (⌊bx·w/8⌋, ⌊by·h/8⌋) — integer
    * index arithmetic, no interpolation, so the hash is bit-stable on
    * every engine), gray = r+g+b per sample, bit (by·8+bx) set iff
    * 64·gray > Σgray (strict — the mean itself hashes 0). Returned
    * split as hi/lo 32-bit halves in BIGINTs (a full 64-bit hash could
    * set bit 63 and read as negative) plus the popcount; band the
    * halves through the SimHash bucket join for candidate pairs.
    * Corrupt blobs → all-null, never a throw. Map-only, no shuffle.
    */
  final case class AHash(asset_id: Long, hash_hi: Option[Long],
      hash_lo: Option[Long], n_bits: Option[Long])

  def imageAHash(assets: Dataset[Asset]): Dataset[AHash] = {
    implicit val enc = Encoders.product[AHash]
    assets.mapPartitions { it =>
      it.map { a =>
        decodePixels(a.content) match {
          case None => AHash(a.asset_id, None, None, None)
          case Some((w, h, px)) =>
            val g = new Array[Long](64)
            var total = 0L
            var j = 0
            while (j < 64) {
              val sx = (j % 8) * w / 8
              val sy = (j / 8) * h / 8
              val p = px(sy * w + sx)
              g(j) = ((p >> 16) & 0xFF) + ((p >> 8) & 0xFF) + (p & 0xFF)
              total += g(j)
              j += 1
            }
            var hi = 0L; var lo = 0L; var n = 0L
            j = 0
            while (j < 64) {
              if (64L * g(j) > total) {
                if (j < 32) lo |= 1L << j else hi |= 1L << (j - 32)
                n += 1
              }
              j += 1
            }
            AHash(a.asset_id, Some(hi), Some(lo), Some(n))
        }
      }
    }
  }

  /** Real audio decode → exact sample statistics: format header
    * (sample rate, channels) plus frame count and Σ|sample| (integers —
    * bit-stable under any partitioning), via the JDK's
    * `javax.sound.sampled` WAV/AIFF/AU parsers. Map-only, constant
    * memory per row. Null content, non-audio containers, and PCM
    * encodings other than 16-bit signed (the overwhelming case, and
    * the only one with unambiguous integer samples) → all-null stats,
    * never a throw — at 100 TB one corrupt blob must not kill the
    * stage.
    */
  def decodeAudioFeatures(assets: Dataset[Asset]): Dataset[AudioFeature] = {
    implicit val enc = Encoders.product[AudioFeature]
    assets.mapPartitions { it =>
      it.map { a =>
        if (a.content == null) AudioFeature(a.asset_id, None, None, None, None)
        else try {
          val ais = AudioSystem.getAudioInputStream(new ByteArrayInputStream(a.content))
          try {
            val fmt = ais.getFormat
            if (fmt.getSampleSizeInBits != 16 || fmt.isBigEndian ||
                fmt.getEncoding != AudioFormat.Encoding.PCM_SIGNED)
              AudioFeature(a.asset_id, None, None, None, None)
            else {
              val bytes = ais.readAllBytes()
              var sum = 0L
              var i = 0
              while (i + 1 < bytes.length) {
                val s = ((bytes(i) & 0xFF) | (bytes(i + 1) << 8)).toShort
                sum += math.abs(s.toLong)
                i += 2
              }
              AudioFeature(a.asset_id, Some(fmt.getSampleRate.toInt),
                Some(fmt.getChannels),
                Some(bytes.length / (2L * fmt.getChannels)), Some(sum))
            }
          } finally ais.close()
        } catch { case _: Exception => AudioFeature(a.asset_id, None, None, None, None) }
      }
    }
  }

  /** Real image decode → normalized luminance histogram (`bins`
    * floats): a compact, deterministic feature vector that feeds the
    * [[Similarity]] operators directly. Undecodable → zero vector
    * (distinguishable and join-safe; filter on `dim > 0` upstream
    * if strictness is wanted — dim is 0 exactly when decode failed).
    */
  def decodeHistogram(assets: Dataset[Asset], bins: Int = 16): Dataset[Feature] = {
    implicit val enc = Encoders.product[Feature]
    assets.mapPartitions { it =>
      it.map { a =>
        decodePixels(a.content) match {
          case None => Feature(a.asset_id, 0, new Array[Float](bins))
          case Some((_, _, px)) =>
            val counts = new Array[Long](bins)
            var i = 0
            while (i < px.length) {
              val p = px(i)
              // integer luma (Rec.601 weights scaled by 1000) — exact
              val lum = (((p >> 16) & 0xFF) * 299 + ((p >> 8) & 0xFF) * 587 +
                (p & 0xFF) * 114) / 1000
              counts(lum * bins / 256) += 1L
              i += 1
            }
            val n = px.length.toFloat
            Feature(a.asset_id, bins, counts.map(c => c / n))
        }
      }
    }
  }

  /** Real pixel-space resize to `w`×`h` — nearest-neighbor source
    * sampling (pure integer arithmetic: deterministic across JVMs,
    * unlike AWT's rendering-hint-dependent scalers), re-encoded as
    * PNG. Null/undecodable content passes through as a null-content
    * asset rather than throwing.
    */
  def resizeImages(assets: Dataset[Asset], w: Int, h: Int): Dataset[Asset] = {
    implicit val enc = Encoders.product[Asset]
    assets.mapPartitions { it =>
      it.map { a =>
        decodePixels(a.content) match {
          case None => Asset(a.asset_id, a.modality, null)
          case Some((iw, ih, src)) =>
            val out = new Array[Int](w * h)
            var y = 0
            while (y < h) {
              val sy = y * ih / h
              var x = 0
              while (x < w) { out(y * w + x) = src(sy * iw + x * iw / w); x += 1 }
              y += 1
            }
            val o = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
            o.setRGB(0, 0, w, h, out, 0, w)
            Asset(a.asset_id, a.modality, pngBytes(o))
        }
      }
    }
  }

  /** Real frame sampling from a multi-frame container (animated GIF;
    * single-frame formats yield one frame): every `stride`-th frame,
    * capped at `maxFrames`, each re-encoded as PNG so downstream
    * per-frame decode composes. Containers the JDK cannot read (video,
    * audio, corrupt blobs) yield `n_frames = 0` — explicitly absent,
    * never faked.
    */
  def sampleFrames(assets: Dataset[Asset], stride: Int = 1,
                   maxFrames: Int = 8): Dataset[Frames] = {
    // a caller bug, not a data condition — fail fast on the driver
    // rather than silently mapping every asset to n_frames = 0
    require(stride >= 1, s"stride must be >= 1, got $stride")
    implicit val enc = Encoders.product[Frames]
    assets.mapPartitions { it =>
      it.map { a =>
        if (a.content == null) Frames(a.asset_id, 0, Array.empty)
        else try {
          val iis = ImageIO.createImageInputStream(new ByteArrayInputStream(a.content))
          try {
            val readers = ImageIO.getImageReaders(iis)
            if (!readers.hasNext) Frames(a.asset_id, 0, Array.empty)
            else {
              val r = readers.next()
              try {
                r.setInput(iis)
                val n = r.getNumImages(true)
                val frames = (0 until n by stride).take(maxFrames)
                  .map(i => pngBytes(toRgb(r.read(i)))).toArray
                Frames(a.asset_id, frames.length, frames)
              } finally r.dispose() // even when a corrupt frame throws mid-loop
            }
          } finally iis.close()
        } catch { case _: Exception => Frames(a.asset_id, 0, Array.empty) }
      }
    }
  }

  /** GIF frames decode as palette-indexed images; normalize to RGB so
    * re-encoded frames behave like any other asset downstream.
    */
  private def toRgb(img: BufferedImage): BufferedImage =
    if (img.getType == BufferedImage.TYPE_INT_RGB) img
    else {
      val o = new BufferedImage(img.getWidth, img.getHeight, BufferedImage.TYPE_INT_RGB)
      val px = img.getRGB(0, 0, img.getWidth, img.getHeight, null, 0, img.getWidth)
      o.setRGB(0, 0, img.getWidth, img.getHeight, px, 0, img.getWidth)
      o
    }
}
