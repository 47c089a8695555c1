package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, Dataset, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal columns: image/audio/video as opaque `BINARY` with typed
  * metadata, processed batch-wise.
  *
  * The Spark-side plumbing is real — schema, partition-batched
  * processing via `mapPartitions` (the JVM analog of Python's
  * `mapInPandas` batch shape), deterministic output contract — while
  * the actual media DECODE IS A STUB (`fakeDecode*`): the container
  * has no image/audio codecs, so decode produces a deterministic
  * hash-seeded feature vector / frame set, clearly marked. Swapping in
  * a real codec only changes the function body, not the plan shape.
  *
  * Scale notes: assets are processed one partition at a time with
  * constant memory per row; no shuffle anywhere — the whole decode /
  * feature-extract stage is map-only, and `content` (the heavy column)
  * is pruned away the moment features are produced. Store assets in
  * parquet with a small row-group size so `content` columns stream.
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

  /** STUB image decode → feature extract. Deterministic fake: a
    * `dim`-float vector seeded by the content hash. Batch shape: one
    * partition in, iterator out — exactly where a real decoder
    * (libjpeg/ffmpeg via JNI) would slot in.
    */
  def fakeDecodeFeatures(assets: Dataset[Asset], dim: Int = 16): Dataset[Feature] = {
    implicit val enc = Encoders.product[Feature]
    assets.mapPartitions { it =>
      it.map { a =>
        val seed = java.util.Arrays.hashCode(a.content).toLong
        val rnd = new scala.util.Random(seed)
        Feature(a.asset_id, dim, Array.fill(dim)(rnd.nextFloat()))
      }
    }
  }

  /** STUB video frame-sample: every `stride`-th 16-byte slice of the
    * content stands in for a decoded frame. Real plan shape (explode
    * to one row per frame happens downstream via `explode`).
    */
  def fakeFrameSample(assets: Dataset[Asset], stride: Int = 64,
                      maxFrames: Int = 8): Dataset[Frames] = {
    implicit val enc = Encoders.product[Frames]
    assets.mapPartitions { it =>
      it.map { a =>
        val frames = (0 until maxFrames)
          .map(_ * stride)
          .filter(_ + 16 <= a.content.length)
          .map(off => java.util.Arrays.copyOfRange(a.content, off, off + 16))
          .toArray
        Frames(a.asset_id, frames.length, frames)
      }
    }
  }

  /** STUB resize: trim/pad content to `targetBytes` — placeholder for
    * a pixel-space resize with the same (binary→binary) plan shape.
    */
  def fakeResize(assets: Dataset[Asset], targetBytes: Int = 256): Dataset[Asset] = {
    implicit val enc = Encoders.product[Asset]
    assets.mapPartitions { it =>
      it.map { a =>
        val out = java.util.Arrays.copyOf(a.content, targetBytes)
        Asset(a.asset_id, a.modality, out)
      }
    }
  }
}
