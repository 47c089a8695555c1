package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.pipeline.Multimodal.Asset

class MultimodalSpec extends AnyFunSuite with SparkSpec {

  private def assets = {
    import spark.implicits._
    Seq(
      Asset(1L, "image", Array[Byte](0x89.toByte, 0x50, 0x4E, 0x47, 1, 2, 3, 4) ++
        Array.fill[Byte](600)(7)),
      Asset(2L, "image", Array[Byte](0xFF.toByte, 0xD8.toByte, 0x11, 0x22) ++
        Array.fill[Byte](100)(9)),
      Asset(3L, "text", "plain ascii bytes".getBytes("UTF-8"))).toDS()
  }

  test("sniffFormat detects magic bytes without UDFs") {
    val got = Multimodal.contentMeta(assets.toDF(), "asset_id", "content")
      .collect().map(r => r.getLong(0) -> r.getString(3)).toMap
    assert(got == Map(1L -> "png", 2L -> "jpeg", 3L -> "unknown"))
  }

  test("contentMeta computes byte length and digest") {
    val r = Multimodal.contentMeta(assets.toDF(), "asset_id", "content")
      .filter(col("asset_id") === 3).collect().head
    assert(r.getLong(1) == 17)
    assert(r.getString(2) == java.security.MessageDigest.getInstance("MD5")
      .digest("plain ascii bytes".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString)
  }

  test("fakeDecodeFeatures is deterministic with the declared batch shape") {
    val f1 = Multimodal.fakeDecodeFeatures(assets, dim = 8).collect()
      .map(f => f.asset_id -> f.feature.toSeq).toMap
    val f2 = Multimodal.fakeDecodeFeatures(assets.repartition(3), dim = 8).collect()
      .map(f => f.asset_id -> f.feature.toSeq).toMap
    assert(f1 == f2) // partitioning must not change results
    assert(f1(1L).size == 8)
  }

  test("fakeFrameSample bounds frames and slices deterministically") {
    val frames = Multimodal.fakeFrameSample(assets, stride = 64, maxFrames = 8)
      .collect().map(f => f.asset_id -> f.n_frames).toMap
    assert(frames(1L) == 8) // 608 bytes → all 8 strided slices fit
    assert(frames(2L) == 2) // 104 bytes → offsets 0, 64 only
    assert(frames(3L) == 1)
  }

  test("frame pipeline composes: sample → explode → per-frame features → similarity") {
    import spark.implicits._
    val frames = Multimodal.fakeFrameSample(assets, stride = 64, maxFrames = 4)
    // one row per frame, then the (stub) decoder over frames-as-assets
    val perFrame = frames.flatMap(f =>
      f.frames.zipWithIndex.map { case (bytes, i) =>
        Multimodal.Asset(f.asset_id * 100 + i, "frame", bytes)
      })
    val feats = Multimodal.fakeDecodeFeatures(perFrame, dim = 8)
      .select($"asset_id".as("vec_id"), $"feature".as("embedding"))
    assert(feats.count() >= 4) // asset 1 alone yields 4 frames
    // frame-level near-dup search runs on the frame features directly
    val sims = Similarity.nearDupPairs(feats.toDF(), "vec_id", "embedding", threshold = 0.99)
    // frames of asset 1 are constant-filled slices → identical features
    assert(sims.count() >= 1)
  }

  test("features feed straight into the similarity operators") {
    import spark.implicits._
    val feats = Multimodal.fakeDecodeFeatures(assets, dim = 8)
      .select($"asset_id".as("vec_id"), $"feature".as("embedding"))
    val top = Similarity.bruteForceTopK(feats, feats.filter($"vec_id" === 1),
      "vec_id", "embedding", k = 2)
    assert(top.count() == 2) // plumbing composes end-to-end
  }
}
