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

  /** Real decodable PNG assets: 6×4 gradient + 8×8 constant + a null
    * content + an undecodable text blob.
    */
  private def pngAssets = {
    import spark.implicits._
    Seq(
      Asset(1L, "image", Multimodal.encodePng(6, 4, (x, y) =>
        ((10 + x) << 16) | ((20 + y) << 8) | (x + y))),
      Asset(2L, "image", Multimodal.encodePng(8, 8, (_, _) => 0x405060)),
      Asset(3L, "image", null),
      Asset(4L, "text", "not an image at all".getBytes("UTF-8"))).toDS()
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

  test("decodeImageFeatures recovers exact dimensions and channel sums") {
    val f = Multimodal.decodeImageFeatures(pngAssets).collect()
      .map(x => x.asset_id -> x).toMap
    // 6×4 gradient: sum_r = Σ(10+x) over 24 px = 24*10 + 4*Σx = 240+60
    assert(f(1L).width.contains(6) && f(1L).height.contains(4))
    assert(f(1L).sum_r.contains(24L * 10 + 4 * (0 to 5).sum))
    assert(f(1L).sum_g.contains(24L * 20 + 6 * (0 to 3).sum))
    assert(f(1L).sum_b.contains(4L * (0 to 5).sum + 6 * (0 to 3).sum))
    // constant image: every channel sum = count × level
    assert(f(2L).sum_r.contains(64L * 0x40))
    assert(f(2L).sum_b.contains(64L * 0x60))
    // null and undecodable content → all-null stats, no exception
    assert(f(3L).width.isEmpty && f(3L).sum_r.isEmpty)
    assert(f(4L).width.isEmpty)
  }

  test("decode is partitioning-invariant") {
    val a = Multimodal.decodeImageFeatures(pngAssets).collect().toSet
    val b = Multimodal.decodeImageFeatures(pngAssets.repartition(3)).collect().toSet
    assert(a == b)
  }

  test("resizeImages does a real pixel-space resize (and survives nulls)") {
    val resized = Multimodal.resizeImages(pngAssets, 4, 4)
    val feats = Multimodal.decodeImageFeatures(resized).collect()
      .map(x => x.asset_id -> x).toMap
    // constant 8×8 → 4×4: still constant, sums scale with the pixel count
    assert(feats(2L).width.contains(4) && feats(2L).height.contains(4))
    assert(feats(2L).sum_r.contains(16L * 0x40))
    assert(feats(2L).sum_g.contains(16L * 0x50))
    assert(feats(2L).sum_b.contains(16L * 0x60))
    // nearest-neighbor on the gradient: out(x,y) samples src(x*6/4, y*4/4)
    val xs = (0 until 4).map(_ * 6 / 4)
    val ys = (0 until 4).map(_ * 4 / 4)
    assert(feats(1L).sum_r.contains(ys.map(_ => xs.map(10L + _).sum).sum))
    // null/undecodable stay null-content, never throw
    assert(feats(3L).width.isEmpty && feats(4L).width.isEmpty)
  }

  test("sampleFrames reads real multi-frame GIFs with stride and cap") {
    import spark.implicits._
    val gif5 = Multimodal.encodeGif((0 until 5).map(i =>
      Multimodal.grayFrame(4, 4, 40 * i)))
    val ds = Seq(
      Asset(1L, "video", gif5),
      Asset(2L, "image", Multimodal.encodePng(4, 4, (_, _) => 0x112233)),
      Asset(3L, "text", "nope".getBytes("UTF-8")),
      Asset(4L, "image", null)).toDS()
    val got = Multimodal.sampleFrames(ds, stride = 2, maxFrames = 8)
      .collect().map(f => f.asset_id -> f.n_frames).toMap
    assert(got == Map(1L -> 3, 2L -> 1, 3L -> 0, 4L -> 0)) // frames 0,2,4
    // cap applies after stride
    val capped = Multimodal.sampleFrames(ds.filter($"asset_id" === 1), stride = 1,
      maxFrames = 3).collect().head
    assert(capped.n_frames == 3)
  }

  test("frame pipeline composes: sample → explode → per-frame decode") {
    import spark.implicits._
    val gif = Multimodal.encodeGif((0 until 3).map(i =>
      Multimodal.grayFrame(4, 4, 30 + 60 * i)))
    val frames = Multimodal.sampleFrames(Seq(Asset(9L, "video", gif)).toDS())
    val perFrame = frames.flatMap(f =>
      f.frames.zipWithIndex.map { case (bytes, i) =>
        Asset(f.asset_id * 100 + i, "frame", bytes)
      })
    val feats = Multimodal.decodeImageFeatures(perFrame).collect()
      .sortBy(_.asset_id)
    assert(feats.length == 3)
    // frames re-encode as PNG → per-frame decode sees 4×4 images whose
    // gray levels are monotone in frame order (GIF palettization may
    // shift exact levels; monotonicity survives)
    assert(feats.forall(_.width.contains(4)))
    val grays = feats.map(_.sum_r.get)
    assert(grays(0) < grays(1) && grays(1) < grays(2))
  }

  test("decodeAudioFeatures recovers exact sample statistics from a WAV round trip") {
    import spark.implicits._
    val samples = Array.tabulate(300)(i => ((i * 37) % 4001 - 2000).toShort)
    val ds = Seq(
      Asset(1L, "audio", Multimodal.encodeWav(11000, samples)),
      Asset(2L, "audio", Multimodal.encodeWav(8000, Array[Short](100, -200, 0, 32767, -32768))),
      Asset(3L, "audio", null),
      Asset(4L, "audio", "not audio".getBytes("UTF-8")),
      // a decodable IMAGE is not audio: must fall out null, not throw
      Asset(5L, "image", Multimodal.encodePng(4, 4, (_, _) => 0x112233))).toDS()
    val f = Multimodal.decodeAudioFeatures(ds).collect().map(x => x.asset_id -> x).toMap
    assert(f(1L).sample_rate.contains(11000) && f(1L).channels.contains(1))
    assert(f(1L).n_frames.contains(300L))
    assert(f(1L).sum_abs.contains(samples.map(s => math.abs(s.toLong)).sum))
    assert(f(2L).sum_abs.contains(100L + 200 + 0 + 32767 + 32768))
    assert(f(3L).sample_rate.isEmpty && f(4L).sample_rate.isEmpty && f(5L).sample_rate.isEmpty)
  }

  test("audio decode is partitioning-invariant and wav-sniffable") {
    import spark.implicits._
    val ds = Seq.tabulate(7)(i => Asset(i.toLong, "audio",
      Multimodal.encodeWav(8000 + i, Array.tabulate(50)(j => (i * j).toShort)))).toDS()
    val a = Multimodal.decodeAudioFeatures(ds).collect().toSet
    val b = Multimodal.decodeAudioFeatures(ds.repartition(4)).collect().toSet
    assert(a == b)
    val sniffed = Multimodal.contentMeta(ds.toDF(), "asset_id", "content")
      .select("format").distinct().collect().map(_.getString(0)).toSeq
    assert(sniffed == Seq("wav"))
  }

  test("decodeHistogram features feed straight into the similarity operators") {
    import spark.implicits._
    val ds = Seq(
      Asset(1L, "image", Multimodal.encodePng(8, 8, (_, _) => 0x101010)),
      Asset(2L, "image", Multimodal.encodePng(8, 8, (_, _) => 0x121212)),
      Asset(3L, "image", Multimodal.encodePng(8, 8, (_, _) => 0xF0F0F0))).toDS()
    val feats = Multimodal.decodeHistogram(ds, bins = 8)
      .select($"asset_id".as("vec_id"), $"feature".as("embedding"))
    // near-identical dark images collide; the bright one doesn't
    val sims = Similarity.nearDupPairs(feats.toDF(), "vec_id", "embedding",
      threshold = 0.99).collect()
    assert(sims.map(r => (r.getLong(0), r.getLong(1))).toSet == Set((1L, 2L)))
  }
}
