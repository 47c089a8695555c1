package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSpec
import graft.sources.TileCatalog.RasterMeta

/** Focal halo-exchange operators vs a brute-force whole-raster
  * reference (single flat array, no tiling) — proves the strip
  * emission/placement reconstructs exactly the neighborhoods a
  * monolithic implementation sees, including across tile borders,
  * at raster edges, and around NaN pockets.
  */
class FocalSpec extends AnyFunSuite with SparkSpec {

  private val lc = 3; private val lr = 2; private val ts = 8
  private val W = lc * ts; private val H = lr * ts

  private def value(gc: Int, gr: Int): Double =
    if (gc == 5 && gr == 5) Double.NaN // interior NaN pocket
    else if (gc == 8 && gr == 0) Double.NaN // NaN on a tile border
    else gc * 0.5 + gr * 1.25

  private lazy val meta = RasterMeta("t", 0, "ConusAlbers", "double",
    0, 0, W, H, ts, ts, lc, lr)

  private lazy val layer = {
    import spark.implicits._
    val tiles = for (kc <- 0 until lc; kr <- 0 until lr) yield {
      (kc, kr, Array.tabulate(ts * ts)(i =>
        value(kc * ts + i % ts, kr * ts + i / ts)))
    }
    tiles.toDF("key_col", "key_row", "tile_d")
  }

  private def collectGrid(df: org.apache.spark.sql.DataFrame): Array[Double] = {
    val out = Array.fill(W * H)(Double.NaN)
    df.collect().foreach { r =>
      val kc = r.getInt(0); val kr = r.getInt(1)
      val t = r.getSeq[Double](2)
      for (i <- t.indices)
        out((kr * ts + i / ts) * W + kc * ts + i % ts) = t(i)
    }
    out
  }

  private def assertGridEqual(got: Array[Double], want: Array[Double]): Unit =
    for (gr <- 0 until H; gc <- 0 until W) {
      val g = got(gr * W + gc); val w = want(gr * W + gc)
      assert((g.isNaN && w.isNaN) || math.abs(g - w) < 1e-12,
        s"cell ($gc,$gr): got $g want $w")
    }

  test("focalMeanD == brute force (tile borders, edges, NaN pockets)") {
    val want = Array.tabulate(W * H) { idx =>
      val gc = idx % W; val gr = idx / W
      var s = 0.0; var c = 0
      for (dy <- -1 to 1; dx <- -1 to 1) {
        val x = gc + dx; val y = gr + dy
        if (x >= 0 && x < W && y >= 0 && y < H && !value(x, y).isNaN) {
          s += value(x, y); c += 1
        }
      }
      if (c > 0) s / c else Double.NaN
    }
    assertGridEqual(collectGrid(Focal.focalMeanD(spark, layer, meta)), want)
  }

  test("hornSlopeD == brute force; NaN wherever the window is incomplete") {
    val cell = 2.0
    val want = Array.tabulate(W * H) { idx =>
      val gc = idx % W; val gr = idx / W
      val vs = for (dy <- -1 to 1; dx <- -1 to 1) yield {
        val x = gc + dx; val y = gr + dy
        if (x >= 0 && x < W && y >= 0 && y < H) value(x, y) else Double.NaN
      }
      if (vs.exists(_.isNaN)) Double.NaN
      else {
        val Seq(a, b, c, d, _, f, g, h, i) = vs
        val dzdx = ((c + 2 * f + i) - (a + 2 * d + g)) / (8 * cell)
        val dzdy = ((g + 2 * h + i) - (a + 2 * b + c)) / (8 * cell)
        math.toDegrees(math.atan(math.sqrt(dzdx * dzdx + dzdy * dzdy)))
      }
    }
    assertGridEqual(collectGrid(Focal.hornSlopeD(spark, layer, meta, cell)), want)
  }

  test("hornSlopePercentD == 100 * tan(hornSlopeD degrees)") {
    val deg = collectGrid(Focal.hornSlopeD(spark, layer, meta, 2.0))
    val pct = collectGrid(Focal.hornSlopePercentD(spark, layer, meta, 2.0))
    for (i <- deg.indices) {
      assert(deg(i).isNaN == pct(i).isNaN)
      if (!deg(i).isNaN)
        assert(math.abs(pct(i) - 100 * math.tan(math.toRadians(deg(i)))) < 1e-9)
    }
  }

  test("focalMajorityI == brute force with smallest-class tie-break") {
    import graft.raster.NoData
    import spark.implicits._
    def cls(gc: Int, gr: Int): Int =
      if ((gc + gr) % 7 == 3) NoData.INT else (gc * 3 + gr * 5) / 4 % 4
    val tiles = for (kc <- 0 until lc; kr <- 0 until lr) yield {
      (kc, kr, Array.tabulate(ts * ts)(i => cls(kc * ts + i % ts, kr * ts + i / ts)))
    }
    val layer = tiles.toDF("key_col", "key_row", "tile_i")
    val got = Focal.focalMajorityI(spark, layer, meta).collect()
      .flatMap { r =>
        val kc = r.getInt(0); val kr = r.getInt(1); val t = r.getSeq[Int](2)
        t.indices.map(i => (kc * ts + i % ts, kr * ts + i / ts) -> t(i))
      }.toMap
    for (gr <- 0 until H; gc <- 0 until W) {
      val votes = scala.collection.mutable.HashMap.empty[Int, Int]
      for (dy <- -1 to 1; dx <- -1 to 1) {
        val x = gc + dx; val y = gr + dy
        if (x >= 0 && x < W && y >= 0 && y < H && cls(x, y) != NoData.INT)
          votes(cls(x, y)) = votes.getOrElse(cls(x, y), 0) + 1
      }
      val want =
        if (votes.isEmpty) NoData.INT
        else votes.toSeq.map { case (v, c) => (-c, v) }.min._2
      assert(got((gc, gr)) == want, s"cell ($gc,$gr)")
    }
  }

  test("aspectD: plane surfaces face the known downslope direction") {
    import spark.implicits._
    // z = gc  (rises east)  -> faces west (270);  z = gr (rises south,
    // row-down) -> faces north (0)
    def plane(f: (Int, Int) => Double) = {
      val tiles = for (kc <- 0 until lc; kr <- 0 until lr) yield {
        (kc, kr, Array.tabulate(ts * ts)(i =>
          f(kc * ts + i % ts, kr * ts + i / ts)))
      }
      tiles.toDF("key_col", "key_row", "tile_d")
    }
    val west = collectGrid(Focal.aspectD(spark, plane((gc, _) => gc.toDouble), meta, 1.0))
    val north = collectGrid(Focal.aspectD(spark, plane((_, gr) => gr.toDouble), meta, 1.0))
    val flat = collectGrid(Focal.aspectD(spark, plane((_, _) => 5.0), meta, 1.0))
    // interior cells only (borders are NaN: incomplete window)
    assert(math.abs(west((3) * W + 3) - 270.0) < 1e-9)
    assert(math.abs(north((3) * W + 3) - 0.0) < 1e-9)
    assert(flat((3) * W + 3) == -1.0)
  }

  test("hillshadeD: flat ground lit by sun altitude; range clamped to [0, 255]") {
    import spark.implicits._
    val tiles = for (kc <- 0 until lc; kr <- 0 until lr) yield {
      (kc, kr, Array.fill(ts * ts)(7.0))
    }
    val flat = tiles.toDF("key_col", "key_row", "tile_d")
    val hs = collectGrid(Focal.hillshadeD(spark, flat, meta, 1.0, altitudeDeg = 45.0))
    // flat surface: shade = cos(zenith) = cos(45°) -> 255/sqrt(2)
    assert(math.abs(hs(3 * W + 3) - 255.0 / math.sqrt(2.0)) < 1e-9)
    val real = collectGrid(Focal.hillshadeD(spark, layer, meta, 2.0))
    real.filter(!_.isNaN).foreach(v => assert(v >= 0.0 && v <= 255.0))
  }

  test("d8FlowDirectionD == brute force incl. ties, pits, NODATA") {
    import graft.raster.NoData
    val s2 = math.sqrt(2.0)
    val rel = Seq((1, 0, 1.0), (1, 1, s2), (0, 1, 1.0), (-1, 1, s2),
      (-1, 0, 1.0), (-1, -1, s2), (0, -1, 1.0), (1, -1, s2))
    val codes = Seq(1, 2, 4, 8, 16, 32, 64, 128)
    val got = Focal.d8FlowDirectionD(spark, layer, meta).collect()
      .flatMap { r =>
        val kc = r.getInt(0); val kr = r.getInt(1); val t = r.getSeq[Int](2)
        t.indices.map(i => (kc * ts + i % ts, kr * ts + i / ts) -> t(i))
      }.toMap
    for (gr <- 0 until H; gc <- 0 until W) {
      val e = value(gc, gr)
      val want =
        if (e.isNaN) NoData.INT
        else {
          var best = 0.0; var bestCode = 0
          for (((rx, ry, dist), code) <- rel.zip(codes)) {
            val x = gc + rx; val y = gr + ry
            if (x >= 0 && x < W && y >= 0 && y < H && !value(x, y).isNaN) {
              val drop = (e - value(x, y)) / dist
              if (drop > best) { best = drop; bestCode = code }
            }
          }
          bestCode
        }
      assert(got((gc, gr)) == want, s"cell ($gc,$gr)")
    }
    // surface = gc·0.5 + gr·1.25: the N drop (1.25) beats NW
    // ((0.5+1.25)/√2 ≈ 1.24), so interior flow heads N — sanity that
    // codes aren't flipped
    assert(got((10, 10)) == 64)
  }

  test("focalD property: random layouts (non-square tiles, holes) == brute force") {
    import spark.implicits._
    val rnd = new scala.util.Random(2026)
    for (trial <- 0 until 5) {
      val tc = 3 + rnd.nextInt(6); val tr = 3 + rnd.nextInt(6)
      val lc2 = 1 + rnd.nextInt(3); val lr2 = 1 + rnd.nextInt(3)
      val w = lc2 * tc; val h = lr2 * tr
      val m = RasterMeta(s"t$trial", 0, "ConusAlbers", "double",
        0, 0, w, h, tc, tr, lc2, lr2)
      val vals = Array.tabulate(w * h)(i =>
        if (rnd.nextInt(10) == 0) Double.NaN else rnd.nextDouble() * 100)
      val present = (for (kc <- 0 until lc2; kr <- 0 until lr2) yield (kc, kr))
        .filter(_ => rnd.nextInt(5) != 0) // ~20% of tiles missing
      val layer = present.map { case (kc, kr) =>
        (kc, kr, Array.tabulate(tc * tr)(i =>
          vals((kr * tr + i / tc) * w + kc * tc + i % tc)))
      }.toDF("key_col", "key_row", "tile_d")
      def at(gc: Int, gr: Int): Double = {
        val in = gc >= 0 && gc < w && gr >= 0 && gr < h
        if (!in || !present.contains((gc / tc, gr / tr))) Double.NaN
        else vals(gr * w + gc)
      }
      val got = Focal.focalMeanD(spark, layer, m).collect()
        .flatMap { r =>
          val kc = r.getInt(0); val kr = r.getInt(1); val t = r.getSeq[Double](2)
          t.indices.map(i => (kc * tc + i % tc, kr * tr + i / tc) -> t(i))
        }.toMap
      assert(got.size == present.size * tc * tr)
      got.foreach { case ((gc, gr), g) =>
        var s = 0.0; var c = 0
        for (dy <- -1 to 1; dx <- -1 to 1) {
          val v = at(gc + dx, gr + dy)
          if (!v.isNaN) { s += v; c += 1 }
        }
        val want = if (c > 0) s / c else Double.NaN
        assert((g.isNaN && want.isNaN) || math.abs(g - want) < 1e-12,
          s"trial $trial cell ($gc,$gr): got $g want $want")
      }
    }
  }

  test("focalD tolerates missing tiles: halo for an absent tile emits nothing") {
    import org.apache.spark.sql.functions._
    val holey = layer.filter(!(col("key_col") === 1 && col("key_row") === 0))
    val out = Focal.focalMeanD(spark, holey, meta)
    assert(out.count() == lc * lr - 1)
    // cells adjacent to the hole see fewer neighbors, never wrong ones
    val grid = collectGrid(out)
    val gc = ts - 1; val gr = 3 // right edge of tile (0,0), beside the hole
    var s = 0.0; var c = 0
    for (dy <- -1 to 1; dx <- -1 to 1) {
      val x = gc + dx; val y = gr + dy
      val inHole = x >= ts && x < 2 * ts && y < ts
      if (x >= 0 && x < W && y >= 0 && y < H && !inHole && !value(x, y).isNaN) {
        s += value(x, y); c += 1
      }
    }
    assert(math.abs(grid(gr * W + gc) - s / c) < 1e-12)
  }
}
