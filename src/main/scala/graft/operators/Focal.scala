package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.TileCatalog.RasterMeta

/** Focal (neighborhood / stencil) raster operators over the tiled
  * catalog — the classic next operator family beyond the reference's
  * zonal surface (the reference has none; GeoTrellis ships them as
  * `focalMean`/`focalSlope`, which the reference never calls).
  *
  * Distributed design — tile halo exchange, the canonical stencil
  * pattern: each tile emits its own payload plus eight border strips
  * (four 1-cell-wide edges + four corner cells) re-keyed to the
  * neighbor tiles that need them; one `groupByKey(key)` then assembles
  * a (tr+2)×(tc+2) extended frame per tile and runs the kernel
  * entirely locally. Shuffle volume is tiles + O(perimeter) halo —
  * per 512² tile, 2 MB payload + ~16 KB of strips — and the whole op
  * is ONE shuffle regardless of kernel, so at 100 TB it scales exactly
  * like the zonal scan it feeds. No pixel-level shuffle: a naive
  * per-pixel 9-way self-join would shuffle 9× the raster.
  *
  * NODATA: NaN cells are excluded from the mean (cells outside the
  * raster likewise — boundary frames stay NaN); a cell with zero data
  * neighbors yields NaN. Horn slope requires the full 3×3 window and
  * yields NaN if any neighbor is missing.
  */
object Focal {

  /** 3×3 focal mean (center included) of a double layer. */
  def focalMeanD(spark: SparkSession, layer: DataFrame, meta: RasterMeta): DataFrame =
    focalD(spark, layer, meta) { (ext, tc, tr) =>
      val es = tc + 2
      val out = Array.fill(tc * tr)(Double.NaN)
      var y = 1
      while (y <= tr) {
        var x = 1
        while (x <= tc) {
          var s = 0.0; var c = 0
          var dy = -1
          while (dy <= 1) {
            var dx = -1
            while (dx <= 1) {
              val v = ext((y + dy) * es + (x + dx))
              if (!v.isNaN) { s += v; c += 1 }
              dx += 1
            }
            dy += 1
          }
          if (c > 0) out((y - 1) * tc + (x - 1)) = s / c
          x += 1
        }
        y += 1
      }
      out
    }

  /** 3×3 focal (sum, count) plane in ONE halo exchange, with values
    * scaled to integers first: each non-NODATA neighbor contributes
    * floor(v·scale + 0.5) to an integer sum s and 1 to the data count
    * c; the output cell packs s·16 + c (c ≤ 9) into a double. The
    * scaling is a pure per-value function of the stored double and the
    * sum is over ≤ 9 integers, so the plane is EXACT and
    * order-independent — the bit-stable focal statistic a hash-exact
    * gate can pin (q88), where a float mean's summation order can flip
    * a rounding boundary. Exactness needs |v|·scale·9·16 < 2⁵³; cells
    * with no data neighbors stay NaN.
    */
  def focalSumCountD(spark: SparkSession, layer: DataFrame, meta: RasterMeta,
                     scale: Double = 10000.0): DataFrame =
    focalD(spark, layer, meta) { (ext, tc, tr) =>
      val es = tc + 2
      val out = Array.fill(tc * tr)(Double.NaN)
      var y = 1
      while (y <= tr) {
        var x = 1
        while (x <= tc) {
          var s = 0.0; var c = 0
          var dy = -1
          while (dy <= 1) {
            var dx = -1
            while (dx <= 1) {
              val v = ext((y + dy) * es + (x + dx))
              if (!v.isNaN) { s += math.floor(v * scale + 0.5); c += 1 }
              dx += 1
            }
            dy += 1
          }
          if (c > 0) out((y - 1) * tc + (x - 1)) = s * 16 + c
          x += 1
        }
        y += 1
      }
      out
    }

  /** Topographic Position Index plane (Weiss 2001: center minus the
    * mean of its ring neighbors — ridge/valley/flat classification),
    * in the exact-integer encoding of [[focalSumCountD]]: with
    * vi = floor(v·scale + 0.5), each cell with a non-NODATA center and
    * c ≥ 1 data ring-neighbors emits d·16 + c where
    * d = vi(center)·c − Σ vi(neighbors) — the TPI numerator scaled by
    * c·scale, so sign(d) classifies ridge (>0) / valley (<0) / flat
    * (=0) without ever dividing. Same one-shuffle halo exchange;
    * NODATA centers and isolated cells stay NaN. Exactness needs
    * |v|·scale·8·16 < 2⁵³.
    */
  def focalTpiD(spark: SparkSession, layer: DataFrame, meta: RasterMeta,
                scale: Double = 10000.0): DataFrame =
    focalD(spark, layer, meta) { (ext, tc, tr) =>
      val es = tc + 2
      val out = Array.fill(tc * tr)(Double.NaN)
      var y = 1
      while (y <= tr) {
        var x = 1
        while (x <= tc) {
          val cv = ext(y * es + x)
          if (!cv.isNaN) {
            var s = 0.0; var c = 0
            var dy = -1
            while (dy <= 1) {
              var dx = -1
              while (dx <= 1) {
                if (dx != 0 || dy != 0) {
                  val v = ext((y + dy) * es + (x + dx))
                  if (!v.isNaN) { s += math.floor(v * scale + 0.5); c += 1 }
                }
                dx += 1
              }
              dy += 1
            }
            if (c > 0)
              out((y - 1) * tc + (x - 1)) =
                (math.floor(cv * scale + 0.5) * c - s) * 16 + c
          }
          x += 1
        }
        y += 1
      }
      out
    }

  /** Horn's slope (ESRI/GDAL formula): gradient from the 3×3 window
    * with 1-2-1 weights, slope in degrees. NaN if any of the nine
    * cells is missing (honest NODATA propagation for a derivative).
    */
  def hornSlopeD(spark: SparkSession, layer: DataFrame, meta: RasterMeta,
                 cellSize: Double): DataFrame =
    hornKernel(spark, layer, meta, cellSize)(
      grad => math.toDegrees(math.atan(grad)))

  /** Horn's slope as PERCENT (100 · rise/run) — the reference's own
    * `us-percent-slope` convention. Unlike the degrees form this uses
    * only IEEE-exact operations (+, ×, /, sqrt), so per-cell values
    * are bit-identical on any engine evaluating the same expression —
    * which is what lets q91 gate the focal→zonal composition exactly.
    */
  def hornSlopePercentD(spark: SparkSession, layer: DataFrame, meta: RasterMeta,
                        cellSize: Double): DataFrame =
    hornKernel(spark, layer, meta, cellSize)(grad => 100 * grad)

  /** 3×3 focal majority (mode) for CATEGORICAL int layers — the
    * classic classification-smoothing filter. Ties break to the
    * smallest class value (deterministic on any engine); NODATA cells
    * and out-of-raster cells don't vote; a cell with no data neighbor
    * stays NODATA. Int classes ride the double halo machinery exactly
    * (every int < 2^53 is an exact double).
    */
  def focalMajorityI(spark: SparkSession, layer: DataFrame, meta: RasterMeta): DataFrame = {
    import graft.raster.NoData
    val asD = layer.select(col("key_col"), col("key_row"),
      expr(s"transform(tile_i, x -> CASE WHEN x = ${NoData.INT} " +
        "THEN CAST('NaN' AS DOUBLE) ELSE CAST(x AS DOUBLE) END)").as("tile_d"))
    val maj = focalD(spark, asD, meta) { (ext, tc, tr) =>
      val es = tc + 2
      val out = Array.fill(tc * tr)(Double.NaN)
      // a window holds ≤ 9 distinct values: two 9-slot arrays with a
      // linear scan beat a per-cell HashMap by ~3× (measured at sf0.1)
      val vs = new Array[Double](9)
      val cs = new Array[Int](9)
      var y = 1
      while (y <= tr) {
        var x = 1
        while (x <= tc) {
          var n = 0
          var dy = -1
          while (dy <= 1) {
            var dx = -1
            while (dx <= 1) {
              val v = ext((y + dy) * es + (x + dx))
              if (!v.isNaN) {
                var i = 0
                while (i < n && vs(i) != v) i += 1
                if (i < n) cs(i) += 1 else { vs(n) = v; cs(n) = 1; n += 1 }
              }
              dx += 1
            }
            dy += 1
          }
          if (n > 0) {
            var bestV = vs(0); var bestC = cs(0)
            var i = 1
            while (i < n) {
              if (cs(i) > bestC || (cs(i) == bestC && vs(i) < bestV)) {
                bestV = vs(i); bestC = cs(i)
              }
              i += 1
            }
            out((y - 1) * tc + (x - 1)) = bestV
          }
          x += 1
        }
        y += 1
      }
      out
    }
    maj.select(col("key_col"), col("key_row"),
      expr(s"transform(tile_d, v -> CASE WHEN isnan(v) THEN ${NoData.INT} " +
        "ELSE CAST(v AS INT) END)").as("tile_i"))
  }

  /** Aspect (downslope orientation, degrees clockwise from north,
    * 0–360; flat cells → −1): `atan2` of the Horn gradients. Spec-
    * gated only — `atan2`/trig are libm calls whose last-ulp results
    * differ across engines, so no cross-engine hash oracle exists for
    * them (same documented reason the degree-form slope is spec-only).
    */
  def aspectD(spark: SparkSession, layer: DataFrame, meta: RasterMeta,
              cellSize: Double): DataFrame =
    hornGradients(spark, layer, meta, cellSize) { (dzdx, dzdy) =>
      if (dzdx == 0.0 && dzdy == 0.0) -1.0
      else {
        // ESRI convention: direction the surface FACES (downslope)
        val a = math.toDegrees(math.atan2(dzdy, -dzdx))
        val c = if (a > 90.0) 360.0 - a + 90.0 else 90.0 - a
        if (c == 360.0) 0.0 else c
      }
    }

  /** Hillshade (Horn gradients + sun position; standard GDAL/ESRI
    * formula, output 0–255). Spec-gated only (trig — see [[aspectD]]).
    */
  def hillshadeD(spark: SparkSession, layer: DataFrame, meta: RasterMeta,
                 cellSize: Double, azimuthDeg: Double = 315.0,
                 altitudeDeg: Double = 45.0): DataFrame = {
    val zenith = math.toRadians(90.0 - altitudeDeg)
    val azimuth = math.toRadians(360.0 - azimuthDeg + 90.0)
    hornGradients(spark, layer, meta, cellSize) { (dzdx, dzdy) =>
      val slope = math.atan(math.sqrt(dzdx * dzdx + dzdy * dzdy))
      val aspect =
        if (dzdx == 0.0 && dzdy == 0.0) 0.0 else math.atan2(dzdy, -dzdx)
      val shade = math.cos(zenith) * math.cos(slope) +
        math.sin(zenith) * math.sin(slope) * math.cos(azimuth - aspect)
      math.max(0.0, 255.0 * shade)
    }
  }

  /** Shared Horn-gradient frame: computes (dzdx, dzdy) per complete
    * 3×3 window and applies `finish`; incomplete/NODATA windows → NaN.
    */
  private def hornGradients(spark: SparkSession, layer: DataFrame,
                            meta: RasterMeta, cellSize: Double)(
      finish: (Double, Double) => Double): DataFrame =
    focalD(spark, layer, meta) { (ext, tc, tr) =>
      val es = tc + 2
      val out = Array.fill(tc * tr)(Double.NaN)
      var y = 1
      while (y <= tr) {
        var x = 1
        while (x <= tc) {
          val a = ext((y - 1) * es + (x - 1)); val b = ext((y - 1) * es + x)
          val c = ext((y - 1) * es + (x + 1)); val d = ext(y * es + (x - 1))
          val f = ext(y * es + (x + 1)); val g = ext((y + 1) * es + (x - 1))
          val h = ext((y + 1) * es + x); val i = ext((y + 1) * es + (x + 1))
          val e = ext(y * es + x)
          if (!(a.isNaN || b.isNaN || c.isNaN || d.isNaN || e.isNaN ||
            f.isNaN || g.isNaN || h.isNaN || i.isNaN)) {
            val dzdx = ((c + 2 * f + i) - (a + 2 * d + g)) / (8 * cellSize)
            val dzdy = ((g + 2 * h + i) - (a + 2 * b + c)) / (8 * cellSize)
            out((y - 1) * tc + (x - 1)) = finish(dzdx, dzdy)
          }
          x += 1
        }
        y += 1
      }
      out
    }

  /** D8 flow direction (O'Callaghan & Mark 1984; ESRI code convention
    * E=1, SE=2, S=4, SW=8, W=16, NW=32, N=64, NE=128) — the hydrology
    * kernel of the reference's own domain (Model My Watershed): each
    * cell flows to its steepest-descent neighbor, drop = (z − z_n)/dist
    * with dist √2 on diagonals. Pits/flats (no positive drop) → 0;
    * NODATA centers stay NODATA; NODATA / out-of-raster neighbors
    * never receive flow. Ties break to the FIRST direction in the
    * E,SE,S,SW,W,NW,N,NE scan — deterministic, and all arithmetic is
    * IEEE-exact (÷, √2), so an oracle recomputes codes bit-identically.
    */
  def d8FlowDirectionD(spark: SparkSession, layer: DataFrame, meta: RasterMeta): DataFrame = {
    import graft.raster.NoData
    val s2 = math.sqrt(2.0)
    val rel = Array((1, 0, 1.0), (1, 1, s2), (0, 1, 1.0), (-1, 1, s2),
      (-1, 0, 1.0), (-1, -1, s2), (0, -1, 1.0), (1, -1, s2))
    val codes = Array(1.0, 2.0, 4.0, 8.0, 16.0, 32.0, 64.0, 128.0)
    val dirs = focalD(spark, layer, meta) { (ext, tc, tr) =>
      val es = tc + 2
      val out = Array.fill(tc * tr)(Double.NaN)
      var y = 1
      while (y <= tr) {
        var x = 1
        while (x <= tc) {
          val e = ext(y * es + x)
          if (!e.isNaN) {
            var best = 0.0; var bestCode = 0.0
            var i = 0
            while (i < 8) {
              val (rx, ry, dist) = rel(i)
              val n = ext((y + ry) * es + (x + rx))
              if (!n.isNaN) {
                val drop = (e - n) / dist
                if (drop > best) { best = drop; bestCode = codes(i) }
              }
              i += 1
            }
            out((y - 1) * tc + (x - 1)) = bestCode
          }
          x += 1
        }
        y += 1
      }
      out
    }
    dirs.select(col("key_col"), col("key_row"),
      expr(s"transform(tile_d, v -> CASE WHEN isnan(v) THEN ${NoData.INT} " +
        "ELSE CAST(v AS INT) END)").as("tile_i"))
  }

  private def hornKernel(spark: SparkSession, layer: DataFrame, meta: RasterMeta,
                         cellSize: Double)(finish: Double => Double): DataFrame =
    hornGradients(spark, layer, meta, cellSize)((dzdx, dzdy) =>
      finish(math.sqrt(dzdx * dzdx + dzdy * dzdy)))

  /** Halo-exchange skeleton: apply `kernel(extendedFrame, tc, tr)` to
    * every tile of a double layer; the extended frame is (tr+2)×(tc+2)
    * row-major with NaN outside the raster / where neighbors are
    * absent. Returns (key_col, key_row, tile_d). One shuffle.
    */
  def focalD(spark: SparkSession, layer: DataFrame, meta: RasterMeta)
            (kernel: (Array[Double], Int, Int) => Array[Double]): DataFrame = {
    import spark.implicits._
    val tc = meta.tileCols; val tr = meta.tileRows
    val lc = meta.layoutCols; val lr = meta.layoutRows
    val tiles = layer.select(col("key_col"), col("key_row"), col("tile_d"))
      .as[(Int, Int, Array[Double])]
    // (targetKc, targetKr, dc, dr, strip): dc/dr locate the SOURCE
    // relative to the target, so the receiver can place the strip
    // without knowing the sender
    val fragments = tiles.flatMap { case (kc, kr, tile) =>
      for {
        dc <- -1 to 1; dr <- -1 to 1
        tkc = kc + dc if tkc >= 0 && tkc < lc
        tkr = kr + dr if tkr >= 0 && tkr < lr
      } yield {
        // source-local cell range this (dc, dr) neighbor needs
        val xs = dc match { case 1 => tc - 1 to tc - 1; case 0 => 0 until tc; case _ => 0 to 0 }
        val ys = dr match { case 1 => tr - 1 to tr - 1; case 0 => 0 until tr; case _ => 0 to 0 }
        val strip =
          if (dc == 0 && dr == 0) tile // self: full payload, no copy
          else {
            val out = Array.ofDim[Double](xs.size * ys.size)
            var o = 0
            ys.foreach { y => xs.foreach { x => out(o) = tile(y * tc + x); o += 1 } }
            out
          }
        // dc/dr seen FROM the target: source sits at (-dc, -dr)
        (tkc, tkr, -dc, -dr, strip)
      }
    }
    fragments.groupByKey(f => (f._1, f._2))
      .mapGroups { (key: (Int, Int), it) =>
        val (kc, kr) = key
        val es = tc + 2
        val ext = Array.fill(es * (tr + 2))(Double.NaN)
        var hasSelf = false
        it.foreach { case (_, _, dc, dr, strip) =>
          if (dc == 0 && dr == 0) hasSelf = true
          // placement of the strip from the neighbor at (dc, dr)
          val x0 = dc match { case -1 => 0; case 0 => 1; case _ => tc + 1 }
          val y0 = dr match { case -1 => 0; case 0 => 1; case _ => tr + 1 }
          val w = if (dc == 0) tc else 1
          var o = 0
          while (o < strip.length) {
            ext((y0 + o / w) * es + (x0 + o % w)) = strip(o)
            o += 1
          }
        }
        if (hasSelf) (kc, kr, kernel(ext, tc, tr))
        else (kc, kr, null: Array[Double]) // halo for an absent tile
      }
      .filter(_._3 != null)
      .toDF("key_col", "key_row", "tile_d")
  }
}
