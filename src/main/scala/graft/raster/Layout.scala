package graft.raster

import org.locationtech.jts.geom.{Envelope, Geometry}

/** Grid/layout math for tiled rasters — the engine's analog of the
  * reference's GeoTrellis `LayoutDefinition`/`RasterExtent`
  * (SURVEY §1.1: 512×512 tiles, 30 m cells, EPSG:5070, zoom 0).
  * Row 0 is the TOP row (screen coordinates), matching the tile-grid
  * convention of the reference catalog.
  */
final case class Extent(xmin: Double, ymin: Double, xmax: Double, ymax: Double) {
  def width: Double = xmax - xmin
  def height: Double = ymax - ymin
  def toEnvelope: Envelope = new Envelope(xmin, xmax, ymin, ymax)
  def intersects(other: Extent): Boolean =
    xmin < other.xmax && other.xmin < xmax && ymin < other.ymax && other.ymin < ymax
}

/** A concrete pixel grid over an extent: `cols`×`rows` cells of size
  * (cellW, cellH). Pixel (0,0) is the top-left cell.
  */
final case class RasterExtent(extent: Extent, cols: Int, rows: Int) {
  val cellW: Double = extent.width / cols
  val cellH: Double = extent.height / rows

  /** x-coordinate of the CENTER of pixel column c. */
  def colCenter(c: Int): Double = extent.xmin + (c + 0.5) * cellW
  /** y-coordinate of the CENTER of pixel row r (row 0 at top). */
  def rowCenter(r: Int): Double = extent.ymax - (r + 0.5) * cellH

  /** Map x -> pixel column (floor semantics). */
  def mapXToGrid(x: Double): Int = math.floor((x - extent.xmin) / cellW).toInt
  /** Map y -> pixel row (floor from the top edge). */
  def mapYToGrid(y: Double): Int = math.floor((extent.ymax - y) / cellH).toInt

  def cellExtent(c: Int, r: Int): Extent = Extent(
    extent.xmin + c * cellW, extent.ymax - (r + 1) * cellH,
    extent.xmin + (c + 1) * cellW, extent.ymax - r * cellH)
}

/** Tiled layout: `layoutCols`×`layoutRows` tiles of
  * `tileCols`×`tileRows` pixels over `extent`. `SpatialKey`
  * (col, row) addresses one tile, (0,0) top-left.
  */
final case class Layout(extent: Extent, tileCols: Int, tileRows: Int,
                        layoutCols: Int, layoutRows: Int) {
  val tileW: Double = extent.width / layoutCols
  val tileH: Double = extent.height / layoutRows

  def tileExtent(keyCol: Int, keyRow: Int): Extent = Extent(
    extent.xmin + keyCol * tileW, extent.ymax - (keyRow + 1) * tileH,
    extent.xmin + (keyCol + 1) * tileW, extent.ymax - keyRow * tileH)

  def rasterExtent(keyCol: Int, keyRow: Int): RasterExtent =
    RasterExtent(tileExtent(keyCol, keyRow), tileCols, tileRows)

  /** Keys of tiles whose extent intersects the geometry's envelope —
    * the spatial-pruning predicate (reference `Intersects(shape)`
    * pushdown, Utils.scala:246-247). Returns an inclusive key bbox.
    */
  def keyRange(g: Geometry): (Int, Int, Int, Int) = {
    val env = g.getEnvelopeInternal
    val c0 = math.max(0, math.floor((env.getMinX - extent.xmin) / tileW).toInt)
    val c1 = math.min(layoutCols - 1, math.floor((env.getMaxX - extent.xmin) / tileW).toInt)
    val r0 = math.max(0, math.floor((extent.ymax - env.getMaxY) / tileH).toInt)
    val r1 = math.min(layoutRows - 1, math.floor((extent.ymax - env.getMinY) / tileH).toInt)
    (c0, c1, r0, r1)
  }
}

object NoData {
  /** Int NODATA sentinel — participates in group keys as itself
    * (reference Utils.scala:225; CHANGELOG.md:59-63).
    */
  val INT: Int = Int.MinValue
  /** Double NODATA — NaN (reference Utils.scala:269-283). */
  val DOUBLE: Double = Double.NaN
  def isData(v: Int): Boolean = v != INT
  def isData(v: Double): Boolean = !v.isNaN
}
