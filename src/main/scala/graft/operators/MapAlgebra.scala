package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.raster.NoData

/** Local (cell-wise) map algebra over aligned tiled layers — the
  * third classic raster-operator family next to zonal (Zonal) and
  * focal (Focal). A local op needs no halo and no rasterization: it is
  * the align join (reference `joinCollectionLayers`, Utils.scala:
  * 221-232, NODATA-filling absent tiles) followed by a codegen'd
  * `zip_with` over the cell arrays — per-tile, in-place, zero
  * shuffle beyond the key join, which Catalyst makes a broadcast or
  * bucketed join whenever the layers allow.
  */
object MapAlgebra {

  /** Cell-wise combination of two int layers: `lambda` is a SQL
    * two-argument lambda (e.g. `(x, y) -> x * 100 + y`) evaluated over
    * NODATA-filled aligned tiles. Missing tiles become constant NODATA
    * tiles of `tileCells` cells, mirroring the reference's
    * `IntConstantTile(NODATA, …)` fill.
    */
  def localCombineInt(a: DataFrame, b: DataFrame, lambda: String,
                      tileCells: Int): DataFrame = {
    val nod = s"array_repeat(${NoData.INT}, $tileCells)"
    a.select(col("key_col"), col("key_row"), col("tile_i").as("__ta"))
      .join(b.select(col("key_col"), col("key_row"), col("tile_i").as("__tb")),
        Seq("key_col", "key_row"), "full_outer")
      .select(col("key_col"), col("key_row"),
        expr(s"zip_with(coalesce(__ta, $nod), coalesce(__tb, $nod), $lambda)")
          .as("tile_i"))
  }

  /** Cell-value histogram of an int layer: explode + count — the
    * ungrouped "how much of each class" question without a mask.
    */
  def cellHistogram(layer: DataFrame): DataFrame =
    layer.select(explode(col("tile_i")).as("v"))
      .groupBy("v").agg(count(lit(1)).as("cnt"))
}
