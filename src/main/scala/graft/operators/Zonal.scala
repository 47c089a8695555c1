package graft.operators

import org.apache.spark.sql.{DataFrame, Encoders, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.locationtech.jts.geom.{Geometry, MultiLineString, MultiPolygon}

import graft.geom.GeomOps
import graft.raster.{Layout, NoData, Rasterizer}
import graft.sources.TileCatalog.RasterMeta

/** The reference's zonal-statistics operators (SURVEY §2.1 rows A–F)
  * as Spark plans over the tiles table.
  *
  * Shape of every plan:
  *   pruned scan(s) → full-outer align join on SpatialKey (NODATA
  *   fill) → masked-pixel flatMap (rasterizer kernel, the only
  *   imperative stage) → native Catalyst aggregation.
  *
  * The pixel plane stays an internal detail: only (value-tuple, agg)
  * rows of tiny cardinality (≤ ~500 groups, SURVEY §6) ever reach the
  * driver. The flatMap emits no pixel unless masked, so the plane is
  * never a full cartesian explode. Aggregations are plain
  * `groupBy().agg()` — partial map-side combine + one shuffle of a
  * few hundred rows, which is why this design holds at 1000 executors:
  * everything between scan and final agg is embarrassingly parallel
  * per tile.
  *
  * NODATA semantics (SURVEY §2.3):
  *  - group values: NODATA (Int.MinValue) groups as itself;
  *  - average target: NODATA contributes 0.0 but still counts
  *    (reference Geoprocessing.scala:266-270, 313-319);
  *  - summary min/max skip NODATA (as NULL — documented divergence
  *    from the reference's inert NaN guard, Utils.scala:266-284);
  *    summary avg counts every masked pixel with NODATA as 0.0.
  */
object Zonal {

  final case class Layer(meta: RasterMeta, df: DataFrame)

  /** Serializable lazy-parsing geometry holder for broadcast. */
  private final class BGeom(val wkb: Array[Byte]) extends Serializable {
    @transient private var g: Geometry = _
    def geom: Geometry = {
      if (g == null) g = GeomOps.fromWkb(wkb)
      g
    }
  }

  private def bgeom(g: Geometry): BGeom = new BGeom(GeomOps.toWkb(g))

  /** Full-outer align join of N layers on SpatialKey; each layer's
    * tile array surfaces as g0..g{n-1} / d0.. (reference
    * `joinCollectionLayers`, Utils.scala:221-232 — missing tiles stay
    * null here and NODATA-fill inside the flatMap).
    */
  private def joinLayers(layers: Seq[Layer]): DataFrame = {
    require(layers.nonEmpty, "at least one layer")
    val renamed = layers.zipWithIndex.map { case (l, i) =>
      val valueCol = if (l.meta.isInt) col("tile_i") else col("tile_d")
      l.df.select(col("key_col"), col("key_row"), valueCol.as(s"t$i"))
    }
    renamed.reduce((a, b) => a.join(b, Seq("key_col", "key_row"), "full_outer"))
  }

  private val valsField = StructField("vals", ArrayType(IntegerType, containsNull = false))

  /** Masked pixel plane for int grouping layers (+ optional double
    * target): one row per masked pixel, columns
    * `vals ARRAY<INT>` [, `target DOUBLE` nullable=NODATA].
    */
  private def pixelPlane(spark: SparkSession, layout: Layout, groupLayers: Seq[Layer],
                         target: Option[Layer], aoi: MultiPolygon,
                         opts: Rasterizer.Options): DataFrame = {
    val joined = joinLayers(groupLayers ++ target.toSeq)
    val n = groupLayers.size
    val hasTarget = target.isDefined
    val schema = StructType(
      valsField +: (if (hasTarget) Seq(StructField("target", DoubleType, nullable = true)) else Nil))
    val b = bgeom(aoi)
    val tileCols = layout.tileCols
    val o = opts
    val lay = layout
    val out = joined.flatMap { row =>
      val keyCol = row.getInt(0)
      val keyRow = row.getInt(1)
      val re = lay.rasterExtent(keyCol, keyRow)
      val groups: Array[Array[Int]] = Array.tabulate(n) { i =>
        if (row.isNullAt(2 + i)) null else row.getSeq[Int](2 + i).toArray
      }
      val tgt: Array[Double] =
        if (hasTarget && !row.isNullAt(2 + n)) {
          val s = row.getSeq[Any](2 + n)
          s.map { case d: Double => d; case null => Double.NaN }.toArray
        } else null
      val buf = scala.collection.mutable.ArrayBuffer.empty[Row]
      // clip is invalid for fully-inside mode (artificial tile-edge
      // boundary would erode interior cells)
      val clipped =
        if (o.pixelIsArea && !o.includePartial) b.geom else clipToTile(b.geom, re)
      Rasterizer.foreachCellByPolygon(clipped, re, o) { (c, r) =>
        val vals = Array.tabulate(n) { i =>
          if (groups(i) == null) NoData.INT else groups(i)(r * tileCols + c)
        }
        if (hasTarget) {
          val tv = if (tgt == null) Double.NaN else tgt(r * tileCols + c)
          buf += Row(vals.toSeq, if (tv.isNaN) null else tv)
        } else {
          buf += Row(vals.toSeq)
        }
      }
      buf
    }(Encoders.row(schema))
    out.toDF()
  }

  /** Pre-clip the AOI to the tile extent: bounds the scanline to the
    * tile and keeps per-tile cost proportional to local geometry
    * complexity (center-sampling is invariant under this clip).
    * Skipped for PixelIsArea/includePartial=false where artificial
    * clip edges would wrongly erode interior cells.
    */
  private def clipToTile(g: Geometry, re: graft.raster.RasterExtent): Geometry =
    if (g.getNumGeometries > 0) {
      val env = g.getFactory.toGeometry(re.extent.toEnvelope)
      try g.intersection(env) catch { case _: Exception => g }
    } else g

  /** Row A — `rasterGroupedCount` (Geoprocessing.scala:338-368):
    * COUNT(*) of masked pixels per distinct value tuple.
    */
  def groupedCount(spark: SparkSession, layout: Layout, layers: Seq[Layer],
                   aoi: MultiPolygon, opts: Rasterizer.Options = Rasterizer.DEFAULT): DataFrame =
    pixelPlane(spark, layout, layers, None, aoi, opts)
      .groupBy(col("vals")).agg(count(lit(1)).as("cnt"))

  /** Multi-shape masked pixel plane: every shape rasterizes against
    * each tile in ONE flatMap pass (`shape_id` column instead of
    * per-shape rescans — the reference fetches layers once for the
    * union AOI, Geoprocessing.scala:116-120). Columns:
    * `shape_id INT, vals ARRAY<INT>[, target DOUBLE]`.
    */
  private def multiShapePlane(spark: SparkSession, layout: Layout,
                              groupLayers: Seq[Layer], target: Option[Layer],
                              aois: Seq[MultiPolygon],
                              opts: Rasterizer.Options): DataFrame = {
    val joined = joinLayers(groupLayers ++ target.toSeq)
    val n = groupLayers.size
    val hasTarget = target.isDefined
    val shapes = aois.map(bgeom)
    val lay = layout
    val o = opts
    val tileCols = layout.tileCols
    val schema = StructType(
      StructField("shape_id", IntegerType, nullable = false) +: valsField +:
        (if (hasTarget) Seq(StructField("target", DoubleType, nullable = true)) else Nil))
    joined.flatMap { row =>
      val keyCol = row.getInt(0)
      val keyRow = row.getInt(1)
      val re = lay.rasterExtent(keyCol, keyRow)
      val groups: Array[Array[Int]] = Array.tabulate(n) { i =>
        if (row.isNullAt(2 + i)) null else row.getSeq[Int](2 + i).toArray
      }
      val tgt: Array[Double] =
        if (hasTarget && !row.isNullAt(2 + n)) {
          val s = row.getSeq[Any](2 + n)
          s.map { case d: Double => d; case null => Double.NaN }.toArray
        } else null
      val buf = scala.collection.mutable.ArrayBuffer.empty[Row]
      shapes.zipWithIndex.foreach { case (bg, si) =>
        val clipped =
          if (o.pixelIsArea && !o.includePartial) bg.geom else clipToTile(bg.geom, re)
        Rasterizer.foreachCellByPolygon(clipped, re, o) { (c, r) =>
          val vals = Array.tabulate(n) { i =>
            if (groups(i) == null) NoData.INT else groups(i)(r * tileCols + c)
          }
          if (hasTarget) {
            val tv = if (tgt == null) Double.NaN else tgt(r * tileCols + c)
            buf += Row(si, vals.toSeq, if (tv.isNaN) null else tv)
          } else buf += Row(si, vals.toSeq)
        }
      }
      buf
    }(Encoders.row(schema)).toDF()
  }

  /** Row F — `getRasterGroupedCountMany` (Geoprocessing.scala:114-126):
    * grouped count per input polygon, one pass.
    */
  def groupedCountMany(spark: SparkSession, layout: Layout, layers: Seq[Layer],
                       aois: Seq[MultiPolygon],
                       opts: Rasterizer.Options = Rasterizer.DEFAULT): DataFrame =
    multiShapePlane(spark, layout, layers, None, aois, opts)
      .groupBy(col("shape_id"), col("vals")).agg(count(lit(1)).as("cnt"))

  /** Grouped average per shape in one pass (the /multi batch kernel). */
  def groupedAverageMany(spark: SparkSession, layout: Layout, groupLayers: Seq[Layer],
                         target: Layer, aois: Seq[MultiPolygon],
                         opts: Rasterizer.Options = Rasterizer.DEFAULT): DataFrame = {
    val plane = multiShapePlane(spark, layout, groupLayers, Some(target), aois, opts)
    val keyed = if (groupLayers.nonEmpty) plane else plane.withColumn("vals", array(lit(0)))
    keyed.groupBy(col("shape_id"), col("vals"))
      .agg(avg(coalesce(col("target"), lit(0.0))).as("avg_v"))
  }

  /** Batch op spec for [[multiBatch]]. */
  sealed trait BatchOp { def label: String }
  final case class BatchCount(label: String, rasters: Seq[String],
                              opts: Rasterizer.Options = Rasterizer.DEFAULT) extends BatchOp
  final case class BatchAverage(label: String, rasters: Seq[String], target: String,
                                opts: Rasterizer.Options = Rasterizer.DEFAULT) extends BatchOp
  final case class BatchLines(label: String, rasters: Seq[String]) extends BatchOp

  /** The /multi batch as ONE unioned DataFrame plan (SURVEY §3.2's
    * "idiomatic-Spark win"): shared cached scans feed a single-pass
    * multi-shape plane per op; output is
    * `(shape_id, op_label, k, v)` with Ints widened to Double
    * (reference Geoprocessing.scala:56).
    */
  def multiBatch(spark: SparkSession, layout: Layout, shared: Map[String, Layer],
                 aois: Seq[MultiPolygon],
                 lines: Seq[org.locationtech.jts.geom.MultiLineString],
                 ops: Seq[BatchOp]): DataFrame = {
    val keyExpr = expr("concat('List(', array_join(transform(vals, v -> cast(v as string)), ', '), ')')")
    val frames = ops.map {
      case BatchCount(label, rasters, o) =>
        groupedCountMany(spark, layout, rasters.map(shared), aois, o)
          .select(col("shape_id"), lit(label).as("op_label"), keyExpr.as("k"),
            col("cnt").cast("double").as("v"))
      case BatchAverage(label, rasters, target, o) =>
        groupedAverageMany(spark, layout, rasters.map(shared), shared(target), aois, o)
          .select(col("shape_id"), lit(label).as("op_label"), keyExpr.as("k"),
            col("avg_v").as("v"))
      case BatchLines(label, rasters) =>
        val clippedPerShape = aois.map(shape => GeomOps.clipLines(lines, shape))
        linesJoinMany(spark, layout, rasters.map(shared), clippedPerShape)
          .select(col("shape_id"), lit(label).as("op_label"), keyExpr.as("k"),
            col("cnt").cast("double").as("v"))
    }
    frames.reduce(_.unionByName(_))
  }

  /** Lines join for many shapes in ONE pass: each shape's (pre-clipped)
    * lines are broadcast together; the flatMap emits
    * (shape_id, vals, pixel) and one distinct+groupBy dedups per shape.
    * Turns the 61-shape reference batch from 61 scans into one.
    */
  def linesJoinMany(spark: SparkSession, layout: Layout, layers: Seq[Layer],
                    linesPerShape: Seq[Seq[org.locationtech.jts.geom.MultiLineString]]): DataFrame = {
    val joined = joinLayers(layers)
    val n = layers.size
    val gf = new org.locationtech.jts.geom.GeometryFactory()
    val perShape: Seq[BGeom] = linesPerShape.map { ls =>
      val all = ls.flatMap(ml => (0 until ml.getNumGeometries).map(ml.getGeometryN(_)
        .asInstanceOf[org.locationtech.jts.geom.LineString]))
      bgeom(gf.createMultiLineString(all.toArray))
    }
    val lay = layout
    val tileCols = layout.tileCols
    val schema = StructType(Seq(
      StructField("shape_id", IntegerType, nullable = false),
      valsField,
      StructField("key_col", IntegerType, nullable = false),
      StructField("key_row", IntegerType, nullable = false),
      StructField("px", IntegerType, nullable = false),
      StructField("py", IntegerType, nullable = false)))
    joined.flatMap { row =>
      val keyCol = row.getInt(0)
      val keyRow = row.getInt(1)
      val re = lay.rasterExtent(keyCol, keyRow)
      val groups: Array[Array[Int]] = Array.tabulate(n) { i =>
        if (row.isNullAt(2 + i)) null else row.getSeq[Int](2 + i).toArray
      }
      val buf = scala.collection.mutable.ArrayBuffer.empty[Row]
      perShape.zipWithIndex.foreach { case (bg, si) =>
        Rasterizer.foreachCellByLines(bg.geom, re) { (c, r) =>
          val vals = Array.tabulate(n) { i =>
            if (groups(i) == null) NoData.INT else groups(i)(r * tileCols + c)
          }
          buf += Row(si, vals.toSeq, keyCol, keyRow, c, r)
        }
      }
      buf
    }(Encoders.row(schema)).toDF()
      .distinct()
      .groupBy(col("shape_id"), col("vals")).agg(count(lit(1)).as("cnt"))
  }

  /** Rows B/C — `rasterAverage` / `rasterGroupedAverage`
    * (Geoprocessing.scala:245-277, 288-329): mean of target per value
    * tuple; NODATA target → 0.0 but counted. Ungrouped = constant
    * key `List(0)` (reference :275).
    */
  def groupedAverage(spark: SparkSession, layout: Layout, groupLayers: Seq[Layer],
                     target: Layer, aoi: MultiPolygon,
                     opts: Rasterizer.Options = Rasterizer.DEFAULT): DataFrame = {
    val plane = pixelPlane(spark, layout, groupLayers, Some(target), aoi, opts)
    val keyed =
      if (groupLayers.nonEmpty) plane
      else plane.withColumn("vals", array(lit(0)))
    keyed.groupBy(col("vals"))
      .agg(avg(coalesce(col("target"), lit(0.0))).as("avg_v"))
  }

  /** CHANGELOG-era `RasterGroupedSum` (reference CHANGELOG.md:151-153):
    * same plane, SUM with NODATA→0.
    */
  def groupedSum(spark: SparkSession, layout: Layout, groupLayers: Seq[Layer],
                 target: Layer, aoi: MultiPolygon,
                 opts: Rasterizer.Options = Rasterizer.DEFAULT): DataFrame = {
    val plane = pixelPlane(spark, layout, groupLayers, Some(target), aoi, opts)
    val keyed =
      if (groupLayers.nonEmpty) plane
      else plane.withColumn("vals", array(lit(0)))
    keyed.groupBy(col("vals"))
      .agg(sum(coalesce(col("target"), lit(0.0))).as("sum_v"))
  }

  /** Row E — `rasterSummary` (Geoprocessing.scala:380-431): per input
    * raster (order preserved), min/avg/max over masked pixels; min/max
    * skip NODATA, avg counts every masked pixel.
    */
  def summary(spark: SparkSession, layout: Layout, layers: Seq[Layer],
              aoi: MultiPolygon,
              opts: Rasterizer.Options = Rasterizer.DEFAULT): DataFrame =
    layers.zipWithIndex.map { case (l, i) =>
      pixelPlane(spark, layout, Nil, Some(l), aoi, opts)
        .agg(
          min(col("target")).as("min_v"),
          max(col("target")).as("max_v"),
          (sum(coalesce(col("target"), lit(0.0))) / count(lit(1))).as("avg_v"))
        .select(lit(i).as("idx"), lit(l.meta.rasterId).as("raster_id"),
          col("min_v"), col("avg_v"), col("max_v"))
    }.reduce(_.unionByName(_)).orderBy("idx")

  /** Row D — `rasterLinesJoin` (Geoprocessing.scala:210-235): count
    * DISTINCT pixels touched by ≥1 line, grouped by value tuple.
    * Lines are broadcast; the flatMap emits (vals, pixel-identity)
    * and Catalyst's distinct + count does the dedup (reference used a
    * concurrent TrieMap set).
    */
  def linesJoin(spark: SparkSession, layout: Layout, layers: Seq[Layer],
                lines: Seq[MultiLineString]): DataFrame = {
    val joined = joinLayers(layers)
    val n = layers.size
    val gf = new org.locationtech.jts.geom.GeometryFactory()
    // flatten to one MultiLineString (JTS intersection does not
    // support GeometryCollection operands in clipToTile)
    val allLines = lines.flatMap(ml =>
      (0 until ml.getNumGeometries).map(ml.getGeometryN(_)
        .asInstanceOf[org.locationtech.jts.geom.LineString]))
    val merged: Geometry = gf.createMultiLineString(allLines.toArray)
    val b = bgeom(merged)
    val lay = layout
    val tileCols = layout.tileCols
    val schema = StructType(Seq(
      valsField,
      StructField("key_col", IntegerType, nullable = false),
      StructField("key_row", IntegerType, nullable = false),
      StructField("px", IntegerType, nullable = false),
      StructField("py", IntegerType, nullable = false)))
    val cells = joined.flatMap { row =>
      val keyCol = row.getInt(0)
      val keyRow = row.getInt(1)
      val re = lay.rasterExtent(keyCol, keyRow)
      val groups: Array[Array[Int]] = Array.tabulate(n) { i =>
        if (row.isNullAt(2 + i)) null else row.getSeq[Int](2 + i).toArray
      }
      val buf = scala.collection.mutable.ArrayBuffer.empty[Row]
      // no JTS clip for lines: the rasterizer bbox-prefilters segments
      // per tile, and clipping would drop cells where a segment ends
      // exactly on a tile border
      Rasterizer.foreachCellByLines(b.geom, re) { (c, r) =>
        val vals = Array.tabulate(n) { i =>
          if (groups(i) == null) NoData.INT else groups(i)(r * tileCols + c)
        }
        buf += Row(vals.toSeq, keyCol, keyRow, c, r)
      }
      buf
    }(Encoders.row(schema))
    cells.toDF()
      .distinct()
      .groupBy(col("vals")).agg(count(lit(1)).as("cnt"))
  }
}

/** Wire-format rendering: `"List(v1, v2)"` stringified tuples are part
  * of the reference's response contract (Geoprocessing.scala:366, all
  * goldens), reproduced exactly.
  */
object Render {
  def listKey(vals: Seq[Int]): String = vals.mkString("List(", ", ", ")")

  def toResultInt(df: DataFrame): Map[String, Int] =
    df.collect().map(r => listKey(r.getSeq[Int](0)) -> r.getLong(1).toInt).toMap

  def toResultDouble(df: DataFrame): Map[String, Double] =
    df.collect().map(r => listKey(r.getSeq[Int](0)) -> r.getDouble(1)).toMap

  def toResultSummary(df: DataFrame): Seq[Map[String, Double]] =
    df.collect().sortBy(_.getInt(0)).map(r => Map(
      "min" -> r.getDouble(2), "avg" -> r.getDouble(3), "max" -> r.getDouble(4))).toSeq

  def toResultManyInt(df: DataFrame, nShapes: Int): Seq[Map[String, Int]] = {
    val grouped = df.collect()
      .groupBy(_.getInt(df.columns.indexOf("shape_id")))
    (0 until nShapes).map { i =>
      grouped.getOrElse(i, Array.empty)
        .map(r => listKey(r.getSeq[Int](df.columns.indexOf("vals"))) ->
          r.getLong(df.columns.indexOf("cnt")).toInt).toMap
    }
  }
}
