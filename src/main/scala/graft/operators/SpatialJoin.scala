package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.locationtech.jts.geom.{Coordinate, Envelope, Geometry, GeometryFactory}
import org.locationtech.jts.geom.prep.{PreparedGeometry, PreparedGeometryFactory}
import org.locationtech.jts.index.strtree.STRtree

/** Vector×vector spatial join: points against a broadcast polygon set.
  *
  * The reference joins rasters to polygons (rasterize + mask,
  * `Geoprocessing.scala:263,310,356`) and rasters to lines
  * (`:224`); the third classic join — point records against an AOI
  * set — shows up the moment event/observation tables meet the same
  * watershed shapes. The scale shape is the broadcast spatial index:
  * the polygon side of such joins is small (thousands of AOIs), the
  * point side is the 100 TB fact table, so ship the polygons to every
  * task once and stream the points through an in-memory STRtree —
  * a map-only join, no shuffle of the point table at all, exactly
  * like Catalyst's BroadcastHashJoin but keyed by an R-tree instead
  * of a hash.
  */
object SpatialJoin {

  /** All (point, polygon) containment pairs: `(point_id, poly_id)`.
    * `polys` is broadcast (JTS geometries are serializable); each task
    * builds the STRtree + prepared geometries once per partition —
    * envelope probe first, exact `covers` only on bbox survivors.
    * Boundary rule is JTS `covers` (boundary counts as inside).
    */
  def pointInPolygon(points: DataFrame, idCol: String, xCol: String,
                     yCol: String, polys: Seq[(Long, Geometry)]): DataFrame = {
    val spark = points.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(polys)
    points
      .select(col(idCol).cast("long"), col(xCol).cast("double"),
        col(yCol).cast("double"))
      .as[(Long, Double, Double)]
      .mapPartitions { it =>
        val idx = new STRtree()
        bc.value.foreach { case (id, g) =>
          idx.insert(g.getEnvelopeInternal,
            (id, PreparedGeometryFactory.prepare(g)))
        }
        idx.build()
        val gf = new GeometryFactory()
        it.flatMap { case (pid, x, y) =>
          val pt = gf.createPoint(new Coordinate(x, y))
          val hits = idx.query(new Envelope(x, x, y, y))
          val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
          val hi = hits.iterator()
          while (hi.hasNext) {
            val (rid, prep) = hi.next().asInstanceOf[(Long, PreparedGeometry)]
            if (prep.covers(pt)) out += ((pid, rid))
          }
          out
        }
      }
      .toDF("point_id", "poly_id")
  }
}
