package graft.geom

import org.locationtech.jts.geom._
import org.locationtech.jts.operation.union.UnaryUnionOp
import scala.jdk.CollectionConverters._

/** Driver-side geometry preparation, mirroring the reference's request
  * pipeline (SURVEY §2.2 rows K–O): parse → reproject → regularize →
  * union / clip. All pure JTS; geometries are then broadcast to
  * executors as WKB.
  */
object GeomOps {

  private val gf = new GeometryFactory(new PrecisionModel(), 0)

  /** `buffer(0)` regularization — fixes self-intersections before
    * union, as the reference does (Utils.scala:137-143, motivated by
    * JTS TopologyException; CHANGELOG.md:134-136).
    */
  def regularize(mp: MultiPolygon): MultiPolygon = {
    if (mp.isEmpty) return mp
    mp.buffer(0) match {
      case m: MultiPolygon => m
      case p: Polygon => gf.createMultiPolygon(Array(p))
      case _ => gf.createMultiPolygon(Array.empty)
    }
  }

  /** Parse + reproject + regularize one GeoJSON polygon string. */
  def toAoi(geojson: String, fromCrs: Projections.Crs, toCrs: Projections.Crs): MultiPolygon =
    regularize(Projections.reproject(GeoJson.parseMultiPolygon(geojson), fromCrs, toCrs)
      .asInstanceOf[MultiPolygon])

  /** Union many AOIs into one MultiPolygon (reference
    * `createAOIFromInput`, Utils.scala:66-74).
    */
  def unionAll(aois: Seq[MultiPolygon]): MultiPolygon = {
    val nonEmpty = aois.filterNot(_.isEmpty)
    if (nonEmpty.isEmpty) return gf.createMultiPolygon(Array.empty)
    UnaryUnionOp.union(nonEmpty.asJava.asInstanceOf[java.util.Collection[Geometry]]) match {
      case m: MultiPolygon => m
      case p: Polygon => gf.createMultiPolygon(Array(p))
      case _ => gf.createMultiPolygon(Array.empty)
    }
  }

  /** Clip lines to an AOI keeping only line components (reference
    * `cropLinesToAOI`, Utils.scala:196-198): non-intersecting lines
    * drop out; partial intersections keep their in-AOI pieces.
    */
  def clipLines(lines: Seq[MultiLineString], aoi: MultiPolygon): Seq[MultiLineString] =
    lines.flatMap { ml =>
      val clipped = ml.intersection(aoi)
      val parts = clipped match {
        case l: LineString => Seq(l)
        case m: MultiLineString =>
          (0 until m.getNumGeometries).map(m.getGeometryN(_).asInstanceOf[LineString])
        case gc: GeometryCollection =>
          (0 until gc.getNumGeometries).map(gc.getGeometryN).collect { case l: LineString => l }
        case _ => Nil
      }
      val nonEmpty = parts.filterNot(_.isEmpty)
      if (nonEmpty.isEmpty) None
      else Some(gf.createMultiLineString(nonEmpty.toArray))
    }

  /** Parse + reproject one GeoJSON lines string (reference
    * `createMultiLineFromInput`, Utils.scala:154-163; default
    * LatLng→ConusAlbers, :185-186).
    */
  def toLines(geojson: String, fromCrs: Projections.Crs, toCrs: Projections.Crs): MultiLineString =
    Projections.reproject(GeoJson.parseMultiLineString(geojson), fromCrs, toCrs)
      .asInstanceOf[MultiLineString]

  /** WKB round-trip helpers for broadcasting geometries to executors. */
  def toWkb(g: Geometry): Array[Byte] = new org.locationtech.jts.io.WKBWriter().write(g)
  def fromWkb(b: Array[Byte]): Geometry = new org.locationtech.jts.io.WKBReader(gf).read(b)
}
