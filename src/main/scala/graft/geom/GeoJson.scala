package graft.geom

import org.json4s._
import org.json4s.jackson.JsonMethods
import org.locationtech.jts.geom._

/** Minimal GeoJSON ↔ JTS codec for the geometry types the engine
  * accepts: Polygon, MultiPolygon, LineString, MultiLineString (plus
  * Feature/FeatureCollection unwrapping, which the reference's shipped
  * request corpus uses).
  *
  * Semantics mirror the reference's tolerant parsing
  * (Utils.scala:129-135, 174-180): a Polygon is wrapped into a
  * MultiPolygon; GeoJSON that parses but is not of the requested
  * family yields an EMPTY geometry, not an error.
  */
object GeoJson {

  private val gf = new GeometryFactory(new PrecisionModel(), 0)

  private def coord(arr: JValue): Coordinate = arr match {
    case JArray(JDouble(x) :: JDouble(y) :: _) => new Coordinate(x, y)
    case JArray(JInt(x) :: JDouble(y) :: _) => new Coordinate(x.toDouble, y.toDouble)
    case JArray(JDouble(x) :: JInt(y) :: _) => new Coordinate(x, y.toDouble)
    case JArray(JInt(x) :: JInt(y) :: _) => new Coordinate(x.toDouble, y.toDouble)
    case other => throw new MalformedGeoJsonException(s"bad coordinate: $other")
  }

  private def ring(arr: JValue): LinearRing = arr match {
    case JArray(cs) => gf.createLinearRing(cs.map(coord).toArray)
    case other => throw new MalformedGeoJsonException(s"bad ring: $other")
  }

  private def polygon(coords: JValue): Polygon = coords match {
    case JArray(shell :: holes) =>
      gf.createPolygon(ring(shell), holes.map(ring).toArray)
    case other => throw new MalformedGeoJsonException(s"bad polygon: $other")
  }

  private def lineString(coords: JValue): LineString = coords match {
    case JArray(cs) => gf.createLineString(cs.map(coord).toArray)
    case other => throw new MalformedGeoJsonException(s"bad linestring: $other")
  }

  /** Parse any supported GeoJSON geometry (or Feature wrapper). */
  def parse(json: String): Geometry = toGeometry(JsonMethods.parse(json))

  private def toGeometry(j: JValue): Geometry = {
    val typ = (j \ "type") match {
      case JString(s) => s
      case _ => throw new MalformedGeoJsonException("missing type")
    }
    typ match {
      case "Feature" => toGeometry(j \ "geometry")
      case "FeatureCollection" =>
        val geoms = (j \ "features") match {
          case JArray(fs) => fs.map(toGeometry)
          case _ => Nil
        }
        gf.createGeometryCollection(geoms.toArray)
      case "Polygon" => polygon(j \ "coordinates")
      case "MultiPolygon" => (j \ "coordinates") match {
        case JArray(ps) => gf.createMultiPolygon(ps.map(polygon).toArray)
        case other => throw new MalformedGeoJsonException(s"bad multipolygon: $other")
      }
      case "LineString" => lineString(j \ "coordinates")
      case "MultiLineString" => (j \ "coordinates") match {
        case JArray(ls) => gf.createMultiLineString(ls.map(lineString).toArray)
        case other => throw new MalformedGeoJsonException(s"bad multilinestring: $other")
      }
      case "Point" => gf.createPoint(coord(j \ "coordinates"))
      case other => throw new MalformedGeoJsonException(s"unsupported type: $other")
    }
  }

  /** Reference semantics (Utils.scala:129-135): polygonal input as a
    * MultiPolygon; a bare Polygon wraps; anything else → EMPTY.
    */
  def parseMultiPolygon(json: String): MultiPolygon = parse(json) match {
    case mp: MultiPolygon => mp
    case p: Polygon => gf.createMultiPolygon(Array(p))
    case gc: GeometryCollection =>
      val polys = (0 until gc.getNumGeometries).map(gc.getGeometryN).flatMap {
        case p: Polygon => Seq(p)
        case mp: MultiPolygon =>
          (0 until mp.getNumGeometries).map(mp.getGeometryN(_).asInstanceOf[Polygon])
        case _ => Nil
      }
      gf.createMultiPolygon(polys.toArray)
    case _ => gf.createMultiPolygon(Array.empty)
  }

  /** Reference semantics (Utils.scala:174-180): line input as a
    * MultiLineString; a bare LineString wraps; anything else → EMPTY.
    */
  def parseMultiLineString(json: String): MultiLineString = parse(json) match {
    case ml: MultiLineString => ml
    case l: LineString => gf.createMultiLineString(Array(l))
    case gc: GeometryCollection =>
      val lines = (0 until gc.getNumGeometries).map(gc.getGeometryN).flatMap {
        case l: LineString => Seq(l)
        case ml: MultiLineString =>
          (0 until ml.getNumGeometries).map(ml.getGeometryN(_).asInstanceOf[LineString])
        case _ => Nil
      }
      gf.createMultiLineString(lines.toArray)
    case _ => gf.createMultiLineString(Array.empty)
  }

  /** Emit GeoJSON for the supported geometry types. */
  def write(g: Geometry): String = JsonMethods.compact(JsonMethods.render(toJson(g)))

  private def coords(cs: Array[Coordinate]): JArray =
    JArray(cs.map(c => JArray(List(JDouble(c.x), JDouble(c.y)))).toList)

  private def polyCoords(p: Polygon): JArray =
    JArray(coords(p.getExteriorRing.getCoordinates) ::
      (0 until p.getNumInteriorRing).map(i => coords(p.getInteriorRingN(i).getCoordinates)).toList)

  private def toJson(g: Geometry): JValue = g match {
    case p: Point =>
      JObject("type" -> JString("Point"),
        "coordinates" -> JArray(List(JDouble(p.getX), JDouble(p.getY))))
    case l: LineString =>
      JObject("type" -> JString("LineString"), "coordinates" -> coords(l.getCoordinates))
    case p: Polygon =>
      JObject("type" -> JString("Polygon"), "coordinates" -> polyCoords(p))
    case ml: MultiLineString =>
      JObject("type" -> JString("MultiLineString"), "coordinates" -> JArray(
        (0 until ml.getNumGeometries).map(i =>
          coords(ml.getGeometryN(i).getCoordinates)).toList))
    case mp: MultiPolygon =>
      JObject("type" -> JString("MultiPolygon"), "coordinates" -> JArray(
        (0 until mp.getNumGeometries).map(i =>
          polyCoords(mp.getGeometryN(i).asInstanceOf[Polygon])).toList))
    case other => throw new MalformedGeoJsonException(s"cannot write ${other.getGeometryType}")
  }
}

class MalformedGeoJsonException(msg: String) extends IllegalArgumentException(msg)
