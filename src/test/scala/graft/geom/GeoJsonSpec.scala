package graft.geom

import org.scalatest.funsuite.AnyFunSuite
import org.locationtech.jts.geom.{MultiLineString, MultiPolygon}

class GeoJsonSpec extends AnyFunSuite {

  private val squarePoly =
    """{"type":"Polygon","coordinates":[[[0,0],[4,0],[4,4],[0,4],[0,0]]]}"""
  private val multiPoly =
    """{"type":"MultiPolygon","coordinates":[[[[0,0],[2,0],[2,2],[0,2],[0,0]]],
      |[[[3,3],[5,3],[5,5],[3,5],[3,3]]]]}""".stripMargin
  private val line =
    """{"type":"LineString","coordinates":[[0,0],[1,1],[2,0]]}"""

  test("Polygon wraps into MultiPolygon (reference Utils.scala:129-135)") {
    val mp = GeoJson.parseMultiPolygon(squarePoly)
    assert(mp.isInstanceOf[MultiPolygon])
    assert(mp.getNumGeometries == 1)
    assert(mp.getArea == 16.0)
  }

  test("MultiPolygon parses with all parts") {
    val mp = GeoJson.parseMultiPolygon(multiPoly)
    assert(mp.getNumGeometries == 2)
    assert(mp.getArea == 8.0)
  }

  test("non-polygon input yields EMPTY MultiPolygon, not an error") {
    val mp = GeoJson.parseMultiPolygon(line)
    assert(mp.isEmpty)
  }

  test("LineString wraps into MultiLineString; polygon input is empty") {
    val ml = GeoJson.parseMultiLineString(line)
    assert(ml.isInstanceOf[MultiLineString])
    assert(ml.getNumGeometries == 1)
    assert(GeoJson.parseMultiLineString(squarePoly).isEmpty)
  }

  test("polygon with hole round-trips") {
    val holed =
      """{"type":"Polygon","coordinates":[[[0,0],[10,0],[10,10],[0,10],[0,0]],
        |[[4,4],[6,4],[6,6],[4,6],[4,4]]]}""".stripMargin
    val mp = GeoJson.parseMultiPolygon(holed)
    assert(mp.getArea == 96.0)
    val back = GeoJson.parseMultiPolygon(GeoJson.write(mp))
    assert(back.equalsExact(mp))
  }

  test("Feature and FeatureCollection unwrap") {
    val feature = s"""{"type":"Feature","properties":{},"geometry":$squarePoly}"""
    assert(GeoJson.parseMultiPolygon(feature).getArea == 16.0)
    val fc = s"""{"type":"FeatureCollection","features":[
      |{"type":"Feature","properties":{},"geometry":$squarePoly}]}""".stripMargin
    assert(GeoJson.parseMultiPolygon(fc).getArea == 16.0)
  }

  test("malformed JSON raises MalformedGeoJsonException") {
    intercept[MalformedGeoJsonException](GeoJson.parse("""{"no":"type"}"""))
  }

  test("clipLines keeps only in-AOI pieces (reference Utils.scala:196-198)") {
    val aoi = GeoJson.parseMultiPolygon(squarePoly)
    val crossing = GeoJson.parseMultiLineString(
      """{"type":"LineString","coordinates":[[-2,2],[6,2]]}""")
    val outside = GeoJson.parseMultiLineString(
      """{"type":"LineString","coordinates":[[10,10],[12,12]]}""")
    val clipped = GeomOps.clipLines(Seq(crossing, outside), aoi)
    assert(clipped.size == 1)
    assert(clipped.head.getLength == 4.0)
  }

  test("unionAll merges overlapping AOIs") {
    val a = GeoJson.parseMultiPolygon(squarePoly) // area 16
    val b = GeoJson.parseMultiPolygon(
      """{"type":"Polygon","coordinates":[[[2,0],[6,0],[6,4],[2,4],[2,0]]]}""") // area 16, overlap 8
    val u = GeomOps.unionAll(Seq(a, b))
    assert(u.getArea == 24.0)
  }
}
