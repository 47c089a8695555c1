package graft.geom

import org.scalatest.funsuite.AnyFunSuite

import Projections._

class ProjectionsSpec extends AnyFunSuite {

  // deterministic CONUS sweep, denser than any realistic request grid
  private val samples: Seq[(Double, Double)] = for {
    lon <- BigDecimal(-120.0) to BigDecimal(-70.0) by 2.5
    lat <- BigDecimal(25.0) to BigDecimal(50.0) by 2.5
  } yield (lon.toDouble, lat.toDouble)

  test("WebMercator known anchors") {
    // equator/prime meridian at origin; x at lon=180 is πR
    val (x0, y0) = WebMercator.forward(0, 0)
    assert(math.abs(x0) < 1e-6 && math.abs(y0) < 1e-6)
    val (x, _) = WebMercator.forward(180, 0)
    assert(math.abs(x - math.Pi * 6378137.0) < 1e-6)
  }

  test("ConusAlbers central meridian maps to x=0") {
    val (x, _) = ConusAlbers.forward(-96.0, 40.0)
    assert(math.abs(x) < 1e-6)
    // x grows east of the central meridian
    assert(ConusAlbers.forward(-90.0, 40.0)._1 > 0)
    assert(ConusAlbers.forward(-100.0, 40.0)._1 < 0)
  }

  test("ConusAlbers latitude of origin maps to y=0") {
    val (_, y) = ConusAlbers.forward(-96.0, 23.0)
    assert(math.abs(y) < 1e-6)
  }

  test("round-trip forward∘inverse ≈ id over CONUS") {
    for ((lon, lat) <- samples; crs <- Seq(LatLng, WebMercator, ConusAlbers)) {
      val (x, y) = crs.forward(lon, lat)
      val (lon2, lat2) = crs.inverse(x, y)
      assert(math.abs(lon2 - lon) < 1e-9, s"${crs.name} lon@($lon,$lat)")
      assert(math.abs(lat2 - lat) < 1e-9, s"${crs.name} lat@($lon,$lat)")
    }
  }

  test("Albers preserves area ordering (equal-area sanity)") {
    // two 1°×1° cells at different latitudes: projected area must
    // shrink with latitude matching true ellipsoidal area ratio ~cos(φ)
    def cellArea(lat: Double): Double = {
      val p = Seq((-96.0, lat), (-95.0, lat), (-95.0, lat + 1), (-96.0, lat + 1))
        .map { case (lo, la) => ConusAlbers.forward(lo, la) }
      // shoelace
      math.abs((0 until 4).map { i =>
        val (x1, y1) = p(i); val (x2, y2) = p((i + 1) % 4)
        x1 * y2 - x2 * y1
      }.sum / 2)
    }
    val a30 = cellArea(30); val a45 = cellArea(45)
    val ratio = a45 / a30
    val expected = math.cos(math.toRadians(45.5)) / math.cos(math.toRadians(30.5))
    assert(math.abs(ratio - expected) < 0.01)
  }

  test("registry resolves reference names only") {
    assert(byName("LatLng") == LatLng)
    assert(byName("WebMercator") == WebMercator)
    assert(byName("ConusAlbers") == ConusAlbers)
    intercept[UnknownCrsException](byName("EPSG:4326"))
  }

  test("reproject transforms JTS geometry coordinates") {
    val gf = new org.locationtech.jts.geom.GeometryFactory()
    val p = gf.createPoint(new org.locationtech.jts.geom.Coordinate(-96.0, 23.0))
    val out = reproject(p, LatLng, ConusAlbers)
    assert(math.abs(out.getCoordinate.x) < 1e-6)
    assert(math.abs(out.getCoordinate.y) < 1e-6)
    // original untouched
    assert(p.getCoordinate.x == -96.0)
  }
}
