package graft.geom

import org.locationtech.jts.geom.{CoordinateSequence, CoordinateSequenceFilter, Geometry}

/** Map projections used by the engine, as pure functions.
  *
  * The reference supports exactly three CRSs — LatLng (EPSG:4326),
  * WebMercator (EPSG:3857), ConusAlbers (EPSG:5070) — resolved by name
  * (reference Utils.scala:208-213); anything else is an error. Formulas
  * are the published Snyder ("Map Projections — A Working Manual",
  * USGS PP 1395) sphere/ellipsoid equations; no proj dependency.
  */
object Projections {

  sealed trait Crs {
    def name: String
    /** (lon, lat) degrees -> projected (x, y) meters. */
    def forward(lon: Double, lat: Double): (Double, Double)
    /** projected (x, y) meters -> (lon, lat) degrees. */
    def inverse(x: Double, y: Double): (Double, Double)
  }

  case object LatLng extends Crs {
    val name = "LatLng"
    def forward(lon: Double, lat: Double): (Double, Double) = (lon, lat)
    def inverse(x: Double, y: Double): (Double, Double) = (x, y)
  }

  /** Spherical web mercator (EPSG:3857), Snyder eq. 7-1/7-2. */
  case object WebMercator extends Crs {
    val name = "WebMercator"
    private val R = 6378137.0
    def forward(lon: Double, lat: Double): (Double, Double) = {
      val x = R * math.toRadians(lon)
      val y = R * math.log(math.tan(math.Pi / 4 + math.toRadians(lat) / 2))
      (x, y)
    }
    def inverse(x: Double, y: Double): (Double, Double) = {
      val lon = math.toDegrees(x / R)
      val lat = math.toDegrees(2 * math.atan(math.exp(y / R)) - math.Pi / 2)
      (lon, lat)
    }
  }

  /** Albers equal-area conic on GRS80 (EPSG:5070, "ConusAlbers"):
    * φ₁=29.5°, φ₂=45.5°, φ₀=23°, λ₀=−96°, FE=FN=0.
    * Snyder eq. 14-1..14-11 (forward), 14-19..14-21 (inverse).
    */
  case object ConusAlbers extends Crs {
    val name = "ConusAlbers"
    private val a = 6378137.0
    private val f = 1.0 / 298.257222101
    private val e2 = f * (2 - f)
    private val e = math.sqrt(e2)

    private def mFn(phi: Double): Double =
      math.cos(phi) / math.sqrt(1 - e2 * math.sin(phi) * math.sin(phi))
    private def qFn(phi: Double): Double = {
      val s = math.sin(phi)
      (1 - e2) * (s / (1 - e2 * s * s) -
        (1 / (2 * e)) * math.log((1 - e * s) / (1 + e * s)))
    }

    private val phi0 = math.toRadians(23.0)
    private val phi1 = math.toRadians(29.5)
    private val phi2 = math.toRadians(45.5)
    private val lam0 = math.toRadians(-96.0)
    private val m1 = mFn(phi1)
    private val m2 = mFn(phi2)
    private val q0 = qFn(phi0)
    private val q1 = qFn(phi1)
    private val q2 = qFn(phi2)
    private val n = (m1 * m1 - m2 * m2) / (q2 - q1)
    private val bigC = m1 * m1 + n * q1
    private val rho0 = a * math.sqrt(bigC - n * q0) / n

    def forward(lon: Double, lat: Double): (Double, Double) = {
      val q = qFn(math.toRadians(lat))
      val rho = a * math.sqrt(bigC - n * q) / n
      val theta = n * (math.toRadians(lon) - lam0)
      (rho * math.sin(theta), rho0 - rho * math.cos(theta))
    }

    def inverse(x: Double, y: Double): (Double, Double) = {
      val rho = math.sqrt(x * x + (rho0 - y) * (rho0 - y))
      val theta = math.atan2(x, rho0 - y)
      val q = (bigC - rho * rho * n * n / (a * a)) / n
      var phi = math.asin(math.min(1.0, math.max(-1.0, q / 2)))
      var i = 0
      while (i < 15) {
        val s = math.sin(phi)
        val corr = math.pow(1 - e2 * s * s, 2) / (2 * math.cos(phi)) *
          (q / (1 - e2) - s / (1 - e2 * s * s) +
            (1 / (2 * e)) * math.log((1 - e * s) / (1 + e * s)))
        phi += corr
        i += 1
      }
      (math.toDegrees(lam0 + theta / n), math.toDegrees(phi))
    }
  }

  /** Named CRS registry — exactly the reference vocabulary; unknown
    * names raise (reference Utils.scala:208-213 → 400).
    */
  def byName(name: String): Crs = name match {
    case "LatLng" => LatLng
    case "WebMercator" => WebMercator
    case "ConusAlbers" => ConusAlbers
    case other => throw new UnknownCrsException(other)
  }

  /** In-place coordinate transform of a JTS geometry between CRSs. */
  def reproject(g: Geometry, from: Crs, to: Crs): Geometry = {
    if (from == to) return g
    val out = g.copy()
    out.apply(new CoordinateSequenceFilter {
      override def filter(seq: CoordinateSequence, i: Int): Unit = {
        val (lon, lat) = from.inverse(seq.getX(i), seq.getY(i))
        val (x, y) = to.forward(lon, lat)
        seq.setOrdinate(i, 0, x)
        seq.setOrdinate(i, 1, y)
      }
      override def isDone: Boolean = false
      override def isGeometryChanged: Boolean = true
    })
    out.geometryChanged()
    out
  }
}

class UnknownCrsException(name: String)
  extends IllegalArgumentException(s"Unknown CRS: $name")
