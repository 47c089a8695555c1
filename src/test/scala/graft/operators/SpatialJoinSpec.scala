package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.locationtech.jts.geom.{Coordinate, GeometryFactory}
import graft.SparkSpec

class SpatialJoinSpec extends AnyFunSuite with SparkSpec {

  private val gf = new GeometryFactory()
  private def tri(pts: (Double, Double)*) =
    gf.createPolygon((pts :+ pts.head)
      .map { case (x, y) => new Coordinate(x, y) }.toArray)

  test("pointInPolygon: bbox survivor filtered by exact geometry; overlaps; boundary covers") {
    import spark.implicits._
    // right triangle (0,0)-(10,0)-(0,10): its bbox is the 10x10 square,
    // so (9,9) probes the index but fails the exact test
    val polys = Seq(
      1L -> tri((0.0, 0.0), (10.0, 0.0), (0.0, 10.0)),
      2L -> gf.toGeometry(new org.locationtech.jts.geom.Envelope(0, 10, 0, 10)))
    val pts = Seq(
      (100L, 1.0, 1.0),   // inside both
      (101L, 9.0, 9.0),   // square only (outside hypotenuse)
      (102L, 5.0, 0.0),   // on shared bottom edge: covers -> both
      (103L, 50.0, 50.0)) // outside everything
      .toDF("pid", "x", "y")
    val got = SpatialJoin.pointInPolygon(pts, "pid", "x", "y", polys)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((100L, 1L), (100L, 2L), (101L, 2L),
      (102L, 1L), (102L, 2L)))
  }

  test("pointInPolygon: partitioning-invariant pair set") {
    import spark.implicits._
    val polys = (0L until 20L).map { i =>
      i -> gf.toGeometry(new org.locationtech.jts.geom.Envelope(
        (i * 13) % 80, (i * 13) % 80 + 15, (i * 7) % 80, (i * 7) % 80 + 10))
    }
    val pts = (0 until 500).map(i => (i.toLong, (i % 97) + 0.5, (i % 89) + 0.5))
    def run(parts: Int) =
      SpatialJoin.pointInPolygon(
        pts.toDF("pid", "x", "y").repartition(parts), "pid", "x", "y", polys)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(run(1) == run(16) && run(1).nonEmpty)
  }
}
