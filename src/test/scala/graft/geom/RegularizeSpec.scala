package graft.geom

import org.scalatest.funsuite.AnyFunSuite
import org.locationtech.jts.geom.{Coordinate, GeometryFactory}

import graft.operators.Render

class RegularizeSpec extends AnyFunSuite {

  private val gf = new GeometryFactory()

  test("regularize repairs a self-intersecting (bowtie) polygon — reference buffer(0)") {
    // bowtie: (0,0)-(2,2)-(2,0)-(0,2) crosses itself at (1,1)
    val bowtie = gf.createMultiPolygon(Array(gf.createPolygon(Array(
      new Coordinate(0, 0), new Coordinate(2, 2), new Coordinate(2, 0),
      new Coordinate(0, 2), new Coordinate(0, 0)))))
    assert(!bowtie.isValid)
    val fixed = GeomOps.regularize(bowtie)
    assert(fixed.isValid)
    // buffer(0) resolves the crossing by winding: the negatively-wound
    // lobe drops, leaving one unit triangle (identical to what the
    // reference gets from the same JTS call)
    assert(math.abs(fixed.getArea - 1.0) < 1e-9)
    // union after regularization must not throw (the reference's
    // original TopologyException motivation, CHANGELOG.md:134-136)
    val u = GeomOps.unionAll(Seq(fixed, fixed))
    assert(u.isValid)
  }

  test("result keys render exactly like the reference golden corpus") {
    val golden = new java.io.File(
      "/root/reference/scripts/benchmarking_output/huc12_54277_nlcd_soil.json")
    assume(golden.isFile)
    val json = java.nio.file.Files.readString(golden.toPath)
    val keyPattern = """"(List\([^"]*\))"""".r
    val keys = keyPattern.findAllMatchIn(json).map(_.group(1)).toSeq
    assert(keys.nonEmpty)
    // every golden key is reproducible by our renderer from its values
    keys.foreach { k =>
      val vals = k.stripPrefix("List(").stripSuffix(")").split(", ").map(_.toInt)
      assert(Render.listKey(vals.toSeq) == k)
    }
    // the NODATA sentinel appears in goldens and round-trips
    assert(keys.exists(_.contains("-2147483648")))
  }
}
