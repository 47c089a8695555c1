package graft.raster

import org.scalatest.funsuite.AnyFunSuite
import org.locationtech.jts.geom.{Coordinate, GeometryFactory}

import Rasterizer.Options

/** Hand-computable small-grid goldens pinning the rasterizer kernel's
  * semantics (SURVEY §7 "what's hard": edge rules must be stable).
  * Grid: 8×8 cells over extent (0,0)-(8,8), cell size 1 → cell (c,r)
  * has center (c+0.5, 7.5-r); row 0 on top.
  */
class RasterizerSpec extends AnyFunSuite {

  private val gf = new GeometryFactory()
  private val re = RasterExtent(Extent(0, 0, 8, 8), 8, 8)

  private def poly(pts: (Double, Double)*) =
    gf.createPolygon(pts.map { case (x, y) => new Coordinate(x, y) }.toArray)

  private def cells(g: org.locationtech.jts.geom.Geometry, opts: Options = Rasterizer.DEFAULT) = {
    val b = scala.collection.mutable.Set.empty[(Int, Int)]
    Rasterizer.foreachCellByPolygon(g, re, opts)((c, r) => b += ((c, r)))
    b.toSet
  }

  private def lineCells(g: org.locationtech.jts.geom.Geometry) = {
    val b = scala.collection.mutable.Set.empty[(Int, Int)]
    Rasterizer.foreachCellByLines(g, re)((c, r) => b += ((c, r)))
    b.toSet
  }

  test("unit-aligned square covers exactly its cells (PixelIsPoint)") {
    // square [2,5]×[2,5] → centers inside: cols 2..4 × map-y 2..5
    // map y in (2,5) → centers 2.5,3.5,4.5 → rows 7-ceil: rows 3,4,5
    val s = poly((2, 2), (5, 2), (5, 5), (2, 5), (2, 2))
    val got = cells(s)
    val want = (for (c <- 2 to 4; r <- 3 to 5) yield (c, r)).toSet
    assert(got == want)
  }

  test("cell-center boundary: half-open rule excludes right/top edge") {
    // square [2.5, 4.5]² has centers (2.5,y),(3.5,y),(4.5,y) on edges:
    // left/bottom edge centers included, right/top excluded
    val s = poly((2.5, 2.5), (4.5, 2.5), (4.5, 4.5), (2.5, 4.5), (2.5, 2.5))
    val got = cells(s)
    // x centers: 2.5 (col 2, on left edge: included), 3.5 (col 3);
    // 4.5 (col 4, on right edge: excluded)
    // y centers: 2.5 (row 5, bottom edge: y>=ylo half-open → included), 3.5 (row 4), 4.5 (row 3: excluded)
    val want = (for (c <- 2 to 3; r <- 4 to 5) yield (c, r)).toSet
    assert(got == want)
  }

  test("polygon with hole excludes the hole (even-odd)") {
    val outer = Seq((0.0, 0.0), (8.0, 0.0), (8.0, 8.0), (0.0, 8.0), (0.0, 0.0))
    val hole = Seq((3.0, 3.0), (5.0, 3.0), (5.0, 5.0), (3.0, 5.0), (3.0, 3.0))
    val p = gf.createPolygon(
      gf.createLinearRing(outer.map { case (x, y) => new Coordinate(x, y) }.toArray),
      Array(gf.createLinearRing(hole.map { case (x, y) => new Coordinate(x, y) }.toArray)))
    val got = cells(p)
    assert(got.size == 64 - 4)
    assert(!got.contains((3, 3)) && !got.contains((4, 4)))
  }

  test("PixelIsArea+includePartial ⊇ PixelIsPoint, adds partial cells") {
    // small square [2.2,2.8]×[2.2,2.8] inside cell (2, 5): no center
    // inside (center 2.5,2.5 IS inside!) — use [2.6,2.9]² instead: no
    // center inside, but intersects cell (2,5)
    val tiny = poly((2.6, 2.6), (2.9, 2.6), (2.9, 2.9), (2.6, 2.9), (2.6, 2.6))
    assert(cells(tiny) == Set.empty)
    assert(cells(tiny, Options(includePartial = true, pixelIsArea = true)) == Set((2, 5)))
  }

  test("PixelIsArea monotonicity on a diamond") {
    val diamond = poly((4, 1), (7, 4), (4, 7), (1, 4), (4, 1))
    val point = cells(diamond)
    val area = cells(diamond, Options(includePartial = true, pixelIsArea = true))
    val full = cells(diamond, Options(includePartial = false, pixelIsArea = true))
    assert(point.subsetOf(area))
    assert(full.subsetOf(point))
    assert(full.nonEmpty && area.size > point.size)
  }

  test("mask(A∪B) ⊇ mask(A) (union monotonicity)") {
    val a = poly((1, 1), (3, 1), (3, 3), (1, 3), (1, 1))
    val b = poly((4, 4), (7, 4), (7, 7), (4, 7), (4, 4))
    val union = a.union(b)
    assert(cells(a).subsetOf(cells(union)))
    assert(cells(b).subsetOf(cells(union)))
  }

  test("horizontal line supercover") {
    val l = gf.createLineString(Array(new Coordinate(0.5, 2.5), new Coordinate(6.5, 2.5)))
    // y=2.5 → row 5; x 0.5..6.5 → cols 0..6
    assert(lineCells(l) == (0 to 6).map((_, 5)).toSet)
  }

  test("diagonal line supercover includes every crossed cell") {
    val l = gf.createLineString(Array(new Coordinate(0.5, 0.5), new Coordinate(3.5, 3.5)))
    val got = lineCells(l)
    // diagonal from cell (0,7) to (3,4): crosses 4 diagonal cells plus
    // the edge-adjacent ones the segment passes through
    assert(got.contains((0, 7)) && got.contains((3, 4)))
    assert(got.size >= 4)
    // supercover: consecutive cells are 4-connected (no diagonal jumps)
    val sorted = got.toSeq.sortBy { case (c, r) => (c, -r) }
    sorted.sliding(2).foreach {
      case Seq((c1, r1), (c2, r2)) =>
        assert(math.abs(c1 - c2) + math.abs(r1 - r2) <= 2)
      case _ =>
    }
  }

  test("vertical line stays in one column") {
    val l = gf.createLineString(Array(new Coordinate(3.5, 1.5), new Coordinate(3.5, 6.5)))
    val got = lineCells(l)
    assert(got.forall(_._1 == 3))
    assert(got == (1 to 6).map(r => (3, 7 - r)).toSet)
  }

  test("multi-segment polyline dedups shared cells") {
    val l = gf.createMultiLineString(Array(
      gf.createLineString(Array(new Coordinate(0.5, 0.5), new Coordinate(3.5, 0.5))),
      gf.createLineString(Array(new Coordinate(3.5, 0.5), new Coordinate(3.5, 3.5)))))
    val got = lineCells(l)
    // corner cell (3,7) appears once in the set by construction
    assert(got == ((0 to 3).map((_, 7)) ++ (4 to 7).map(r => (3, r))).toSet)
  }

  test("empty and degenerate geometries produce no cells") {
    assert(cells(gf.createPolygon()) == Set.empty)
    assert(lineCells(gf.createLineString()) == Set.empty)
  }

  test("includePartial=false with PixelIsPoint is plain center-sampling (GeoTrellis parity)") {
    // a sampled point is never "partial": the flag only subtracts on
    // the PixelIsArea branch, so with pixelIsArea=false both flag
    // values must produce identical masks — on a boundary-crossing
    // polygon where the PixelIsArea branch WOULD differ
    val g = poly((1.4, 1.4), (6.6, 1.4), (6.6, 6.6), (1.4, 6.6), (1.4, 1.4))
    val point = cells(g, Options(includePartial = true, pixelIsArea = false))
    val noPartial = cells(g, Options(includePartial = false, pixelIsArea = false))
    assert(noPartial == point && point.nonEmpty)
    // sanity: the same flag flip DOES change the PixelIsArea result
    assert(cells(g, Options(includePartial = false, pixelIsArea = true)) !=
      cells(g, Options(includePartial = true, pixelIsArea = true)))
  }

  test("property: center scanline equals JTS point-in-polygon on random convex polygons") {
    // independent per-cell oracle: PreparedGeometry.contains(center).
    // Random doubles never place a center exactly on an edge, so the
    // half-open tie rule can't fire and the two definitions coincide.
    val re16 = RasterExtent(Extent(0, 0, 16, 16), 16, 16)
    val rnd = new scala.util.Random(4242)
    for (trial <- 0 until 25) {
      val pts = Array.fill(3 + rnd.nextInt(8))(
        new Coordinate(rnd.nextDouble() * 16, rnd.nextDouble() * 16))
      val hull = new org.locationtech.jts.algorithm.ConvexHull(pts, gf).getConvexHull
      if (hull.getDimension == 2) {
        val got = {
          val b = scala.collection.mutable.Set.empty[(Int, Int)]
          Rasterizer.foreachCellByPolygon(hull, re16)((c, r) => b += ((c, r)))
          b.toSet
        }
        val prep = org.locationtech.jts.geom.prep.PreparedGeometryFactory.prepare(hull)
        val want = (for {
          c <- 0 until 16; r <- 0 until 16
          p = gf.createPoint(new Coordinate(re16.colCenter(c), re16.rowCenter(r)))
          if prep.contains(p)
        } yield (c, r)).toSet
        assert(got == want, s"trial $trial hull=$hull")
      }
    }
  }

  test("property: PixelIsArea+fully-inside equals JTS covers on random polygons") {
    val re16 = RasterExtent(Extent(0, 0, 16, 16), 16, 16)
    val rnd = new scala.util.Random(1313)
    for (trial <- 0 until 15) {
      val pts = Array.fill(3 + rnd.nextInt(6))(
        new Coordinate(rnd.nextDouble() * 16, rnd.nextDouble() * 16))
      val hull = new org.locationtech.jts.algorithm.ConvexHull(pts, gf).getConvexHull
      if (hull.getDimension == 2) {
        val got = {
          val b = scala.collection.mutable.Set.empty[(Int, Int)]
          Rasterizer.foreachCellByPolygon(hull, re16,
            Options(includePartial = false, pixelIsArea = true))((c, r) => b += ((c, r)))
          b.toSet
        }
        val prep = org.locationtech.jts.geom.prep.PreparedGeometryFactory.prepare(hull)
        val want = (for {
          c <- 0 until 16; r <- 0 until 16
          cell = re16.cellExtent(c, r)
          if prep.covers(gf.toGeometry(cell.toEnvelope))
        } yield (c, r)).toSet
        assert(got == want, s"trial $trial hull=$hull")
      }
    }
  }

  test("property: PixelIsArea+includePartial equals JTS cell-intersects on random polygons") {
    val re16 = RasterExtent(Extent(0, 0, 16, 16), 16, 16)
    val rnd = new scala.util.Random(777)
    for (trial <- 0 until 15) {
      val pts = Array.fill(3 + rnd.nextInt(6))(
        new Coordinate(rnd.nextDouble() * 16, rnd.nextDouble() * 16))
      val hull = new org.locationtech.jts.algorithm.ConvexHull(pts, gf).getConvexHull
      if (hull.getDimension == 2) {
        val got = {
          val b = scala.collection.mutable.Set.empty[(Int, Int)]
          Rasterizer.foreachCellByPolygon(hull, re16,
            Options(includePartial = true, pixelIsArea = true))((c, r) => b += ((c, r)))
          b.toSet
        }
        val prep = org.locationtech.jts.geom.prep.PreparedGeometryFactory.prepare(hull)
        val want = (for {
          c <- 0 until 16; r <- 0 until 16
          cell = re16.cellExtent(c, r)
          if prep.intersects(gf.toGeometry(cell.toEnvelope))
        } yield (c, r)).toSet
        assert(got == want, s"trial $trial hull=$hull")
      }
    }
  }
}
