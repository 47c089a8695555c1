package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkSpec

class ZorderSpec extends AnyFunSuite with SparkSpec {

  /** Reference Morton implementation: interleave bit-by-bit. */
  private def mortonRef(x: Int, y: Int): Long =
    (0 until 16).foldLeft(0L) { (acc, i) =>
      acc |
        (((x >> i) & 1).toLong << (2 * i)) |
        (((y >> i) & 1).toLong << (2 * i + 1))
    }

  test("morton matches bit-by-bit reference on corners and randoms") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val keys = Seq((0, 0), (1, 0), (0, 1), (1, 1), (65535, 65535),
      (65535, 0), (0, 65535)) ++
      Seq.fill(200)((rnd.nextInt(65536), rnd.nextInt(65536)))
    val got = keys.toDF("x", "y")
      .select(col("x"), col("y"), Zorder.morton(col("x"), col("y")).as("z"))
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap
    keys.foreach { case (x, y) =>
      assert(got((x, y)) == mortonRef(x, y), s"($x,$y)")
    }
  }

  test("z order walks aligned 2^b blocks contiguously") {
    import spark.implicits._
    // full 8x8 grid, blockBits=1: each 2x2 block must own exactly 4
    // CONSECUTIVE z codes (that containment is the locality claim)
    val grid = for { x <- 0 until 8; y <- 0 until 8 } yield (x, y)
    val rows = Zorder.zIndexed(grid.toDF("x", "y"), "x", "y", blockBits = 1)
      .collect().map(r => (r.getInt(0), r.getInt(1),
        r.getLong(2), r.getLong(3)))
    assert(rows.map(_._3).distinct.length == 64) // z is a bijection
    rows.groupBy(_._4).foreach { case (blk, members) =>
      assert(members.length == 4)
      val zs = members.map(_._3).sorted
      assert(zs.last - zs.head == 3, s"block $blk not contiguous")
      // and the block is a 2x2 square in key space
      assert(members.map(_._1).max - members.map(_._1).min == 1)
      assert(members.map(_._2).max - members.map(_._2).min == 1)
    }
  }
}
