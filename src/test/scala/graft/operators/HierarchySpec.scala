package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSpec

class HierarchySpec extends AnyFunSuite with SparkSpec {

  test("resolveRoots: known forest, roots at depth 0, doubling matches walk") {
    import spark.implicits._
    // forest: 1 -> null, 2 -> null; 3,4 -> 1; 5 -> 3; 6 -> 5; 7 -> 2
    val nodes = Seq(
      (1L, None), (2L, None), (3L, Some(1L)), (4L, Some(1L)),
      (5L, Some(3L)), (6L, Some(5L)), (7L, Some(2L)))
      .toDF("id", "parent")
    val got = Hierarchy.resolveRoots(nodes, "id", "parent")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got == Map(
      1L -> ((1L, 0L)), 2L -> ((2L, 0L)), 3L -> ((1L, 1L)), 4L -> ((1L, 1L)),
      5L -> ((1L, 2L)), 6L -> ((1L, 3L)), 7L -> ((2L, 1L))))
  }

  test("resolveRoots: dangling parent is reported as terminal, not dropped") {
    import spark.implicits._
    // 10's parent 99 is absent from the node set; 11 hangs below 10.
    // Both must survive resolution, terminating at the missing id 99.
    val nodes = Seq(
      (1L, None), (2L, Some(1L)), (10L, Some(99L)), (11L, Some(10L)))
      .toDF("id", "parent")
    val got = Hierarchy.resolveRoots(nodes, "id", "parent")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got == Map(
      1L -> ((1L, 0L)), 2L -> ((1L, 1L)),
      10L -> ((99L, 1L)), 11L -> ((99L, 2L))))
  }

  test("resolveRoots: deep chain closes in log rounds; property vs reference walk") {
    import spark.implicits._
    // 300-node chain under maxIter 12 (2^12 >> 300): pointer doubling
    // must fully resolve where naive iteration would need 300 rounds
    val nodes = (1L to 300L).map(i => (i, if (i == 1) None else Some(i - 1)))
      .toDF("id", "parent")
    val got = Hierarchy.resolveRoots(nodes, "id", "parent", maxIter = 12)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    (1L to 300L).foreach { i =>
      assert(got(i) == ((1L, i - 1)), s"node $i")
    }
  }
}
