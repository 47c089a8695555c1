package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSpec

/** Hand-computed cases for the round-7 graph additions (q362/q363). */
class Round7bSpec extends AnyFunSuite with SparkSpec {

  test("labelPropagation: barbell splits into its two triangles") {
    import spark.implicits._
    // two triangles {1,2,3}, {4,5,6} bridged by 3—4; synchronous
    // rounds with the smallest-label tiebreak converge to community
    // labels 1 and 3 (hand-traced: after round 2 the left triangle is
    // all-1 and the right all-3, both stable thereafter)
    val e = Seq((1L, 2L), (1L, 3L), (2L, 3L), (4L, 5L), (4L, 6L), (5L, 6L),
      (3L, 4L)).toDF("a", "b")
    val got = Graph.labelPropagation(e, "a", "b", rounds = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L,
      4L -> 3L, 5L -> 3L, 6L -> 3L))
  }

  test("katzCentralityFixed: path graph, exact integer attenuation") {
    import spark.implicits._
    // path 1—2—3, beta=10, attenDen=2, 2 rounds:
    // round 1: x = (15, 20, 15); round 2: x = (20, 25, 20)
    val e = Seq((1L, 2L), (2L, 3L)).toDF("a", "b")
    val got = Graph.katzCentralityFixed(e, "a", "b", rounds = 2,
        beta = 10L, attenDen = 2L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 20L, 2L -> 25L, 3L -> 20L))
  }

  test("labelPropagation: tie on the bridge resolves to the smaller label") {
    import spark.implicits._
    // single edge 7—9: each vertex sees exactly the other's label, so
    // round 1 swaps and round 2 swaps back — rounds must terminate on
    // the fixed count, and the result is the deterministic swap parity
    val e = Seq((7L, 9L)).toDF("a", "b")
    val r1 = Graph.labelPropagation(e, "a", "b", rounds = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(r1 == Map(7L -> 9L, 9L -> 7L))
    val r2 = Graph.labelPropagation(e, "a", "b", rounds = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(r2 == Map(7L -> 7L, 9L -> 9L))
  }
}
