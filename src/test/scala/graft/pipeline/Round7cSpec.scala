package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSpec

/** Hand-computed cases for the round-7 graph additions (q402). */
class Round7cSpec extends AnyFunSuite with SparkSpec {

  test("ktrussPeelRounds: K4 survives 4-truss peeling, pendant triangle does not") {
    import spark.implicits._
    // K4 on {1,2,3,4} (6 edges, 4 triangles, every edge in exactly 2)
    // plus a pendant triangle {4,5,6} whose 3 edges each sit in 1.
    // k = 4 ⇒ keep support ≥ 2: round 1 sees 5 triangles and peels
    // the pendant (6 edges left); round 2 sees K4's 4 triangles and
    // peels nothing — the fixpoint.
    val e = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L),
      (4L, 5L), (4L, 6L), (5L, 6L)).toDF("a", "b")
    val got = Graph.ktrussPeelRounds(e, "a", "b", k = 4, rounds = 2)
      .orderBy("round").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == Seq((1L, 5L, 6L), (2L, 4L, 6L)))
  }

  test("ktrussPeelRounds: triangle-free cycle empties in one round") {
    import spark.implicits._
    // C5 has no triangles, so every edge has support 0 < k−2 and the
    // first peel removes the whole graph; later rounds stay empty.
    val e = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (5L, 1L))
      .toDF("a", "b")
    val got = Graph.ktrussPeelRounds(e, "a", "b", k = 3, rounds = 2)
      .orderBy("round").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == Seq((1L, 0L, 0L), (2L, 0L, 0L)))
  }
}
