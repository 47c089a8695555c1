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

  test("ktrussPeelRounds: fixpoint early-exit pads the census identically") {
    import spark.implicits._
    // Same K4 + pendant graph, but FOUR rounds: the edge set is stable
    // from round 2 on, so rounds 3–4 must be served by the early-exit
    // padding and read exactly what a full recount would produce
    // (4 triangles, 6 edges — the K4 fixpoint).
    val e = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L),
      (4L, 5L), (4L, 6L), (5L, 6L)).toDF("a", "b")
    val got = Graph.ktrussPeelRounds(e, "a", "b", k = 4, rounds = 4)
      .orderBy("round").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == Seq((1L, 5L, 6L), (2L, 4L, 6L), (3L, 4L, 6L), (4L, 4L, 6L)))
  }

  test("ktrussPeelRounds: hoisted round-0 orientation still exact after peel") {
    import spark.implicits._
    // A hub (vertex 1, degree 5) whose degree COLLAPSES after round 1:
    // K4 on {1,2,3,4} plus pendant edges 1–5, 1–6 (support 0, peeled
    // immediately). With orientation frozen from round-0 degrees the
    // round-2 triangle count over the surviving K4 must still be exact
    // — any fixed acyclic direction counts each triangle once.
    val e = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L),
      (1L, 5L), (1L, 6L)).toDF("a", "b")
    val got = Graph.ktrussPeelRounds(e, "a", "b", k = 4, rounds = 2)
      .orderBy("round").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == Seq((1L, 4L, 6L), (2L, 4L, 6L)))
  }
}
