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

  test("ktrussPeelRounds: incremental decrement cascades removals across rounds") {
    import spark.implicits._
    // Triangle fan around vertex 1 along the path 2–3–4–5:
    // T1={1,2,3}, T2={1,3,4}, T3={1,4,5}. Interior spokes (1,3),(1,4)
    // have support 2; the five boundary edges have support 1.
    // k = 4: round 1 peels the boundary (3 triangles, 2 edges left);
    // the destroyed triangles decrement (1,3) twice (T1, T2) and
    // (1,4) twice (T2, T3), so round 2 peels the rest (0 triangles,
    // 0 edges). A stale support plane (the incremental path's failure
    // mode) would keep the spokes alive forever.
    val e = Seq((1L, 2L), (1L, 3L), (1L, 4L), (1L, 5L),
      (2L, 3L), (3L, 4L), (4L, 5L)).toDF("a", "b")
    val got = Graph.ktrussPeelRounds(e, "a", "b", k = 4, rounds = 3)
      .orderBy("round").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == Seq((1L, 3L, 2L), (2L, 0L, 0L), (3L, 0L, 0L)))
  }

  test("ktrussPeelRounds: triangle with TWO removed edges decrements the survivor once") {
    import spark.implicits._
    // K4 on {1,2,3,4} plus pendant triangle {1,2,5}: supports are
    // (1,2)=3, other K4 edges=2, (1,5)=(2,5)=1. k = 4: round 1 peels
    // (1,5),(2,5) — ONE destroyed triangle reached via BOTH removed
    // edges; the canonical distinct must count it once, so the
    // survivor (1,2) drops 3 → 2 and the K4 stands. Double-counting
    // would push (1,2) to 1 and wrongly dismantle the K4 in round 2.
    val e = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L),
      (1L, 5L), (2L, 5L)).toDF("a", "b")
    val got = Graph.ktrussPeelRounds(e, "a", "b", k = 4, rounds = 3)
      .orderBy("round").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == Seq((1L, 5L, 6L), (2L, 4L, 6L), (3L, 4L, 6L)))
  }

  test("ccStarRounds: triangle + path census, hand-traced") {
    import spark.implicits._
    // Triangle {1,2,3} (3 edges) + path 10–11–12 (2 edges): round 1's
    // large-star hooks 2,3 → 1 and 11,12 → 10 (the triangle loses an
    // edge: (2,3) re-hooks to the shared min); small-star keeps the
    // two stars. Edge count: 5 → 4, then stable.
    val e = Seq((1L, 2L), (1L, 3L), (2L, 3L), (10L, 11L), (11L, 12L))
      .toDF("a", "b")
    val got = Graph.ccStarRounds(e, "a", "b", rounds = 4)
      .orderBy("round").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got == Seq((1L, 4L), (2L, 4L), (3L, 4L), (4L, 4L)))
  }
}
