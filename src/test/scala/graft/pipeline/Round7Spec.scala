package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Hand-computed cases for the round-7 operators (q317–q328). */
class Round7Spec extends AnyFunSuite with SparkSpec {

  test("mannWhitneyU: doubled midranks on a tied pooled sample") {
    import spark.implicits._
    // A = {1, 3}, B = {2, 3, 5}: U1 = 1.5 (one win + half a tie),
    // R1 = 1 + 3.5 → r1_twice = 2 + 7 = 9, u1_twice = 9 − 2·3 = 3,
    // one 2-way tie → tie_cubes = 2³−2 = 6
    val df = Seq((1L, 1L), (3L, 1L), (2L, 0L), (3L, 0L), (5L, 0L))
      .toDF("v", "a")
    val r = Stats.mannWhitneyU(df, "v", col("a") === 1L).collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
      r.getLong(4)) == ((2L, 3L, 9L, 3L, 6L)))
  }

  test("mannKendall: concordant/discordant/tied over one series") {
    import spark.implicits._
    // values by day: 1,2,2,1 → C=2, D=2, T=2, S=0
    val df = Seq(("g", 1, 1L), ("g", 2, 2L), ("g", 3, 2L), ("g", 4, 1L))
      .toDF("grp", "t", "v")
    val r = Stats.mannKendall(df, Seq("grp"), "t", "v").collect().head
    assert((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)) ==
      ((2L, 2L, 2L, 0L)))
  }

  test("cramersV: perfect 2x2 association gives V² = 1") {
    import spark.implicits._
    val df = Seq(("a", 0L), ("a", 0L), ("b", 1L), ("b", 1L)).toDF("x", "y")
    val r = Stats.cramersV(df, col("x"), col("y")).collect().head
    // per-cell χ²·10⁶ = 10⁶ each over the 4-cell grid (zeros included)
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
      r.getLong(4)) == ((4L, 2L, 2L, 4000000L, 1000000L)))
  }

  test("herfindahl: shares 3/4 and 1/4 give HHI = 0.625") {
    import spark.implicits._
    val df = Seq(("g", "m1", 3L), ("g", "m2", 1L)).toDF("grp", "m", "cents")
    val r = Stats.herfindahl(df, Seq("grp"), "m", "cents").collect().head
    assert((r.getLong(1), r.getLong(2), r.getLong(3)) == ((2L, 4L, 625000L)))
  }

  test("cohensKappa: 4/6 agreement with symmetric marginals gives 1/3") {
    import spark.implicits._
    val df = Seq(("x", "x"), ("x", "x"), ("x", "y"), ("y", "x"), ("y", "y"),
      ("y", "y")).toDF("a", "b")
    val r = TextAnalysis.cohensKappa(df, col("a"), col("b")).collect().head
    // κ = (6·4 − 18)/(36 − 18) = 1/3 → 333333 floored micros
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) ==
      ((6L, 4L, 18L, 333333L)))
  }

  test("rollingCorrMoments: window of 2 on a perfectly correlated pair") {
    import spark.implicits._
    val df = Seq((1L, 1L, 1L), (2L, 2L, 2L)).toDF("t", "x", "y")
    val rows = Stats.rollingCorrMoments(df, "t", "x", "y", window = 2)
      .orderBy("t").collect()
    assert(rows(0).isNullAt(7)) // single point: den = 0 → NULL
    val r = rows(1)
    assert((r.getLong(1), r.getLong(2), r.getLong(4), r.getLong(6)) ==
      ((2L, 3L, 5L, 5L)))
    assert(r.getLong(7) == 1000000L) // r² = 1, positive
  }

  test("bpePairStats: corpus-weighted adjacent char pairs") {
    import spark.implicits._
    // words: ab×2, abc×1 → 'ab' count 3, 'bc' count 1
    val df = Seq("ab ab abc").toDF("text")
    val out = TextAnalysis.bpePairStats(df, "text", k = 20).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(out == Seq(("ab", 3L), ("bc", 1L)))
  }

  test("boilerplateCoverage: a shared 2-gram covers both its positions") {
    import spark.implicits._
    val df = Seq((1L, "a b c"), (2L, "a b d")).toDF("doc_id", "text")
    val out = Dedup.boilerplateCoverage(df, "doc_id", "text", n = 2, minDf = 2L)
      .orderBy("doc").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.toSeq == Seq((1L, 3L, 2L, 1L), (2L, 3L, 2L, 1L)))
  }

  test("crossSourceOverlap: one shared 2-gram out of two per source") {
    import spark.implicits._
    val df = Seq(("s1", "a b c"), ("s2", "a b d")).toDF("source", "text")
    val r = Dedup.crossSourceOverlap(df, "source", "text", n = 2)
      .collect().head
    assert((r.getAs[String]("src_a"), r.getAs[String]("src_b"),
      r.getAs[Long]("inter"), r.getAs[Long]("na"), r.getAs[Long]("nb"),
      r.getAs[Long]("overlap_micro")) == (("s1", "s2", 1L, 2L, 2L, 500000L)))
  }

  test("weightedJaccardPairs: rare-token weighting separates pairs") {
    import spark.implicits._
    // three near-identical docs; w(t) = N − df + 1: shared-everywhere
    // tokens weigh 1, doc-unique tokens weigh 3
    val df = Seq((1L, "a b c d e f g h i j"), (2L, "a b c d e f g h i j"),
      (3L, "a b c d e f g h i zz")).toDF("doc_id", "text")
    val out = Dedup.weightedJaccardPairs(df, "doc_id", "text", minMicro = 0L)
      .orderBy("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(4))).toSeq
    // identical docs MUST collide in every LSH band → wJ = 1
    assert(out.find(p => p._1 == 1L && p._2 == 2L).exists(_._3 == 1000000L))
    // the 'zz'-divergent pair: a..i shared by all 3 docs → df 3 → w 1;
    // j in docs 1,2 → w 2; zz only in 3 → w 3. inter(1,3) = 9,
    // wsum1 = 11, wsum3 = 12, union = 14 → ⌊9e6/14⌋ = 642857. LSH
    // candidates are probabilistic, so assert the VALUE only when the
    // bands surfaced the pair (recall has its own gates: q73/q81/q103)
    assert(out.find(p => p._1 == 1L && p._2 == 3L).forall(_._3 == 642857L))
  }

  test("linkPrediction: the 4-cycle's two diagonals, hub cap respected") {
    import spark.implicits._
    val e = Seq((1L, 2L), (2L, 4L), (4L, 3L), (3L, 1L)).toDF("a", "b")
    val out = Graph.linkPrediction(e, "a", "b", k = 20, maxDegree = 64L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSeq
    assert(out == Seq((1L, 4L, 2L, 4L), (2L, 3L, 2L, 4L)))
    // cap below every degree → no candidates survive
    assert(Graph.linkPrediction(e, "a", "b", k = 20, maxDegree = 1L)
      .collect().isEmpty)
  }
}
