package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSpec

class SparseSimSpec extends AnyFunSuite with SparkSpec {

  private def cosine(a: Map[String, Int], b: Map[String, Int]): Double = {
    val dot = a.keySet.intersect(b.keySet).toSeq.map(t => a(t).toLong * b(t)).sum
    dot / math.sqrt((a.values.map(v => v.toLong * v).sum *
      b.values.map(v => v.toLong * v).sum).toDouble)
  }

  private def tfMap(s: String): Map[String, Int] =
    s.split(" ").filter(_.nonEmpty).groupBy(identity).view.mapValues(_.length).toMap

  test("cosineTopK matches a reference all-pairs cosine on a small corpus") {
    import spark.implicits._
    val texts = Seq(
      0L -> "spark scala data engine data",
      1L -> "spark data pipeline",
      2L -> "scala engine engine",
      3L -> "totally different words here",
      4L -> "data data data spark")
    val docs = texts.toDF("doc_id", "text")
    val got = SparseSim.cosineTopK(docs, docs.filter($"doc_id" === 0L),
      "doc_id", "text", k = 3)
      .collect().map(r => (r.getLong(2), r.getLong(1), r.getDouble(4)))
    val byMap = texts.toMap
    val expected = texts.filter(_._1 != 0L)
      .map { case (id, t) => id -> cosine(tfMap(byMap(0L)), tfMap(t)) }
      .filter(_._2 > 0)
      .sortBy { case (id, c) => (-c, id) }
      .take(3)
    assert(got.map(_._1).toSeq == expected.map(_._1))
    got.zip(expected).foreach { case ((_, _, c), (_, e)) =>
      assert(math.abs(c - math.rint(e * 1e6) / 1e6) < 1e-9)
    }
    // doc 3 shares no term with doc 0: must not appear at all
    assert(!got.exists(_._1 == 3L))
  }

  test("maxDf prunes the ubiquitous term from the join but keeps full norms") {
    import spark.implicits._
    // "common" is in every doc (df=4 > cap 2); "rare" links only 0 and 1
    val docs = Seq(
      0L -> "common rare",
      1L -> "common rare",
      2L -> "common x",
      3L -> "common y").toDF("doc_id", "text")
    val got = SparseSim.cosineTopK(docs, docs.filter($"doc_id" === 0L),
      "doc_id", "text", k = 4, maxDf = Some(2L))
      .collect().map(r => r.getLong(2) -> r.getDouble(4)).toMap
    // only doc 1 is reachable through the surviving "rare" posting
    assert(got.keySet == Set(1L))
    // lower-bound score: dot counts only "rare" (1) but norms are full
    // vectors (sqrt(2)*sqrt(2) = 2) -> 0.5, not the true cosine 1.0
    assert(math.abs(got(1L) - 0.5) < 1e-9)
  }
}
