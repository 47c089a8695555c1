package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSpec

class KMeansSpec extends AnyFunSuite with SparkSpec {

  test("kmeansCentroids separates two obvious clusters and is deterministic") {
    import spark.implicits._
    // two tight clusters around orthogonal directions, interleaved by
    // id so the deterministic lowest-id init seeds one of each (a
    // k-means|| init would remove this constraint)
    val vecs = (0 until 40).map { i =>
      if (i % 2 == 0) (i.toLong, Array(1.0f, 0.01f * i, 0.0f))
      else (i.toLong, Array(0.0f, 0.01f * i, 1.0f))
    }.toDF("vec_id", "embedding")
    val cents = Similarity.kmeansCentroids(vecs, "vec_id", "embedding", k = 2, iters = 4)
    val assigned = Similarity.ivfAssignDf(vecs, "vec_id", "embedding", cents, "cid", "cv")
      .select("id", "cell").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // every member of a cluster lands in the same cell, clusters differ
    val cellsA = (0L until 40L by 2).map(assigned).toSet
    val cellsB = (1L until 40L by 2).map(assigned).toSet
    assert(cellsA.size == 1 && cellsB.size == 1 && cellsA != cellsB)
    // deterministic across runs
    val again = Similarity.kmeansCentroids(vecs, "vec_id", "embedding", k = 2, iters = 4)
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1))).toSet
    val first = cents.collect().map(r => (r.getLong(0), r.getSeq[Double](1))).toSet
    assert(again == first)
  }
}
