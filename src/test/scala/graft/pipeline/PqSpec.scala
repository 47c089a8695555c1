package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSpec

/** Product-quantization specs: codebook/encode invariants on synthetic
  * clustered vectors, and ADC retrieval quality vs brute force.
  */
class PqSpec extends AnyFunSuite with SparkSpec {

  // 2 well-separated clusters in R^8: cluster A near e1, cluster B near e5,
  // deterministic jitter in the other coords
  private def clustered(n: Int): Seq[(Long, Seq[Float])] =
    (0 until n).map { i =>
      val base = Array.fill(8)(0.0f)
      if (i % 2 == 0) base(0) = 10f else base(4) = 10f
      base(1 + (i % 3)) += (i % 5) * 0.1f
      base(5 + (i % 2)) += (i % 7) * 0.1f
      (i.toLong, base.toSeq)
    }

  test("pqEncode: exactly one code per (id, subspace), codes within [0, ksub)") {
    import spark.implicits._
    val df = clustered(40).toDF("vec_id", "embedding")
    val cb = Similarity.pqTrain(df, "vec_id", "embedding", dim = 8, m = 2,
      ksub = 4, iters = 2)
    val enc = Similarity.pqEncode(df, "vec_id", "embedding", dim = 8, cb, m = 2)
    assert(enc.count() == 80)
    assert(enc.select($"id", $"m").distinct().count() == 80)
    val codes = enc.select($"code").distinct().collect().map(_.getLong(0))
    assert(codes.forall(c => c >= 0 && c < 4))
  }

  test("ADC top-1 stays within the query's cluster on separated clusters") {
    import spark.implicits._
    val df = clustered(40).toDF("vec_id", "embedding")
    val cb = Similarity.pqTrain(df, "vec_id", "embedding", dim = 8, m = 2,
      ksub = 4, iters = 3)
    val enc = Similarity.pqEncode(df, "vec_id", "embedding", dim = 8, cb, m = 2)
    val queries = df.filter($"vec_id" < 6)
    val top1 = Similarity.pqTopK(enc, queries, "vec_id", "embedding", dim = 8,
      cb, k = 1, m = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(2))
    assert(top1.length == 6)
    top1.foreach { case (q, n) => assert(q % 2 == n % 2, s"query $q matched $n") }
  }

  test("ADC top-5 recall vs brute force is high on the toy set") {
    import spark.implicits._
    val df = clustered(40).toDF("vec_id", "embedding")
    val queries = df.filter($"vec_id" < 10)
    val exact = Similarity.bruteForceTopK(df, queries, "vec_id", "embedding", k = 5)
      .select($"query_id", $"neighbor_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val cb = Similarity.pqTrain(df, "vec_id", "embedding", dim = 8, m = 2,
      ksub = 4, iters = 3)
    val enc = Similarity.pqEncode(df, "vec_id", "embedding", dim = 8, cb, m = 2)
    val approx = Similarity.pqTopK(enc, queries, "vec_id", "embedding", dim = 8,
      cb, k = 5, m = 2)
      .select($"query_id", $"neighbor_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = exact.intersect(approx).size.toDouble / exact.size
    assert(recall >= 0.5, s"recall=$recall")
  }

  test("rerank with a full-corpus shortlist reproduces brute force exactly") {
    import spark.implicits._
    val df = clustered(30).toDF("vec_id", "embedding")
    val queries = df.filter($"vec_id" < 5)
    val exact = Similarity.bruteForceTopK(df, queries, "vec_id", "embedding", k = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val cb = Similarity.pqTrain(df, "vec_id", "embedding", dim = 8, m = 2,
      ksub = 4, iters = 2)
    val enc = Similarity.pqEncode(df, "vec_id", "embedding", dim = 8, cb, m = 2)
    // shortlist >= corpus size: ADC ordering is irrelevant, the exact
    // rerank must land on the brute-force answer including rank order
    val got = Similarity.pqTopKRerank(enc, df, queries, "vec_id", "embedding",
      dim = 8, codebook = cb, k = 3, shortlist = 30, m = 2)
      .select($"query_id", $"rank", $"neighbor_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == exact.map { case (q, r, n) => (q, r, n) })
  }

  test("ivfPq with all cells probed + full shortlist == brute force exactly") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val df = clustered(30).toDF("vec_id", "embedding")
    val queries = df.filter(col("vec_id") < 4)
    val exact = Similarity.bruteForceTopK(df, queries, "vec_id", "embedding", 3)
      .select($"query_id", $"rank", $"neighbor_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // nProbe = kCells (no coarse pruning) and shortlist >= corpus:
    // every candidate survives to the EXACT rerank, so the composed
    // search must reproduce brute force including rank order
    val got = Similarity.ivfPqTopKRerank(df, "vec_id", "embedding", dim = 8,
      queryIds = col("id") < 4, kCells = 4, nProbe = 4, m = 2, ksub = 4,
      k = 3, shortlist = 30)
      .select($"query_id", $"rank", $"neighbor_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == exact)
  }

  test("semDedup equals the unsalted brute-force pairwise on seeded random vectors") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // seeded jittered vectors with planted near-duplicates (i and
    // i+100 differ by tiny jitter -> cosine ~1), so both the drop and
    // keep paths are exercised; the op's salted cell join must produce
    // exactly the plain pairwise answer
    val rnd = new scala.util.Random(20260815)
    val base = (0 until 100).map(_ => Array.fill(16)(rnd.nextFloat() * 2f - 1f))
    val vecs = (0 until 100).map(i => (i.toLong, base(i).toSeq)) ++
      (0 until 40).map(i => (i + 100L,
        base(i).map(x => x + (rnd.nextFloat() - 0.5f) * 0.01f).toSeq))
    val df = vecs.toDF("vec_id", "embedding")
    val got = Similarity.semDedup(df, "vec_id", "embedding",
        nClusters = 4, tNum = 9, tDen = 10)
      .select($"id", $"cluster", $"is_dropped")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSet
    // brute force: same quantize/assign chain, plain pairwise test
    val qv = expr("transform(embedding, x -> " +
      "CAST(floor(CAST(x AS DOUBLE) * 1000.0 + 0.5) AS BIGINT))")
    val v = df.select($"vec_id".as("id"), qv.as("q")).localCheckpoint()
    val cents = v.orderBy("id").limit(4)
      .select($"q".as("cq"), (row_number().over(
        org.apache.spark.sql.expressions.Window.orderBy($"id")) - 1)
        .cast("long").as("cidx"))
    val d2 = "aggregate(zip_with(q, cq, (x, y) -> (x - y) * (x - y)), 0L, (a, e) -> a + e)"
    val m = v.crossJoin(broadcast(cents))
      .groupBy("id").agg(min(expr(s"$d2 * 4 + cidx")).as("key"))
      .select($"id", pmod($"key", lit(4L)).as("cluster"))
      .join(v, "id")
      .withColumn("n2", expr("aggregate(transform(q, x -> x * x), 0L, (a, e) -> a + e)"))
    val dot = "aggregate(zip_with(qa, qb, (x, y) -> x * y), 0L, (a, e) -> a + e)"
    val dropped = m.as("a").join(m.as("b"),
        $"a.cluster" === $"b.cluster" && $"a.id" < $"b.id")
      .select($"b.id".as("id"), $"a.q".as("qa"), $"b.q".as("qb"),
        $"a.n2".as("na"), $"b.n2".as("nb"))
      .withColumn("dot", expr(dot))
      .filter($"dot" > 0L && $"dot" * $"dot" * 100L >= $"na" * $"nb" * 81L)
      .select("id").distinct()
      .collect().map(_.getLong(0)).toSet
    val want = m.select($"id", $"cluster")
      .collect().map(r => (r.getLong(0), r.getLong(1),
        dropped.contains(r.getLong(0)))).toSet
    assert(got == want)
    assert(got.exists(_._3) && got.exists(!_._3), "need both drop and keep paths")
  }

  test("semDedupDelta equals the plain bipartite + pairwise screens on seeded vectors") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // same planted-near-duplicate corpus as the semDedup test, split
    // store (id % 3 != 0) vs delta (id % 3 == 0): jitter copies land
    // on both sides of the split, so all three verdicts occur
    val rnd = new scala.util.Random(20260815)
    val base = (0 until 100).map(_ => Array.fill(16)(rnd.nextFloat() * 2f - 1f))
    val vecs = (0 until 100).map(i => (i.toLong, base(i).toSeq)) ++
      (0 until 40).map(i => (i + 100L,
        base(i).map(x => x + (rnd.nextFloat() - 0.5f) * 0.01f).toSeq))
    val df = vecs.toDF("vec_id", "embedding")
    val storeDf = df.filter($"vec_id" % 3 =!= 0)
    val deltaDf = df.filter($"vec_id" % 3 === 0)
    val store = Similarity.semDedupMembers(storeDf, "vec_id", "embedding", 4)
    // SAME centroid plane for both sides (the production contract):
    // reuse the store's effective centroids — its 4 lowest-id vectors
    val cents = store.orderBy("id").limit(4)
      .select($"q".as("cq"), (row_number().over(
        org.apache.spark.sql.expressions.Window.orderBy($"id")) - 1)
        .cast("long").as("cidx")).localCheckpoint()
    val store2 = Similarity.semDedupMembers(storeDf, "vec_id", "embedding", 4,
      Some(cents))
    val delta = Similarity.semDedupMembers(deltaDf, "vec_id", "embedding", 4,
      Some(cents))
    val got = Similarity.semDedupDelta(store2, delta, tNum = 9, tDen = 10)
      .collect()
      .map(r => (r.getLong(0), r.getBoolean(2), r.getBoolean(3), r.getBoolean(4)))
      .toSet
    // brute force: plain (unsalted) bipartite + pairwise tests
    val dot = "aggregate(zip_with(qa, qb, (x, y) -> x * y), 0L, (a, e) -> a + e)"
    def hits(l: org.apache.spark.sql.DataFrame, r: org.apache.spark.sql.DataFrame,
             cond: org.apache.spark.sql.Column): Set[Long] =
      l.as("a").join(r.as("b"), $"a.cluster" === $"b.cluster" && cond)
        .select($"a.id".as("id"), $"a.q".as("qa"), $"b.q".as("qb"),
          $"a.n2".as("na"), $"b.n2".as("nb"))
        .withColumn("dot", expr(dot))
        .filter($"dot" > 0L && $"dot" * $"dot" * 100L >= $"na" * $"nb" * 81L)
        .select("id").distinct().collect().map(_.getLong(0)).toSet
    val ds = hits(delta, store2, lit(true))
    val dd = hits(delta, delta, $"b.id" < $"a.id")
    val want = delta.select($"id").collect().map(_.getLong(0)).map { id =>
      (id, ds.contains(id), dd.contains(id), !ds.contains(id) && !dd.contains(id))
    }.toSet
    assert(got == want)
    assert(got.exists(_._2) && got.exists(_._4), "need dup_of_store and kept paths")
  }
}
