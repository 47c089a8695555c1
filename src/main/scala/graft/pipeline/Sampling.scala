package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling / split assignment for training-data
  * pipelines. Assignment is a pure function of the row key (md5-derived
  * 60-bit hash vs. fraction thresholds), so it is:
  *  - stable across runs, partitionings, engines, and cluster sizes
  *    (no RNG state, unlike `df.sample`/`randomSplit`);
  *  - leak-proof: the same key always lands in the same split, even
  *    across incremental reprocessing of a growing corpus;
  *  - map-only (a literal comparison per row — no shuffle, no UDF).
  */
object Sampling {

  private val SPACE: Double = math.pow(2.0, 60)

  /** 60-bit key hash, portable across engines (same construction as
    * [[Dedup.hash60]]).
    */
  private def keyHash(keySql: String, seed: Int): Column =
    Dedup.hash60(s"CAST($keySql AS STRING)", seed)

  /** Add a `split` column: named fractions must sum to ≤ 1; any
    * remainder falls into the last split.
    */
  def hashSplit(df: DataFrame, keyCol: String,
                fractions: Seq[(String, Double)], seed: Int = 0): DataFrame = {
    require(fractions.nonEmpty && fractions.map(_._2).sum <= 1.0 + 1e-9,
      "fractions must sum to <= 1")
    val h = keyHash(keyCol, seed)
    val thresholds = fractions.scanLeft(0.0)(_ + _._2).tail
      .map(f => math.min(Long.MaxValue.toDouble, f * SPACE).toLong)
    val expr0: Column = lit(fractions.last._1)
    val split = fractions.init.zip(thresholds.init).reverse
      .foldLeft(expr0) { case (els, ((name, _), thr)) =>
        when(h < thr, lit(name)).otherwise(els)
      }
    df.withColumn("split", split)
  }

  /** Keep a deterministic `fraction` of rows by key hash. */
  def deterministicSample(df: DataFrame, keyCol: String, fraction: Double,
                          seed: Int = 0): DataFrame =
    df.filter(keyHash(keyCol, seed) < (fraction * SPACE).toLong)

  /** Exact threshold [[domainMix]] compares against for weight `w` —
    * exposed so an independent checker (the DuckDB oracle) can embed
    * the identical long instead of re-deriving it from a double (cast
    * rounding differs across engines).
    */
  def weightThreshold(w: Double): Long = (w * SPACE).toLong

  /** Weighted domain mixing: keep rows of domain d with probability
    * `weights(d)` — the per-source subsampling step that turns raw
    * corpus proportions into a training mixture. Same hash-vs-threshold
    * construction as [[deterministicSample]], so it is map-only,
    * partition-invariant, and stable under incremental reprocessing;
    * domains absent from `weights` are dropped (weight 0).
    */
  def domainMix(df: DataFrame, keyCol: String, domainCol: String,
                weights: Seq[(String, Double)], seed: Int = 0): DataFrame = {
    require(weights.nonEmpty && weights.forall { case (_, w) => w >= 0 && w <= 1 },
      "weights must be in [0, 1]")
    val h = keyHash(keyCol, seed)
    val thr = weights.tail
      .foldLeft(when(col(domainCol) === weights.head._1,
        lit(weightThreshold(weights.head._2)))) {
        case (acc, (d, w)) => acc.when(col(domainCol) === d, lit(weightThreshold(w)))
      }
      .otherwise(lit(0L))
    df.filter(h < thr)
  }

  /** Deterministic epoch-shuffle key: a uniform 60-bit hash of
    * (epoch, key). Range-partitioning + sorting by it IS the global
    * shuffle pass of a training epoch — reproducible on any engine or
    * cluster size, a different order every epoch, and no RNG state to
    * coordinate across executors. Map-only; the caller chooses whether
    * to `repartitionByRange`/`sortWithinPartitions` (scale path) or
    * globally sort (small corpus).
    */
  def withEpochKey(df: DataFrame, keyCol: String, epoch: Int): DataFrame =
    df.withColumn("epoch_key", keyHash(keyCol, epoch))

  /** Global 1-based epoch positions: rank under the (epoch_key, key)
    * total order, computed with [[Prefix.withGlobalPosition]] (range
    * partition + offsets — no single-task global window), so the
    * "which sample is row N of epoch e" question is answerable at any
    * corpus size.
    */
  def epochPositions(df: DataFrame, keyCol: String, epoch: Int): DataFrame =
    Prefix.withGlobalPosition(withEpochKey(df, keyCol, epoch),
      Seq("epoch_key", keyCol))
      .withColumn("pos", col("pos") + 1L)

  /** Stratified EXACT-n sample: the first `n` rows of each stratum
    * under the deterministic (hash, key) order — unlike
    * [[deterministicSample]]'s threshold rule, every stratum yields
    * exactly min(n, |stratum|) rows, which is what eval-set carving
    * and per-domain capping need.
    *
    * Scale shape: `row_number() <= n` over (stratum / hash-order) is
    * rewritten by Catalyst's InferWindowGroupLimit into a
    * WindowGroupLimit exec — each task keeps only a bounded n-row
    * buffer per stratum BEFORE the shuffle, so the exchange carries
    * O(strata · n) rows, not the corpus. Same bounded-buffer property
    * as the q59 ordered string-agg.
    */
  def stratifiedFixedN(df: DataFrame, keyCol: String, stratumCol: String,
                       n: Int, seed: Int = 0): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(stratumCol))
      .orderBy(keyHash(keyCol, seed), col(keyCol))
    df.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= n)
      .drop("rn")
  }

  /** Temperature-weighted mixture plan (the `p^α` sampling rule of
    * multilingual / multi-domain LM training, e.g. mT5): per domain,
    * raw share p_d = n_d / N and temperature weight
    * w_d = n_d^α / Σ n_d^α, plus the resulting document budget for an
    * epoch of `epochSize` samples. α < 1 upweights small domains.
    *
    * Scale shape: one partial-aggregated count per domain (domains are
    * few), then a broadcast of the 1-row total — no window-over-all,
    * no single-partition exchange.
    */
  def temperatureWeights(df: DataFrame, domainCol: String,
                         alpha: Double = 0.5, epochSize: Long = 1000L): DataFrame = {
    val counts = df.groupBy(col(domainCol).as("domain"))
      .agg(count(lit(1)).as("n_docs"))
      .withColumn("npow", pow(col("n_docs").cast("double"), lit(alpha)))
    val tot = counts.agg(sum("n_docs").as("total_docs"), sum("npow").as("total_pow"))
    counts.crossJoin(broadcast(tot))
      .select(col("domain"), col("n_docs"),
        round(col("n_docs") / col("total_docs"), 6).as("p_raw"),
        round(col("npow") / col("total_pow"), 6).as("weight"),
        round(col("npow") / col("total_pow") * epochSize, 0).cast("long").as("epoch_docs"))
  }

  /** Fixed-size weighted sample WITHOUT replacement — Efraimidis &
    * Spirakis (2006) A-ES: each row draws priority `u^(1/w)` with `u`
    * uniform in (0,1] from the row's md5 hash (deterministic, no RNG
    * state), and the k highest priorities are the sample; inclusion
    * probability is proportional to weight in the without-replacement
    * sense. Zero/negative weights are excluded by definition
    * (their priority would be 0).
    *
    * Deterministic given (data, seed) — reruns return the identical
    * sample — but the priority involves libm `pow`, so cross-engine
    * gates must be STRUCTURAL (q50-style pass booleans), not key
    * hashes: size, determinism, zero-weight exclusion, weight lift.
    *
    * Scale shape: map-only priority computation + TakeOrdered
    * (per-partition k-heaps, never a global sort).
    */
  def weightedSample(df: DataFrame, idCol: String, weightCol: String,
                     k: Int, seed: Int = 0): DataFrame = {
    val u = (keyHash(idCol, seed) + 1).cast("double") / SPACE
    df.filter(col(weightCol) > 0)
      .withColumn("__pri", pow(u, lit(1.0) / col(weightCol).cast("double")))
      .orderBy(col("__pri").desc, col(idCol))
      .limit(k)
      .drop("__pri")
  }

  /** Largest-remainder (Hamilton) apportionment of an integer budget
    * across groups proportional to a BIGINT weight — the exact way to
    * turn mixing weights into per-domain token/doc quotas that sum to
    * the budget EXACTLY (naive rounding drifts by up to one per
    * group). Each group gets ⌊budget·w/W⌋; the leftover seats go one
    * each to the largest remainders (budget·w mod W, ties broken by
    * the key order). All-integer ⇒ hash-exact; needs budget·max(w)
    * < 2⁶³. The remainder rank runs through the range-partitioned
    * global position, so no single-task window even with millions of
    * groups.
    */
  def largestRemainderAllocation(groups: DataFrame, keyCols: Seq[String],
                                 weightCol: String, budget: Long): DataFrame = {
    require(budget >= 0, "budget must be non-negative")
    val gcols = keyCols.map(col)
    val tot = groups.agg(sum(col(weightCol)).as("__W"))
    val base = groups.crossJoin(broadcast(tot))
      .withColumn("__alloc0", expr(s"$budget * $weightCol div __W"))
      .withColumn("__rem", expr(s"$budget * $weightCol % __W"))
      .withColumn("__negrem", -col("__rem"))
    val used = base.agg(sum(col("__alloc0")).as("__used"))
    Prefix.withGlobalPosition(base, "__negrem" +: keyCols)
      .crossJoin(broadcast(used))
      .select(gcols :+ col(weightCol) :+
        (col("__alloc0") +
          when(col("pos") < lit(budget) - col("__used"), 1L).otherwise(0L))
          .as("alloc"): _*)
  }
}
