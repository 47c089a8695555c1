package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus-level statistical operators. */
object Stats {

  /** Frequency spectrum (count-of-counts): how many keys occur exactly
    * r times, plus the Good–Turing adjusted count
    * r* = (r+1) · n_{r+1} / n_r (Good 1953 — the smoothing statistic
    * LM estimators build on; r* = 0 where n_{r+1} is absent).
    *
    * Scale shape: two partial-aggregated `groupBy`s (keys, then
    * counts) — the second input is at most one row per distinct
    * frequency, so the spectrum join is broadcast-trivial. No windows,
    * no collects.
    */
  def frequencySpectrum(df: DataFrame, keySql: String): DataFrame = {
    val tf = df.selectExpr(s"$keySql AS k")
      .groupBy("k").agg(count(lit(1)).as("r"))
    val spec = tf.groupBy("r").agg(count(lit(1)).as("n_r"))
    val next = spec.select((col("r") - 1).as("r"), col("n_r").as("n_r1"))
    spec.join(next, Seq("r"), "left")
      .select(col("r"), col("n_r"),
        round(((col("r") + 1) * coalesce(col("n_r1"), lit(0L)))
          .cast("double") / col("n_r"), 4).as("r_star"))
  }

  /** Pearson chi-square contingency analysis of two low-cardinality
    * categorical columns — the feature-association screen (is
    * event_type independent of weekday? does domain predict quality
    * band?) run before stratifying or rebalancing a corpus. Returns
    * the FULL r×c contingency grid (absent combinations materialized
    * with o = 0 — they still contribute their expectation) with
    * per-cell expected counts and chi-square contributions in
    * micro-units; Σ chi2_micro / 1e6 is the statistic against the
    * χ²((r−1)(c−1)) distribution.
    *
    * Scale shape: one groupBy of the raw rows builds the observed
    * cells; everything after operates on ≤ r·c rows (margins are
    * broadcast, the grid is a broadcast cross of two margin tables) —
    * a 100 TB input costs exactly one count-aggregation pass.
    * Exactness: no libm anywhere — e = ra·cb/n and (o−e)²/e are
    * IEEE-exact double chains over exact integers, evaluated in the
    * identical literal order by the oracle, floored to micro-integers
    * per cell.
    */
  def chiSquare(df: DataFrame, aCol: Column, bCol: Column): DataFrame = {
    val cells = df.select(aCol.as("a"), bCol.as("b"))
      .groupBy("a", "b").agg(count(lit(1)).as("o"))
    val ra = cells.groupBy("a").agg(sum(col("o")).as("ra"))
    val cb = cells.groupBy("b").agg(sum(col("o")).as("cb"))
    val n = cells.agg(sum(col("o")).as("n"))
    broadcast(ra).crossJoin(broadcast(cb))
      .join(cells, Seq("a", "b"), "left")
      .na.fill(0L, Seq("o"))
      .crossJoin(broadcast(n))
      .select(col("a"), col("b"), col("o"),
        expr("CAST(floor((CAST(ra AS DOUBLE) * cb) / n * 1000000.0 + 0.5) AS BIGINT)")
          .as("e_micro"),
        expr("CAST(floor((o - (CAST(ra AS DOUBLE) * cb) / n) * " +
          "(o - (CAST(ra AS DOUBLE) * cb) / n) / ((CAST(ra AS DOUBLE) * cb) / n) " +
          "* 1000000.0 + 0.5) AS BIGINT)").as("chi2_micro"))
  }

  /** Robust outlier flagging by the MAD rule — flag x where
    * |x − median| > k · MAD (the filter that survives the outliers it
    * hunts, unlike mean/stddev which the outliers drag). Input values
    * must be INTEGERS (cents discipline): then the group median is an
    * exact half-integer and the MAD an exact quarter-integer, so the
    * flag compares `4·|x − med| > k · 4·MAD` on exact BIGINTs — no
    * tolerance, cross-engine deterministic.
    *
    * Scale shape: two [[graft.operators.ExactPercentiles]] passes
    * (range-partitioned sorts, the q44/q124 declared-exact class) and
    * broadcast joins of the per-group statistics back to the rows —
    * the row table shuffles only for its two sorts, and the flags
    * themselves are a map-only projection.
    */
  def madOutliers(df0: DataFrame, groupCols: Seq[String], valueCol: String,
                  k: Int = 3): DataFrame = {
    import graft.operators.ExactPercentiles
    val gcols = groupCols.map(col)
    // df is consumed THREE times (median counts/rank, deviation build,
    // MAD counts/rank) — checkpoint once so each pass, including
    // [[ExactPercentiles.exact]]'s hot-group probe on a derived input
    // whose plan-time stats are unknown, scans materialized rows
    // instead of re-executing the caller's upstream chain (round-13:
    // q156's EWMA chain was re-executed per probe, +1s each)
    val df = df0.localCheckpoint()
    val med = ExactPercentiles.exact(df, groupCols, valueCol, Seq("med" -> 0.5))
    val dev = df.join(broadcast(med), groupCols)
      .select(gcols ++ Seq(col(valueCol), col("med"),
        abs(col(valueCol) - col("med")).as("dev")): _*)
    val mad = ExactPercentiles.exact(dev, groupCols, "dev", Seq("mad" -> 0.5))
    dev.join(broadcast(mad), groupCols)
      .withColumn("is_outlier",
        expr(s"CAST(4 * dev AS BIGINT) > $k * CAST(4 * mad AS BIGINT)"))
  }

  /** Pairwise association rules from a (basket, item) relation — the
    * market-basket screen (A-priori at level 2, where the useful rules
    * live): for every ordered item pair with joint support ≥
    * `minPairSupport`, emit support counts plus confidence
    * supp(a∪b)/supp(a) and lift n·supp(a∪b)/(supp(a)·supp(b)) as
    * floored micro-integers (exact integer counts, one deterministic
    * double chain each — no libm).
    *
    * Scale shape: candidate pairs come from the within-basket
    * self-join (per-basket fanout C(k,2) with k = basket size — small
    * by domain), item supports from one item-keyed agg joined back
    * broadcast, the basket count from a 1-row broadcast. Nothing is
    * quadratic in the item-catalog or basket count.
    */
  def associationRules(baskets: DataFrame, basketCol: String, itemCol: String,
                       minPairSupport: Long = 2): DataFrame = {
    val items = baskets.select(col(basketCol).as("b"), col(itemCol).as("i"))
      .distinct()
    val nB = items.select(col("b")).distinct().agg(count(lit(1)).as("n"))
    val supp = items.groupBy("i").agg(count(lit(1)).as("s"))
    val pairs = items.as("x").join(items.as("y"),
        col("x.b") === col("y.b") && col("x.i") < col("y.i"))
      .groupBy(col("x.i").as("ia"), col("y.i").as("ib"))
      .agg(count(lit(1)).as("sab"))
      .filter(col("sab") >= minPairSupport)
    val dir = pairs.select(col("ia").as("ante"), col("ib").as("cons"), col("sab"))
      .unionAll(pairs.select(col("ib").as("ante"), col("ia").as("cons"), col("sab")))
    dir
      .join(broadcast(supp.select(col("i").as("ante"), col("s").as("sa"))), "ante")
      .join(broadcast(supp.select(col("i").as("cons"), col("s").as("sc"))), "cons")
      .crossJoin(broadcast(nB))
      .select(col("ante"), col("cons"), col("sab"), col("sa"), col("sc"),
        expr("CAST(floor(CAST(sab AS DOUBLE) / sa * 1000000.0 + 0.5) AS BIGINT)")
          .as("conf_micro"),
        expr("CAST(floor((CAST(n AS DOUBLE) * sab) / (CAST(sa AS DOUBLE) * sc) * 1000000.0 + 0.5) AS BIGINT)")
          .as("lift_micro"))
  }

  /** Per-group quantile normalization — replace a feature value by its
    * empirical quantile (rank − 1)/(n − 1) within its group, the
    * rank-based transform that makes heavy-tailed features comparable
    * across groups (and the first half of quantile-mapping between
    * distributions). Ties are totally ordered by `tieCols`, so the
    * rank is a row_number, the quantile an exact rational, and the
    * emitted `q_micro = floor(pr·1e6 + 0.5)` cross-engine
    * deterministic. One key-partitioned window sort; no global sort,
    * no single-task window.
    */
  def quantileNormalize(df: DataFrame, groupCols: Seq[String],
                        valueCol: String, tieCols: Seq[String]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(groupCols.map(col): _*)
      .orderBy((col(valueCol) +: tieCols.map(col)): _*)
    df.withColumn("__pr", percent_rank().over(w))
      .withColumn("q_micro",
        expr("CAST(floor(__pr * 1000000.0 + 0.5) AS BIGINT)"))
      .drop("__pr")
  }

  /** Weight of evidence + information value per category of a
    * predictor against a binary outcome — the classic supervised
    * feature screen (complements the unsupervised chi-square q147):
    * WoE(c) = ln(p(c|good)/p(c|bad)), IV = Σ (p_good − p_bad)·WoE.
    * Laplace-smoothed (+0.5 per cell) so empty cells stay finite.
    *
    * Exactness: the q139 quantized-ln discipline — WoE is floored to
    * micro-nats the moment the (deterministic, exact-integer-derived)
    * ln argument is computed; the IV contribution multiplies the
    * exact rational (g/G − b/B) by the integer woe6 and floors again.
    * One groupBy over the rows; everything after is category-sized.
    */
  def weightOfEvidence(df: DataFrame, catCol: Column, outcomeCol: Column,
                       woePlane: Option[DataFrame] = None): DataFrame = {
    val cells = df.select(catCol.as("c"), outcomeCol.cast("long").as("y"))
      .groupBy("c")
      .agg(sum(col("y")).as("g"), sum(lit(1L) - col("y")).as("b"))
    val tot = cells.agg(sum(col("g")).as("gt"), sum(col("b")).as("bt"))
    // explicit DOUBLE casts: a bare `g + 0.5` would run Spark's
    // DECIMAL arithmetic (scale-rounded divisions) while the oracle
    // computes doubles — the chains must be the same IEEE ops
    val based = cells.crossJoin(broadcast(tot))
    // cross-engine gating passes a (g, b, woe6) JVM plane
    // (StatsFixture) pinning the single transcendental; LEFT join +
    // raise_error so a stale plane fails loudly rather than dropping
    // the same rows from both engines
    val withWoe = woePlane match {
      case Some(p) =>
        based.join(broadcast(p.withColumnsRenamed(Map("g" -> "pg", "b" -> "pb"))),
            col("g") === col("pg") && col("b") === col("pb"), "left")
          .select(col("c"), col("g"), col("b"), col("gt"), col("bt"),
            when(col("woe6").isNotNull, col("woe6"))
              .otherwise(raise_error(lit("stale woe6 fixture plane: missing " +
                "(g, b) cell — delete the graft_ln6_* tmp dir and rerun")))
              .as("woe_micro"))
      case None =>
        based.select(col("c"), col("g"), col("b"), col("gt"), col("bt"),
          expr("CAST(floor(ln(((CAST(g AS DOUBLE) + 0.5) / (CAST(gt AS DOUBLE) + 0.5)) / " +
            "((CAST(b AS DOUBLE) + 0.5) / (CAST(bt AS DOUBLE) + 0.5))) * 1000000.0 + 0.5) AS BIGINT)")
            .as("woe_micro"))
    }
    withWoe.select(col("c"), col("g"), col("b"), col("woe_micro"),
      expr("CAST(floor((CAST(g AS DOUBLE) / gt - CAST(b AS DOUBLE) / bt) * woe_micro + 0.5) AS BIGINT)")
        .as("iv_contrib_micro"))
  }

  /** Exact-integer correlation matrix over small-integer metrics —
    * Pearson r for every metric pair from co-moment sums (n, Σx, Σy,
    * Σxy, Σx², Σy²) that are exact BIGINTs, so unlike the built-in
    * `corr` (an FP accumulation whose last ulps depend on partition
    * order) the result is partition-invariant and hash-gateable:
    * r = (n·Σxy − Σx·Σy) / (√(n·Σx² − (Σx)²) · √(n·Σy² − (Σy)²))
    * evaluated in one deterministic double chain (sqrt is
    * IEEE-exactly-rounded), floored to micro. Metrics must be small
    * integers (quantize first) so the co-moments stay within BIGINT.
    *
    * Scale shape: ONE scan and one wide aggregation per group — the
    * k(k+3)/2 sums ride a single groupBy; the pair expansion is a
    * group-row-sized explode.
    */
  def corrMatrix(df: DataFrame, groupCols: Seq[String],
                 metrics: Seq[String]): DataFrame = {
    val gcols = groupCols.map(col)
    val aggs = Seq(count(lit(1)).as("__n")) ++
      metrics.flatMap(m => Seq(
        sum(col(m)).as(s"__s_$m"), sum(col(m) * col(m)).as(s"__q_$m"))) ++
      metrics.combinations(2).map { case Seq(a, b) =>
        sum(col(a) * col(b)).as(s"__p_${a}_$b")
      }.toSeq
    val row = df.groupBy(gcols: _*).agg(aggs.head, aggs.tail: _*)
    val pairs = metrics.combinations(2).map { case Seq(a, b) =>
      struct(lit(a).as("ma"), lit(b).as("mb"),
        col(s"__s_$a").as("sx"), col(s"__s_$b").as("sy"),
        col(s"__q_$a").as("qx"), col(s"__q_$b").as("qy"),
        col(s"__p_${a}_$b").as("pxy"))
    }.toSeq
    row.select(gcols :+ col("__n").as("n") :+ explode(array(pairs: _*)).as("c"): _*)
      .select(gcols ++ Seq(col("n"), col("c.ma").as("metric_a"),
        col("c.mb").as("metric_b"),
        expr("CAST(floor((CAST(n AS DOUBLE) * c.pxy - CAST(c.sx AS DOUBLE) * c.sy) / " +
          "(sqrt(CAST(n AS DOUBLE) * c.qx - CAST(c.sx AS DOUBLE) * c.sx) * " +
          "sqrt(CAST(n AS DOUBLE) * c.qy - CAST(c.sy AS DOUBLE) * c.sy)) " +
          "* 1000000.0 + 0.5) AS BIGINT)").as("corr_micro")): _*)
  }

  /** Per-group Gini concentration coefficient — the inequality measure
    * for share-of-total analysis (is one customer/domain/source
    * dominating the group?): with values sorted ascending under a
    * tie-broken total order, G = 2·Σᵢ i·xᵢ / (n·Σx) − (n+1)/n.
    * Integer values (cents) make Σx and Σ i·x exact BIGINTs, so the
    * one double chain at the end is deterministic and the result
    * hash-gates as a micro-integer. One key-partitioned window sort +
    * one aggregation.
    */
  def giniByGroup(df: DataFrame, groupCols: Seq[String], valueCol: String,
                  tieCols: Seq[String]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(groupCols.map(col): _*)
      .orderBy((col(valueCol) +: tieCols.map(col)): _*)
    df.withColumn("__i", row_number().over(w).cast("long"))
      .groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("n"), sum(col(valueCol)).as("total"),
        sum(col("__i") * col(valueCol)).as("ranked_sum"))
      .withColumn("gini_micro", expr(
        "CAST(floor(((2.0 * ranked_sum) / (CAST(n AS DOUBLE) * total) - " +
          "(CAST(n AS DOUBLE) + 1.0) / n) * 1000000.0 + 0.5) AS BIGINT)"))
  }

  /** Misra–Gries heavy-hitters summary (Misra & Gries 1982; the
    * deterministic frequent-items sketch Space-Saving descends from)
    * over a key expression: `(k, est)` for keys surviving a k-counter
    * streaming summary. Returned estimates depend on partitioning;
    * the classical GUARANTEES do not, and are what callers gate on:
    *
    *  - completeness: every key with true count `> n/(k+1)` appears —
    *    if it beats the global threshold it beats `n_p/(k+1)` in at
    *    least one partition (pigeonhole over `Σ n_p = n`), and
    *    per-partition MG never evicts such a key;
    *  - underestimate-only: a partition's surviving counter is ≤ its
    *    true in-partition count, so the merged sum never exceeds the
    *    exact global count;
    *  - bounded error: each partition decrements any key ≤ `n_p/(k+1)`
    *    times, so `exact − est ≤ Σ_p n_p/(k+1) = n/(k+1)`.
    *
    * Scale shape — the point of the sketch: the raw key stream is
    * NEVER shuffled. One `mapPartitions` pass holds O(k) memory per
    * task and emits ≤ k rows per partition; the merge `groupBy` runs
    * over ≤ k×partitions rows. An exact heavy-hitter count on the same
    * data would shuffle every distinct key; at 100 TB with a skewed
    * token distribution that is the difference between a metadata-
    * sized job and a corpus-sized one.
    */
  def misraGries(df: DataFrame, keySql: String, k: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.selectExpr(s"CAST(($keySql) AS STRING) AS k").as[String]
      .mapPartitions { it =>
        val counters = new java.util.HashMap[String, Long](k * 2)
        it.foreach { key =>
          if (key != null) {
            val cur = counters.get(key)
            if (cur != 0L) counters.put(key, cur + 1)
            else if (counters.size < k) counters.put(key, 1L)
            else {
              // decrement-all, dropping zeros: O(k) but amortized O(1)
              // per input (each trigger consumes k+1 prior increments)
              val itr = counters.entrySet().iterator()
              while (itr.hasNext) {
                val e = itr.next()
                if (e.getValue == 1L) itr.remove()
                else e.setValue(e.getValue - 1)
              }
            }
          }
        }
        import scala.jdk.CollectionConverters._
        counters.entrySet().iterator().asScala.map(e => (e.getKey, e.getValue))
      }
      .toDF("k", "est")
      .groupBy("k").agg(sum(col("est")).as("est"))
  }

  /** Count-min sketch (Cormode & Muthukrishnan 2005) — the
    * OVERESTIMATE-only dual of [[misraGries]]: `depth` hash rows of
    * `width` counters; a key's estimate is the MIN of its cells, so
    * `est ≥ exact` always (every occurrence increments every one of
    * the key's cells) and the slack is other keys colliding into them
    * (E[slack] = n/width per row, and min-of-depth rows needs ALL
    * rows' collisions to be large simultaneously).
    *
    * Hashes are md5-derived (`row:key` prefixing, the engine's q49
    * construction), so the whole sketch is deterministic and
    * cross-engine reproducible — the q113 gate hash-matches the
    * COUNTERS themselves, not just bounds.
    *
    * Scale shape: the build is one partial-aggregated groupBy whose
    * key space is capped at depth×width cells — map-side combine
    * collapses each task's contribution to ≤ depth×width rows no
    * matter how many tokens stream through, and the merged sketch is
    * kilobytes. Point queries broadcast the sketch.
    */
  def countMinSketch(df: DataFrame, keySql: String,
                     depth: Int, width: Int): DataFrame =
    df.selectExpr(s"CAST(($keySql) AS STRING) AS k")
      .select(col("k"), explode(sequence(lit(0), lit(depth - 1))).as("r"))
      .select(col("r"), cmsCell(col("r"), col("k"), width).as("c"))
      .groupBy("r", "c").agg(count(lit(1)).as("cnt"))

  /** Point-query `probes` (column `k`) against a built sketch:
    * `(k, est)`, est = min over the key's depth cells. */
  def cmsEstimate(sketch: DataFrame, probes: DataFrame,
                  depth: Int, width: Int): DataFrame =
    probes.select(col("k"))
      .select(col("k"), explode(sequence(lit(0), lit(depth - 1))).as("r"))
      .withColumn("c", cmsCell(col("r"), col("k"), width))
      .join(broadcast(sketch), Seq("r", "c"))
      .groupBy("k").agg(min(col("cnt")).as("est"))

  private def cmsCell(r: Column, k: Column, width: Int): Column =
    conv(substring(md5(concat(r.cast("string"), lit(":"), k)), 1, 15), 16, 10)
      .cast("long") % width

  /** Lag-k autocorrelation (serial Pearson): for each group and each
    * lag k ≤ `maxLag`, the Pearson correlation of (vₜ, vₜ₋ₖ) pairs
    * under the group's `orderCol` total order. One key-partitioned
    * window produces every lag in a single pass (no per-lag re-sort);
    * the moment sums and the final double chain are [[corrMatrix]]'s
    * exactly, so integer-valued inputs hash-gate as micro integers.
    *
    * Scale shape: one shuffle on the group key, per-group local sort
    * (the same contract as sessionization), then a partial-aggregated
    * groupBy over (group, lag) — rows never leave their group's
    * partition between window and aggregate.
    */
  def acf(df: DataFrame, groupCols: Seq[String], orderCol: String,
          valueCol: String, maxLag: Int): DataFrame = {
    require(maxLag >= 1, "maxLag must be >= 1")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(groupCols.map(col): _*).orderBy(col(orderCol))
    // windows first (generators may not contain window expressions),
    // then the lag struct array explodes plain columns
    val pairs = df
      .select(groupCols.map(col) ++ ((1 to maxLag).map(k =>
        lag(col(valueCol), k).over(w).cast("long").as(s"__y$k")) :+
        col(valueCol).cast("long").as("x")): _*)
      .select(groupCols.map(col) :+ col("x") :+
        explode(array((1 to maxLag).map(k =>
          struct(lit(k).as("lag"), col(s"__y$k").as("y"))): _*)).as("c"): _*)
      .select(groupCols.map(col) ++ Seq(col("c.lag").as("lag"), col("x"),
        col("c.y").as("y")): _*)
      .where(col("y").isNotNull)
    corrMatrix(pairs, groupCols :+ "lag", Seq("x", "y"))
      .select(groupCols.map(col) ++
        Seq(col("lag"), col("n"), col("corr_micro").as("acf_micro")): _*)
  }

  /** Benford's-law first-digit profile of a positive integer metric:
    * per leading digit d ∈ 1..9, the observed count, the expected
    * Benford share log₁₀(1 + 1/d) as a micro integer, and the χ²
    * contribution (obs − n·p)² / (n·p) as a micro integer. The digit
    * is taken from the decimal STRING (exact for integers — float
    * log10 misclassifies exact powers of ten), counts are one
    * partial-aggregated groupBy over ≤ 9 keys, and the totals join
    * broadcasts one row, so the whole screen is a single scan at any
    * scale. The ln-based double chain is shared verbatim with the
    * oracle (the q158 WoE precedent: identical libm inputs ⇒ identical
    * doubles).
    */
  def benford(df: DataFrame, value: Column): DataFrame = {
    val digits = df.select(value.cast("long").as("v"))
      .where(col("v") > 0L)
      .select(substring(col("v").cast("string"), 1, 1).cast("int").as("digit"))
      .groupBy("digit").agg(count(lit(1)).as("cnt"))
    val tot = digits.agg(sum(col("cnt")).as("n"))
    digits.crossJoin(broadcast(tot))
      .withColumn("p", expr("ln(1.0 + 1.0 / digit) / ln(10.0)"))
      .select(col("digit"), col("cnt"), col("n"),
        expr("CAST(floor(p * 1000000.0 + 0.5) AS BIGINT)").as("exp_micro"),
        expr("CAST(floor((cnt - n * p) * (cnt - n * p) / (n * p) " +
          "* 1000000.0 + 0.5) AS BIGINT)").as("chi2_micro"))
  }

  /** Population Stability Index cells — the standard production drift
    * monitor between a baseline and a current sample over pre-binned
    * values: per (group, bin), both counts and the contribution
    * (p − q)·ln(p/q) with +0.5/bin Laplace smoothing (so one-sided
    * bins stay finite) as a micro integer. Σ over bins ≥ 0.2 is the
    * conventional "investigate" line. One partial-aggregated groupBy
    * (counts are exact BIGINTs) + a broadcast of per-group totals; the
    * ln chain is shared verbatim with the oracle.
    */
  def populationStability(df: DataFrame, groupCols: Seq[String],
                          bin: Column, isBaseline: Column): DataFrame = {
    val gcols = groupCols.map(col)
    val cells = df
      .select(gcols :+ bin.cast("long").as("bin") :+
        isBaseline.cast("long").as("a"): _*)
      .groupBy(gcols :+ col("bin"): _*)
      .agg(sum(col("a")).as("cnt_base"), sum(lit(1L) - col("a")).as("cnt_cur"))
    val totals = cells.groupBy(gcols: _*)
      .agg(sum(col("cnt_base")).as("tot_base"), sum(col("cnt_cur")).as("tot_cur"),
        count(lit(1)).as("nbins"))
    cells.join(broadcast(totals), groupCols)
      .withColumn("p", expr(
        "(cnt_base + 0.5) / (tot_base + 0.5 * nbins)"))
      .withColumn("q", expr(
        "(cnt_cur + 0.5) / (tot_cur + 0.5 * nbins)"))
      .select(gcols ++ Seq(col("bin"), col("cnt_base"), col("cnt_cur"),
        expr("CAST(floor((p - q) * ln(p / q) * 1000000.0 + 0.5) AS BIGINT)")
          .as("psi_micro")): _*)
  }

  /** Wald–Wolfowitz runs test per group: over the `orderCol` total
    * order, rows are signed above/below `threshold` (exact ties
    * dropped), `runs` counts maximal same-sign stretches, and
    * `z_micro` is the normal-approximation statistic
    * (r − μ)/σ with μ = 2n₁n₂/(n₁+n₂) + 1. Serial-randomness screen:
    * trending or oscillating series reject. One key-partitioned
    * window (lag of the sign) + one aggregation — counts exact, the
    * single double chain shared with the oracle.
    */
  def runsTest(df: DataFrame, groupCols: Seq[String], orderCol: String,
               value: Column, threshold: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val gcols = groupCols.map(col)
    val w = Window.partitionBy(gcols: _*).orderBy(col(orderCol))
    val signed = df
      .select(gcols :+ col(orderCol) :+ value.cast("long").as("v"): _*)
      .where(col("v") =!= threshold)
      .withColumn("s", (col("v") > threshold).cast("int"))
      .withColumn("chg",
        when(lag(col("s"), 1).over(w).isNull ||
          lag(col("s"), 1).over(w) =!= col("s"), 1L).otherwise(0L))
    signed.groupBy(gcols: _*)
      .agg(sum(col("s")).cast("long").as("n1"),
        sum(lit(1) - col("s")).cast("long").as("n2"),
        sum(col("chg")).as("runs"))
      .withColumn("mu", expr("2.0 * n1 * n2 / (n1 + n2) + 1.0"))
      .withColumn("sg", expr(
        "sqrt(2.0 * n1 * n2 * (2.0 * n1 * n2 - n1 - n2) / " +
          "((n1 + n2) * (n1 + n2) * (n1 + n2 - 1.0)))"))
      .select(gcols ++ Seq(col("n1"), col("n2"), col("runs"),
        expr("CAST(floor((runs - mu) / sg * 1000000.0 + 0.5) AS BIGINT)")
          .as("z_micro")): _*)
  }

  /** Pairwise Jensen–Shannon divergence between per-domain unigram
    * distributions over a fixed reference vocabulary (the globally
    * top-`vocabSize` tokens, tie-broken by token) with +1 Laplace
    * smoothing — the symmetric, bounded corpus-drift measure
    * (√JS is a metric; JS ≤ ln 2). Counts are exact BIGINTs; the ln
    * chain is shared with the oracle. Scale shape: token counts are
    * partial-aggregated; the vocabulary is a broadcast (vocabSize
    * rows); the dense domain×vocab grid and the pair join are
    * domain²·vocab — domains are few by construction.
    */
  def jsDivergenceMatrix(df: DataFrame, domainCol: String, textCol: String,
                         vocabSize: Int = 100): DataFrame = {
    val toks = df.select(col(domainCol).as("d"),
        explode(split(col(textCol), " ")).as("token"))
    val vocab = broadcast(toks.groupBy("token").agg(count(lit(1)).as("gcnt"))
      .orderBy(col("gcnt").desc, col("token")).limit(vocabSize)
      .select(col("token")))
    val counts = toks.join(vocab, "token")
      .groupBy(col("d"), col("token")).agg(count(lit(1)).as("cnt"))
    val domains = df.select(col(domainCol).as("d")).distinct()
    val dense = domains.crossJoin(vocab)
      .join(counts, Seq("d", "token"), "left")
      .select(col("d"), col("token"), coalesce(col("cnt"), lit(0L)).as("cnt"))
    val totals = dense.groupBy("d").agg(sum(col("cnt")).as("tot"))
    val probs = dense.join(broadcast(totals), "d")
      .select(col("d"), col("token"),
        expr(s"(cnt + 1.0) / (tot + ${vocabSize}.0)").as("p"))
    probs.as("a").join(probs.as("b"),
        col("a.token") === col("b.token") && col("a.d") < col("b.d"))
      .groupBy(col("a.d").as("dom_a"), col("b.d").as("dom_b"))
      .agg(expr("CAST(floor(sum(0.5 * a.p * ln(2.0 * a.p / (a.p + b.p)) + " +
        "0.5 * b.p * ln(2.0 * b.p / (a.p + b.p))) * 1000000.0 + 0.5) AS BIGINT)")
        .as("js_micro"))
  }

  /** Exact weighted median per group: the smallest value whose running
    * weight reaches half the group's total (2·cumw ≥ W under the
    * (value, tie) total order) — the robust center for weighted data
    * (revenue-weighted latencies, size-weighted scores). All-integer:
    * one key-partitioned sort window + a broadcast totals join; ties
    * on value resolve identically on both engines because the
    * cumulative is over the value order with min-value selection.
    */
  def weightedMedian(df: DataFrame, groupCols: Seq[String], valueCol: String,
                     weightCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val gcols = groupCols.map(col)
    val w = Window.partitionBy(gcols: _*).orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val cum = df
      .select(gcols :+ col(valueCol).cast("long").as("v") :+
        col(weightCol).cast("long").as("wt"): _*)
      .withColumn("cumw", sum(col("wt")).over(w))
    val tot = cum.groupBy(gcols: _*).agg(sum(col("wt")).as("tw"))
    cum.join(broadcast(tot), groupCols)
      .filter(col("cumw") * 2 >= col("tw"))
      .groupBy(gcols: _*)
      .agg(min(col("v")).as("wmedian"))
  }

  /** Per-group OLS trend of an integer metric against its 1-based
    * position under the group's `orderCol` total order: slope and
    * intercept of the least-squares line, as micro integers from the
    * closed-form sums — n·Σxy, Σx·Σy etc. are exact BIGINTs, so the
    * two final double chains are deterministic and hash-gate. One
    * key-partitioned window (rank) + one partial-aggregated groupBy.
    * BIGINT co-moments need n²·maxrank·maxvalue < 2⁶³ — beyond ~10⁵
    * rows per group pre-aggregate to coarser positions (or center x)
    * before calling.
    */
  def olsTrend(df: DataFrame, groupCols: Seq[String], orderCol: String,
               value: Column): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val gcols = groupCols.map(col)
    val w = Window.partitionBy(gcols: _*).orderBy(col(orderCol))
    df.select(gcols :+ col(orderCol) :+ value.cast("long").as("y"): _*)
      .withColumn("x", row_number().over(w).cast("long"))
      .groupBy(gcols: _*)
      .agg(count(lit(1)).as("n"), sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        sum(col("x") * col("x")).as("sxx"), sum(col("x") * col("y")).as("sxy"))
      .select(gcols ++ Seq(col("n"),
        expr("CAST(floor((CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy) / " +
          "(CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx) " +
          "* 1000000.0 + 0.5) AS BIGINT)").as("slope_micro"),
        expr("CAST(floor((CAST(sy AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sxy) / " +
          "(CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx) " +
          "* 1000000.0 + 0.5) AS BIGINT)").as("intercept_micro")): _*)
  }

  /** Two-sample Kolmogorov–Smirnov statistic, EXACT: with sample sizes
    * n (rows where `isFirst`) and m, D = maxᵥ |F₁(v) − F₂(v)| over the
    * pooled support = maxᵥ |i·m − j·n| / (n·m) where i, j are the
    * inclusive cumulative counts at v. Everything up to and including
    * the returned `d_num`/`denom` rational is BIGINT arithmetic — no
    * float ever enters — and `d_micro` is the truncating integer
    * division (d_num·10⁶) DIV denom, so the gate is hash-exact.
    *
    * Scale shape: groupBy value (partial-aggregated) collapses the
    * input to its distinct support; [[Prefix.withPrefixSums]] runs
    * both ECDFs over ONE range shuffle with per-partition windows (no
    * single-task global sort); one final scalar aggregate. The totals
    * join is a broadcast of one row.
    */
  /** Mann–Whitney U rank-sum statistic between two samples, in exact
    * integers. Ranks are midranks over the pooled sample; to stay on
    * BIGINTs every rank is carried DOUBLED (a midrank is a
    * half-integer, so 2·rank is integral): for a value v with
    * `less` pooled observations below it and `c` tied at it,
    * 2·midrank(v) = 2·less + c + 1. Then
    * `r1_twice = Σ_A 2·midrank`, `u1_twice = r1_twice − n1·(n1+1)`
    * (twice the classical U₁), and `tie_cubes = Σ t³−t` feeds the
    * variance correction downstream (kept integral; the z-score's
    * sqrt is deliberately left out of the gated output — the
    * cross-libm-fragile step the q139 postmortem banned).
    *
    * Scale shape: one `groupBy` on the value, the distributed
    * exclusive prefix sum ([[Prefix.withPrefixSums]] — no single-task
    * window), one final aggregate. Nothing quadratic, nothing
    * collected beyond per-partition offsets.
    */
  def mannWhitneyU(df: DataFrame, valueCol: String, isFirst: Column): DataFrame = {
    val counts = df
      .select(col(valueCol).cast("long").as("v"), isFirst.cast("long").as("a"))
      .groupBy("v")
      .agg(sum(col("a")).as("ca"), sum(lit(1L) - col("a")).as("cb"))
    val cum = Prefix.withPrefixSums(counts, Seq("v"), Seq("ca", "cb"))
      .withColumn("c", col("ca") + col("cb"))
      .withColumn("less", col("prefix_ca") + col("prefix_cb"))
    cum.agg(
        sum(col("ca")).as("n1"), sum(col("cb")).as("n2"),
        sum(col("ca") * (lit(2L) * col("less") + col("c") + 1L)).as("r1_twice"),
        sum(col("c") * col("c") * col("c") - col("c")).as("tie_cubes"))
      .select(col("n1"), col("n2"), col("r1_twice"),
        (col("r1_twice") - col("n1") * (col("n1") + 1L)).as("u1_twice"),
        col("tie_cubes"))
  }

  /** Mann–Kendall trend statistic per group: concordant / discordant /
    * tied pair counts and S = C − D over the (orderCol, valueCol)
    * series — the non-parametric "is this drifting" screen that needs
    * no distributional assumption and stays in exact integers.
    *
    * Scale shape: the pair join is per-group over the ALREADY
    * AGGREGATED series (one row per order position — for daily series
    * the calendar bounds it at ~365·years rows per group), so the
    * self-equi-join on the group key costs |group|² over small,
    * bounded groups — never over raw events.
    */
  def mannKendall(df: DataFrame, groupCols: Seq[String], orderCol: String,
                  valueCol: String): DataFrame = {
    val s = df.select((groupCols.map(col) :+ col(orderCol).as("__t") :+
      col(valueCol).cast("long").as("__v")): _*)
    val pairs = s.as("a").join(s.as("b"),
      groupCols.map(c => col(s"a.$c") === col(s"b.$c"))
        .reduce(_ && _) && col("a.__t") < col("b.__t"))
    pairs.groupBy(groupCols.map(c => col(s"a.$c").as(c)): _*)
      .agg(
        sum(when(col("b.__v") > col("a.__v"), 1L).otherwise(0L)).as("concordant"),
        sum(when(col("b.__v") < col("a.__v"), 1L).otherwise(0L)).as("discordant"),
        sum(when(col("b.__v") === col("a.__v"), 1L).otherwise(0L)).as("tied"))
      .withColumn("s_stat", col("concordant") - col("discordant"))
  }

  /** Cramér's V (bias-uncorrected) of a two-way contingency table as
    * floored micro-integers: per-cell χ² contributions come from
    * [[chiSquare]] (the established per-cell floor(·10⁶) discipline —
    * integer-summable in any order, so no float-summation-order
    * hazard), and V² = χ²/(n·min(r−1, c−1)) is one integer division
    * at the end. No transcendental anywhere (the sqrt to V itself is
    * the caller's presentation step, not gated).
    */
  def cramersV(df: DataFrame, aCol: Column, bCol: Column): DataFrame = {
    val cells = chiSquare(df, aCol, bCol)
    val dims = cells.agg(
      countDistinct(col("a")).as("r"), countDistinct(col("b")).as("c"),
      sum(col("o")).as("n"), sum(col("chi2_micro")).as("chi2_micro_sum"))
    dims.select(col("n"), col("r"), col("c"), col("chi2_micro_sum"),
      expr("chi2_micro_sum DIV (n * least(r - 1, c - 1))").as("v2_micro"))
  }

  /** Herfindahl–Hirschman concentration index per group over integer
    * "mass" values (cents discipline): HHI·10⁶ = ⌊10⁶·Σsᵢ²/S²⌋ where
    * sᵢ is each member's mass. Squares of large cent totals overflow
    * BIGINT, so the moments ride DECIMAL(38,0) and the finish is one
    * integral division — exact on any engine, no floats at all.
    *
    * Scale shape: member rollup + group rollup, two partial-aggregated
    * shuffles on the natural keys.
    */
  def herfindahl(df: DataFrame, groupCols: Seq[String], memberCol: String,
                 valueCol: String): DataFrame = {
    val members = df.groupBy((groupCols :+ memberCol).map(col): _*)
      .agg(sum(col(valueCol)).cast("decimal(38,0)").as("s"))
    members.groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("n_members"),
        sum(col("s")).as("total"),
        sum(col("s") * col("s")).as("sumsq"))
      .select((groupCols.map(col) :+ col("n_members") :+
        col("total").cast("long").as("total") :+
        expr("CAST((sumsq * 1000000) DIV (total * total) AS BIGINT)")
          .as("hhi_micro")): _*)
  }

  /** Trailing rolling correlation between two integer series keyed by
    * an integer time axis, reported as exact co-moments plus a
    * signed squared correlation in micros:
    * num = n·Σxy − Σx·Σy, den = (n·Σx² − (Σx)²)·(n·Σy² − (Σy)²),
    * corr2s_micro = sign(num)·⌊10⁶·num²/den⌋. The moments are BIGINT
    * window sums; num²·10⁶ rides DECIMAL(38,0); one integral division
    * finishes — deterministic with zero libm surface, and the caller
    * gets the exact moments to compute a float r if it wants one.
    *
    * Scale shape: the window runs over the PRE-AGGREGATED per-tick
    * series (one row per time key), `RANGE BETWEEN w−1 PRECEDING` on
    * the integer axis — calendar-bounded state, never raw events.
    */
  def rollingCorrMoments(series: DataFrame, timeCol: String,
                         xCol: String, yCol: String, window: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.orderBy(col(timeCol))
      .rangeBetween(-(window - 1).toLong, Window.currentRow)
    val m = series
      .withColumn("n", count(lit(1)).over(w))
      .withColumn("sx", sum(col(xCol)).over(w))
      .withColumn("sy", sum(col(yCol)).over(w))
      .withColumn("sxx", sum(col(xCol) * col(xCol)).over(w))
      .withColumn("syy", sum(col(yCol) * col(yCol)).over(w))
      .withColumn("sxy", sum(col(xCol) * col(yCol)).over(w))
      .withColumn("num", col("n") * col("sxy") - col("sx") * col("sy"))
      // n·Σx² products can pair up past BIGINT range: den on DECIMAL(38,0)
      .withColumn("den",
        (col("n") * col("sxx") - col("sx") * col("sx")).cast("decimal(38,0)") *
          (col("n") * col("syy") - col("sy") * col("sy")).cast("decimal(38,0)"))
    m.select(col(timeCol), col("n"), col("sx"), col("sy"),
      col("sxx"), col("syy"), col("sxy"),
      when(col("den") > 0,
        when(col("num") >= 0L, 1L).otherwise(-1L) *
          expr("CAST((CAST(num AS DECIMAL(38,0)) * num * 1000000) DIV den AS BIGINT)"))
        .as("corr2s_micro"))
  }

  def ksTwoSample(df: DataFrame, valueCol: String, isFirst: Column): DataFrame = {
    val counts = df
      .select(col(valueCol).cast("long").as("v"), isFirst.cast("long").as("a"))
      .groupBy("v")
      .agg(sum(col("a")).as("ca"), sum(lit(1L) - col("a")).as("cb"))
    val cum = Prefix.withPrefixSums(counts, Seq("v"), Seq("ca", "cb"))
      .select((col("prefix_ca") + col("ca")).as("i"),
        (col("prefix_cb") + col("cb")).as("j"))
    val totals = counts.agg(sum(col("ca")).as("n"), sum(col("cb")).as("m"))
    cum.crossJoin(broadcast(totals))
      .groupBy(col("n"), col("m"))
      .agg(max(abs(col("i") * col("m") - col("j") * col("n"))).as("d_num"))
      .select(col("n"), col("m"), col("d_num"),
        (col("n") * col("m")).as("denom"),
        expr("d_num * 1000000L DIV (n * m)").as("d_micro"))
  }
}
