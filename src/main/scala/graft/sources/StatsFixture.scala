package graft.sources

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** JVM-dumped quantized-ln planes for the q305/q311/q207/q158 oracles
  * — the [[RetrievalFixture]] idf6 discipline applied to every gate
  * whose oracle would otherwise call DuckDB `ln` on data-dependent
  * input and floor the result.
  *
  * `floor(ln(x)·1e6)` computed independently by JVM `Math.log` and the
  * driver's DuckDB libm can differ by one ulp at a floor boundary
  * (the round-6 q139 post-mortem). Cure: dump the ONLY transcendental
  * intermediate — quantized over exactly the integer-count pairs the
  * gates evaluate — from the JVM as a parquet fixture that BOTH the
  * Spark query and the DuckDB oracle equi-join. Each side still
  * recomputes every count, join, and cumulative independently; only
  * the libm call is pinned to one engine, so the gate keeps verifying
  * the whole distributed chain. Consumers take a LEFT join and
  * raise_error on a NULL plane value, so a stale cached fixture fails
  * loudly instead of silently dropping the same rows from both sides.
  *
  * Two planes (tiny — bounded by day/type/band cardinality, not rows):
  *  - `ln6.parquet` (num, den, ln6 = floor(ln(num/den)·1e6)):
  *     q305 Kaplan–Meier (n_risk − d_churn, n_risk) per churn day;
  *     q311 info gain (c, N) per event_type and (c, N_band) per
  *     (band, event_type); q207 Markov add-1 likelihood
  *     (c + 1, tot + k) per transition cell.
  *  - `woe6.parquet` (g, b, woe6): q158's Laplace-smoothed
  *     weight-of-evidence per (goods, bads) cell, quantized with the
  *     exact `floor(ln(((g+.5)/(gt+.5))/((b+.5)/(bt+.5)))·1e6+.5)`
  *     chain (gt/bt are corpus scalars, so (g, b) keys the cell).
  */
object StatsFixture {

  def dir(sfDir: String): String = {
    val tag = new java.io.File(sfDir).getName
    // v3: + q456 DSIR bucket-model pairs (bump invalidates v2 caches)
        val fp = EdgePlane.fingerprint(sfDir, Seq("events.parquet", "documents.parquet"))
    s"${System.getProperty("java.io.tmpdir")}/graft_ln6_v4_${tag}_$fp"
  }

  def ensure(spark: SparkSession, sfDir: String): String = synchronized {
    val d = dir(sfDir)
    if (new java.io.File(s"$d/ln6.parquet/_SUCCESS").exists() &&
        new java.io.File(s"$d/woe6.parquet/_SUCCESS").exists()) return d
    val e = graft.Tables.events(spark, sfDir)

    // q305 pairs: survivors-over-risk ratio per churn day
    val ev = e.select(col("user_id"), to_date(col("ts")).as("day"))
    val span = ev.agg(max(col("day")).as("max_day"))
    val lastDay = ev.groupBy("user_id").agg(max(col("day")).as("last_day"))
      .crossJoin(broadcast(span))
    val churn = lastDay.filter(col("last_day") < col("max_day"))
      .groupBy(col("last_day").as("day")).agg(count(lit(1)).as("d_churn"))
    val byDay = lastDay.groupBy(col("last_day").as("day"))
      .agg(count(lit(1)).as("ending"))
    val tot = lastDay.agg(count(lit(1)).as("n_users"))
    val wDays = org.apache.spark.sql.expressions.Window.orderBy(col("day"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val risk = byDay.crossJoin(broadcast(tot))
      .withColumn("n_risk",
        col("n_users") - coalesce(sum(col("ending")).over(wDays), lit(0L)))
      .select(col("day"), col("n_risk"))
    val p305 = churn.join(risk, "day")
      .filter(col("d_churn") < col("n_risk"))
      .select((col("n_risk") - col("d_churn")).as("num"),
        col("n_risk").as("den"))

    // q311 pairs: marginal and band-conditional class-share ratios
    val e311 = e.select(expr("CAST(user_id % 10 AS BIGINT)").as("band"),
      col("event_type"))
    val n311 = e311.agg(count(lit(1)).as("n"))
    val marg = e311.groupBy("event_type").agg(count(lit(1)).as("c"))
      .crossJoin(broadcast(n311))
      .select(col("c").as("num"), col("n").as("den"))
    val bandTot = e311.groupBy("band").agg(count(lit(1)).as("nb"))
    val cond = e311.groupBy("band", "event_type").agg(count(lit(1)).as("c"))
      .join(broadcast(bandTot), "band")
      .select(col("c").as("num"), col("nb").as("den"))

    // q207 pairs: add-1-smoothed transition likelihood (c+1, tot+k)
    // per (prev, cur) cell of the per-user event-type chains
    val wSeq = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("tu"), col("event_id"))
    val trans = e.select(col("user_id"), col("event_id"),
        unix_micros(col("ts")).as("tu"), col("event_type"))
      .withColumn("prev", lag(col("event_type"), 1).over(wSeq))
      .filter(col("prev").isNotNull)
      .select(col("prev"), col("event_type").as("cur"))
    val kStates = trans.select(col("cur")).union(trans.select(col("prev")))
      .distinct().agg(count(lit(1)).as("k"))
    val cell207 = trans.groupBy("prev", "cur").agg(count(lit(1)).as("c"))
    val p207 = cell207
      .join(broadcast(cell207.groupBy("prev").agg(sum(col("c")).as("tot"))),
        "prev")
      .crossJoin(broadcast(kStates))
      .select((col("c") + 1L).as("num"), (col("tot") + col("k")).as("den"))

    // q456 pairs: DSIR hashed-unigram bucket models — add-1-smoothed
    // (count+1, total+64) for BOTH the target (source = src0) and raw
    // (all sources) models, enumerated over all 64 buckets so absent
    // buckets contribute their smoothing-only pair
    val dtok = graft.Tables.load(spark, sfDir, "documents")
      .select(col("source"), explode(split(col("text"), " ")).as("token"))
      .withColumn("bucket", expr("CAST(conv(substring(md5(concat(" +
        "'dsir:', token)), 1, 15), 16, 10) AS BIGINT) % 64"))
    val ct456 = dtok.filter(col("source") === "src0")
      .groupBy("bucket").agg(count(lit(1)).as("c"))
    val cr456 = dtok.groupBy("bucket").agg(count(lit(1)).as("c"))
    val bk456 = spark.range(64).select(col("id").as("bucket"))
      .join(ct456.withColumnRenamed("c", "ct"), Seq("bucket"), "left")
      .join(cr456.withColumnRenamed("c", "cr"), Seq("bucket"), "left")
      .select(col("bucket"), coalesce(col("ct"), lit(0L)).as("ct"),
        coalesce(col("cr"), lit(0L)).as("cr"))
      .crossJoin(broadcast(
        dtok.agg(count(lit(1)).as("rt"),
          sum(when(col("source") === "src0", 1L).otherwise(0L)).as("tt"))))
    val p456 = bk456
      .select((col("ct") + 1L).as("num"), (col("tt") + 64L).as("den"))
      .unionAll(bk456
        .select((col("cr") + 1L).as("num"), (col("rt") + 64L).as("den")))

    p305.unionAll(marg).unionAll(cond).unionAll(p207).unionAll(p456)
      .distinct()
      .withColumn("ln6", expr(
        "CAST(floor(ln(CAST(num AS DOUBLE) / den) * 1000000.0) AS BIGINT)"))
      .coalesce(1).write.mode("overwrite").parquet(s"$d/ln6.parquet")

    // q158 plane: WoE per (g, b) cell — the chain below is copied
    // VERBATIM from Stats.weightOfEvidence so the plane pins exactly
    // the double the operator would compute
    val cells = e.select(expr("CAST(user_id % 10 AS BIGINT)").as("cband"),
        expr("CAST(CAST(event_type = 'purchase' AS INT) AS LONG)").as("y"))
      .groupBy("cband")
      .agg(sum(col("y")).as("g"), sum(lit(1L) - col("y")).as("b"))
    val gb = cells.agg(sum(col("g")).as("gt"), sum(col("b")).as("bt"))
    cells.crossJoin(broadcast(gb))
      .select(col("g"), col("b"),
        expr("CAST(floor(ln(((CAST(g AS DOUBLE) + 0.5) / (CAST(gt AS DOUBLE) + 0.5)) / " +
          "((CAST(b AS DOUBLE) + 0.5) / (CAST(bt AS DOUBLE) + 0.5))) * 1000000.0 + 0.5) AS BIGINT)")
          .as("woe6"))
      .distinct()
      .coalesce(1).write.mode("overwrite").parquet(s"$d/woe6.parquet")
    d
  }
}
