package graft.sources

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** JVM-dumped quantized-ln plane for the q305/q311 oracles — the
  * [[RetrievalFixture]] idf6 discipline applied to the two remaining
  * gates whose oracle called DuckDB `ln` directly.
  *
  * `floor(ln(x)·1e6)` computed independently by JVM `Math.log` and the
  * driver's DuckDB libm can differ by one ulp at a floor boundary
  * (the round-6 q139 post-mortem). Cure: dump the ONLY transcendental
  * intermediate — `ln6 = floor(ln(num/den)·1e6)` over exactly the
  * (num, den) integer-count pairs the two gates evaluate — from the
  * JVM as a parquet fixture that BOTH the Spark query and the DuckDB
  * oracle equi-join. Each side still recomputes every count, join,
  * and cumulative independently; only the libm call is pinned to one
  * engine, so the gate keeps verifying the whole distributed chain.
  *
  * Pair sets (tiny — bounded by day/type/band cardinality, not rows):
  *  - q305 Kaplan–Meier: (n_risk − d_churn, n_risk) per churn day
  *  - q311 info gain: (c, N) per event_type and (c, N_band) per
  *    (band, event_type)
  */
object StatsFixture {

  def dir(sfDir: String): String = {
    val tag = new java.io.File(sfDir).getName
    s"${System.getProperty("java.io.tmpdir")}/graft_ln6_v1_$tag"
  }

  def ensure(spark: SparkSession, sfDir: String): String = synchronized {
    val d = dir(sfDir)
    if (new java.io.File(s"$d/ln6.parquet/_SUCCESS").exists()) return d
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

    p305.unionAll(marg).unionAll(cond).distinct()
      .withColumn("ln6", expr(
        "CAST(floor(ln(CAST(num AS DOUBLE) / den) * 1000000.0) AS BIGINT)"))
      .coalesce(1).write.mode("overwrite").parquet(s"$d/ln6.parquet")
    d
  }
}
