package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-weighted average over irregular event series — the TWAP/TWA
  * statistic: each observation holds (piecewise-constant) until the
  * next one, so its weight is the seconds until the successor, and
  *
  *   twa(key) = Σ value·Δt / Σ Δt
  *
  * over the key's span. The plain `avg` answers "average of the
  * samples"; TWA answers "average of the SIGNAL", which is what
  * monitoring, pricing, and sensor rollups actually want when
  * sampling is irregular (a value that persisted 3 hours must weigh
  * 3 hours, not one row).
  *
  * Scale shape: one key-partitioned `lead` window (sort is local to
  * each key's partition — never a global sort) followed by a
  * partial-aggregated groupBy on the same key, which AQE coalesces
  * into the window's existing hash partitioning: one shuffle total.
  */
object Twap {

  /** Per-key (twa, span_sec, n_events). `orderCols` must make the
    * per-key order total (include a unique tiebreak; equal-timestamp
    * rows then get zero weight except the last of the ties, the
    * piecewise-constant convention). Keys with a single event (or
    * zero span) have no signal to integrate: `twa` is NULL, the
    * caller's signal to fall back to the plain sample mean.
    */
  def timeWeightedAvg(df: DataFrame, keyCol: String, tsCol: String,
                      valCol: String, orderCols: Seq[String]): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(orderCols.map(col): _*)
    val sec = col(tsCol).cast("double")
    df.withColumn("__dt", lead(sec, 1).over(w) - sec)
      .groupBy(col(keyCol))
      .agg(
        (sum(col(valCol) * col("__dt")) / sum(col("__dt"))).as("twa"),
        coalesce(sum(col("__dt")), lit(0.0)).as("span_sec"),
        count(lit(1)).as("n_events"))
  }
}
