package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series regularization: resample an irregular event stream onto
  * a fixed per-key grid and forward-fill the last observation — the
  * feature-pipeline step that turns event logs into model-ready
  * regular series.
  *
  * Scale shape: everything is keyed by the series key — the per-bucket
  * pick is a WindowGroupLimit-optimized row_number (bounded buffer
  * before the exchange), the grid explodes from one (key, start, end)
  * row per key, and the forward fill is a key-partitioned running
  * `last(ignoreNulls)` window. No global sort, no driver loop; grid
  * cardinality is span/step per key, the intended output size.
  */
object GapFill {

  /** Resample `df` to a one-`unit` grid per `keyCol` spanning each
    * key's [min(ts), max(ts)] (bucket-truncated, inclusive), carrying
    * the LATEST `valueCol` of each bucket (ties on ts broken by
    * `tieCol`) and forward-filling empty buckets. Output: (keyCol,
    * bucket timestamp, filled value). Leading buckets are never null —
    * each key's grid starts at its first observation's bucket.
    */
  def resampleFfill(df: DataFrame, keyCol: String, tsCol: String,
                    valueCol: String, tieCol: String,
                    unit: String = "hour"): DataFrame = {
    val step = s"1 $unit"
    val bucket: Column = date_trunc(unit, col(tsCol))
    val picked = df
      .withColumn("__h", bucket)
      .withColumn("__rn", row_number().over(
        Window.partitionBy(col(keyCol), col("__h"))
          .orderBy(col(tsCol).desc, col(tieCol).desc)))
      .filter(col("__rn") === 1)
      .select(col(keyCol), col("__h"), col(valueCol).as("__v"))
    val grid = df
      .groupBy(col(keyCol))
      .agg(date_trunc(unit, min(col(tsCol))).as("__h0"),
        date_trunc(unit, max(col(tsCol))).as("__h1"))
      .select(col(keyCol),
        explode(expr(s"sequence(__h0, __h1, interval $step)")).as("__h"))
    grid.join(picked, Seq(keyCol, "__h"), "left")
      .withColumn("__vf", last(col("__v"), ignoreNulls = true).over(
        Window.partitionBy(col(keyCol)).orderBy(col("__h"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .select(col(keyCol), col("__h").as("bucket"), col("__vf").as("value"))
  }
}
