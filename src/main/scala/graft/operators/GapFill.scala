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

  /** Resample to a one-`unit` grid with LINEAR interpolation between
    * the surrounding raw observations — the numeric complement to
    * [[resampleFfill]]'s step function. At grid time h the anchors are
    * the latest observation with ts ≤ h (ties by `tieCol`, latest
    * wins) and the earliest strictly-later observation; edges fall
    * back to the single available anchor (nearest-neighbor). `valueCol`
    * must be INTEGER (cents discipline): the interpolated value is
    * emitted as micro-units via one deterministic double chain —
    * v0 + (v1−v0)·(h−t0)/(t1−t0) over exact BIGINT micros — floored,
    * so an oracle evaluating the identical literal chain lands on the
    * same integer.
    *
    * Scale shape: both anchors come from ONE union of events and grid
    * points and two key-partitioned running windows (the as-of
    * pattern, q24/q48) — no range join, no per-grid-point probe.
    */
  def resampleInterp(df: DataFrame, keyCol: String, tsCol: String,
                     valueCol: String, tieCol: String,
                     unit: String = "hour"): DataFrame = {
    val ev = df.select(col(keyCol), unix_micros(col(tsCol)).as("__tu"),
      col(valueCol).cast("long").as("__v"), lit(0).as("__g"),
      col(tieCol).cast("long").as("__tie"))
    val gr = df.groupBy(col(keyCol))
      .agg(date_trunc(unit, min(col(tsCol))).as("__h0"),
        date_trunc(unit, max(col(tsCol))).as("__h1"))
      .select(col(keyCol),
        explode(expr(s"sequence(__h0, __h1, interval 1 $unit)")).as("__h"))
      .select(col(keyCol), unix_micros(col("__h")).as("__tu"),
        lit(null).cast("long").as("__v"), lit(1).as("__g"),
        lit(null).cast("long").as("__tie"))
    // ascending: an event AT the grid instant sorts before the grid row
    // (g 0 < 1) so ts ≤ h anchors include it; descending: the grid row
    // sorts first so the "next" anchor is strictly later
    val wA = Window.partitionBy(col(keyCol))
      .orderBy(col("__tu").asc, col("__g").asc, col("__tie").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wD = Window.partitionBy(col(keyCol))
      .orderBy(col("__tu").desc, col("__g").desc, col("__tie").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val evV = when(col("__g") === 0, col("__v"))
    val evT = when(col("__g") === 0, col("__tu"))
    ev.unionByName(gr)
      .withColumn("__pv", last(evV, ignoreNulls = true).over(wA))
      .withColumn("__pt", last(evT, ignoreNulls = true).over(wA))
      .withColumn("__nv", last(evV, ignoreNulls = true).over(wD))
      .withColumn("__nt", last(evT, ignoreNulls = true).over(wD))
      .filter(col("__g") === 1)
      .select(col(keyCol), expr("timestamp_micros(__tu)").as("bucket"),
        expr(
          """CASE WHEN __pv IS NULL THEN CAST(__nv * 1000000 AS BIGINT)
            |     WHEN __nv IS NULL THEN CAST(__pv * 1000000 AS BIGINT)
            |     ELSE CAST(floor(1000000.0 * (__pv + (__nv - __pv) *
            |       (CAST(__tu - __pt AS DOUBLE) / (__nt - __pt))) + 0.5) AS BIGINT)
            |END""".stripMargin).as("interp_micro"))
  }
}
