package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** 2-D Pareto front (skyline), minimize both dimensions: the points
  * no other point dominates (≤ in both coordinates, < in at least
  * one) — multi-objective "best tradeoff" mining (Börzsönyi et al.,
  * ICDE 2001, "The Skyline Operator").
  *
  * Scale shape, two fully-distributed passes instead of the classic
  * nested-loop:
  *  1. per-x reduction `groupBy(x).min(y)` — only per-x minima can be
  *     on the front (anything else is dominated at equal x), so the
  *     corpus-sized input collapses to one row per distinct x in one
  *     partial-aggregated shuffle;
  *  2. the staircase scan: a point survives iff every strictly-smaller
  *     x has strictly-larger y — an exclusive running minimum over x
  *     order, computed with [[graft.pipeline.Prefix.withPrefixMin]]'s
  *     range-partition machinery (never a single-task global window).
  */
object Skyline {

  /** The front as (xCol, yCol) rows; input needs no dedup (equal
    * points collapse in the per-x reduction). */
  def paretoFront2D(df: DataFrame, xCol: String, yCol: String): DataFrame = {
    val cand = df.groupBy(col(xCol)).agg(min(col(yCol)).as(yCol))
    graft.pipeline.Prefix.withPrefixMin(cand, Seq(xCol), yCol)
      .filter(col("prefix_min").isNull || col(yCol) < col("prefix_min"))
      .drop("prefix_min")
  }
}
