package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact interpolated percentiles by sort, not by value-map collection.
  *
  * Spark's built-in `percentile` is a `TypedImperativeAggregate` that
  * collects a (value → count) map per group: partials serialize the
  * whole map through the shuffle, and on near-unique doubles (prices,
  * latencies) the map degenerates to one entry per row — the shuffle
  * carries the entire column and the final merge is single-threaded
  * per group. This operator computes the same interpolated result
  * (pos = p·(n−1); v_lo·(1−d) + v_hi·d — the formula of Spark's
  * `Percentile.getPercentile`) from a `row_number` window over the
  * sorted group plus a tiny pre-count, so the heavy lifting is one
  * Tungsten range sort and the shuffle carries rows once, with no
  * per-group driver-side merge. Sum order keeps the v_lo term first,
  * so the float result is bit-identical to the built-in's.
  */
object ExactPercentiles {

  /** Percentiles `ps` (output column name → p in [0,1]) of `valueCol`
    * per group of `groupCols`. One output row per group.
    */
  def exact(df: DataFrame, groupCols: Seq[String], valueCol: String,
            ps: Seq[(String, Double)]): DataFrame = {
    val gcols = groupCols.map(col)
    // NULL values are excluded from n and from ranking, matching the
    // built-in percentile's ignore-nulls semantics; a group whose
    // values are ALL null still emits a row with NULL percentiles
    // (count(col) skips nulls, the final left join keeps the group)
    val counts = df.groupBy(gcols: _*).agg(count(col(valueCol)).as("__n"))
    val nonNull = df.filter(col(valueCol).isNotNull)
    val w = Window.partitionBy(gcols: _*).orderBy(col(valueCol))
    val ranked = nonNull.select(gcols :+ col(valueCol): _*)
      .join(broadcast(counts), groupCols)
      .withColumn("__rn", row_number().over(w).cast("long"))
    val aggs = ps.map { case (name, p) =>
      // bit-identical to Percentile.getPercentile: pos = (n-1)·p,
      // integral pos returns v_lo, else v_lo·(ceil(pos)−pos) +
      // v_hi·(pos−floor(pos)) — same expressions, same order
      val pos = (col("__n") - 1).cast("double") * lit(p)
      val loD = floor(pos)
      val hiD = ceil(pos)
      val lo = loD + 1 // 1-based row_number of the lower bound
      val hi = hiD + 1
      val v = col(valueCol)
      sum(
        when(col("__rn") === lo,
          when(lo === hi, v).otherwise(v * (hiD - pos))).otherwise(lit(0.0)) +
          when(col("__rn") === hi && hi =!= lo, v * (pos - loD)).otherwise(lit(0.0))
      ).as(name)
    }
    counts.select(groupCols.head, groupCols.tail: _*)
      .join(ranked.groupBy(gcols: _*).agg(aggs.head, aggs.tail: _*), groupCols, "left")
  }
}
