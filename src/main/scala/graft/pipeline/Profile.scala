package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Single-pass table profiling — the data-quality summary every
  * ingest pipeline runs first: per column, row count, null count,
  * exact NDV, min and max.
  *
  * Scale shape: ONE scan and one aggregation no matter how many
  * columns are profiled (the naive per-column loop scans the table
  * `cols` times — at 100 TB that multiplier IS the cost). All
  * measures land in a single wide `agg`; the column-per-row pivot at
  * the end is a `stack` over one already-aggregated row, free.
  * Numeric columns only, so min/max stay doubles and never hit
  * engine-specific string formatting.
  *
  * The N exact `countDistinct`s expand the scan N-fold (Catalyst's
  * multi-distinct Expand) — the exact variant exists for the oracle
  * gate; at corpus scale swap `countDistinct` for
  * `approx_count_distinct` and the whole profile is genuinely one
  * Expand-free pass.
  */
object Profile {

  def numericProfile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "profile at least one column")
    val aggs = cols.flatMap { c =>
      Seq(
        countDistinct(col(c)).as(s"__ndv_$c"),
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"__nn_$c"),
        min(col(c).cast("double")).as(s"__mn_$c"),
        max(col(c).cast("double")).as(s"__mx_$c"))
    } :+ count(lit(1)).as("__n")
    val wide = df.agg(aggs.head, aggs.tail: _*)
    val stackArgs = cols.map { c =>
      s"'$c', __n, `__nn_$c`, `__ndv_$c`, `__mn_$c`, `__mx_$c`"
    }.mkString(", ")
    wide.selectExpr(
      s"stack(${cols.size}, $stackArgs) AS " +
        "(column_name, n_rows, n_null, ndv, min_v, max_v)")
  }
}
