package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing: concatenating documents into fixed-size context
  * windows for LM training. The deterministic "chunked" packing —
  * documents in a stable total order, laid head-to-tail over
  * consecutive `capacity`-token bins — is fully declarative (one
  * cumulative-sum window), reproducible on any engine, and leak-proof
  * (assignment depends only on ids and token counts, never on
  * partitioning or arrival order).
  */
object Packing {

  /** Assign each document a bin and in-bin offset: docs ordered by
    * `idCol`, `start_tok` = tokens before it, bin = start_tok DIV
    * capacity (a doc whose start crosses a bin boundary begins that
    * bin; consumers split or pad at read time).
    *
    * Scale note: the global-order cumulative sum is a range-partitioned
    * distributed sort in Spark (not a single task); the window's
    * running sum needs the per-partition prefix totals, which AQE's
    * single final WindowExec handles at test scale — at petabyte scale
    * swap in a two-pass prefix-sum (per-partition totals broadcast
    * back), same declared semantics.
    */
  def packGreedy(df: DataFrame, idCol: String, tokens: Column,
                 capacity: Int): DataFrame = {
    require(capacity > 0, "capacity must be positive")
    val w = Window.orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    df.select(col(idCol), tokens.cast("long").as("n_tokens"))
      .withColumn("start_tok", coalesce(sum(col("n_tokens")).over(w), lit(0L)))
      .withColumn("bin", (col("start_tok") / capacity).cast("long"))
      .withColumn("offset", (col("start_tok") % capacity).cast("long"))
  }
}
