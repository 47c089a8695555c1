package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental aggregate-view maintenance: refresh a grouped
  * count/sum rollup by MERGING the old state with the aggregate of a
  * delta batch, never re-aggregating the base.
  *
  * Count and sum are monoids, so `agg(base ∪ delta) =
  * merge(agg(base), agg(delta))` — refreshing a 100 TB rollup costs
  * the delta's aggregation (delta-sized shuffle) plus a state-sized
  * full-outer join, and avg/rate-style measures derive from the
  * maintained (count, sum) pairs at read time. Retractions compose
  * the same way: encode deletes as negative counts/sums in the delta
  * and the merge subtracts; groups whose count reaches 0 can be
  * compacted away by the caller.
  */
object Incremental {

  /** Grouped (count, sums) state of one batch — the aggregation shape
    * [[merge]] maintains. `n` counts rows; each sum column keeps its
    * name. */
  def countSumState(df: DataFrame, keys: Seq[String],
                    sumCols: Seq[String]): DataFrame =
    df.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("n"),
        sumCols.map(c => sum(col(c)).as(c)): _*)

  /** Merge two states: full-outer on keys, absent side contributes
    * the monoid identity (0). */
  def merge(a: DataFrame, b: DataFrame, keys: Seq[String],
            sumCols: Seq[String]): DataFrame = {
    val measures = "n" +: sumCols
    val bRen = measures.foldLeft(b)((d, c) => d.withColumnRenamed(c, s"__b_$c"))
    a.join(bRen, keys, "full_outer")
      .select(keys.map(col) ++ measures.map(c =>
        (coalesce(col(c), lit(0L)) + coalesce(col(s"__b_$c"), lit(0L))).as(c)): _*)
  }
}
