package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed-table helpers: pre-shuffle once at write time so repeated
  * joins/aggregations on the bucket key run with NO exchange at all —
  * the standard pattern for a fact table joined on the same key by
  * every query (at 100 TB, the shuffle you don't run is the one that
  * wins). `sortBy` additionally removes the sort from sort-merge
  * joins.
  */
object Bucketing {

  /** Persist `df` as a bucketed+sorted managed table. */
  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int): Unit =
    df.write
      .bucketBy(buckets, key)
      .sortBy(key)
      .mode("overwrite")
      .saveAsTable(table)

  /** Join two tables bucketed on `key` with identical bucket counts:
    * Catalyst recognizes the co-located layout and plans a
    * SortMergeJoin with zero Exchange operators.
    */
  def bucketedJoin(spark: SparkSession, tableA: String, tableB: String,
                   key: String): DataFrame =
    spark.table(tableA).join(spark.table(tableB), Seq(key))
}
