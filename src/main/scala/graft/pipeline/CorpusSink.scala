package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

/** Production sink for curated corpora: partitioned, sorted parquet.
  *
  * Layout choices and why they matter at 100 TB:
  *  - `partitionBy(split)` (or source/date): downstream training jobs
  *    read one split with partition PRUNING, never a filter scan.
  *  - `repartitionByRange(shuffle_key)` + `sortWithinPartitions`:
  *    a globally hash-ordered layout ([[Sampling.withEpochKey]]) means
  *    a sequential read IS a shuffled epoch — no shuffle at training
  *    time, and range partitioning bounds file skew.
  *  - `maxRecordsPerFile` caps file size so a 100 TB write cannot
  *    produce unsplittable multi-GB files (parquet row groups aside,
  *    many consumers schedule per file).
  */
object CorpusSink {

  /** Write `df` under `path` partitioned by `partitionCols`, each file
    * sorted by `sortCol`, at most `maxRecordsPerFile` rows per file.
    * `buckets` is the TOTAL range-partition count of the sort layout
    * across all partition values (files per directory follow each
    * value's share of the data, then maxRecordsPerFile splitting).
    */
  def writePartitioned(df: DataFrame, path: String,
                       partitionCols: Seq[String], sortCol: String,
                       buckets: Int = 8, maxRecordsPerFile: Long = 5000000L): Unit = {
    require(partitionCols.nonEmpty, "need at least one partition column")
    df.repartitionByRange(buckets, partitionCols.map(col) :+ col(sortCol): _*)
      .sortWithinPartitions((partitionCols :+ sortCol).map(col): _*)
      .write
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .partitionBy(partitionCols: _*)
      .mode("overwrite")
      .parquet(path)
  }
}
