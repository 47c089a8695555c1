package graft.pipeline

import org.apache.spark.sql.DataFrame

/** Parallelism repair for underpartitioned inputs.
  *
  * Small parquet inputs (one row group) arrive as ONE scan partition, so
  * a pipeline's expensive map side — shingle hashing, bigram explodes,
  * nested-loop pair joins — runs on one core no matter how many the
  * cluster has. At production scale inputs arrive in thousands of
  * splits and the round-robin shuffle below is skipped entirely; it
  * only fires when the scan has fewer partitions than the cluster has
  * slots, where one extra small shuffle buys full-width execution of
  * everything downstream.
  */
private[graft] object Par {
  def spread(df: DataFrame): DataFrame = {
    if (df.isStreaming) return df // .rdd is illegal on a stream; micro-batches size themselves
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < target) df.repartition(target) else df
  }
}
