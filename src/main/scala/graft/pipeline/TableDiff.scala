package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Checksum-based table reconciliation (the anti-entropy / Merkle
  * pattern): compare two snapshots of a table WITHOUT moving either.
  *
  * Each side reduces, map-side, to `buckets` summary rows
  * (bucket, n_rows, xor of row hashes) — order-insensitive,
  * partitioning-insensitive, and total size O(buckets) regardless of
  * table size. Equal tables produce equal summaries; a divergent
  * bucket pinpoints WHERE to run the expensive row-level diff (drill
  * into that one bucket's rows, 1/buckets of the data). At 100 TB
  * this is the difference between "diff two snapshots" being one
  * metadata-sized exchange versus a full-table join.
  *
  * XOR (not SUM) folds the hashes: commutative, associative,
  * overflow-free, and any single-row change flips the bucket digest
  * with probability 1 − 2⁻⁶⁰ (collisions need the md5 prefixes to
  * cancel exactly).
  */
object TableDiff {

  /** 60-bit row hash from md5 of a row-identity SQL expression — the
    * q49 keyHash construction, hex-exact across engines. */
  private def rowHash(rowSql: String): Column =
    conv(substring(md5(expr(rowSql)), 1, 15), 16, 10).cast("long")

  /** Per-bucket digest of a snapshot: (bucket, n_rows, xor_h). */
  def checksum(df: DataFrame, rowSql: String, buckets: Int): DataFrame =
    df.select(rowHash(rowSql).as("h"))
      .groupBy((col("h") % buckets).as("bucket"))
      .agg(count(lit(1)).as("n_rows"), expr("bit_xor(h)").as("xor_h"))

  /** Buckets where two snapshots diverge, with both sides' digests;
    * empty result = tables identical (up to hash collision). Missing
    * buckets compare as (0 rows, 0 digest).
    */
  def diff(a: DataFrame, b: DataFrame, rowSql: String,
           buckets: Int): DataFrame = {
    val ca = checksum(a, rowSql, buckets)
      .select(col("bucket"), col("n_rows").as("a_rows"), col("xor_h").as("a_xor"))
    val cb = checksum(b, rowSql, buckets)
      .select(col("bucket"), col("n_rows").as("b_rows"), col("xor_h").as("b_xor"))
    ca.join(cb, Seq("bucket"), "full_outer")
      .select(col("bucket"),
        coalesce(col("a_rows"), lit(0L)).as("a_rows"),
        coalesce(col("b_rows"), lit(0L)).as("b_rows"),
        coalesce(col("a_xor"), lit(0L)).as("a_xor"),
        coalesce(col("b_xor"), lit(0L)).as("b_xor"))
      .filter(col("a_rows") =!= col("b_rows") || col("a_xor") =!= col("b_xor"))
  }
}
