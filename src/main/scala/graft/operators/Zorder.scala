package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton) space-filling-curve layout for grid-keyed data —
  * the tile catalog's scale story for WRITE layout.
  *
  * The reference's catalog keys tiles by (col, row) and prunes scans
  * by bbox (reference `Utils.scala:241-248`); our reader pushes the
  * same bbox down as `key_col/key_row BETWEEN` filters
  * ([[graft.sources.TileCatalog.readLayer]]). What pushdown cannot fix
  * is IO SHAPE: a catalog written in row-major key order turns a
  * square AOI into one thin row-stripe per key_row — O(height) small
  * reads scattered across files. Interleaving the key bits (Morton
  * order) maps every aligned 2^b × 2^b block to ONE contiguous
  * z-range, so the same bbox touches O(few) contiguous runs whose
  * min/max column stats prune exactly — the layout trick behind
  * Delta/Iceberg Z-ORDER clustering, applied to the tile table. At
  * 100 TB the clustered write (`repartitionByRange` on z, sorted
  * within partitions) is what keeps bbox scans near-sequential.
  *
  * Pure shift/mask bit-spreading on built-in functions — codegen'd end
  * to end, no UDF, and exactly reproducible by any engine's integer
  * arithmetic (the q107 oracle recomputes it in SQL).
  */
object Zorder {

  /** Spread the low 16 bits of `v`: bit i moves to bit 2i. */
  private def spread16(v: Column): Column = {
    val a = v.cast("long").bitwiseAND(lit(0xFFFFL))
    val b = a.bitwiseOR(shiftleft(a, 8)).bitwiseAND(lit(0x00FF00FFL))
    val c = b.bitwiseOR(shiftleft(b, 4)).bitwiseAND(lit(0x0F0F0F0FL))
    val d = c.bitwiseOR(shiftleft(c, 2)).bitwiseAND(lit(0x33333333L))
    d.bitwiseOR(shiftleft(d, 1)).bitwiseAND(lit(0x55555555L))
  }

  /** Morton code of a (col, row) grid key (row bits one position above
    * col bits); total order = depth-first quadtree walk. */
  def morton(keyCol: Column, keyRow: Column): Column =
    spread16(keyCol).bitwiseOR(shiftleft(spread16(keyRow), 1))

  /** Annotate grid-keyed rows with their z-index and quadtree block id
    * (`z >> 2b` = the aligned 2^b × 2^b square containing the key).
    * A writer lays the catalog out with
    * `zIndexed(df, "key_col", "key_row", b).repartitionByRange(col("z"))
    * .sortWithinPartitions("z")` — every output file then covers one
    * contiguous z-range with tight (key_col, key_row) min/max stats.
    */
  def zIndexed(df: DataFrame, colName: String, rowName: String,
               blockBits: Int): DataFrame =
    df.withColumn("z", morton(col(colName), col(rowName)))
      .withColumn("z_block", shiftright(col("z"), 2 * blockBits))
}
