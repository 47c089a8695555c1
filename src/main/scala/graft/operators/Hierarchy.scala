package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Parent-pointer hierarchy resolution — the recursive-CTE query
  * class (org charts, category trees, thread ancestry) on an engine
  * with no WITH RECURSIVE: iterated POINTER DOUBLING instead of
  * row-at-a-time recursion.
  *
  * State is one row per node `(id, anc, depth)` — the ancestor
  * currently known and the verified step count to it; roots point at
  * themselves with depth 0. Each round substitutes every pointer with
  * its ancestor's pointer (`anc ← state[anc].anc`,
  * `depth ← depth + state[anc].depth`), HALVING every root path, so a
  * depth-d forest resolves in ⌈log₂ d⌉ rounds of one self-equi-join
  * each — at 100 TB that is a handful of hash-partitioned shuffles
  * keyed by node id, versus d sequential joins for naive recursion.
  * `localCheckpoint` per round cuts lineage (constant plan size, the
  * [[graft.pipeline.Graph]] iteration discipline).
  */
object Hierarchy {

  /** Resolve `(id, root, depth)` for every node. `parentCol` NULL
    * marks a root. Cycles never terminate pointer chasing — `maxIter`
    * bounds rounds (2^maxIter depth) and unresolved rows are reported
    * with the deepest ancestor found so far. A node whose parent id is
    * ABSENT from the input set is kept, terminating at the dangling id
    * (root = the missing ancestor, depth = steps to it) — the left
    * join below reports such rows instead of silently dropping them;
    * callers wanting strictness can assert root ∈ ids.
    */
  def resolveRoots(nodes: DataFrame, idCol: String, parentCol: String,
                   maxIter: Int = 20): DataFrame = {
    var state = nodes.select(
      col(idCol).cast("long").as("id"),
      coalesce(col(parentCol).cast("long"), col(idCol).cast("long")).as("anc"),
      when(col(parentCol).isNull, 0L).otherwise(1L).as("depth"))
      .localCheckpoint()
    var moving = 1L
    var i = 0
    while (moving > 0 && i < maxIter) {
      val jump = state.select(col("id").as("j_id"), col("anc").as("j_anc"),
        col("depth").as("j_depth"))
      val next = state.join(jump, col("anc") === col("j_id"), "left")
        .select(col("id"), coalesce(col("j_anc"), col("anc")).as("anc"),
          (col("depth") + coalesce(col("j_depth"), lit(0L))).as("depth"),
          coalesce(col("j_depth") > 0, lit(false)).as("moved"))
        .localCheckpoint()
      moving = next.filter(col("moved")).count()
      state = next.select(col("id"), col("anc"), col("depth"))
      i += 1
    }
    state.withColumnRenamed("anc", "root")
  }
}
