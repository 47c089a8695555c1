package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed graph primitives for dedup pipelines.
  *
  * Near-duplicate PAIRS (MinHash/SimHash/embedding candidates) are only
  * half the dedup story: keeping one survivor per duplicate CLUSTER
  * requires the transitive closure of the pair relation. At corpus
  * scale that is a connected-components problem over billions of
  * edges — solved here with the standard iterative min-label
  * propagation (Lloyd-style; the basis of GraphX/Pregel CC).
  */
object Graph {

  /** Connected components by min-label propagation: every node starts
    * as its own label; each round, a node adopts the smallest label
    * among itself and its neighbors; converged when no label changes.
    * The result is deterministic (the unique least-id fixpoint), so an
    * engine-independent oracle can reproduce it exactly.
    *
    * Scale notes: each round is one shuffle of the edge list joined to
    * the label table plus a min-aggregation — O(E) per round, ≤
    * O(log V) rounds on real near-dup graphs (components are tiny and
    * dense). `localCheckpoint` cuts the plan lineage every round so
    * iteration N does not replan rounds 1..N−1; on a cluster a
    * reliable checkpoint dir serves the same purpose. The driver-side
    * convergence count is one scalar per round, not data.
    *
    * @param nodes one row per node (deduplicated by caller)
    * @param edges undirected pair list (aCol, bCol)
    * @return (doc, group_id): node id → least node id in its component
    */
  def connectedComponents(nodes: DataFrame, idCol: String,
                          edges: DataFrame, aCol: String, bCol: String,
                          maxIter: Int = 25): DataFrame = {
    val adj = edges.select(col(aCol).as("src"), col(bCol).as("dst"))
      .union(edges.select(col(bCol).as("src"), col(aCol).as("dst")))
      .distinct().persist()
    var labels = nodes.select(col(idCol).as("doc"), col(idCol).as("group_id"))
      .localCheckpoint()
    var changed = 1L
    var i = 0
    while (changed > 0 && i < maxIter) {
      val nbr = adj.join(labels, col("src") === col("doc"))
        .groupBy(col("dst")).agg(min(col("group_id")).as("nbl"))
      val next = labels.join(nbr, col("doc") === col("dst"), "left")
        .select(col("doc"),
          least(col("group_id"), coalesce(col("nbl"), col("group_id"))).as("group_id"),
          (coalesce(col("nbl"), col("group_id")) < col("group_id")).as("chg"))
        .localCheckpoint()
      changed = next.filter(col("chg")).count()
      labels = next.select(col("doc"), col("group_id"))
      i += 1
    }
    adj.unpersist()
    labels
  }
}
