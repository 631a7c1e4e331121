package graft.operators

import graft.Checkpoints
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components over an undirected pair graph — the cluster-
  * resolution stage a dedup pipeline runs AFTER candidate generation:
  * near-duplicate pairs (from MinHash/LSH, SimHash or embedding
  * buckets) are stitched into duplicate *clusters*, and each cluster
  * elects one canonical representative (the minimum id), which is the
  * set of documents actually kept at 100 TB.
  *
  * Algorithm: iterative min-label propagation. Each node starts with
  * `comp = min(id, min(neighbor ids))` and every round takes the min of
  * its own label and its neighbors' labels; after `diameter(G)` rounds
  * every node carries the minimum id of its component. Each round is
  * one equi-join of the (persisted, hash-partitioned) edge list against
  * the |V|-sized label vector plus one hash aggregation — the same
  * join/agg discipline as the HITS kernel ([[Hits.iterate]]), so the
  * big edge side is shuffled once and only the label vector moves per
  * round. Labels are `localCheckpoint`ed per round to truncate lineage.
  *
  * Convergence detection is one in-plan scalar per round: labels only
  * ever decrease, so `sum(comp)` is strictly monotone until the fixed
  * point — equal consecutive sums IS convergence (no row-wise diff join
  * needed).
  *
  * Scale note: propagation rounds equal the component diameter. Dedup
  * clusters are dense and shallow (diameter ≤ 3-4 in practice), so this
  * runs in a handful of rounds; for adversarial long-chain graphs the
  * large-star/small-star variant (Kiveris et al., "Connected Components
  * in MapReduce and Beyond") halves distances per round — noted, not
  * needed for the dedup workload this serves.
  */
object ConnectedComponents {

  /** Components of the undirected graph given as `(a, b)` pairs.
    * Returns `(id, component)` — one row per node that appears in at
    * least one pair, `component` = min node id of its component. */
  def run(pairs: DataFrame, a: String = "a", b: String = "b"): DataFrame = {
    // Both directions so one join side covers every neighborhood.
    val e = pairs.select(col(a).as("x"), col(b).as("y"))
      .unionAll(pairs.select(col(b).as("x"), col(a).as("y")))
      .persist()
    try {
      var comp = Checkpoints.materialize(e.groupBy(col("x").as("id"))
        .agg(min(col("y")).as("nmin"))
        .select(col("id"), least(col("id"), col("nmin")).as("comp")))
      var prevSum = checksum(comp)
      var converged = false
      while (!converged) {
        val nbrMin = e
          .join(comp.select(col("id").as("y"), col("comp").as("yc")), Seq("y"))
          .groupBy(col("x").as("id")).agg(min(col("yc")).as("nmin"))
        val next = Checkpoints.materialize(comp.join(nbrMin, Seq("id"))
          .select(col("id"), least(col("comp"), col("nmin")).as("comp")))
        val s = checksum(next)
        // `next` is materialized and checksummed: the previous round's
        // label checkpoint is unreachable — release eagerly (see
        // [[graft.Checkpoints]]).
        Checkpoints.release(comp)
        converged = s == prevSum
        prevSum = s
        comp = next
      }
      comp
    } finally e.unpersist(false)
  }

  private def checksum(comp: DataFrame): Long =
    comp.agg(sum(col("comp"))).head.getLong(0)

  /** Duplicate-cluster view over near-dup candidate `(a, b)` pairs:
    * `(doc_id, cluster_id, n_members)`, cluster_id = the canonical
    * (minimum) doc id of the cluster — the survivor a dedup pass keeps. */
  def clusters(pairs: DataFrame): DataFrame = {
    val comp = run(pairs)
    val sizes = comp.groupBy(col("comp")).agg(count(lit(1)).as("n_members"))
    comp.join(sizes, Seq("comp"))
      .select(col("id").as("doc_id"), col("comp").as("cluster_id"),
        col("n_members"))
      .orderBy(col("doc_id"))
  }
}
