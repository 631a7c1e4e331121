package graft.operators

import graft.Checkpoints
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Semi-supervised label propagation over the undirected simple
  * projection: sparse seed labels spread to unlabeled nodes by
  * deterministic neighbor majority.
  *
  * Beyond-reference graph analytics, third of the structural family
  * ([[Triangles]], [[LinkPredict]]): the training-data use is
  * propagating a label known for a FEW documents (human-rated quality,
  * verified domain, license class) across a similarity/citation graph
  * to the rest of the corpus.
  *
  * Semantics (synchronous, clamped, k fixed iterations — chosen so a
  * SQL oracle can unroll them exactly):
  *  - labeled nodes NEVER change (seed clamping);
  *  - each iteration, every still-unlabeled node takes the most frequent
  *    label among its LABELED neighbors, ties broken by label ascending
  *    — a total, deterministic rule (no random tie-break, unlike
  *    classic LPA, whose nondeterminism would make cross-engine parity
  *    meaningless);
  *  - nodes with no labeled neighbor stay unlabeled this iteration.
  *
  * Scale shape: per iteration, one equi-join of the symmetric edge list
  * against the |V|-sized label vector, a partial-aggregating
  * `(node, label)` count, and a per-node argmax window whose partitions
  * are bounded by the DISTINCT LABEL count (not by degree — the
  * count aggregation collapses a hot node's votes map-side first).
  * Same per-iteration discipline as the kernels: the label vector is
  * checkpointed each round and the superseded one released.
  */
object LabelProp {

  /** Propagate `seeds(id, label)` over `edges(src, dst, *)` for `iters`
    * synchronous rounds; returns `(id, label)` for every node of the
    * undirected simple projection, label null if never reached. */
  def run(spark: SparkSession, edges: DataFrame, seeds: DataFrame,
      iters: Int): DataFrame =
    runOn(spark, Triangles.undirected(edges), seeds, iters)

  /** [[run]] over an already-built undirected projection (the
    * persisted [[StructuralIndex]] or any `(a, b)` simple edge set —
    * the symmetric neighbor list is materialized internally, so the
    * input may be a lazy plan). Bit-equal to the from-scratch path;
    * the `*_indexed` gate shares its oracle verbatim. */
  def runOn(spark: SparkSession, undIn: DataFrame, seeds: DataFrame,
      iters: Int): DataFrame = {
    require(iters >= 0, s"need iters >= 0, got $iters")
    val und = Checkpoints.materialize(undIn)
    // symmetric neighbor list: votes flow both ways across each edge
    val nbrs = Checkpoints.materialize(
      und.select(col("a").as("src"), col("b").as("id"))
        .unionAll(und.select(col("b").as("src"), col("a").as("id"))))
    Checkpoints.release(und) // nbrs is materialized; und has no other use
    val nodes = nbrs.select(col("id")).distinct()
    var lab = Checkpoints.materialize(
      nodes.join(seeds, Seq("id"), "left")
        .select(col("id"), col("label")))
    val byVotes = Window.partitionBy(col("id"))
      .orderBy(col("c").desc, col("label"))
    (0 until iters).foreach { _ =>
      // Votes only matter for still-unlabeled destinations (clamping
      // discards the rest), so gate the aggregate's input on them — the
      // per-round work shrinks as coverage grows, same output.
      val votes = nbrs
        .join(lab.where(col("label").isNull).select(col("id")),
          Seq("id"), "left_semi")
        .join(lab.where(col("label").isNotNull)
          .select(col("id").as("src"), col("label")), Seq("src"))
        .groupBy(col("id"), col("label"))
        .agg(count(lit(1)).as("c"))
      val best = votes
        .select(col("id"), col("label"), row_number().over(byVotes).as("rn"))
        .where(col("rn") === 1)
        .select(col("id"), col("label").as("vote"))
      val next = Checkpoints.materialize(
        lab.join(best, Seq("id"), "left")
          .select(col("id"), coalesce(col("label"), col("vote")).as("label")))
      Checkpoints.release(lab)
      lab = next
    }
    // lab is itself a checkpoint, so the caller's releaseAll on the
    // result can never reach nbrs — free it here (the kernel
    // discipline: no block set may outlive its last consumer).
    Checkpoints.release(nbrs)
    lab
  }
}
