package graft.operators

import graft.Checkpoints
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** k-core decomposition over the undirected simple projection:
  * the maximal induced subgraph in which every node has degree ≥ k,
  * found by synchronous peeling (drop all nodes of current degree < k,
  * recompute, repeat to the fixed point).
  *
  * Fourth of the structural family ([[Triangles]], [[LinkPredict]],
  * [[LabelProp]]): core membership is the standard density tier for
  * graph sampling ("train on the 3-core"), spam-tail removal, and as a
  * cheap importance floor before the expensive kernels run.
  *
  * Parity shape: peeling is MONOTONE — once the edge set stops
  * shrinking, further rounds are identities. A SQL oracle therefore
  * unrolls a GENEROUS fixed round count and equals the Spark fixed
  * point exactly whenever convergence happens within the unroll; the
  * operator enforces that contract by failing loudly if `maxRounds` is
  * reached without convergence (a silent partial peel would
  * hash-mismatch the oracle in a way that looks like an engine bug).
  *
  * Scale shape per round: one partial-aggregating degree count plus two
  * left-semi joins of the edge list against the surviving-node set —
  * all equi-joins on node keys, no windows, no sorts; the edge list
  * shrinks monotonically and is checkpointed per round with the
  * superseded generation released, the kernel discipline. Convergence
  * is detected by edge-count equality, one cheap `count()` per round on
  * an already-materialized frame.
  */
object KCore {

  /** Nodes of the k-core with their within-core degree:
    * `(id, core_degree)`, empty when the k-core is empty. */
  def run(edges: DataFrame, k: Int, maxRounds: Int = 24): DataFrame =
    runOn(Triangles.undirected(edges), k, maxRounds)

  /** [[run]] over an already-built undirected projection (the
    * persisted [[StructuralIndex]] or any `(a, b)` simple edge set —
    * the peel materializes its own working copy, so the input may be
    * a lazy plan). Bit-equal to the from-scratch path; the
    * `*_indexed` gate shares its oracle verbatim. */
  def runOn(und: DataFrame, k: Int, maxRounds: Int = 24): DataFrame = {
    val e0 = Checkpoints.materialize(und.select(col("a"), col("b")))
    peel(e0, Triangles.degrees(e0), k, maxRounds)
  }

  /** The peel over a STABLE projection whose degrees are ALREADY
    * materialized — the persisted [[StructuralIndex]] fast path.
    * Round 0's degree aggregate over the full edge list is the peel's
    * single most expensive stage and is exactly what the index stores
    * (`deg` MUST be [[Triangles.degrees]] of `und` — the contract the
    * shared-oracle gates prove), so it is read, not recomputed; and
    * because the index buckets `und` by `a` and `deg` by `id` with
    * the shuffle-partition bucket count, round 0's `a`-side semi-join
    * starts co-partitioned on BOTH sides — the only exchange left in
    * round 0 is the edge list's `b`-side redistribution
    * (`CatalystSpec` pins the plan shape). `und` must be cheap to
    * re-scan (a table/parquet scan): round 0 reads it twice instead
    * of copying it through a checkpoint first. Later rounds shrink
    * and are checkpointed exactly as [[runOn]]; results are
    * bit-equal. */
  def runPreDegreed(und: DataFrame, deg: DataFrame, k: Int,
      maxRounds: Int = 24): DataFrame =
    peel(und.select(col("a"), col("b")),
      deg.select(col("id"), col("deg")), k, maxRounds)

  private def peel(e0: DataFrame, deg0: DataFrame, k: Int,
      maxRounds: Int): DataFrame = {
    require(k >= 1, s"need k >= 1, got $k")
    require(maxRounds >= 1, s"need maxRounds >= 1, got $maxRounds")
    var e = e0
    var deg = deg0 // == degrees(e) at every round boundary
    var n = e.count()
    // `rounds` counts SHRINKING rounds only: the pass that observes
    // `m == n` certifies convergence without consuming budget, so a
    // peel of exactly `maxRounds` shrinks succeeds — the same graphs
    // the oracle's `maxRounds`-deep unroll resolves (an unroll round
    // past the fixed point is an identity; an off-by-one here would
    // fail graphs the oracle handles).
    var rounds = 0
    var converged = n == 0L
    while (!converged) {
      val keep = deg.where(col("deg") >= k).select(col("id"))
      val next = Checkpoints.materialize(
        e.join(keep.withColumnRenamed("id", "a"), Seq("a"), "left_semi")
          .join(keep.withColumnRenamed("id", "b"), Seq("b"), "left_semi")
          .select(col("a"), col("b")))
      val m = next.count()
      if (m == n) { converged = true; Checkpoints.release(next) }
      else {
        require(rounds < maxRounds,
          s"k-core peel did not converge within $maxRounds shrinking " +
            "rounds (raise maxRounds; the SQL oracle unrolls the same " +
            "bound)")
        Checkpoints.release(e) // no-op when e is the stable round-0 input
        e = next; n = m; rounds += 1
        deg = Triangles.degrees(e)
      }
    }
    Triangles.degrees(e)
      .select(col("id"), col("deg").as("core_degree"))
  }

  /** WEIGHTED k-core: peel by weighted degree (strength = Σ incident
    * edge weights) instead of edge count — the "train on the
    * high-engagement core" variant, composable with the weighted
    * kernels that consume the same edge weights. A node survives while
    * its within-core strength ≥ `minStrength`; returns
    * `(id, core_strength)` (strength rounded to 6 decimals from the
    * exact micro-unit sum — see [[Triangles.undirectedWeighted]]).
    * Same monotone-peel parity contract and per-round scale shape as
    * [[run]]: the aggregate swaps from COUNT to an integer SUM,
    * nothing else moves. */
  def runWeighted(edges: DataFrame, minStrength: Double,
      maxRounds: Int = 24): DataFrame =
    runWeightedOn(Triangles.undirectedWeighted(edges), minStrength,
      maxRounds)

  /** [[runWeighted]] over an already-built weighted projection
    * `(a, b, wt)` (micro-unit weights). */
  def runWeightedOn(undW: DataFrame, minStrength: Double,
      maxRounds: Int = 24): DataFrame = {
    val e0 = Checkpoints.materialize(
      undW.select(col("a"), col("b"), col("wt")))
    peelWeighted(e0, Triangles.weightedDegrees(e0), minStrength, maxRounds)
  }

  /** The WEIGHTED peel over a stable projection whose strengths are
    * ALREADY materialized — [[runPreDegreed]]'s twin on the strength
    * axis (`wdeg` MUST be [[Triangles.weightedDegrees]] of `undW`, the
    * contract the shared-oracle gate proves; the persisted
    * [[StructuralIndex]] stores both aggregates in one degree
    * table). Same round-0 shape: the stored strengths replace the
    * full-edge-list aggregate and the bucketed `a`-side semi-join
    * starts co-partitioned. Bit-equal to [[runWeightedOn]]. */
  def runWeightedPreDegreed(undW: DataFrame, wdeg: DataFrame,
      minStrength: Double, maxRounds: Int = 24): DataFrame =
    peelWeighted(undW.select(col("a"), col("b"), col("wt")),
      wdeg.select(col("id"), col("wd")), minStrength, maxRounds)

  private def peelWeighted(e0: DataFrame, wdeg0: DataFrame,
      minStrength: Double, maxRounds: Int): DataFrame = {
    require(minStrength > 0, s"need minStrength > 0, got $minStrength")
    require(maxRounds >= 1, s"need maxRounds >= 1, got $maxRounds")
    val kMicro = math.round(minStrength * 1e6)
    var e = e0
    var wdeg = wdeg0 // == weightedDegrees(e) at every round boundary
    var n = e.count()
    var rounds = 0
    var converged = n == 0L
    while (!converged) {
      val keep = wdeg.where(col("wd") >= kMicro).select(col("id"))
      val next = Checkpoints.materialize(
        e.join(keep.withColumnRenamed("id", "a"), Seq("a"), "left_semi")
          .join(keep.withColumnRenamed("id", "b"), Seq("b"), "left_semi")
          .select(col("a"), col("b"), col("wt")))
      val m = next.count()
      if (m == n) { converged = true; Checkpoints.release(next) }
      else {
        require(rounds < maxRounds,
          s"weighted k-core peel did not converge within $maxRounds " +
            "shrinking rounds (raise maxRounds; the SQL oracle unrolls " +
            "the same bound)")
        Checkpoints.release(e) // no-op when e is the stable round-0 input
        e = next; n = m; rounds += 1
        wdeg = Triangles.weightedDegrees(e)
      }
    }
    Triangles.weightedDegrees(e)
      .select(col("id"),
        round(col("wd").cast("double") / lit(1e6), 6).as("core_strength"))
  }
}
