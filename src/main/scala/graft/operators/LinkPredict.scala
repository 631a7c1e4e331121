package graft.operators

import graft.Checkpoints
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Link-prediction candidate scoring over the undirected simple
  * projection: common-neighbor counts and Adamic–Adar weights for
  * non-adjacent node pairs.
  *
  * Beyond-reference graph analytics, same family as [[Triangles]]: the
  * reference ranks existing nodes; link prediction ranks MISSING edges
  * — the standard graph-feature generator for recommendation and
  * knowledge-graph-completion training data.
  *
  * Scale shape: a candidate pair is a wedge (two nodes sharing a
  * neighbor), so the driver of cost is Σ C(deg(center), 2) — inherently
  * quadratic in hub degree. Unlike triangle counting there is no
  * orientation trick: the pair set itself is the quadratic object. The
  * production answer (and ours) is a CENTER-DEGREE CAP: wedges are only
  * generated through centers of degree ≤ `maxCenterDegree`. That is the
  * exact semantics, not a sampling fudge — a super-hub center
  * contributes `1/ln(deg)` ≈ nothing to each of its O(d²) pairs, so the
  * cap removes the quadratic surface while changing scores only in the
  * low-signal tail; the cap value is part of the operator contract and
  * the oracle mirrors it. Everything else is equi-joins and one hash
  * aggregate on the pair key.
  */
object LinkPredict {

  /** Top-`k` non-adjacent pairs by `(common neighbors, Adamic–Adar)`
    * evidence through centers of degree ≤ `maxCenterDegree`:
    * `(src, dst, common_neighbors, adamic_adar)`, `src < dst`,
    * deterministically ordered (count desc, rounded score desc, ids).
    *
    * Adamic–Adar = Σ over common neighbors c of `1 / ln(deg(c))`;
    * centers of degree 1 form no pairs, so `ln` never sees 1. The score
    * is rounded to `digits` decimals on both engines — summation-order
    * double noise (~1e-15) sits far below the rounding step, the same
    * parity argument as the HITS round-6 gates. */
  def topCandidates(edges: DataFrame, k: Int = 20,
      maxCenterDegree: Long = 64, digits: Int = 6): DataFrame = {
    val und = Checkpoints.materialize(Triangles.undirected(edges))
    topCandidatesOn(und, Triangles.degrees(und), k, maxCenterDegree, digits)
  }

  /** [[topCandidates]] over an already-built projection (the persisted
    * [[StructuralIndex]] or any stable `(a, b)` / `(id, deg)` pair).
    * Caller contract as [[Triangles.perNodeOn]]: `und` cheap to
    * re-scan (it feeds the adjacency build and the final
    * already-an-edge anti-join), `deg` exactly
    * [[Triangles.degrees]](und). Bit-equal to the from-scratch path —
    * the `*_indexed` gate shares its oracle verbatim. */
  def topCandidatesOn(und: DataFrame, deg: DataFrame, k: Int = 20,
      maxCenterDegree: Long = 64, digits: Int = 6): DataFrame = {
    // Symmetric adjacency restricted to capped centers; dc rides along
    // so the Adamic-Adar term needs no later join back to degrees.
    val adj = Checkpoints.materialize(
      und.select(col("a").as("c"), col("b").as("n"))
        .unionAll(und.select(col("b").as("c"), col("a").as("n")))
        .join(deg.select(col("id").as("c"), col("deg").as("dc")), Seq("c"))
        .where(col("dc") <= maxCenterDegree))

    // Each unordered neighbor pair once per center (n < n2), then one
    // hash agg on the pair key; the cap bounds the self-join fan-out.
    val pairs = adj
      .join(adj.select(col("c"), col("n").as("n2")), Seq("c"))
      .where(col("n") < col("n2"))
      .select(col("n").as("src"), col("n2").as("dst"), col("dc"))
    val scored = pairs.groupBy("src", "dst").agg(
      count(lit(1)).as("common_neighbors"),
      sum(lit(1.0) / log(col("dc").cast("double"))).as("aa"))

    // Predict NEW links only: drop pairs that are already edges.
    scored
      .join(und.select(col("a").as("src"), col("b").as("dst")),
        Seq("src", "dst"), "left_anti")
      .select(col("src"), col("dst"), col("common_neighbors"),
        round(col("aa"), digits).as("adamic_adar"))
      .orderBy(col("common_neighbors").desc, col("adamic_adar").desc,
        col("src"), col("dst"))
      .limit(k)
  }
}
