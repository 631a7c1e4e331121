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

  /** WEIGHTED link prediction — the strength-aware member of the
    * weighted structural quartet ([[Triangles.perNodeWeighted]],
    * [[KCore.runWeighted]], [[LabelProp.runWeighted]]): evidence for a
    * missing edge counts HOW STRONGLY the pair is wired through each
    * shared neighbor, not merely that it is. Two scores per candidate
    * pair (src < dst, non-adjacent, centers capped exactly as
    * [[topCandidates]]):
    *  - `common_strength` = Σ over common neighbors c of
    *    `min(wt(src,c), wt(dst,c))` — the bottleneck strength of each
    *    two-hop path, summed as MICRO-UNIT INTEGERS (addend-order-free,
    *    the [[Triangles.undirectedWeighted]] discipline) so the primary
    *    ranking key is exact cross-engine;
    *  - `adamic_adar_weighted` = Σ over c of `1 / ln(1 + strength(c))`
    *    where `strength(c)` is c's weighted degree in original units —
    *    the Adamic–Adar inverse-log discount applied to engagement
    *    mass instead of neighbor count (the `1 +` keeps the log
    *    positive for sub-unit strengths; on this family's graphs
    *    strengths are ≫ 1 so the shift is a vanishing perturbation).
    * Ordered (common_strength desc, rounded weighted-AA desc, ids) —
    * the integer micro-unit sum leads, so the order is deterministic
    * up to the rounded-double tiebreak, the [[topCandidates]] parity
    * argument. Same scale shape: the unweighted-degree cap bounds the
    * wedge fan-out; weights ride the adjacency rows (two longs). */
  def topCandidatesWeighted(edges: DataFrame, k: Int = 20,
      maxCenterDegree: Long = 64, digits: Int = 6): DataFrame = {
    val undW = Checkpoints.materialize(Triangles.undirectedWeighted(edges))
    topCandidatesWeightedOn(undW, Triangles.degrees(undW), k,
      maxCenterDegree, digits)
  }

  /** [[topCandidatesWeighted]] over an already-built WEIGHTED
    * projection (the persisted [[StructuralIndex]] or any stable
    * `(a, b, wt)` frame) — caller contract as [[topCandidatesOn]];
    * `deg` is the UNWEIGHTED [[Triangles.degrees]] of it (the cap is
    * topological, identical to the unweighted operator's). Bit-equal
    * to the from-scratch path; the `*_indexed` gate shares its oracle
    * verbatim. */
  def topCandidatesWeightedOn(undW: DataFrame, deg: DataFrame,
      k: Int = 20, maxCenterDegree: Long = 64,
      digits: Int = 6): DataFrame = {
    val wdeg = Triangles.weightedDegrees(undW)
    // Symmetric weighted adjacency restricted to capped centers; the
    // center's weighted degree (wc) rides along so the discount term
    // needs no later join back.
    val adj = Checkpoints.materialize(
      undW.select(col("a").as("c"), col("b").as("n"), col("wt"))
        .unionAll(undW.select(col("b").as("c"), col("a").as("n"), col("wt")))
        .join(deg.select(col("id").as("c"), col("deg").as("dc")), Seq("c"))
        .where(col("dc") <= maxCenterDegree)
        .join(wdeg.select(col("id").as("c"), col("wd").as("wc")), Seq("c")))
    val pairs = adj
      .join(adj.select(col("c"), col("n").as("n2"), col("wt").as("wt2")),
        Seq("c"))
      .where(col("n") < col("n2"))
      .select(col("n").as("src"), col("n2").as("dst"),
        least(col("wt"), col("wt2")).as("mw"), col("wc"))
    val scored = pairs.groupBy("src", "dst").agg(
      count(lit(1)).as("common_neighbors"),
      sum(col("mw")).as("cs_micro"),
      sum(lit(1.0) /
        log(lit(1.0) + col("wc").cast("double") / lit(1e6))).as("waa"))
    scored
      .join(undW.select(col("a").as("src"), col("b").as("dst")),
        Seq("src", "dst"), "left_anti")
      .orderBy(col("cs_micro").desc, round(col("waa"), digits).desc,
        col("src"), col("dst"))
      .limit(k)
      .select(col("src"), col("dst"), col("common_neighbors"),
        round(col("cs_micro").cast("double") / lit(1e6), digits)
          .as("common_strength"),
        round(col("waa"), digits).as("adamic_adar_weighted"))
  }
}
