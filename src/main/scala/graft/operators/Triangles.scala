package graft.operators

import graft.Checkpoints
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Triangle counting and local clustering coefficients over the
  * undirected simple projection of a directed graph.
  *
  * Beyond-reference graph analytics (the reference stops at link-based
  * ranking; triangle counts are the standard next structural signal —
  * community density, spam-farm detection, clustering-coefficient
  * features for the same web-graph corpora the HITS/SALSA kernels
  * score).
  *
  * Algorithm: degree-oriented wedge join (the distributed form of
  * node-iterator++ / compact-forward). Each undirected edge is oriented
  * from its LOWER endpoint under the total order `(degree, id)`; wedges
  * are enumerated by self-joining the oriented edge list on its source
  * and closed by one more equi-join against the oriented edges. Every
  * triangle is found exactly once (at its lowest-order corner).
  *
  * Why this scales where the naive formulation dies: a node of degree d
  * emits `C(out-degree, 2)` wedge candidates. Without orientation a hot
  * hub (the defining feature of web/order graphs) emits O(d²) rows —
  * quadratic in exactly the key that is already skewed. Orientation
  * bounds every out-degree by O(√m) (a node can only point at
  * same-or-higher-degree neighbors, and there are at most 2√m nodes of
  * degree ≥ √m), so the wedge fan-out per node is O(m) total and the
  * hub CONSUMES wedges (as the closing endpoint, via a well-distributed
  * equi-join key) instead of producing them. All stages are equi-joins
  * and hash aggregates — partial-aggregated, AQE-splittable, no
  * cartesian surface anywhere.
  */
object Triangles {

  /** Canonical undirected simple edge set of a directed graph:
    * `(a, b)` with `a < b`, self-loops dropped, parallel and reversed
    * duplicates collapsed (one hash-repartition by pair). */
  def undirected(edges: DataFrame): DataFrame =
    edges.select(least(col("src"), col("dst")).as("a"),
        greatest(col("src"), col("dst")).as("b"))
      .where(col("a") =!= col("b"))
      .distinct()

  /** Undirected degree of every endpoint of an `(a, b)` edge frame:
    * `(id, deg)` — one partial-aggregating hash agg over both endpoint
    * columns. Shared by the whole structural family ([[Triangles]],
    * [[LinkPredict]], [[KCore]]). */
  def degrees(und: DataFrame): DataFrame =
    und.select(col("a").as("id"))
      .unionAll(und.select(col("b").as("id")))
      .groupBy("id").agg(count(lit(1)).as("deg"))

  /** Weighted canonical projection: `(a, b, wt)` with `a < b`,
    * self-loops dropped, and `wt` the MICRO-UNIT INTEGER sum of every
    * directed edge's weight between the endpoints (both directions,
    * parallel edges included — the natural strength of the collapsed
    * undirected edge). Integer micro-units because the strength later
    * crosses aggregation boundaries (per-node sums over triangles /
    * incident edges) where a double sum's addend order would differ
    * between engines; longs sum exactly in any order, the repo's
    * micro-unit discipline ([[graft.pipelines.Similarity.clusterReport]]).
    * Same shuffle shape as [[undirected]] — the `distinct` becomes a
    * hash agg on the identical key. */
  def undirectedWeighted(edges: DataFrame): DataFrame =
    edges.select(least(col("src"), col("dst")).as("a"),
        greatest(col("src"), col("dst")).as("b"),
        round(col("weight") * lit(1e6)).cast("long").as("wt"))
      .where(col("a") =!= col("b"))
      .groupBy(col("a"), col("b")).agg(sum(col("wt")).as("wt"))

  /** Weighted endpoint degree (strength) of an `(a, b, wt)` frame:
    * `(id, wd)` in micro-units — the weighted twin of [[degrees]],
    * shared with [[KCore.runWeightedOn]]. */
  def weightedDegrees(undW: DataFrame): DataFrame =
    undW.select(col("a").as("id"), col("wt"))
      .unionAll(undW.select(col("b").as("id"), col("wt")))
      .groupBy("id").agg(sum(col("wt")).as("wd"))

  /** Per-node triangle participation over the [[undirected]] projection:
    * `(id, triangles, clustering)` for every node with at least one
    * undirected edge, where `clustering` is the local clustering
    * coefficient `2·t / (deg·(deg−1))` (0 for degree-1 nodes), rounded
    * to `digits` decimals. The division is exact-integer double
    * division, so a DuckDB oracle reproduces it bit-identically.
    *
    * The undirected edge set and the oriented edge list are each
    * materialized once ([[Checkpoints.materialize]]) — both feed
    * multiple joins; callers release via [[Checkpoints.releaseAll]] on
    * the consumed result, like the iterative kernels. */
  def perNode(edges: DataFrame, digits: Int = 9): DataFrame = {
    val und = Checkpoints.materialize(undirected(edges))
    perNodeOn(und, degrees(und), digits)
  }

  /** [[perNode]] over an ALREADY-BUILT projection — the persisted
    * structural index ([[StructuralIndex]]) or any stable `(a, b)` /
    * `(id, deg)` pair. Caller contract: `und` must be cheap to
    * re-scan (a checkpoint or a parquet read — it feeds the degree
    * joins and the orientation), and `deg` must be EXACTLY
    * [[degrees]] of `und` (the clustering denominator and the
    * orientation order both read it). Bit-equal to [[perNode]]: ids
    * and integer degrees round-trip parquet exactly, so the
    * `*_indexed` gate shares the from-scratch oracle verbatim. */
  def perNodeOn(und: DataFrame, deg: DataFrame,
      digits: Int = 9): DataFrame = {
    // Orient each edge from its lower (deg, id) endpoint; carry the
    // destination's degree so wedge pairs can be ordered by the SAME
    // total order without re-joining degrees.
    val withDeg = und
      .join(deg.select(col("id").as("a"), col("deg").as("da")), Seq("a"))
      .join(deg.select(col("id").as("b"), col("deg").as("db")), Seq("b"))
    val lowFirst = col("da") < col("db") ||
      (col("da") === col("db") && col("a") < col("b"))
    val oriented = Checkpoints.materialize(withDeg.select(
      when(lowFirst, col("a")).otherwise(col("b")).as("u"),
      when(lowFirst, col("b")).otherwise(col("a")).as("v"),
      when(lowFirst, col("db")).otherwise(col("da")).as("dv")))

    // Wedges centered at u, endpoints ordered by (deg, id); a triangle
    // {u,v,w} with ord(u)<ord(v)<ord(w) is found exactly once, as the
    // wedge v<-u->w closed by the oriented edge v->w.
    val wedges = oriented
      .join(oriented.select(col("u"), col("v").as("w"), col("dv").as("dw")),
        Seq("u"))
      .where(col("dv") < col("dw") ||
        (col("dv") === col("dw") && col("v") < col("w")))
    val tri = wedges
      .join(oriented.select(col("u").as("v"), col("v").as("w")), Seq("v", "w"))
      .select(col("u"), col("v"), col("w"))

    val counts = tri
      .select(explode(array(col("u"), col("v"), col("w"))).as("id"))
      .groupBy("id").agg(count(lit(1)).as("t"))
    deg.join(counts, Seq("id"), "left")
      .select(col("id"),
        coalesce(col("t"), lit(0L)).as("triangles"),
        round(when(col("deg") >= 2,
            (lit(2L) * coalesce(col("t"), lit(0L))).cast("double") /
              (col("deg") * (col("deg") - lit(1L))).cast("double"))
          .otherwise(lit(0.0)), digits).as("clustering"))
  }

  /** Corpus-derived DOULION sampling rate — the
    * `autoBits`/`autoNlist`/`autoTables` sizing discipline on the
    * triangle axis (VERDICT r18 missing #5: the scaladoc's own "pick p
    * per corpus size" rule, now derived instead of hand-set): `p`
    * HALVES for every 8× the undirected edge count grows past
    * `baseEdges`, i.e. `p ∝ m^(-1/3)`, so under a roughly
    * corpus-stable triangle-per-edge density the EXPECTED SAMPLED
    * TRIANGLE COUNT `T·p³ ∝ m·p³` stays put (in the thousands at the
    * gate corpora — the variance the estimator carries is then
    * scale-invariant) while sampled edge work `m·p` grows only as
    * `m^(2/3)`. Clamped to [1, 1000]; at or below `baseEdges` the
    * sample degenerates to the exact count. The thresholds are exact
    * integers (`baseEdges·8^i`), so the DuckDB twin replays the
    * derivation as `count(*)` comparisons — the
    * [[graft.pipelines.HyperplaneLsh.tableActivation]] discipline. */
  def autoPPermille(edgeCount: Long, baseEdges: Long = 16384): Int = {
    require(baseEdges >= 1, s"baseEdges must be >= 1, got $baseEdges")
    var p = 1000
    var t = baseEdges
    while (edgeCount > t && p > 1) { p = math.max(1, p >> 1); t = t * 8 }
    p
  }

  /** DOULION-style approximate GLOBAL triangle count: every undirected
    * edge survives with probability `pPermille`/1000 under a
    * deterministic hash gate (`graft_hash(a || '|' || b ||
    * '|trisample') ‰` — the engine-portable coin every other sampler
    * here uses, so the DuckDB twin replays the exact same subgraph),
    * triangles are counted on the sampled subgraph with the SAME
    * degree-oriented wedge join as [[perNode]], and the count is
    * scaled by `(1000/p)³` (each triangle survives iff all three
    * edges do — probability p³; the estimator is unbiased, Tsourakakis
    * et al.'s DOULION).
    *
    * This is the triangle family's 100 TB cheap rung, the analogue of
    * the ANN ladder's sampled stages: edge work drops by p, wedge work
    * by ~p², closing-join work by ~p³. The trade is variance
    * (∝ 1/p³ around the true count): `pPermille <= 0` (the default)
    * DERIVES p from the corpus's undirected edge count
    * ([[autoPPermille]] — expected sampled triangles ~constant as the
    * corpus grows), the same one-cheap-count contract as every other
    * derived knob here; an explicit `pPermille` is honored verbatim.
    * `pPermille = 1000` (and the derived value on a ≤`baseEdges`
    * corpus) degenerates to the exact count (spec-asserted).
    *
    * Output, one row: `(p_permille, sampled_edges, sampled_triangles,
    * triangles_est)` — all integers (the sampled-sum division by 3 is
    * INTEGER `div`, exact since each triangle contributes 3 — ADVICE
    * r18: `Column./` is IEEE double division, which would silently
    * truncate past 2^53) except the rounded estimate, so the gate is
    * deterministic cross-engine. */
  def approxCount(edges: DataFrame, pPermille: Int = 0): DataFrame = {
    require(pPermille <= 1000,
      s"pPermille must be <= 1000 (or <= 0 to derive), got $pPermille")
    val spark = edges.sparkSession
    val und = Checkpoints.materialize(undirected(edges))
    val p = if (pPermille > 0) pPermille else autoPPermille(und.count())
    val gate = graft.functions.GraftHash.graftHash(spark,
      concat(col("a"), lit("|"), col("b"), lit("|trisample"))) % 1000
    val samp =
      if (p >= 1000) und
      else {
        val s = Checkpoints.materialize(und.filter(gate < p))
        Checkpoints.release(und)
        s
      }
    val scale = 1000.0 / p
    // each triangle contributes 3 to the per-node sum; both aggregates
    // are single-row, so the crossJoin is a broadcast scalar attach
    val tri = perNodeOn(samp, degrees(samp))
      .agg(expr("coalesce(sum(triangles), bigint(0)) div 3")
        .as("sampled_triangles"))
    samp.agg(count(lit(1)).as("sampled_edges"))
      .crossJoin(tri)
      .select(lit(p).as("p_permille"), col("sampled_edges"),
        col("sampled_triangles"),
        round(col("sampled_triangles").cast("double") *
          lit(scale * scale * scale), 6).as("triangles_est"))
  }

  /** Weighted triangle strength per node: `(id, triangles, strength)`
    * for every node of the projection, where `strength` is the sum
    * over the node's triangles of the three edge weights
    * (micro-unit-exact until the final division — see
    * [[undirectedWeighted]]), rounded to `digits`. The count column is
    * a free cross-check against [[perNode]] (identical topology).
    *
    * Same degree-oriented wedge join as [[perNode]] — the orientation
    * order is the UNWEIGHTED (degree, id) total order, so the O(√m)
    * out-degree bound and the hubs-consume-wedges property carry over
    * verbatim; weights just ride the oriented edges (one long per row)
    * and meet at the closing join. Makes the structural family
    * composable with the weighted HITS/SALSA gates, which consume the
    * same edge weights. */
  def perNodeWeighted(edges: DataFrame, digits: Int = 6): DataFrame = {
    val undW = Checkpoints.materialize(undirectedWeighted(edges))
    perNodeWeightedOn(undW, degrees(undW), digits)
  }

  /** [[perNodeWeighted]] over an already-built weighted projection —
    * caller contract as [[perNodeOn]] (`undW` stable `(a, b, wt)`,
    * `deg` exactly [[degrees]] of it). */
  def perNodeWeightedOn(undW: DataFrame, deg: DataFrame,
      digits: Int = 6): DataFrame = {
    val withDeg = undW
      .join(deg.select(col("id").as("a"), col("deg").as("da")), Seq("a"))
      .join(deg.select(col("id").as("b"), col("deg").as("db")), Seq("b"))
    val lowFirst = col("da") < col("db") ||
      (col("da") === col("db") && col("a") < col("b"))
    val oriented = Checkpoints.materialize(withDeg.select(
      when(lowFirst, col("a")).otherwise(col("b")).as("u"),
      when(lowFirst, col("b")).otherwise(col("a")).as("v"),
      when(lowFirst, col("db")).otherwise(col("da")).as("dv"),
      col("wt")))
    val wedges = oriented
      .join(oriented.select(col("u"), col("v").as("w"), col("dv").as("dw"),
        col("wt").as("wt2")), Seq("u"))
      .where(col("dv") < col("dw") ||
        (col("dv") === col("dw") && col("v") < col("w")))
    val tri = wedges
      .join(oriented.select(col("u").as("v"), col("v").as("w"),
        col("wt").as("wt3")), Seq("v", "w"))
      .select(col("u"), col("v"), col("w"),
        (col("wt") + col("wt2") + col("wt3")).as("twt"))
    val counts = tri
      .select(explode(array(col("u"), col("v"), col("w"))).as("id"),
        col("twt"))
      .groupBy("id").agg(count(lit(1)).as("t"), sum(col("twt")).as("s"))
    deg.join(counts, Seq("id"), "left")
      .select(col("id"),
        coalesce(col("t"), lit(0L)).as("triangles"),
        round(coalesce(col("s"), lit(0L)).cast("double") / lit(1e6),
          digits).as("strength"))
  }
}
