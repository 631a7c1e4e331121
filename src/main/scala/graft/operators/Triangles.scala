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
}
