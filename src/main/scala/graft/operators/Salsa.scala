package graft.operators

import graft.{Checkpoints, Graph}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** SALSA kernel family, K7-K12 of SURVEY.md §2.6.
  *
  * Two shapes exist in the reference:
  *  - "simplified" SALSA (non-iterative): hub score = out-degree / Σ
  *    out-degrees, authority = in-degree / Σ in-degrees
  *    (reference `src/base_salsa.py:37-45`), optionally with weighted
  *    degrees (`src/weighted_salsa.py:41-42`);
  *  - iterative "mutual update" SALSA: h(a) = Σ_{(a,b)} auth(b)/indeg(b),
  *    a(b) = Σ_{(a,b)} hub(a)/outdeg(a), authorities from the fresh hubs,
  *    L1 normalization each iteration, init 1/√N
  *    (reference `src/base_salsa_2.py:71-84`), with teleport / topic
  *    variants mirroring the HITS ones but with `(1-beta)/(2N)` mass
  *    (`src/random_teleport_salsa.py:74-80`,
  *    `src/topic_specific_salsa.py:79-96`).
  *
  * Degrees are always computed on the FULL edge set passed in, and the
  * per-edge division uses the degree of the score-contributing endpoint
  * (in-degree of dst for the hub update, out-degree of src for the
  * authority update) — exactly the reference's keyed-tuple layout
  * (`src/base_salsa_2.py:20-23`).
  */
object Salsa {

  final case class Result(hubs: DataFrame, auths: DataFrame)

  /** K7 simplified SALSA: degree mass, L1-normalized. Integer degree
    * counts divide as doubles, matching Python true division. */
  def runSimplified(edges: DataFrame): Result = Result(
    Normalize.l1(Degrees.out(edges)
      .select(col("id"), col("out_degree").cast("double").as("score"))),
    Normalize.l1(Degrees.in(edges)
      .select(col("id"), col("in_degree").cast("double").as("score"))))

  /** K9 weighted simplified SALSA: Σ weight instead of counts. */
  def runWeightedSimplified(edges: DataFrame): Result = Result(
    Normalize.l1(Degrees.outWeighted(edges)
      .select(col("id"), col("out_degree").as("score"))),
    Normalize.l1(Degrees.inWeighted(edges)
      .select(col("id"), col("in_degree").as("score"))))

  /** K8 iterative SALSA (rank-equivalent to K7; reference
    * `src/base_salsa_2.py:1-2`). */
  def run(g: Graph, numIter: Int = 8): Result =
    iterate(initUniform(g.nodes), g.edges, numIter, Hits.Identity)

  /** K10 random-teleport SALSA: `beta*s + (1-beta)/(2N)` applied to every
    * aggregated node, hubs first (reference `src/random_teleport_salsa.py:70-85`). */
  def runTeleport(g: Graph, beta: Double = 0.8, numIter: Int = 8): Result = {
    val n = g.nodes.count()
    iterate(initUniform(g.nodes), g.edges, numIter, Hits.Teleport(beta, 2L * n))
  }

  /** K11 topic-specific SALSA: init 0 for non-topic nodes and
    * 1/(2·N_topic) for topic nodes (reference
    * `src/topic_specific_salsa.py:23`), conditional `(1-beta)/(2·N_topic)`
    * teleport each update. */
  def runTopicSpecific(g: Graph, topic: String, beta: Double = 0.8,
      numIter: Int = 8): Result = {
    val flags = Hits.prepFlags(g, topic)
    val nTopic = flags.filter(col("flag") === 1).count()
    val init = flags.select(col("id"),
      when(col("flag") === 0, lit(0.0))
        .otherwise(lit(1.0 / (2.0 * nTopic))).as("score"))
    val r = iterate(init, g.edges, numIter,
      Hits.TopicTeleport(beta, 2L * nTopic, flags))
    flags.unpersist(false)
    r
  }

  /** K12 query-dependent SALSA: simplified SALSA on the neighborhood
    * subgraph (reference `src/query_dependent_salsa.py:36-55`). The
    * subgraph's semi/anti-join edge derivation is persisted so the two
    * degree aggregations (out + in) execute it once, not twice; both
    * score vectors are materialized before the cache drops. */
  def runQueryDependent(g: Graph, topic: String): Result = {
    val e = Subgraph.queryDependent(g, topic).edges.persist()
    try {
      val r = runSimplified(e)
      val out =
        Result(Checkpoints.materialize(r.hubs), Checkpoints.materialize(r.auths))
      // The re-materialized copies supersede iterate's final checkpoints;
      // release those now rather than leaving two |V|-sized blocks to the
      // GC-timed ContextCleaner path.
      Checkpoints.releaseAll(r.hubs)
      Checkpoints.releaseAll(r.auths)
      out
    } finally e.unpersist(false)
  }

  /** Fixed-point extension mirroring [[Hits.runConverged]] (the
    * reference always runs a fixed 8 iterations — `src/base_salsa_2
    * .py:71-84`): iterate the K8 mutual update until the max absolute
    * change of the L1-normalized authority vector drops below `tol`.
    * Same edge-cache discipline as [[iterate]] (edges shuffled once per
    * run, degree joins co-partitioned), plus one |V|-sized full-outer
    * delta join per CHECKED iteration — checks run on the
    * `firstCheck/checkEvery` schedule (see [[PageRank.runConverged]]
    * for the rationale); the kernel may overrun the true fixed point
    * by < `checkEvery` no-op refinements and reports the iterations
    * actually executed. The returned [[graft.Fixpoint]] carries an
    * explicit `converged` flag — false = capped at `maxIter` without
    * a sub-`tol` delta. */
  def runConverged(g: Graph, tol: Double = 1e-9,
      maxIter: Int = 50, checkEvery: Int = 3, firstCheck: Int = 3)
      : graft.Fixpoint[Result] = {
    require(checkEvery >= 1 && firstCheck >= 1,
      s"need positive check schedule, got every=$checkEvery first=$firstCheck")
    val spark = g.edges.sparkSession
    val np = spark.conf.get("spark.sql.shuffle.partitions").toInt
    val eBase = g.edges.select(col("src"), col("dst"))
      .repartition(np, col("dst")).persist()
    val dIn = Degrees.in(eBase).hint("SHUFFLE_HASH")
    val eIn = eBase.join(dIn, eBase("dst") === dIn("id"))
      .select(col("src"), col("dst"), col("in_degree")).persist()
    val dOut = Degrees.out(eBase).hint("SHUFFLE_HASH")
    val eOut = eBase.repartition(np, col("src"))
      .join(dOut, col("src") === dOut("id"))
      .select(col("src"), col("dst"), col("out_degree")).persist()
    val init = initUniform(g.nodes)

    try {
      var hubs = init
      var auths = init
      var prev: Option[DataFrame] = None
      var ck2: DataFrame = null // checkpoint superseded two iterations back
      var it = 0
      var done = false
      while (it < maxIter && !done) {
        it += 1
        // Same materialization discipline as Hits.runConverged: only the
        // normalized auth vector is checkpointed each iteration; the hub
        // subtree stays lazy inside it. The auth update consumes the
        // UN-normalized fresh hubs (matching iterate / the reference's
        // update order); normalization applies to the carried vectors.
        val a0 = auths.hint("SHUFFLE_HASH")
        val hubsU = eIn.join(a0, eIn("dst") === a0("id"))
          .groupBy(eIn("src").as("id"))
          .agg(sum(col("score") / col("in_degree")).as("score"))
        val h0 = hubsU.hint("SHUFFLE_HASH")
        val authsU = eOut.join(h0, eOut("src") === h0("id"))
          .groupBy(eOut("dst").as("id"))
          .agg(sum(col("score") / col("out_degree")).as("score"))
        hubs = Normalize.l1(hubsU)
        val cur = Checkpoints.materializeKeyed(Normalize.l1(authsU))
        if (it >= firstCheck && (it - firstCheck) % checkEvery == 0)
            prev.foreach { p =>
          // Co-partitioned full-outer delta join — see Hits.runConverged.
          val delta = cur.as("c")
            .join(p.as("p").hint("SHUFFLE_HASH"),
              col("c.id") === col("p.id"), "full_outer")
            .select(abs(coalesce(col("c.score"), lit(0.0)) -
              coalesce(col("p.score"), lit(0.0))).as("d"))
            .agg(coalesce(max(col("d")), lit(0.0))).head.getDouble(0)
          if (delta < tol) done = true
        }
        if (ck2 != null) Checkpoints.release(ck2)
        ck2 = prev.orNull
        prev = Some(cur)
        auths = cur
      }
      // Materialize the lazy hub plan before the edge caches drop; the
      // it-1 auth checkpoint it hung off becomes unreachable then.
      val h = Checkpoints.materialize(hubs)
      if (ck2 != null) Checkpoints.release(ck2)
      graft.Fixpoint(Result(h, auths), it, done)
    } finally {
      eIn.unpersist(false)
      eOut.unpersist(false)
      eBase.unpersist(false)
    }
  }

  // -----------------------------------------------------------------

  private def initUniform(nodes: DataFrame): DataFrame = {
    val n = nodes.count()
    nodes.select(col("id"), lit(1.0 / math.sqrt(n)).as("score"))
  }

  /** K8 over a [[graft.GraphIO.writeBucketedGraph]] layout — the SALSA
    * twin of [[Hits.runBucketed]]: both edge tables come back from the
    * catalog hash-clustered on their join key, so the degree
    * aggregations, the degree-attach joins AND the per-iteration score
    * joins all plan with ZERO edge-side Exchange. Scores are identical
    * to [[run]] (same loop, same init). */
  def runBucketed(spark: org.apache.spark.sql.SparkSession, prefix: String,
      numIter: Int = 8): Result = {
    Hits.requireBucketAligned(spark, prefix)
    def edges(table: String): DataFrame =
      spark.table(table).select(col("src"), col("dst"))
    // Persisting keeps the parquet scan out of the loop; the
    // InMemoryRelation reports the bucketed scan's partitioning.
    val eDstB = edges(s"${prefix}_edges_by_dst").persist()
    val eSrcB = edges(s"${prefix}_edges_by_src").persist()
    try loopDeg(initUniform(spark.table(s"${prefix}_nodes")),
      eDstB, eSrcB, numIter, Hits.Identity)
    finally {
      eDstB.unpersist(false)
      eSrcB.unpersist(false)
    }
  }

  /** `post` reuses the HITS transforms; for SALSA the teleport `n` slot
    * carries 2N / 2·N_topic (the reference's denominators). */
  private def iterate(init: DataFrame, edges: DataFrame, numIter: Int,
      post: Hits.Post): Result = {
    val spark = edges.sparkSession
    val np = spark.conf.get("spark.sql.shuffle.partitions").toInt
    // The upstream edge derivation (union of three projections; for K12
    // also the subgraph semi/anti joins) runs exactly ONCE into `eBase`;
    // both degree-annotated copies and both degree aggregations derive
    // from the cache — the mirror of the Hits.iterate eSrc-from-eDst fix.
    val eBase = edges.select(col("src"), col("dst"))
      .repartition(np, col("dst")).persist()
    try loopDeg(init, eBase, eBase.repartition(np, col("src")), numIter, post)
    finally eBase.unpersist(false)
  }

  /** The shared degree-annotated kernel loop over pre-co-partitioned
    * edge copies (`eDstBase` clustered on dst, `eSrcBase` on src, both
    * `(src, dst)`). Each degree aggregation groups by its base's
    * clustering key and each degree-attach join matches it, so neither
    * adds an edge Exchange; per iteration only the fresh |V|-sized
    * score vector shuffles. SHUFFLE_HASH hints on the (small) degree /
    * score sides keep the joins hash-based without touching
    * session-wide planner flags. */
  private def loopDeg(init: DataFrame, eDstBase: DataFrame,
      eSrcBase: DataFrame, numIter: Int, post: Hits.Post): Result = {
    val dIn = Degrees.in(eDstBase).hint("SHUFFLE_HASH")
    val eIn = eDstBase.join(dIn, eDstBase("dst") === dIn("id"))
      .select(col("src"), col("dst"), col("in_degree")).persist()
    val dOut = Degrees.out(eSrcBase).hint("SHUFFLE_HASH")
    val eOut = eSrcBase.join(dOut, col("src") === dOut("id"))
      .select(col("src"), col("dst"), col("out_degree")).persist()

    try {
      var hubs = init
      var auths = init
      var prevCk: DataFrame = null
      for (i <- 1 to numIter) {
        // Hub side checkpointed only on the final iteration — see
        // Hits.iterate: intermediate hubs are consumed solely by the auth
        // update within the same job.
        // Per-join SHUFFLE_HASH hints — see Hits.loop.
        val a0 = auths.hint("SHUFFLE_HASH")
        val hubsRaw = applyPost(
          eIn.join(a0, eIn("dst") === a0("id"))
            .groupBy(eIn("src").as("id"))
            .agg(sum(col("score") / col("in_degree")).as("score")),
          post)
        val hubsU = if (i == numIter) Checkpoints.materializeKeyed(hubsRaw)
          else hubsRaw
        val h0 = hubsU.hint("SHUFFLE_HASH")
        val authsU = Checkpoints.materializeKeyed(applyPost(
          eOut.join(h0, eOut("src") === h0("id"))
            .groupBy(eOut("dst").as("id"))
            .agg(sum(col("score") / col("out_degree")).as("score")),
          post))
        // Previous iteration's auth checkpoint is now unreachable —
        // release its blocks eagerly (see [[graft.Checkpoints]]).
        if (prevCk != null) Checkpoints.release(prevCk)
        prevCk = authsU
        hubs = Normalize.l1(hubsU)
        auths = Normalize.l1(authsU)
      }
      Result(hubs, auths)
    } finally {
      // Drop the caches even if an action inside the (eager) loop
      // throws — no leaked session state.
      eIn.unpersist(false)
      eOut.unpersist(false)
    }
  }

  // Teleport arithmetic is shared with HITS (the 2N / 2N_topic factors
  // are baked into the constructor arguments by the callers above).
  private def applyPost(scores: DataFrame, post: Hits.Post): DataFrame =
    Hits.applyPost(scores, post)
}
