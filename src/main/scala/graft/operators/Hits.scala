package graft.operators

import graft.{Checkpoints, Graph}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** HITS (Kleinberg hubs & authorities) kernel family, K1-K6 of SURVEY.md §2.6.
  *
  * Parity-critical semantics preserved from the reference:
  *  - Gauss-Seidel ordering: hubs are updated from the *old* authorities,
  *    authorities from the *new, not-yet-normalized* hubs
  *    (reference `src/base_hits.py:57-60`).
  *  - Teleport / topic transforms apply to the aggregated vector *before*
  *    the opposite update consumes it and before normalization
  *    (reference `src/random_teleport_hits.py:66-77`), and only to nodes
  *    present in the aggregation result — dropout semantics, SURVEY.md §2
  *    notes B/C: zero-out-degree nodes leave the hub vector after
  *    iteration 1; no outer join resurrects them.
  *  - L2 normalization of both vectors at iteration end
  *    (reference `src/base_hits.py:63-64`).
  *
  * Execution model (the Spark-first redesign, nothing like the reference's
  * RDD loop): score vectors are DataFrames `(id, score)`; one iteration is
  * two equi-joins + two partial/final hash aggregates, all whole-stage
  * codegen'd. Each aggregated vector is `localCheckpoint`ed: without plan
  * truncation, 8 iterations of nested joins make Catalyst analysis cost
  * explode (the known failure mode of iterative DataFrame algorithms).
  * The |V|-sized score side of each join is left to AQE to broadcast when
  * it fits; at cluster scale it degrades gracefully to a shuffle hash join
  * on the same key as the previous iteration.
  */
object Hits {

  /** Post-aggregation score transform applied inside each iteration. */
  sealed trait Post
  case object Identity extends Post
  /** `score <- beta*score + (1-beta)/n` (reference `src/random_teleport_hits.py:69`). */
  final case class Teleport(beta: Double, n: Long) extends Post
  /** Conditional teleport: topic nodes get the `(1-beta)/nTopic` mass
    * (reference `src/topic_specific_hits.py:77`). `flags` = (id, flag). */
  final case class TopicTeleport(beta: Double, nTopic: Long, flags: DataFrame)
      extends Post

  final case class Result(hubs: DataFrame, auths: DataFrame)

  /** K1 base HITS. */
  def run(g: Graph, numIter: Int = 8): Result =
    iterate(g.nodes, g.edges, numIter, weighted = false, Identity)

  /** K2 weighted HITS: contribution = weight * score
    * (reference `src/weighted_hits.py:53-56`). */
  def runWeighted(g: Graph, numIter: Int = 8): Result =
    iterate(g.nodes, g.edges, numIter, weighted = true, Identity)

  /** K3 random-teleport HITS (reference `src/random_teleport_hits.py`). */
  def runTeleport(g: Graph, beta: Double = 0.8, numIter: Int = 8): Result = {
    val n = g.nodes.count()
    iterate(g.nodes, g.edges, numIter, weighted = false, Teleport(beta, n))
  }

  /** K4 topic-specific HITS: uniform init over all nodes, teleport mass
    * only to topic nodes (reference `src/topic_specific_hits.py:54-87`).
    * Flags are pre-hashed on id and cached once: the per-iteration flag
    * join is then shuffle-free on both sides. */
  def runTopicSpecific(g: Graph, topic: String, beta: Double = 0.8,
      numIter: Int = 8): Result = {
    val flags = prepFlags(g, topic)
    val nTopic = flags.filter(col("flag") === 1).count()
    val r = iterate(g.nodes, g.edges, numIter, weighted = false,
      TopicTeleport(beta, nTopic, flags))
    flags.unpersist(false)
    r
  }

  private[operators] def prepFlags(g: Graph, topic: String): DataFrame = {
    val spark = g.nodes.sparkSession
    val np = spark.conf.get("spark.sql.shuffle.partitions").toInt
    g.nodes.select(col("id"),
        when(col("label") === topic, 1).otherwise(0).as("flag"))
      .repartition(np, col("id")).persist()
  }

  /** Fixed-point extension (not in the reference, which always runs a
    * fixed 8 iterations): stop when the max absolute change of the
    * normalized authority vector drops below `tol`. The delta is a
    * second |V|-sized job per checked iteration, so checks run on a
    * schedule (`firstCheck, firstCheck+checkEvery, ...`) — the kernel
    * may overrun the true fixed point by < `checkEvery` no-op
    * refinements and reports the iterations actually executed (see
    * [[PageRank.runConverged]] for the full rationale). The returned
    * [[graft.Fixpoint]] carries an explicit `converged` flag —
    * false = capped at `maxIter` without a sub-`tol` delta. */
  def runConverged(g: Graph, tol: Double = 1e-9,
      maxIter: Int = 50, checkEvery: Int = 3, firstCheck: Int = 3)
      : graft.Fixpoint[Result] = {
    require(checkEvery >= 1 && firstCheck >= 1,
      s"need positive check schedule, got every=$checkEvery first=$firstCheck")
    val spark = g.edges.sparkSession
    val np = spark.conf.get("spark.sql.shuffle.partitions").toInt
    val proj = g.edges.select(col("src"), col("dst"),
      col("weight").cast("double").as("w"))
    // Same co-partitioning discipline as the fixed-count loop: edges
    // shuffled once for the whole run, score vectors only thereafter.
    val eDst = proj.repartition(np, col("dst")).persist()
    val eSrc = eDst.repartition(np, col("src")).persist()
    val n = g.nodes.count()
    val init = g.nodes.select(col("id"), lit(1.0 / math.sqrt(n)).as("score"))

    try {
      var hubs = init
      var auths = init
      var prev: Option[DataFrame] = None
      var ck2: DataFrame = null // checkpoint superseded two iterations back
      var it = 0
      var done = false
      while (it < maxIter && !done) {
        it += 1
        // Same materialization discipline as `iterate`: only the
        // normalized auth vector is checkpointed (one eager job per
        // iteration) — the hub subtree stays lazy inside it, and the
        // returned hubs plan hangs off the last checkpointed auths, so
        // plan depth stays bounded without 3 materializations/iteration.
        // SHUFFLE_HASH hints scoped to these joins (not a session-wide
        // planner flag): the |V|-sized score side is the build side and
        // is re-aggregated fresh each iteration — sorting it for SMJ
        // every round is pure waste.
        val a0 = auths.hint("SHUFFLE_HASH")
        val hubsU = eDst.join(a0, eDst("dst") === a0("id"))
          .groupBy(eDst("src").as("id")).agg(sum(col("score")).as("score"))
        val h0 = hubsU.hint("SHUFFLE_HASH")
        val authsU = eSrc.join(h0, eSrc("src") === h0("id"))
          .groupBy(eSrc("dst").as("id")).agg(sum(col("score")).as("score"))
        hubs = Normalize.l2(hubsU)
        val cur = Checkpoints.materializeKeyed(Normalize.l2(authsU))
        if (it >= firstCheck && (it - firstCheck) % checkEvery == 0)
            prev.foreach { p =>
          // Both sides are checkpointed aggregation outputs hash-
          // partitioned on id — the full-outer delta join is
          // co-partitioned, and the SHUFFLE_HASH hint skips re-sorting
          // both |V|-sized vectors every iteration (full-outer
          // shuffled-hash joins are supported since Spark 3.1).
          val delta = cur.as("c")
            .join(p.as("p").hint("SHUFFLE_HASH"),
              col("c.id") === col("p.id"), "full_outer")
            .select(abs(coalesce(col("c.score"), lit(0.0)) -
              coalesce(col("p.score"), lit(0.0))).as("d"))
            // coalesce: an empty vector pair (degenerate empty graph)
            // has max-delta NULL, which must read as converged, not NPE.
            .agg(coalesce(max(col("d")), lit(0.0))).head.getDouble(0)
          if (delta < tol) done = true
        }
        // Live references at this point: `cur` (it), `prev` (it-1, still
        // feeding the pending lazy `hubs` plan). The it-2 checkpoint is
        // unreachable — release it eagerly.
        if (ck2 != null) Checkpoints.release(ck2)
        ck2 = prev.orNull
        prev = Some(cur)
        auths = cur
      }
      // The final hub vector re-derives from the last checkpoint when
      // consumed; materialize it here so callers (and the unpersist
      // below) cannot race the edge-cache release. Once materialized, the
      // it-1 auth checkpoint it hung off is unreachable too.
      val h = Checkpoints.materialize(hubs)
      if (ck2 != null) Checkpoints.release(ck2)
      graft.Fixpoint(Result(h, auths), it, done)
    } finally {
      // Drop the caches even on failure — the loop runs eager actions,
      // so exceptions mid-loop are real.
      eDst.unpersist(false)
      eSrc.unpersist(false)
    }
  }

  /** K5 topic-exclusive HITS: base kernel on the induced topic subgraph
    * (intent semantics by default — SURVEY.md §2 note E;
    * `selfLoopsOnly = true` replays the reference's literal
    * self-loops-only edge filter, see [[Subgraph.topicExclusive]]). */
  def runTopicExclusive(g: Graph, topic: String, numIter: Int = 8,
      selfLoopsOnly: Boolean = false): Result =
    run(Subgraph.topicExclusive(g, topic, selfLoopsOnly), numIter)

  /** K6 query-dependent HITS: base kernel on the neighborhood graph. */
  def runQueryDependent(g: Graph, topic: String, numIter: Int = 8): Result =
    run(Subgraph.queryDependent(g, topic), numIter)

  // -----------------------------------------------------------------

  private[operators] def applyPost(scores: DataFrame, post: Post): DataFrame = post match {
    case Identity => scores
    case Teleport(beta, n) =>
      scores.select(col("id"),
        (lit(beta) * col("score") + lit((1.0 - beta) / n)).as("score"))
    case TopicTeleport(beta, nTopic, flags) =>
      // Inner join against the full flag table: agg keys are edge
      // endpoints, all present in the node set — same as the reference's
      // `.join(nodes_label)` (`src/topic_specific_hits.py:76`).
      // SHUFFLE_HASH, not the planner's broadcast pick (guide §3.1):
      // `scores` is a fresh aggregation output hash-partitioned on id
      // and `flags` is pre-hashed on id ([[prepFlags]]) — the join is
      // co-partitioned and exchange-free, while the broadcast plan
      // rebuilt and shipped a |V|-row broadcast TWICE PER ITERATION
      // (16 driver collects per topic kernel in the r19 event logs).
      scores.join(flags.hint("SHUFFLE_HASH"), Seq("id"))
        .select(col("id"),
          when(col("flag") === 0, lit(beta) * col("score"))
            .otherwise(lit(beta) * col("score") + lit((1.0 - beta) / nTopic))
            .as("score"))
  }

  private[graft] def iterate(nodes: DataFrame, edges: DataFrame, numIter: Int,
      weighted: Boolean, post: Post): Result = {
    val spark = edges.sparkSession
    val np = spark.conf.get("spark.sql.shuffle.partitions").toInt
    val proj = edges.select(col("src"), col("dst"),
      col("weight").cast("double").as("w"))
    val eDst = proj.repartition(np, col("dst")).persist()
    // derive the src-hashed copy from the cached dst-hashed one: the
    // upstream edge derivation (incl. subgraph semi/anti joins for the
    // exclusive/query-dependent kernels) then runs exactly once
    val eSrc = eDst.repartition(np, col("src")).persist()
    try loop(nodes, eDst, eSrc, numIter, weighted, post)
    finally {
      // Final results live on the last checkpoints only; the edge caches
      // can go (non-blocking) without recompute risk.
      eDst.unpersist(false)
      eSrc.unpersist(false)
    }
  }

  /** K1 over a [[graft.GraphIO.writeBucketedGraph]] layout: the edge
    * tables come back from the catalog already hash-clustered on each
    * join key (`<prefix>_edges_by_dst` / `_by_src`), so the kernel plans
    * ZERO edge-side Exchange for the whole run — not even the once-per-
    * run shuffle [[iterate]] pays to co-partition a derived edge set. At
    * 100 TB that once-per-run shuffle is itself worth eliminating when a
    * graph is reused across many runs; bucket count must equal the
    * consumer's `spark.sql.shuffle.partitions` so the per-iteration
    * score-aggregation output aligns with the bucket partitioning. */
  /** Fail fast when a bucketed layout's bucket count differs from this
    * session's shuffle partition count — the zero-edge-Exchange property
    * of the bucketed kernels holds only when they match; a mismatched
    * layout would silently reintroduce per-iteration edge shuffles
    * (exactly what those entry points exist to eliminate). Shared by
    * [[Hits.runBucketed]] and [[Salsa.runBucketed]]. */
  private[operators] def requireBucketAligned(
      spark: org.apache.spark.sql.SparkSession, prefix: String): Unit = {
    val buckets = spark.sessionState.catalog
      .getTableMetadata(org.apache.spark.sql.catalyst.TableIdentifier(
        s"${prefix}_edges_by_dst"))
      .bucketSpec.map(_.numBuckets)
    val shufflePartitions = spark.conf.get("spark.sql.shuffle.partitions").toInt
    require(buckets.contains(shufflePartitions),
      s"bucketed layout '$prefix' has ${buckets.fold("no bucket spec")(
        _.toString + " buckets")} but spark.sql.shuffle.partitions is " +
        s"$shufflePartitions; set them equal (or rewrite the layout) to " +
        "keep the kernel's zero-edge-Exchange plan")
  }

  def runBucketed(spark: org.apache.spark.sql.SparkSession, prefix: String,
      numIter: Int = 8): Result = {
    requireBucketAligned(spark, prefix)
    def edges(table: String): DataFrame =
      spark.table(table).select(col("src"), col("dst"),
        col("weight").cast("double").as("w"))
    // Persisting keeps the parquet scan out of the per-iteration loop;
    // the InMemoryRelation reports the bucketed scan's partitioning, so
    // the no-Exchange property survives caching.
    val eDst = edges(s"${prefix}_edges_by_dst").persist()
    val eSrc = edges(s"${prefix}_edges_by_src").persist()
    try loop(spark.table(s"${prefix}_nodes"), eDst, eSrc, numIter,
      weighted = false, Identity)
    finally {
      eDst.unpersist(false)
      eSrc.unpersist(false)
    }
  }

  /** The shared kernel loop over pre-co-partitioned (and persisted) edge
    * copies — `eDst` hash-clustered on `dst`, `eSrc` on `src`, both with
    * schema `(src, dst, w)`. Every iteration shuffles ONLY the freshly
    * aggregated |V|-sized vector: the score side of each join is an
    * aggregation output (hash partitioned on id) whose partitioning
    * survives the checkpoint, and the edge side's clustering comes from
    * the caller (one up-front repartition, or a bucketed table layout
    * with zero shuffles at all). */
  private def loop(nodes: DataFrame, eDst: DataFrame, eSrc: DataFrame,
      numIter: Int, weighted: Boolean, post: Post): Result = {
    require(numIter >= 1, s"numIter must be >= 1, got $numIter")
    // Materialize the node-id set ONCE. For the subgraph kernels (K5/K6)
    // `nodes` is a semi/anti-join plan over the edge tables that would
    // otherwise re-execute for the count AND again when iteration 1
    // consumes `init`; for plain kernels it is a cheap copy of the cached
    // node table. Released in `finally` — init is consumed only inside
    // the (eager) iteration-1 checkpoint job.
    val nodeIds = Checkpoints.materialize(nodes.select(col("id")))
    val n = nodeIds.count()
    val init = nodeIds.select(col("id"), lit(1.0 / math.sqrt(n)).as("score"))

    def contribution(score: Column): Column =
      if (weighted) col("w") * score else score

    try {
      var hubs = init
      var auths = init
      var prevCk: DataFrame = null
      for (i <- 1 to numIter) {
        // Hub: for each a, sum (weighted) authority scores over (a,b) edges.
        // Only the auth vector feeds the next iteration (Gauss-Seidel), so
        // the hub side is materialized just once, on the final iteration —
        // halving the per-iteration job count; intermediate hubs stay a
        // lazy subtree inside the auth checkpoint's job.
        // SHUFFLE_HASH hints scoped to these two joins (not a session-
        // wide planner flag, which would leak to concurrent queries on
        // the same session): the |V|-sized score side is the build side
        // and is re-aggregated fresh each iteration — sorting it for a
        // sort-merge join every round is pure waste.
        val a0 = auths.hint("SHUFFLE_HASH")
        val hubsRaw = applyPost(
          eDst.join(a0, eDst("dst") === a0("id"))
            .groupBy(eDst("src").as("id"))
            .agg(sum(contribution(col("score"))).as("score")),
          post)
        val hubsU = if (i == numIter) Checkpoints.materializeKeyed(hubsRaw)
          else hubsRaw
        // Authority: from the NEW, un-normalized hubs (Gauss-Seidel).
        val h0 = hubsU.hint("SHUFFLE_HASH")
        val authsU = Checkpoints.materializeKeyed(applyPost(
          eSrc.join(h0, eSrc("src") === h0("id"))
            .groupBy(eSrc("dst").as("id"))
            .agg(sum(contribution(col("score"))).as("score")),
          post))
        // The fresh auth checkpoint (and on the final iteration the hub
        // one) is materialized; the previous iteration's auth blocks are
        // now unreachable by any live plan — release them eagerly instead
        // of waiting for a driver GC + ContextCleaner sweep. Live blocks
        // per kernel stay O(2·|V|) however long the run.
        if (prevCk != null) Checkpoints.release(prevCk)
        prevCk = authsU
        hubs = Normalize.l2(hubsU)
        auths = Normalize.l2(authsU)
      }
      Result(hubs, auths)
    } finally {
      // Final results live on the last checkpoints only; the init
      // node-id checkpoint can go without recompute risk. try/finally so
      // an exception inside the eager loop cannot leak it.
      Checkpoints.release(nodeIds)
    }
  }
}
