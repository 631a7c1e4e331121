package graft

import graft.functions.{GraftHash, TextFunctions => TF}
import graft.operators._
import graft.pipelines.{Classify, Dedup, Multimodal, Packing, Retrieval,
  Sampling, Similarity, Sketches, TextMetrics}
import graft.streaming.{EventPipelines, Tws}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every entry in [[queries]] has a DuckDB twin in [[oracleSql]]
  * (generated in [[Oracles]]); column names and types are aligned on
  * both sides because the driver's compare sorts columns by name and
  * hashes values. Floating-point scores are rounded identically on both
  * sides (HITS: 6 decimals, SALSA: 9 — see [[Oracles]] scaladoc).
  */
object SparkEntry {

  /** Topic label used by the topic/query-dependent kernels: 'part' is the
    * only label with intra-topic edges in the derived order graph. */
  private val Topic = "part"

  /** Edge-strength floor (raw weight units) for the weighted
    * components gates. The collapsed-edge strength distribution on the
    * order graph is bimodal and scale-stable (quantity-weighted
    * part-chain edges ≪ price-weighted customer/order edges); 105k
    * sits above the p75 price mode, so the surviving subgraph
    * fractures into thousands of small components at every SF
    * (156 / 1,502 / 14,999 at sf0.001/0.01/0.1) instead of staying one
    * giant — a non-degenerate weighted gate. */
  private val ComponentStrengthFloor = 105000.0

  /** Fixed probe query for the retrieval gates — mid-frequency corpus
    * terms so the BM25 idf spread is non-degenerate. */
  private val SearchTerms = Seq("spark", "query", "vector")

  /** Corpora whose persisted structural projection has been built in
    * THIS JVM — the `*_indexed` gates share one build per corpus
    * (that sharing is the index's entire point; a per-gate rebuild
    * would just re-prove the from-scratch gates). Keyed by index dir;
    * rebuilt on first touch each JVM so a stale on-disk index from an
    * older code version can never leak into a gate. The memo maps
    * key → key and is populated through `computeIfAbsent` (ADVICE
    * r18): the build runs under the per-key lock and the mapping is
    * recorded only if `write` RETURNS — a concurrent gate on the same
    * corpus blocks until the index is complete instead of reading a
    * half-written one, and a failed build leaves no entry, so the
    * next gate retries instead of inheriting a poisoned memo. */
  private val structIdxBuilt =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  private def structIdxDir(s: SparkSession, dir: String): String = {
    // readable sanitized tail + graft hash of the RAW dir string, so
    // two corpus dirs that sanitize alike (sf0.1 vs sf0_1) can never
    // share an index (ADVICE r18)
    val idx = "target/graft-structidx-" +
      dir.replaceAll("[^a-zA-Z0-9]", "_") + "-" +
      java.lang.Long.toHexString(graft.functions.GraftHash.hashUtf8(
        org.apache.spark.unsafe.types.UTF8String.fromString(dir)))
    structIdxBuilt.computeIfAbsent(idx, { k =>
      StructuralIndex.write(GraphIO.orderGraph(s, dir).edges, k)
      k
    })
  }

  /** Probe values for the Count-Min gate: the search terms plus one
    * token absent from the corpus. */
  private val CmsProbes = Seq("spark", "query", "vector", "zz_absent_probe")

  /** Fixed-bin quantile-sketch geometry for the events `value` column:
    * `(lo, width, nbins)` — [0, 1024) in half-unit bins, chosen from
    * schema knowledge (testdata values span [0, ~561]; the documented
    * width/2 error bound needs the domain covered — see
    * [[graft.functions.FixedBinHistogramAgg]]). Shared verbatim with
    * the DuckDB oracle ([[Oracles.eventsPercentilesSketch]] is invoked
    * with exactly these values below). */
  private val PctSketchBins: (Double, Double, Int) = (0.0, 0.5, 2048)

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("hits_base")(spark, "/root/testdata/sf0.001")

  private def scoresRows(hubs: DataFrame, auths: DataFrame,
      digits: Int): DataFrame =
    auths.select(lit("auth").as("kind"), col("id"),
        round(col("score"), digits).as("score"))
      .unionAll(hubs.select(lit("hub").as("kind"), col("id"),
        round(col("score"), digits).as("score")))

  private def scoresOut(hubs: DataFrame, auths: DataFrame,
      digits: Int): DataFrame =
    scoresRows(hubs, auths, digits).orderBy(col("kind"), col("id"))

  private def hitsOut(r: Hits.Result): DataFrame =
    scoresOut(r.hubs, r.auths, 6)
  private def salsaOut(r: Salsa.Result): DataFrame =
    scoresOut(r.hubs, r.auths, 9)

  /** One per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- HITS family (K1-K6) on the derived order graph ----
    "hits_base" -> ((s, dir) =>
      hitsOut(Hits.run(GraphIO.orderGraph(s, dir)))),
    "hits_weighted" -> ((s, dir) =>
      hitsOut(Hits.runWeighted(GraphIO.orderGraph(s, dir)))),
    "hits_weighted_alt" -> ((s, dir) =>
      hitsOut(Hits.runWeighted(GraphIO.orderGraphAltWeights(s, dir)))),
    "hits_teleport" -> ((s, dir) =>
      hitsOut(Hits.runTeleport(GraphIO.orderGraph(s, dir)))),
    "hits_topic" -> ((s, dir) =>
      hitsOut(Hits.runTopicSpecific(GraphIO.orderGraph(s, dir), Topic))),
    "hits_topic_exclusive" -> ((s, dir) =>
      hitsOut(Hits.runTopicExclusive(GraphIO.orderGraph(s, dir), Topic))),
    "hits_query_dependent" -> ((s, dir) =>
      hitsOut(Hits.runQueryDependent(GraphIO.orderGraph(s, dir), Topic))),
    // One-time bucketed-layout write, gated on its table cardinalities.
    // Runs before hits_bucketed (family order is alphabetical), so the
    // kernel query below measures the amortized zero-shuffle run, not
    // the write — the actual 100 TB proposition (write once, score many
    // times).
    "graph_bucketed_write" -> ((s, dir) => {
      import s.implicits._
      GraphIO.writeBucketedGraph(GraphIO.orderGraph(s, dir),
        bucketedPrefix(s, dir),
        s.conf.get("spark.sql.shuffle.partitions").toInt)
      Seq("edges_by_dst", "edges_by_src", "nodes").map(t =>
        (t, s.table(s"${bucketedPrefix(s, dir)}_$t").count()))
        .toDF("bucket_table", "n_rows").orderBy(col("bucket_table"))
    }),
    // Kernel over the bucketed handoff layout: ZERO edge-side shuffles
    // (the scan itself is the co-partitioning). Writes the layout only
    // if this JVM hasn't already (standalone runs); scores — and so the
    // oracle — are identical to hits_base.
    "hits_bucketed" -> ((s, dir) => {
      val prefix = bucketedPrefix(s, dir)
      if (!s.catalog.tableExists(s"${prefix}_nodes"))
        GraphIO.writeBucketedGraph(GraphIO.orderGraph(s, dir), prefix,
          s.conf.get("spark.sql.shuffle.partitions").toInt)
      hitsOut(Hits.runBucketed(s, prefix))
    }),
    // ---- SALSA family (K7-K12) ----
    // K8 over the bucketed handoff layout — zero edge-side shuffles,
    // including the degree aggregations; scores identical to
    // salsa_iterative. Reuses (or writes) the same layout as
    // hits_bucketed.
    "salsa_bucketed" -> ((s, dir) => {
      val prefix = bucketedPrefix(s, dir)
      if (!s.catalog.tableExists(s"${prefix}_nodes"))
        GraphIO.writeBucketedGraph(GraphIO.orderGraph(s, dir), prefix,
          s.conf.get("spark.sql.shuffle.partitions").toInt)
      salsaOut(Salsa.runBucketed(s, prefix))
    }),
    "salsa_simplified" -> ((s, dir) =>
      salsaOut(Salsa.runSimplified(GraphIO.orderGraph(s, dir).edges))),
    "salsa_iterative" -> ((s, dir) =>
      salsaOut(Salsa.run(GraphIO.orderGraph(s, dir)))),
    "salsa_weighted" -> ((s, dir) =>
      salsaOut(Salsa.runWeightedSimplified(GraphIO.orderGraph(s, dir).edges))),
    "salsa_teleport" -> ((s, dir) =>
      salsaOut(Salsa.runTeleport(GraphIO.orderGraph(s, dir)))),
    "salsa_topic" -> ((s, dir) =>
      salsaOut(Salsa.runTopicSpecific(GraphIO.orderGraph(s, dir), Topic))),
    "salsa_query_dependent" -> ((s, dir) =>
      salsaOut(Salsa.runQueryDependent(GraphIO.orderGraph(s, dir), Topic))),
    // Convergence extension, determinized like hits_converged: the
    // sf0.01 gate corpus stops at iteration 13 (tol 1e-9; delta(12)
    // ≈1.6e-9, delta(13)≈6e-10, so the count has ≥1.4× margin both
    // ways), and the oracle unrolls exactly 13 iterations. The pinned
    // N below is the sf0.01 default only: Verify re-derives the oracle
    // from the kernel's reported iter row at whatever scale it runs
    // (sf0.001 converges at 15), so the gate is scale-correct.
    // Delta checks are batched (firstCheck=7, every 3 → 7,10,13,...):
    // the sf0.01 stop stays at the measured 13, with 3 delta jobs
    // instead of 13.
    "salsa_converged" -> ((s, dir) => {
      import s.implicits._
      val fp =
        Salsa.runConverged(GraphIO.orderGraph(s, dir), 1e-9, 20,
          checkEvery = 3, firstCheck = 7)
      scoresRows(fp.result.hubs, fp.result.auths, 9)
        .unionAll(Seq(("iter", "n_iter", fp.iterations.toDouble),
          ("iter", "converged", if (fp.converged) 1.0 else 0.0))
          .toDF("kind", "id", "score"))
        .orderBy(col("kind"), col("id"))
    }),
    // ---- utility operators (K13, degrees, top-k, sampling) ----
    "topics_list" -> ((s, dir) =>
      Topics.list(GraphIO.orderGraph(s, dir).nodes).orderBy(col("label"))),
    "graph_degrees" -> ((s, dir) => {
      val e = GraphIO.orderGraph(s, dir).edges
      Degrees.out(e).select(lit("out").as("kind"), col("id"),
          col("out_degree").as("degree"))
        .unionAll(Degrees.in(e).select(lit("in").as("kind"), col("id"),
          col("in_degree").as("degree")))
        .orderBy(col("kind"), col("id"))
    }),
    // Beyond-reference structural signal: per-node triangle counts +
    // local clustering coefficient via the degree-oriented wedge join
    // (hub skew bounded by construction — see `Triangles` scaladoc).
    "graph_triangles" -> ((s, dir) =>
      Triangles.perNode(GraphIO.orderGraph(s, dir).edges)
        .orderBy(col("id"))),
    // Semi-supervised label propagation: hash-gated 30% seeds carry
    // their node label, 4 clamped synchronous majority rounds (the
    // quality/domain-label spreading primitive — see `LabelProp`).
    "graph_label_prop" -> ((s, dir) => {
      val g = GraphIO.orderGraph(s, dir)
      val seeds = g.nodes
        .filter(GraftHash.graftHash(s, col("id")) % 100 < 30)
        .select(col("id"), col("label"))
      LabelProp.run(s, g.edges, seeds, 4)
        .select(col("id"),
          coalesce(col("label"), lit("unlabeled")).as("label"))
        .orderBy(col("id"))
    }),
    // k-core density tier: synchronous peel to the 3-core fixed point
    // (the "train on the dense core" sampling primitive — see `KCore`).
    "graph_kcore" -> ((s, dir) =>
      KCore.run(GraphIO.orderGraph(s, dir).edges, 3)
        .orderBy(col("id"))),
    // WEIGHTED structural variants (r18): the same wedge join / peel
    // with the aggregate swapped to the micro-unit-exact edge-weight
    // sum — composable with the weighted HITS/SALSA gates, which
    // consume the same weights. Threshold 300k sits between the
    // weighted-degree median (~520k) and p10 (~235k) on the order
    // graph at every SF (the distribution is scale-stable), so the
    // peel is non-trivial and converges in ≤3 rounds — far inside the
    // oracle's 24-round unroll.
    "graph_triangles_weighted" -> ((s, dir) =>
      Triangles.perNodeWeighted(GraphIO.orderGraph(s, dir).edges)
        .orderBy(col("id"))),
    "graph_kcore_weighted" -> ((s, dir) =>
      KCore.runWeighted(GraphIO.orderGraph(s, dir).edges, 300000.0)
        .orderBy(col("id"))),
    // DOULION sampled triangle count — the family's cheap 100 TB rung
    // (the ANN ladder philosophy applied to triangles): hash-gated
    // edge sample at the CORPUS-DERIVED rate (autoPPermille — p halves
    // per 8× edge growth, so expected sampled triangles stay put),
    // wedge work ~p², count scaled by (1000/p)³; the twin replays both
    // the derivation (count-threshold unroll) and the exact subgraph.
    "graph_triangles_approx" -> ((s, dir) =>
      Triangles.approxCount(GraphIO.orderGraph(s, dir).edges)),
    // Structural family on the EVENT graph — the natural skew gate:
    // its authorities ('e' event-type nodes) hold hot-key in-degrees
    // by construction. Triangles are degenerate there (bipartite ⇒
    // none), but link prediction IS the textbook co-engagement
    // recommender (event types sharing many users — hot-type centers
    // are excluded by the degree cap, users are the wedge centers),
    // and the k-core is the engagement tier.
    "evt_graph_link_predict" -> ((s, dir) =>
      LinkPredict.topCandidates(GraphIO.eventGraph(s, dir).edges)),
    "evt_graph_kcore" -> ((s, dir) =>
      KCore.run(GraphIO.eventGraph(s, dir).edges, 3)
        .orderBy(col("id"))),
    // r19: the remaining structural pair on the event graph, so the
    // whole family is proven on both graph derivations. Triangles are
    // structurally ZERO on a bipartite graph — the gate certifies
    // exactly that (every per-node count 0, clustering 0, under the
    // hot-key in-degree skew), not a vacuous empty result.
    "evt_graph_triangles" -> ((s, dir) =>
      Triangles.perNode(GraphIO.eventGraph(s, dir).edges)
        .orderBy(col("id"))),
    "evt_graph_label_prop" -> ((s, dir) => {
      val g = GraphIO.eventGraph(s, dir)
      val seeds = g.nodes
        .filter(GraftHash.graftHash(s, col("id")) % 100 < 30)
        .select(col("id"), col("label"))
      LabelProp.run(s, g.edges, seeds, 4)
        .select(col("id"),
          coalesce(col("label"), lit("unlabeled")).as("label"))
        .orderBy(col("id"))
    }),
    // weighted majority: a high-engagement neighbor outvotes many weak
    // ones — votes are integer micro-unit edge strengths, so every
    // round is exactly replayed by the unrolled twin
    "graph_label_prop_weighted" -> ((s, dir) => {
      val g = GraphIO.orderGraph(s, dir)
      val seeds = g.nodes
        .filter(GraftHash.graftHash(s, col("id")) % 100 < 30)
        .select(col("id"), col("label"))
      LabelProp.runWeighted(s, g.edges, seeds, 4)
        .select(col("id"),
          coalesce(col("label"), lit("unlabeled")).as("label"))
        .orderBy(col("id"))
    }),
    // Link-prediction features: top-20 non-adjacent pairs by
    // common-neighbor/Adamic-Adar evidence (center-degree cap 64 — the
    // quadratic-surface contract, see `LinkPredict` scaladoc).
    "graph_link_predict" -> ((s, dir) =>
      LinkPredict.topCandidates(GraphIO.orderGraph(s, dir).edges)),
    // Weighted link prediction — completes the weighted structural
    // quartet: bottleneck common strength (exact micro-unit integer
    // primary key) + the 1/ln(1+strength) Adamic-Adar discount, same
    // topological center cap as the unweighted operator.
    "graph_link_predict_weighted" -> ((s, dir) =>
      LinkPredict.topCandidatesWeighted(GraphIO.orderGraph(s, dir).edges)),
    // ---- persisted structural projection (StructuralIndex) ----
    // Lifecycle proof, the ann_topk_ivf_persisted pattern: build +
    // persist the shared undirected/degrees projection once, read it
    // back, run each structural operator on it — each *_indexed gate
    // shares its from-scratch gate's oracle VERBATIM, so the persisted
    // path is proven bit-equal. At 100 TB this is what removes three
    // redundant corpus-scale distinct-shuffles from a one-graph
    // analysis session (VERDICT r17 missing #3).
    "graph_triangles_indexed" -> ((s, dir) => {
      val idx = structIdxDir(s, dir)
      Triangles.perNodeOn(StructuralIndex.undirected(s, idx),
          StructuralIndex.degrees(s, idx))
        .orderBy(col("id"))
    }),
    // bucketed = false: link prediction's first join re-keys the scan
    // (union into adjacency), so bucket metadata only pins it to a
    // fixed non-AQE layout — measured 35 vs 19 s at 100×; the k-core
    // peel, whose joins ARE on the bucket key, keeps the metadata.
    "graph_link_predict_indexed" -> ((s, dir) => {
      val idx = structIdxDir(s, dir)
      LinkPredict.topCandidatesOn(
        StructuralIndex.undirected(s, idx, bucketed = false),
        StructuralIndex.degrees(s, idx, bucketed = false))
    }),
    "graph_label_prop_indexed" -> ((s, dir) => {
      val idx = structIdxDir(s, dir)
      val seeds = GraphIO.orderGraph(s, dir).nodes
        .filter(GraftHash.graftHash(s, col("id")) % 100 < 30)
        .select(col("id"), col("label"))
      LabelProp.runOn(s, StructuralIndex.undirected(s, idx), seeds, 4)
        .select(col("id"),
          coalesce(col("label"), lit("unlabeled")).as("label"))
        .orderBy(col("id"))
    }),
    "graph_kcore_indexed" -> ((s, dir) => {
      val idx = structIdxDir(s, dir)
      // the index IS round 0: stored degrees replace the peel's first
      // (full-edge-list) aggregate, and the bucketed layout makes the
      // a-side semi-join exchange-free — see KCore.runPreDegreed
      KCore.runPreDegreed(StructuralIndex.undirected(s, idx),
          StructuralIndex.degrees(s, idx), 3)
        .orderBy(col("id"))
    }),
    // the index stores the WEIGHTED projection (the unweighted readers
    // prune the wt column away at the scan) — one gate proves the
    // weighted family reads it bit-equal too, sharing the weighted
    // oracle verbatim
    "graph_kcore_weighted_indexed" -> ((s, dir) => {
      val idx = structIdxDir(s, dir)
      // stored strengths are the weighted peel's round 0, the
      // runPreDegreed pattern on the strength axis
      KCore.runWeightedPreDegreed(
          StructuralIndex.undirectedWeighted(s, idx),
          StructuralIndex.weightedDegrees(s, idx), 300000.0)
        .orderBy(col("id"))
    }),
    // the remaining weighted family members over the SAME single index
    // (r19): every weighted operator now has a from-scratch gate AND an
    // indexed twin sharing its oracle verbatim — the one-index-serves-
    // both claim exercised across the whole quartet
    "graph_triangles_weighted_indexed" -> ((s, dir) => {
      val idx = structIdxDir(s, dir)
      Triangles.perNodeWeightedOn(StructuralIndex.undirectedWeighted(s, idx),
          StructuralIndex.degrees(s, idx))
        .orderBy(col("id"))
    }),
    "graph_label_prop_weighted_indexed" -> ((s, dir) => {
      val idx = structIdxDir(s, dir)
      val seeds = GraphIO.orderGraph(s, dir).nodes
        .filter(GraftHash.graftHash(s, col("id")) % 100 < 30)
        .select(col("id"), col("label"))
      LabelProp.runWeightedOn(s, StructuralIndex.undirectedWeighted(s, idx),
          seeds, 4)
        .select(col("id"),
          coalesce(col("label"), lit("unlabeled")).as("label"))
        .orderBy(col("id"))
    }),
    "graph_link_predict_weighted_indexed" -> ((s, dir) => {
      val idx = structIdxDir(s, dir)
      LinkPredict.topCandidatesWeightedOn(
        StructuralIndex.undirectedWeighted(s, idx, bucketed = false),
        StructuralIndex.degrees(s, idx, bucketed = false))
    }),
    // Connected components (r19) — the fifth structural-family member,
    // computed by the adversarial-scale large-star/small-star engine
    // (O(log d) rounds, convergence asserted loudly). On the order
    // graph the full projection is ONE giant component by construction
    // — the gate certifies exactly that (every node labeled with the
    // global min id, n_members = |V|), the evt_graph_triangles
    // "certify the degenerate case" pattern; the WEIGHTED member
    // thresholds edges at strength 105k (between the price-edge and
    // quantity-edge modes of the scale-stable bimodal strength
    // distribution), fracturing the graph into thousands of small
    // high-value components — real structure, real size histogram.
    "graph_components" -> ((s, dir) =>
      ConnectedComponents.componentsOn(
        Triangles.undirected(GraphIO.orderGraph(s, dir).edges))),
    "graph_components_weighted" -> ((s, dir) =>
      ConnectedComponents.componentsWeightedOn(
        Triangles.undirectedWeighted(GraphIO.orderGraph(s, dir).edges),
        ComponentStrengthFloor)),
    // components on the EVENT graph: bipartite users × event types —
    // every user reaches every other through the hot types, so full
    // engagement connectivity is certified under hot-key skew
    "evt_graph_components" -> ((s, dir) =>
      ConnectedComponents.componentsOn(
        Triangles.undirected(GraphIO.eventGraph(s, dir).edges))),
    // indexed twins: the star-forest contraction re-keys edges every
    // round (x→y orientation flips), so bucket metadata cannot help —
    // read the persisted projection with bucketed = false, the
    // link_predict_indexed precedent
    "graph_components_indexed" -> ((s, dir) => {
      val idx = structIdxDir(s, dir)
      ConnectedComponents.componentsOn(
        StructuralIndex.undirected(s, idx, bucketed = false))
    }),
    "graph_components_weighted_indexed" -> ((s, dir) => {
      val idx = structIdxDir(s, dir)
      ConnectedComponents.componentsWeightedOn(
        StructuralIndex.undirectedWeighted(s, idx, bucketed = false),
        ComponentStrengthFloor)
    }),
    // k-truss (r19) — the edge-level density tier next to k-core's
    // node-level one: every surviving edge closes >= 2 triangles
    // inside the surviving subgraph (k=4 — non-trivial multi-round
    // peel with a non-empty truss at every SF; k=5 empties the order
    // graph at sf0.01+). Support peel enumerates triangles
    // degree-oriented per round (the Triangles wedge discipline).
    "graph_ktruss" -> ((s, dir) =>
      KTruss.run(GraphIO.orderGraph(s, dir).edges, 4)
        .orderBy(col("a"), col("b"))),
    "graph_ktruss_indexed" -> ((s, dir) => {
      val idx = structIdxDir(s, dir)
      KTruss.runOn(StructuralIndex.undirected(s, idx, bucketed = false), 4)
        .orderBy(col("a"), col("b"))
    }),
    "rank_topk" -> ((s, dir) => {
      val auths = Salsa.runSimplified(GraphIO.orderGraph(s, dir).edges).auths
      RankOutput.topK(auths, 10)
        .select(col("id"), round(col("score"), 9).as("score"))
    }),
    "sample_hash" -> ((s, dir) =>
      GraphIO.orderGraph(s, dir).nodes.select(col("id"))
        .filter(GraftHash.graftHash(s, col("id")) % 100 < 5)
        .orderBy(col("id"))),
    // S5 graph-render model: the annotated (id, color, width) node set
    // behind the reference's HubAndAuthorities PNG view, hash-sampled so
    // DuckDB replays the identical selection.
    "render_model" -> ((s, dir) => {
      val g = GraphIO.orderGraph(s, dir)
      val r = Hits.run(g)
      val (nodes, _) = RankOutput.renderModelHash(g.edges, r.hubs, r.auths,
        "both")
      // width = score*10000, so 2 decimals here = the same 1e-6 absolute
      // tolerance on score that every other HITS oracle gates on.
      nodes.select(col("id"), col("color"),
        round(col("width"), 2).as("width")).orderBy(col("id"))
    }),
    // ---- PageRank extension (kernel-family completeness) ----
    "pagerank" -> ((s, dir) =>
      PageRank.run(GraphIO.orderGraph(s, dir))
        .select(col("id"), round(col("score"), 9).as("score"))
        .orderBy(col("id"))),
    // Personalized variant: teleport uniform over the 'part' seed set
    // — the PageRank analogue of topic-specific HITS.
    "pagerank_personalized" -> ((s, dir) =>
      PageRank.runPersonalized(GraphIO.orderGraph(s, dir), Topic)
        .select(col("id"), round(col("score"), 9).as("score"))
        .orderBy(col("id"))),
    // Convergence run, determinized like hits/salsa_converged: the
    // sf0.01 gate corpus stops at iteration 25 at tol 5.8e-8 (measured
    // delta(24)∈[1.0e-7,1.05e-7), delta(25)∈[3.2e-8,3.5e-8) — ~1.7×
    // margin both ways), and the oracle unrolls exactly 25 iterations.
    // Pinned N = sf0.01 default only; Verify re-derives from the
    // kernel's reported n_iter row at the scale it runs.
    // Delta checks batched on 13,16,19,22,25: the sf0.01 stop stays at
    // the measured 25 (delta(22) ≈ delta(24)/0.85² ≈ 1.4e-7 ≥ tol with
    // ~2.4× margin), with 5 delta jobs instead of 25.
    "pagerank_converged" -> ((s, dir) => {
      import s.implicits._
      val fp =
        PageRank.runConverged(GraphIO.orderGraph(s, dir), 0.85, 5.8e-8, 60,
          checkEvery = 3, firstCheck = 13)
      fp.result.select(col("id"), round(col("score"), 9).as("score"))
        .unionAll(Seq(("n_iter", fp.iterations.toDouble),
          ("converged", if (fp.converged) 1.0 else 0.0)).toDF("id", "score"))
        .orderBy(col("id"))
    }),
    // ---- event-graph kernels (skewed in-degree coverage) ----
    "evt_hits_base" -> ((s, dir) =>
      hitsOut(Hits.run(GraphIO.eventGraph(s, dir)))),
    "evt_salsa_weighted" -> ((s, dir) =>
      salsaOut(Salsa.runWeightedSimplified(GraphIO.eventGraph(s, dir).edges))),
    // ---- convergence extension; oracle-gated by determinizing the
    // fixed point: the sf0.01 gate corpus converges at iteration 12,
    // so the oracle unrolls 12 iterations and the extra
    // ('iter','n_iter',N) row asserts the kernel stopped exactly
    // there. tol sits at the geometric mid of the measured brackets
    // delta(11)∈[1.6e-6,1.75e-6) and delta(12)∈[8e-7,9e-7) — ≥1.33×
    // margin both ways (the r1 value 1e-6 had as little as 1.0× above
    // delta(12)). Pinned N = sf0.01 default; Verify re-derives from
    // the reported iter row at the scale it runs. ----
    // Delta checks batched on 6,9,12,15: the sf0.01 stop stays at the
    // measured 12 (delta(9) > delta(11) ≥ 1.6e-6 ≥ tol), with 3 delta
    // jobs instead of 12.
    "hits_converged" -> ((s, dir) => {
      import s.implicits._
      val fp =
        Hits.runConverged(GraphIO.orderGraph(s, dir), 1.2e-6, 16,
          checkEvery = 3, firstCheck = 6)
      scoresRows(fp.result.hubs, fp.result.auths, 6)
        .unionAll(Seq(("iter", "n_iter", fp.iterations.toDouble),
          ("iter", "converged", if (fp.converged) 1.0 else 0.0))
          .toDF("kind", "id", "score"))
        .orderBy(col("kind"), col("id"))
    }),
    // ---- events: batch twins of the streaming pipeline ----
    "events_sessionize" -> ((s, dir) =>
      EventPipelines.sessionizeBatch(GraphIO.events(s, dir))),
    // Salt-and-merge twin: same sessions from bounded partitions (the
    // hot-user skew posture); gated on the UNCHANGED sessionize oracle
    // — the gate IS the output-equality proof.
    "events_sessionize_salted" -> ((s, dir) =>
      EventPipelines.sessionizeSalted(GraphIO.events(s, dir))),
    // Native session_window twin: the built-in gap-session operator,
    // boundary-aligned (gap+1µs over integer-µs event times), gated on
    // the UNCHANGED sessionize oracle — the gate IS the equality proof.
    "events_sessionize_native" -> ((s, dir) =>
      EventPipelines.sessionizeNativeExact(GraphIO.events(s, dir))),
    "events_window" -> ((s, dir) =>
      EventPipelines.windowedStatsBatch(GraphIO.events(s, dir))),
    "events_rollup" -> ((s, dir) =>
      EventPipelines.typeRollup(GraphIO.events(s, dir))),
    // Interval-union engagement time per user (exact integer nanos).
    "events_active_time" -> ((s, dir) =>
      EventPipelines.activeTime(GraphIO.events(s, dir))),
    // Exponentially decayed per-type counts anchored at max ts.
    "events_decayed" -> ((s, dir) =>
      EventPipelines.decayedCounts(GraphIO.events(s, dir))),
    "events_running_totals" -> ((s, dir) =>
      EventPipelines.runningTotals(GraphIO.events(s, dir))),
    "skew_salted_join" -> ((s, dir) => {
      val ev = GraphIO.events(s, dir)
      val dims = ev.select(col("event_type").as("et2"),
        upper(col("event_type")).as("tag")).distinct()
      graft.operators.Skew
        .saltedEquiJoin(ev, dims, col("event_type"), col("et2"), 8)
        .groupBy(col("tag"))
        .agg(count(lit(1)).as("n"),
          round(sum(col("value")) * lit(100.0)).cast("long").as("cents"))
        .orderBy(col("tag"))
    }),
    "events_asof" -> ((s, dir) =>
      EventPipelines.asofPurchaseView(GraphIO.events(s, dir))),
    "events_range_join" -> ((s, dir) =>
      EventPipelines.rangeJoinClicksBeforeErrors(GraphIO.events(s, dir))),
    "events_props_json" -> ((s, dir) =>
      EventPipelines.propsJsonStats(GraphIO.events(s, dir))),
    "events_top_users" -> ((s, dir) =>
      EventPipelines.topUsers(GraphIO.events(s, dir))
        .withColumn("rn", col("rn").cast("long"))),
    // Deterministic KMV sketch: the approximate distinct-user count
    // itself is oracle-gated (integer-exact k-smallest sketch +
    // op-order-matched estimator), next to the exact count.
    "events_kmv_users" -> ((s, dir) => {
      val ev = GraphIO.events(s, dir)
      val exact = ev.groupBy(col("event_type"))
        .agg(countDistinct(col("user_id")).as("n_exact"))
      val kmv = Sketches
        .kmvDistinct(s, ev, col("event_type"), col("user_id").cast("string"))
        .select(col("grp").as("event_type"),
          col("kmv_distinct").as("kmv_users"))
      exact.join(kmv, Seq("event_type")).orderBy(col("event_type"))
    }),
    // The sketch at realistic token-level cardinality: per-source
    // distinct 3-gram shingles — where exact countDistinct shuffles
    // every key and the KMV sketch ships 256 int64s per group.
    "corpus_shingle_kmv" -> ((s, dir) => {
      val sh = GraphIO.documents(s, dir)
        .select(col("source"), explode(TF.shingles(col("text"), 3)).as("v"))
      val exact = sh.groupBy(col("source"))
        .agg(countDistinct(col("v")).as("n_exact"))
      val kmv = Sketches.kmvDistinct(s, sh, col("source"), col("v"))
        .select(col("grp").as("source"),
          col("kmv_distinct").as("kmv_shingles"))
      exact.join(kmv, Seq("source")).orderBy(col("source"))
    }),
    // Sketch-based source-overlap audit: pairwise Jaccard between the
    // 20 sources' shingle sets from the same sketches — integer set
    // algebra on <=K-element arrays, no raw-data join.
    "corpus_source_overlap_kmv" -> ((s, dir) =>
      Sketches.kmvPairwiseJaccard(s,
        GraphIO.documents(s, dir)
          .select(col("source"), explode(TF.shingles(col("text"), 3)).as("v")),
        col("source"), col("v"))),
    // ---- sequence packing (LLM batch assembly) ----
    "pack_sequences" -> ((s, dir) =>
      Packing.packDocs(s, GraphIO.documents(s, dir), "doc_id", "text",
        capacity = 2000L, buckets = 8).orderBy(col("doc_id"))),
    "pack_manifest" -> ((s, dir) =>
      Packing.packManifest(
        Packing.packDocs(s, GraphIO.documents(s, dir), "doc_id", "text",
          capacity = 2000L, buckets = 8), "doc_id").orderBy(col("pack"))),
    // ---- text analysis ----
    "text_stats" -> ((s, dir) =>
      GraphIO.documents(s, dir).select(col("doc_id"),
        TF.tokenCount(col("text")).cast("long").as("n_tokens"),
        TF.punctCount(col("text")).cast("long").as("n_punct"),
        TF.subtokenCount(col("text")).cast("long").as("n_subtokens"),
        TF.langId(col("text")).as("lang_pred"),
        round(TF.qualityScore(col("text")), 6).as("quality"))
        .orderBy(col("doc_id"))),
    "text_fingerprint" -> ((s, dir) =>
      GraphIO.documents(s, dir).select(col("doc_id"),
        TF.fingerprint(s, col("text")).as("fp"))
        .orderBy(col("doc_id"))),
    "text_repetition" -> ((s, dir) =>
      TextMetrics.repetitionSignals(GraphIO.documents(s, dir))),
    "text_tfidf" -> ((s, dir) =>
      TextMetrics.tfidf(GraphIO.documents(s, dir))),
    "text_scrub" -> ((s, dir) =>
      TextMetrics.scrub(GraphIO.documents(s, dir),
        "(customer|supplier)", "[X]")),
    "corpus_mixture" -> ((s, dir) =>
      TextMetrics.mixtureReport(GraphIO.documents(s, dir))),
    "sample_quota" -> ((s, dir) =>
      Sampling.quotaPerGroup(s, GraphIO.documents(s, dir),
        "source", "doc_id", 25)),
    // Both split and shuffle now carry the full input row; the gates
    // project one payload column (source) alongside the assignment so
    // the pass-through itself is oracle-checked.
    "sample_split" -> ((s, dir) =>
      Sampling.splitByHash(s, GraphIO.documents(s, dir), "doc_id",
        Seq("train" -> 900, "val" -> 50, "test" -> 50))
        .select(col("doc_id"), col("source"), col("split"))
        .orderBy(col("doc_id"))),
    "corpus_shuffle" -> ((s, dir) =>
      Sampling.shuffleByHash(s, GraphIO.documents(s, dir), "doc_id")
        .select(col("doc_id"), col("source"), col("sort_key"))),
    "decontaminate" -> ((s, dir) => {
      val d = GraphIO.documents(s, dir)
      Dedup.benchmarkContamination(s,
        d.filter(col("doc_id") % 10 =!= 7), d.filter(col("doc_id") % 10 === 7))
    }),
    // Bloom-prefiltered variant — broadcastable-bitmap prefilter before
    // the exact confirm; n_hits must match `decontaminate` (no false
    // negatives), n_bloom exposes the FP tail. The oracle replays the
    // bitmap bit-for-bit.
    "decontaminate_bloom" -> ((s, dir) => {
      val d = GraphIO.documents(s, dir)
      Dedup.benchmarkContaminationBloom(s,
        d.filter(col("doc_id") % 10 =!= 7), d.filter(col("doc_id") % 10 === 7))
    }),
    "events_percentiles" -> ((s, dir) =>
      EventPipelines.typePercentiles(GraphIO.events(s, dir))),
    "pipeline_clean_corpus" -> ((s, dir) =>
      Dedup.cleanCorpus(s, GraphIO.documents(s, dir))),
    "text_normalize" -> ((s, dir) => {
      val norm = TF.normalizeText(s, col("text"))
      GraphIO.documents(s, dir).select(col("doc_id"),
          norm.as("norm_text"),
          GraftHash.graftHash(s, norm).as("norm_fp"))
        .orderBy(col("doc_id"))
    }),
    // ---- dedup ----
    "dedup_exact" -> ((s, dir) =>
      Dedup.exact(GraphIO.documents(s, dir))),
    "dedup_exact_hash" -> ((s, dir) =>
      Dedup.exactByHash(s, GraphIO.documents(s, dir))),
    "text_langid_ngram" -> ((s, dir) =>
      GraphIO.documents(s, dir).select(col("doc_id"),
        TF.langIdNgram(col("text")).as("lang_tri"))
        .orderBy(col("doc_id"))),
    // Real-BPE token counts next to the subtoken proxy they refine —
    // a per-row codegen'd scalar, no shuffle; the vocab rides the plan
    // as a reference obj. The vocab is TRAINED on this corpus
    // (BpeTrain — the closed tokenizer-training loop): K bounded
    // rounds over the capped word-type dictionary, then the learned
    // K-row merge list is collected (the IVF-centroid pattern) and
    // applied corpus-wide.
    "text_bpe_tokens" -> ((s, dir) => {
      val bpe = new graft.functions.BpeTokenizer(
        graft.pipelines.BpeTrain.trainedVocab(GraphIO.documents(s, dir)))
      GraphIO.documents(s, dir).select(col("doc_id"),
        TF.subtokenCount(col("text")).cast("long").as("n_subtokens"),
        bpe.countTokens(col("text")).as("n_bpe"))
        .orderBy(col("doc_id"))
    }),
    // The BPE TRAINER itself, gate-shaped: the learned merge list in
    // rank order, replayed merge-for-merge by the DuckDB oracle
    // (pair-count argmax + leftmost fold per round).
    "bpe_train" -> ((s, dir) =>
      graft.pipelines.BpeTrain.merges(GraphIO.documents(s, dir))),
    // Driver-local greedy twin at the same merge count — the bounded
    // word dictionary trains on the driver (one corpus job instead of
    // two jobs PER MERGE), and the gate shares bpe_train's greedy
    // oracle verbatim: the speedup is job-count only, never a merge.
    "bpe_train_fast" -> ((s, dir) =>
      graft.pipelines.BpeTrain.merges(GraphIO.documents(s, dir),
        fast = true)),
    "dedup_simhash" -> ((s, dir) =>
      Dedup.simhash(s, GraphIO.documents(s, dir))),
    "dedup_clusters" -> ((s, dir) =>
      ConnectedComponents.clusters(
        Dedup.minhashLsh(s, GraphIO.documents(s, dir), ordered = false))),
    // Same clusters via the large-star/small-star engine (O(log d)
    // rounds — the adversarial-chain-safe variant); oracle shared with
    // dedup_clusters because the output contract is identical.
    "dedup_clusters_star" -> ((s, dir) =>
      ConnectedComponents.clustersStar(
        Dedup.minhashLsh(s, GraphIO.documents(s, dir), ordered = false))),
    "pipeline_near_dedup" -> ((s, dir) =>
      Dedup.nearDedupCorpus(s, GraphIO.documents(s, dir))),
    "dedup_minhash_lsh" -> ((s, dir) =>
      Dedup.minhashLsh(s, GraphIO.documents(s, dir))),
    "dedup_minhash_signature" -> ((s, dir) =>
      Dedup.minhashSignature(s, GraphIO.documents(s, dir))),
    "dedup_ngram_jaccard" -> ((s, dir) =>
      Dedup.ngramJaccard(GraphIO.documents(s, dir))),
    "dedup_passages" -> ((s, dir) =>
      Dedup.repeatedPassages(s, GraphIO.documents(s, dir))),
    // exact-substring span dedup (Lee et al. 2021 shape): maximal
    // cross-document duplicated ≥k-token spans, and the cleaner that
    // cuts them
    "dedup_spans" -> ((s, dir) =>
      Dedup.dedupSpans(s, GraphIO.documents(s, dir))),
    "dedup_spans_occ" -> ((s, dir) =>
      Dedup.dedupSpans(s, GraphIO.documents(s, dir), minOcc = 2)),
    "dedup_spans_clean" -> ((s, dir) =>
      Dedup.dedupSpansClean(s, GraphIO.documents(s, dir))),
    "dedup_embedding" -> ((s, dir) =>
      Similarity.nearDuplicates(GraphIO.embeddings(s, dir), 0.3)),
    // ---- similarity search ----
    // nlist pinned: the DuckDB twin is static SQL, so the gate fixes
    // the cell count; library callers omitting nlist get the
    // √N-derived default ([[graft.pipelines.Similarity.autoNlist]]).
    "dedup_semantic" -> ((s, dir) =>
      Similarity.semanticDuplicates(GraphIO.embeddings(s, dir), 0.3,
        nlist = 8)),
    // The five ANN gates all route through the unified
    // [[graft.pipelines.Similarity.ann]] entry point, so what the
    // oracles certify is the one surface users call.
    "ann_topk" -> ((s, dir) =>
      Similarity.ann(GraphIO.embeddings(s, dir), Similarity.AnnStrategy.Exact)
        .withColumn("rn", col("rn").cast("long"))),
    // Cluster-composition report: one broadcast IVF assignment pass +
    // a per-cell hash agg — corpus inspection before mixture choices.
    "corpus_clusters" -> ((s, dir) =>
      Similarity.clusterReport(GraphIO.embeddings(s, dir), nlist = 8)),
    "ann_topk_lsh" -> ((s, dir) =>
      Similarity.ann(GraphIO.embeddings(s, dir), Similarity.AnnStrategy.Lsh)
        .withColumn("rn", col("rn").cast("long"))),
    // matryoshka rung: prefix-cosine candidates (dims/D of the float
    // reads), exact full-vector rerank — the dimension-reduction axis
    // of the ladder
    "ann_topk_mrl" -> ((s, dir) =>
      Similarity.ann(GraphIO.embeddings(s, dir), Similarity.AnnStrategy.Mrl)
        .withColumn("rn", col("rn").cast("long"))),
    "ann_topk_ivf" -> ((s, dir) =>
      Similarity.ann(GraphIO.embeddings(s, dir), Similarity.AnnStrategy.Ivf,
          nlist = 8)
        .withColumn("rn", col("rn").cast("long"))),
    // MRL×IVF composition: prefix-cosine candidates INSIDE the probed
    // cells, rerank pool a fraction of the PROBED population — the
    // sublinear form of the dimension axis (retires autoMrlCand's
    // linear ⌈N/5⌉ asymptote for the deployed default path).
    "ann_topk_mrl_ivf" -> ((s, dir) =>
      Similarity.ann(GraphIO.embeddings(s, dir),
          Similarity.AnnStrategy.MrlIvf, nlist = 8)
        .withColumn("rn", col("rn").cast("long"))),
    // Exploded to (vec_id, ma, pos, qv) scalar rows: the driver's
    // comparator sorts result columns with pandas, which cannot order an
    // array-typed column — the native array<bigint> API
    // ([[graft.pipelines.Similarity.quantizeQ8]]) is unchanged.
    "embed_quantize" -> ((s, dir) =>
      Similarity.quantizeQ8(GraphIO.embeddings(s, dir))
        .select(col("vec_id"), col("ma"),
          posexplode(col("q")).as(Seq("pos", "qv")))
        .select(col("vec_id"), col("ma"), col("pos").cast("long").as("pos"),
          col("qv"))
        .orderBy(col("vec_id"), col("pos"))),
    // product quantization — the BYTES-PER-VECTOR axis (r19): ADC over
    // 10-byte codes (m=16 subspaces × 32 codewords ≈ 26× smaller than
    // the float column), derived rerank pool max(12k, ⌈N/20⌉); the
    // sublinear deployable form is the IVF composition below
    "ann_topk_pq" -> ((s, dir) =>
      Similarity.ann(GraphIO.embeddings(s, dir), Similarity.AnnStrategy.Pq)
        .withColumn("rn", col("rn").cast("long"))),
    // IVFPQ — the canonical memory-bound 100 TB ANN shape: probed
    // cells shrink the scanned SET, codes shrink the bytes per scanned
    // vector, rerank pool scales with the probed population (raw-
    // vector codes, so ONE code table serves both PQ rungs)
    "ann_topk_pq_ivf" -> ((s, dir) =>
      Similarity.ann(GraphIO.embeddings(s, dir),
          Similarity.AnnStrategy.PqIvf, nlist = 8)
        .withColumn("rn", col("rn").cast("long"))),
    "ann_topk_q8" -> ((s, dir) =>
      Similarity.ann(GraphIO.embeddings(s, dir), Similarity.AnnStrategy.Q8)
        .withColumn("rn", col("rn").cast("long"))),
    "ann_topk_q8_ivf" -> ((s, dir) =>
      Similarity.ann(GraphIO.embeddings(s, dir), Similarity.AnnStrategy.Q8Ivf,
          nlist = 8)
        .withColumn("rn", col("rn").cast("long"))),
    // The full 100 TB ANN configuration — cell probe + int8 prefilter +
    // centroid training on the hash-gated half sample — certified
    // end-to-end: the oracle replays the identical training gate.
    "ann_topk_q8_ivf_sampled" -> ((s, dir) =>
      Similarity.ann(GraphIO.embeddings(s, dir), Similarity.AnnStrategy.Q8Ivf,
          nlist = 8, trainFraction = 0.5)
        .withColumn("rn", col("rn").cast("long"))),
    // IVF index lifecycle proof: build + persist the index (centroids
    // and the cell-repartitioned assigned corpus), read it back, probe
    // — must equal the in-memory rung, so the gate shares
    // ann_topk_ivf's oracle verbatim.
    "ann_topk_ivf_persisted" -> ((s, dir) => {
      val idxDir = "target/graft-ivf-" + dir.replaceAll("[^a-zA-Z0-9]", "_")
      Similarity.ivfIndexWrite(GraphIO.embeddings(s, dir), idxDir, nlist = 8)
      Similarity.annTopKIvfPersisted(s, idxDir, GraphIO.embeddings(s, dir))
        .withColumn("rn", col("rn").cast("long"))
    }),
    // IVF index LIFECYCLE gate: build a versioned index from a corpus
    // with a deterministic subset of embeddings CORRUPTED (negated —
    // those vectors land in the wrong cells), append a generation-1
    // delta carrying the true embeddings for exactly that subset, and
    // compact — the probe over the compacted index must then equal the
    // from-scratch `ann_topk_ivf` run (shared oracle, verbatim), with
    // every hop round-tripped through parquet. Centroids are pinned at
    // build time (the lifecycle contract: appends assign against the
    // persisted centroids; retraining is a rebuild), so the gate pins
    // them to the corpus's trained centroids and proves append+compact
    // reproduce assign-from-scratch — including the cell REASSIGNMENT
    // of every re-ingested vector.
    "ann_topk_ivf_appended" -> ((s, dir) => {
      val base = "target/graft-ivflc-" + dir.replaceAll("[^a-zA-Z0-9]", "_")
      val emb = GraphIO.embeddings(s, dir)
      val updated = col("vec_id") % 7 === 3
      val stale = emb.withColumn("embedding",
        when(updated, transform(col("embedding"), x => -x))
          .otherwise(col("embedding")))
      val corpus = emb.select(col("vec_id"), col("embedding"),
        Similarity.norm(col("embedding")).as("nrm"))
      val cents = Similarity.ivfCentroids(corpus, 8)
      cents.write.mode("overwrite").parquet(s"$base/centroids.parquet")
      Similarity.ivfIndexEntries(stale, cents, 0L)
        .write.mode("overwrite").parquet(s"$base/v0.parquet")
      Similarity.ivfIndexAppend(s.read.parquet(s"$base/v0.parquet"),
          Similarity.ivfIndexEntries(emb.filter(updated), cents, 1L))
        .write.mode("overwrite").parquet(s"$base/v1.parquet")
      Similarity.ivfIndexCompact(s.read.parquet(s"$base/v1.parquet"))
        .repartition(col("cid"))
        .write.mode("overwrite").parquet(s"$base/index.parquet")
      Similarity.annTopKIvfPersisted(s, base, emb)
        .withColumn("rn", col("rn").cast("long"))
    }),
    // Accuracy half of the ANN ladder as a first-class gated output:
    // recall@k of every approximate rung against the exact rung, both
    // deterministic, so the recall numbers themselves are oracle-checked
    // (the DuckDB twin recomputes each rung and intersects).
    "ann_recall_audit" -> ((s, dir) =>
      Similarity.recallAudit(GraphIO.embeddings(s, dir))),
    // Recall DRIFT of the appended index (r13 missing #2): centroids
    // trained when only the first half of the corpus existed, the rest
    // appended against those pinned centroids through the real
    // append+compact ops — recall@k and cell-occupancy imbalance (the
    // documented rebuild trigger) side by side with the fresh rebuild,
    // all four rows recomputed by the DuckDB twin.
    "ann_recall_audit_appended" -> ((s, dir) =>
      Similarity.recallAuditAppended(GraphIO.embeddings(s, dir))),
    // ---- multimodal plumbing ----
    "multimodal_meta" -> ((s, dir) =>
      Multimodal.metaQuery(s, GraphIO.documents(s, dir))),
    "multimodal_chunks" -> ((s, dir) =>
      Multimodal.chunkFingerprints(s, GraphIO.documents(s, dir))),
    // REAL codec proof: encode each doc's bytes as a genuine gray-8
    // PNG and decode it back via javax.imageio (pure JDK) — lossless,
    // so the oracle replays the decoded stats from the raw bytes.
    "multimodal_image_roundtrip" -> ((s, dir) =>
      graft.pipelines.Images.imageRoundTrip(s, GraphIO.documents(s, dir))),
    // REAL 2-D resize proof: PNG → ImageIoCodec.resize (decode,
    // nearest-neighbor both axes, re-encode) → decode — lossless hops,
    // so the oracle replays the resized stats from raw bytes.
    "multimodal_resize_real" -> ((s, dir) =>
      graft.pipelines.Images.resizedRoundTrip(s,
        GraphIO.documents(s, dir), factor = 2)),
    // REAL multi-frame path: animated gray GIF (the JDK's only
    // writable+readable multi-frame container) → per-frame decode →
    // every-2nd-frame sampling — the video-pipeline shape without a
    // JDK video codec.
    "multimodal_frames" -> ((s, dir) =>
      graft.pipelines.Images.frameSample(s, GraphIO.documents(s, dir),
        stride = 2)),
    // REAL audio codec proof: bytes → 8-bit PCM WAV → AudioSystem
    // decode; lossless, so the oracle replays from raw bytes.
    "multimodal_audio_roundtrip" -> ((s, dir) =>
      graft.pipelines.Audio.audioRoundTrip(s, GraphIO.documents(s, dir))),
    "multimodal_features" -> ((s, dir) =>
      featureRows(Multimodal.extractFeatures(s,
        Multimodal.withPayload(GraphIO.documents(s, dir))).toDF())),
    "multimodal_resize" -> ((s, dir) =>
      featureRows(Multimodal.extractFeatures(s,
        Multimodal.resizeAll(s,
          Multimodal.withPayload(GraphIO.documents(s, dir)), 4).toDF())
        .toDF())),
    // Character-entropy garbled/binary-content detector.
    "text_char_entropy" -> ((s, dir) =>
      TextMetrics.charEntropy(GraphIO.documents(s, dir))),
    // CCNet-style unigram NLL quality signal over the corpus's own
    // unigram distribution (micro-nat-exact cross-engine).
    "text_unigram_nll" -> ((s, dir) =>
      TextMetrics.unigramNll(GraphIO.documents(s, dir))),
    // Order-sensitive companion: conditional bigram surprise — high for
    // common tokens in uncommon order (shuffled/stitched text).
    "text_bigram_nll" -> ((s, dir) =>
      TextMetrics.bigramNll(GraphIO.documents(s, dir))),
    // Model-based filtering: multinomial NB trained on the hash-gated
    // half of the corpus's own labels, scored on the held-out half —
    // micro-nat-exact, so the PREDICTIONS are oracle-gated, not just
    // the scores. Language axis + source/domain axis.
    "classify_nb" -> ((s, dir) =>
      Classify.naiveBayes(s, GraphIO.documents(s, dir), "lang")),
    "classify_nb_source" -> ((s, dir) =>
      Classify.naiveBayes(s, GraphIO.documents(s, dir), "source")),
    // Stratified curation: each source keeps its own best quantile.
    "sample_quality_cutoff_by_source" -> ((s, dir) =>
      TextMetrics.qualityCutoffBySource(GraphIO.documents(s, dir))),
    // Vocabulary induction: the tokenizer-training input (tf/df per
    // term, min-count floor, size-capped deterministic ranking).
    "text_vocabulary" -> ((s, dir) =>
      TextMetrics.vocabulary(GraphIO.documents(s, dir))),
    // Cross-source quotation matrix over winnow fingerprints.
    "corpus_quote_matrix" -> ((s, dir) =>
      Dedup.sourceQuoteMatrix(s, GraphIO.documents(s, dir))),
    // Asymmetric containment (quote/inclusion detection).
    "dedup_containment" -> ((s, dir) =>
      Dedup.containment(GraphIO.documents(s, dir), threshold = 0.5)),
    // Full curation chain: normalize → gate → dedup → temperature draw.
    "pipeline_curate" -> ((s, dir) =>
      Dedup.curate(s, GraphIO.documents(s, dir))),
    // Incremental (delta) dedup: odd doc_ids arrive against the even
    // half's fingerprint store.
    "dedup_incremental" -> ((s, dir) => {
      val d = GraphIO.documents(s, dir)
      Dedup.dedupIncremental(s,
        d.filter(col("doc_id") % 2 === 0), d.filter(col("doc_id") % 2 === 1))
    }),
    // Incremental NEAR-dup: odd doc_ids' band signatures probe the
    // even half's persisted LSH index (the minhash analogue of
    // dedup_incremental — O(delta) probes, no corpus self-join).
    // Candidate triage: estimated Jaccard (matching MinHash slots /
    // 16) per LSH candidate pair — the prune-before-exact-verify rung.
    "dedup_minhash_estimate" -> ((s, dir) =>
      Dedup.minhashEstimate(s, GraphIO.documents(s, dir))),
    "dedup_incremental_minhash" -> ((s, dir) => {
      val d = GraphIO.documents(s, dir)
      Dedup.incrementalMinhash(s,
        d.filter(col("doc_id") % 2 === 0), d.filter(col("doc_id") % 2 === 1))
    }),
    // Incremental cluster maintenance: clusters(even corpus) + odd
    // delta must equal from-scratch clusters of the full corpus — the
    // gate shares dedup_clusters' oracle verbatim, so the equality IS
    // the check (including new docs bridging previously separate
    // clusters).
    "dedup_clusters_incremental" -> ((s, dir) => {
      val d = GraphIO.documents(s, dir)
      Dedup.incrementalClusters(s,
        d.filter(col("doc_id") % 2 === 0), d.filter(col("doc_id") % 2 === 1))
    }),
    // TRUE O(delta) cluster maintenance: the even half's band index AND
    // resolved cluster assignments are written to parquet and read
    // back, so the timed path runs NO corpus-sized pass — only delta
    // signatures, the index probe, the delta self-join, and components
    // over star+probe edges. Shares dedup_clusters' from-scratch
    // oracle: the persisted-state path must equal a full rebuild.
    "dedup_clusters_incremental_indexed" -> ((s, dir) => {
      val d = GraphIO.documents(s, dir)
      val base = d.filter(col("doc_id") % 2 === 0)
      val tmp = "target/graft-clidx-" + dir.replaceAll("[^a-zA-Z0-9]", "_")
      Dedup.bandTable(s, base)
        .write.mode("overwrite").parquet(tmp + "/band_index")
      ConnectedComponents.clusters(
          Dedup.minhashLsh(s, base, ordered = false))
        .write.mode("overwrite").parquet(tmp + "/clusters_index")
      Dedup.incrementalClustersIndexed(s,
        s.read.parquet(tmp + "/band_index"),
        s.read.parquet(tmp + "/clusters_index"),
        d.filter(col("doc_id") % 2 === 1))
    }),
    // Band-index lifecycle proof: build gen-0 over a corpus where every
    // 10th document carries STALE text, append the true versions as
    // gen 1, compact — the result must equal a from-scratch rebuild
    // over the final corpus, which is exactly what the DuckDB oracle
    // computes. Retirement is load-bearing: if compaction failed to
    // drop the superseded signatures, the stale (different-text) sigs
    // would survive and hash-mismatch the rebuild.
    "band_index_lifecycle" -> ((s, dir) => {
      val d = GraphIO.documents(s, dir)
      val updated = d.filter(col("doc_id") % 10 === 0)
      val stale = updated
        .withColumn("text", concat(lit("STALE "), col("text")))
      val gen0 = Dedup.bandIndexEntries(s,
        d.filter(col("doc_id") % 10 =!= 0).unionByName(stale), gen = 0)
      val idx = Dedup.bandIndexAppend(gen0,
        Dedup.bandIndexEntries(s, updated, gen = 1))
      Dedup.bandIndexCompact(idx).orderBy(col("doc_id"), col("band"))
    }),
    // Context-window chunking with stride (doc → embedding inputs).
    "text_chunks" -> ((s, dir) =>
      Packing.chunkTokens(GraphIO.documents(s, dir), size = 32, stride = 16)),
    // Winnowing (MOSS) fingerprint selection over word 3-grams.
    "dedup_winnow" -> ((s, dir) =>
      Dedup.winnow(s, GraphIO.documents(s, dir), k = 3, w = 4)),
    // Z-order (Morton) value for the two-dimensional write layout.
    "layout_zorder" -> ((s, dir) =>
      GraphIO.documents(s, dir).select(col("doc_id"),
        graft.pipelines.Layout.zValue(col("doc_id"), col("n_chars"), 8)
          .as("z"))
        .orderBy(col("doc_id"))),
    // Per-source best-k curation by the composite quality score.
    "sample_topk_quality" -> ((s, dir) =>
      Sampling.topKPerGroup(GraphIO.documents(s, dir), "source", "doc_id",
        TF.qualityScore(col("text")), k = 10)),
    // Same result via the k-bounded TopKAgg (no full-group sort) —
    // shares the window formulation's oracle, proving partial-agg
    // equivalence under the gate.
    "sample_topk_quality_agg" -> ((s, dir) =>
      Sampling.topKPerGroupAgg(s, GraphIO.documents(s, dir), "source",
        "doc_id", TF.qualityScore(col("text")), k = 10)),
    // Dynamic-threshold curation: keep the best quality quartile.
    "sample_quality_cutoff" -> ((s, dir) =>
      TextMetrics.qualityCutoff(GraphIO.documents(s, dir))),
    // Efraimidis–Spirakis weighted draw, quality-weighted.
    "sample_weighted" -> ((s, dir) =>
      Sampling.weightedSample(s, GraphIO.documents(s, dir), "doc_id",
        TF.qualityScore(col("text")) + lit(0.1), n = 50)),
    // Temperature-scaled (alpha=0.5) mixture draw over sources.
    "sample_temperature" -> ((s, dir) =>
      Sampling.temperatureSample(s, GraphIO.documents(s, dir),
        "source", "doc_id", total = 200, alpha = 0.5)),
    // Token-budget curation: per source, the maximal quality-first
    // prefix whose running token total stays within the budget — the
    // selection a mixture builder runs once per-source budgets are set.
    "sample_token_budget" -> ((s, dir) =>
      Sampling.tokenBudgetPerGroup(GraphIO.documents(s, dir), "source",
        "doc_id", TF.qualityScore(col("text")),
        TF.tokenCount(col("text")), budget = 1500L)),
    // Skew-proof twin (r13 missing #3): the same selection from a
    // range-partitioned distributed prefix scan — bounded per-task
    // sorts however hot one source gets (a hash-salt cannot decompose
    // a prefix sum; range slices preserve the global order). Gated on
    // the UNCHANGED window-formulation oracle — the gate IS the
    // output-equality proof.
    "sample_token_budget_sliced" -> ((s, dir) =>
      Sampling.tokenBudgetPerGroupSliced(GraphIO.documents(s, dir),
        "source", "doc_id", TF.qualityScore(col("text")),
        TF.tokenCount(col("text")), budget = 1500L)),
    // Cross-source canonical pick over near-dup clusters: per cluster
    // keep the highest-priority source's member (doc_id tiebreak) —
    // dedup across datasets with a trust order, as a map-side-collapsing
    // hash aggregate (min over a (-prio, doc_id) struct), no per-cluster
    // sort. Priority here derives from the source suffix (mod 5, so
    // ties exercise the tiebreak); any integer expression works.
    // Contract: sources are `src<digits>` — the UNBOUNDED substring
    // from position 4 (matching the oracle's substr(source, 4) exactly;
    // the old 16-char cap silently truncated longer suffixes, ADVICE
    // r13) casts cleanly. A non-numeric suffix is null prio on the
    // Spark side but a hard CAST error in DuckDB — outside the
    // contract, the engines intentionally diverge loudly, not
    // silently.
    "dedup_canonical_priority" -> ((s, dir) =>
      Dedup.canonicalByPriority(s, GraphIO.documents(s, dir),
        expr("substring(source, 4)").cast("int") % 5)),
    // Indexed twin: survivors re-picked from PERSISTED cluster
    // assignments (a clusters_index output, round-tripped through
    // parquet in-gate) — the trust-policy-change path, which re-picks
    // canonicals WITHOUT re-running the corpus-sized dedup. Shares the
    // from-scratch oracle verbatim.
    "dedup_canonical_priority_indexed" -> ((s, dir) => {
      val base = "target/graft-canidx-" + dir.replaceAll("[^a-zA-Z0-9]", "_")
      val docs = GraphIO.documents(s, dir)
      ConnectedComponents.clusters(Dedup.minhashLsh(s, docs,
          ordered = false))
        .write.mode("overwrite").parquet(base)
      Dedup.canonicalByPriorityIndexed(docs, s.read.parquet(base),
        expr("substring(source, 4)").cast("int") % 5)
    }),
    // Count-Min point estimates over corpus tokens: probe terms plus
    // one absent probe (exercises the empty-cell → 0 path).
    "corpus_token_cms" -> ((s, dir) =>
      Sketches.cmsCounts(s,
        GraphIO.documents(s, dir)
          .select(explode(TF.tokens(col("text"))).as("tok")),
        col("tok"), CmsProbes)),
    // Exact heavy hitters: Misra-Gries bounded candidate pass + exact
    // recount of the ≤ k candidates — the output is exactly the tokens
    // with frequency > n/(k+1), merge-order-independent.
    "corpus_heavy_tokens" -> ((s, dir) =>
      Sketches.heavyHitters(s,
        GraphIO.documents(s, dir)
          .select(explode(TF.tokens(col("text"))).as("tok")),
        col("tok"))),
    // STREAMING twin of the CMS cell grid: the same tokens arrive via
    // readStream (continuous-ingest shape), the sketch aggregates in
    // complete mode — state is the bounded d×w grid regardless of
    // stream length — and the AvailableNow run drains the parquet as
    // one finite stream. The oracle is the batch cells SQL: streaming
    // and batch must produce the identical grid.
    "stream_token_cms" -> ((s, dir) => {
      val name = "graft_stream_cms_gate"
      val schema = GraphIO.documents(s, dir).schema
      // real directory-shaped file-stream source (GraphIO.streamingDir
      // byte-copies a single-file testdata table into a directory once;
      // directory-shaped corpora stream in place)
      val docs = s.readStream.schema(schema)
        .parquet(GraphIO.streamingDir(dir, "documents"))
      val toks = docs.select(explode(TF.tokens(col("text"))).as("tok"))
      s.catalog.dropTempView(name) // idempotent re-run in one session
      val q = Sketches.cmsSketch(s, toks, col("tok"))
        .writeStream.outputMode("complete").format("memory")
        .queryName(name)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      s.table(name).orderBy(col("r"), col("bucket"))
    }),
    // STREAMING sessionization twin: the explicit-state
    // flatMapGroupsWithState sessionizer (bounded state: one open
    // session per watermark-active user) drains the events directory
    // as one AvailableNow run. ts is µs-floored BEFORE the stream so
    // stream nanos arithmetic and the µs-resolution oracle see the
    // same instants. Oracle: the batch twin restricted to the sessions
    // a finite drain actually closes (see Oracles.streamSessionize).
    "stream_sessionize" -> ((s, dir) => {
      val name = "graft_stream_sessionize_gate"
      val ev = GraphIO.eventsStream(s, dir)
        .withColumn("ts", expr("ts div 1000 * 1000"))
      s.catalog.dropTempView(name) // idempotent re-run in one session
      val q = EventPipelines.sessionizeStream(s, ev,
          watermarkDelay = "0 seconds")
        .toDF()
        .writeStream.outputMode("append").format("memory").queryName(name)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      s.table(name)
        .select(col("user_id"), col("n_events"),
          expr("dur_ns div 1000").as("dur_us"))
        .orderBy(col("user_id"), col("n_events"), col("dur_us"))
    }),
    // Arbitrary-state-API sessionization twin: the SAME session
    // semantics on Spark 4's transformWithState (StatefulProcessor +
    // explicit event-time timers) — which only runs on the RocksDB
    // state store provider, so this gate simultaneously proves the
    // drains are backend-portable (off-heap state, the 100 TB
    // deployment default). Passes stream_sessionize's oracle
    // UNCHANGED.
    "stream_sessionize_tws" -> ((s, dir) => {
      val name = "graft_stream_sessionize_tws_gate"
      val ev = GraphIO.eventsStream(s, dir)
        .withColumn("ts", expr("ts div 1000 * 1000"))
      s.catalog.dropTempView(name) // idempotent re-run in one session
      Tws.withRocksDbStateStore(s) {
        val q = Tws.sessionizeStreamTws(s, ev, watermarkDelay = "0 seconds")
          .toDF()
          .writeStream.outputMode("append").format("memory").queryName(name)
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        q.awaitTermination()
      }
      s.table(name)
        .select(col("user_id"), col("n_events"),
          expr("dur_ns div 1000").as("dur_us"))
        .orderBy(col("user_id"), col("n_events"), col("dur_us"))
    }),
    // STREAMING tumbling-window stats: watermark + hourly window in
    // complete mode (state = windows × types, bounded) drained
    // AvailableNow — the canonical streaming aggregation, gated
    // against the same hour-bucket arithmetic in DuckDB.
    "stream_window" -> ((s, dir) => {
      val name = "graft_stream_window_gate"
      val ev = GraphIO.eventsStream(s, dir)
        .withColumn("ts", timestamp_micros(expr("ts div 1000")))
      s.catalog.dropTempView(name) // idempotent re-run in one session
      val q = EventPipelines.windowedStats(ev)
        .writeStream.outputMode("complete").format("memory").queryName(name)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      s.table(name)
        .select(col("window.start").cast("long").as("hour_ts"),
          col("event_type"), col("n"), round(col("total"), 6).as("total"))
        .orderBy(col("hour_ts"), col("event_type"))
    }),
    // STREAMING running totals: per-event emission from one
    // accumulator double per user; on the single-batch AvailableNow
    // drain the fold order equals the batch window's frame order, so
    // the batch oracle passes unchanged (no closed-set restriction —
    // every event emits at arrival, nothing waits on a watermark).
    "stream_running_totals" -> ((s, dir) => {
      val name = "graft_stream_running_gate"
      s.catalog.dropTempView(name) // idempotent re-run in one session
      val q = EventPipelines
        .runningTotalsStream(s, GraphIO.eventsStream(s, dir))
        .toDF()
        .writeStream.outputMode("append").format("memory").queryName(name)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      // batch-oracle equality leans on the single-batch fold order
      // (across batches the per-group (ts, event_id) sort is per-batch,
      // not global) — same loud guard as stream_range_join/stream_dedup
      requireSingleBatch(q, "stream_running_totals")
      s.table(name).orderBy(col("user_id"), col("event_id"))
    }),
    // CONCURRENT streaming drains: two structured-streaming queries —
    // the complete-mode windowed rollup and the append-mode
    // flatMapGroupsWithState running-totals fold — run AT THE SAME
    // TIME in one SparkSession over the same events source; both are
    // started before either is awaited. Composition evidence the
    // per-drain gates can't give: the queries share the session's
    // scheduler, memory, and state-store configuration, which is how
    // any real pipeline runs its drains. The gate value is the tagged
    // union of both outputs at full row fidelity, so the oracle (both
    // batch oracles, union'd under the same tags) catches cross-drain
    // interference in EITHER drain.
    "stream_two_drains" -> ((s, dir) => {
      val nameW = "graft_two_drains_window"
      val nameT = "graft_two_drains_totals"
      s.catalog.dropTempView(nameW) // idempotent re-run in one session
      s.catalog.dropTempView(nameT)
      val evW = GraphIO.eventsStream(s, dir)
        .withColumn("ts", timestamp_micros(expr("ts div 1000")))
      val qW = EventPipelines.windowedStats(evW)
        .writeStream.outputMode("complete").format("memory")
        .queryName(nameW)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      val qT = EventPipelines
        .runningTotalsStream(s, GraphIO.eventsStream(s, dir)).toDF()
        .writeStream.outputMode("append").format("memory")
        .queryName(nameT)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      // both live before either drains — genuinely concurrent
      qW.awaitTermination()
      qT.awaitTermination()
      // the totals leg has stream_running_totals' single-batch
      // fold-order dependence; the window leg is complete-mode
      // (batch-count-insensitive), no guard needed there
      requireSingleBatch(qT, "stream_two_drains/totals")
      val w = s.table(nameW).select(lit("window").as("drain"),
        concat(col("window.start").cast("long").cast("string"), lit("|"),
          col("event_type")).as("key"),
        col("n"), round(col("total"), 6).as("v"))
      val t = s.table(nameT).select(lit("totals").as("drain"),
        concat(col("user_id").cast("string"), lit("|"),
          col("event_id").cast("string")).as("key"),
        col("running_cents").as("n"), lit(0.0).as("v"))
      w.unionAll(t).orderBy(col("drain"), col("key"))
    }),
    // CHECKPOINTED RESTART, running-totals fold: drain the first half
    // of the events (by time) to a parquet sink with a
    // checkpointLocation, STOP the query, land the second half as a new
    // file, and resume with a brand-new query from the same checkpoint
    // ([[graft.streaming.Restart.twoPhaseDrain]]). The restored
    // accumulator state must continue the fold exactly where the
    // one-shot drain would be — the gate hashes the combined sink
    // against the UNCHANGED batch running-totals oracle, so a state
    // round-trip error of even one cent fails. Each phase is admitted
    // as 4 time-ordered micro-batches (maxFilesPerTrigger=1 over
    // (ts, event_id)-range slices), so the fold consumes every
    // per-user sequence in exact (ts, event_id) order across BOTH
    // batch and phase boundaries — the general resumed-drain shape,
    // not the r14 one-batch-per-phase crutch.
    "stream_restart_totals" -> ((s, dir) =>
      graft.streaming.Restart.twoPhaseDrain(s, GraphIO.events(s, dir),
          "totals", dir,
          src => EventPipelines.runningTotalsStream(s, src).toDF())
        .orderBy(col("user_id"), col("event_id"))),
    // CHECKPOINTED RESTART across a CHANGED OPERATOR (VERDICT r16 next
    // #8) — the remaining deployment shape: code EVOLVES between the
    // stop and the resume. Structured Streaming's recovery semantics
    // allow stateless filters/projections to change UPSTREAM of an
    // unchanged stateful operator (the checkpoint pins the stateful-
    // operator layout and state schema, not the stateless prefix); the
    // gate deploys exactly that change — phase 2 restarts the
    // running-totals fold from phase 1's checkpoint with an
    // `event_id % 2 = 0` filter newly added upstream. The restored
    // accumulators must CONTINUE over the filtered phase-2 sequence:
    // the oracle folds phase-1 events (ts <= the corpus mid-split)
    // unfiltered and phase-2 events filtered, in the same per-user
    // (ts, event_id) order — a skipped odd event that still bumped a
    // total, or a restart that silently rebuilt state from scratch,
    // is a loud hash mismatch.
    "stream_restart_evolved" -> ((s, dir) =>
      graft.streaming.Restart.twoPhaseDrain(s, GraphIO.events(s, dir),
          "evolved", dir,
          src => EventPipelines.runningTotalsStream(s, src).toDF(),
          pipeline2 = Some(src => EventPipelines.runningTotalsStream(s,
            src.filter(col("event_id") % 2 === 0)).toDF()))
        .orderBy(col("user_id"), col("event_id"))),
    // CHECKPOINTED RESTART, sessionization: the harder restore — open
    // sessions (start/last/count) and their event-time timeout
    // deadlines live in the state store across the stop, and the
    // restored WATERMARK gates which of them may flush. After the
    // restart, phase-2 events must extend/close phase-1's open sessions
    // exactly as a single drain would — and with 4 time-ordered
    // micro-batches per phase, MID-DRAIN watermark advances flush
    // sessions between batches too: a session any batch times out is
    // one the single drain would have closed with identical content
    // (any later event of that user lies beyond that batch's
    // watermark, hence beyond the session's gap deadline).
    // Shares the single-drain stream_sessionize oracle verbatim; ts is
    // µs-floored before the stream like that gate.
    "stream_restart_sessionize" -> ((s, dir) =>
      graft.streaming.Restart.twoPhaseDrain(s,
          GraphIO.events(s, dir)
            .withColumn("ts", expr("ts div 1000 * 1000")),
          "sessionize", dir,
          src => EventPipelines.sessionizeStream(s, src,
            watermarkDelay = "0 seconds").toDF())
        .select(col("user_id"), col("n_events"),
          expr("dur_ns div 1000").as("dur_us"))
        .orderBy(col("user_id"), col("n_events"), col("dur_us"))),
    // CHECKPOINTED RESTART under CHANGED PARALLELISM: the one knob a
    // deployment must not have to freeze across restarts. Spark pins
    // the stateful operators' shuffle-partition count in the
    // checkpoint's offset-log metadata and applies the CHECKPOINTED
    // value on resume (`OffsetSeqMetadata.relevantSQLConfs`), so a
    // restart under a resized session must WORK — this gate flips
    // `spark.sql.shuffle.partitions` between the two drains and hashes
    // the combined sink against the same never-stopped oracle. If the
    // engine ever read the session value instead, phase 2 would route
    // keys to partitions whose restored state lives elsewhere — lost
    // accumulators, wrong totals, loud hash mismatch.
    "stream_restart_repartitioned" -> ((s, dir) => {
      val key = "spark.sql.shuffle.partitions"
      val orig = s.conf.get(key)
      val altered = (scala.util.Try(orig.toInt)
        .getOrElse(s.sparkContext.defaultParallelism) * 2 + 1).toString
      val out =
        try graft.streaming.Restart.twoPhaseDrain(s, GraphIO.events(s, dir),
          "repart", dir,
          src => EventPipelines.runningTotalsStream(s, src).toDF(),
          betweenPhases = sess => sess.conf.set(key, altered))
        // restore BEFORE any action on `out`: the session serves every
        // later gate in this JVM
        finally s.conf.set(key, orig)
      out.orderBy(col("user_id"), col("event_id"))
    }),
    // CHECKPOINTED RESTART on the transformWithState/RocksDB path:
    // the deployment-grade state backend's restart is where RocksDB
    // CHANGELOG CHECKPOINTING actually differs from the HDFS-backed
    // default — open sessions AND their registered event-time TIMERS
    // must come back from the changelog across the stop, and phase-2
    // events must extend/close them exactly as the never-stopped
    // drain would. Same µs-floor, same unchanged single-drain
    // stream_sessionize oracle as the fMGWS restart gate.
    "stream_restart_tws" -> ((s, dir) =>
      Tws.withRocksDbStateStore(s) {
        graft.streaming.Restart.twoPhaseDrain(s,
            GraphIO.events(s, dir)
              .withColumn("ts", expr("ts div 1000 * 1000")),
            "tws", dir,
            src => Tws.sessionizeStreamTws(s, src,
              watermarkDelay = "0 seconds").toDF())
          .select(col("user_id"), col("n_events"),
            expr("dur_ns div 1000").as("dur_us"))
          .orderBy(col("user_id"), col("n_events"), col("dur_us"))
      }),
    // ...and the same restart under CHANGED PARALLELISM: RocksDB
    // instances are per state-store partition, so the checkpoint-
    // pinned partition count is what lets a resized session reopen
    // the right RocksDB instances (timers included) on resume.
    "stream_restart_tws_repartitioned" -> ((s, dir) => {
      val key = "spark.sql.shuffle.partitions"
      val orig = s.conf.get(key)
      val altered = (scala.util.Try(orig.toInt)
        .getOrElse(s.sparkContext.defaultParallelism) * 2 + 1).toString
      val out =
        try Tws.withRocksDbStateStore(s) {
          graft.streaming.Restart.twoPhaseDrain(s,
            GraphIO.events(s, dir)
              .withColumn("ts", expr("ts div 1000 * 1000")),
            "twsrepart", dir,
            src => Tws.sessionizeStreamTws(s, src,
              watermarkDelay = "0 seconds").toDF(),
            betweenPhases = sess => sess.conf.set(key, altered))
        } finally s.conf.set(key, orig)
      out.select(col("user_id"), col("n_events"),
          expr("dur_ns div 1000").as("dur_us"))
        .orderBy(col("user_id"), col("n_events"), col("dur_us"))
    }),
    // STREAMING stream-stream interval join twin of events_range_join:
    // both sides watermarked, event-time-bounded join condition → Spark
    // derives a state-retention horizon for both buffers. The single
    // AvailableNow drain sees every pair co-resident in one batch, so
    // the emitted set is exactly the batch interval join — the oracle is
    // the same range predicate in DuckDB at µs resolution (ts is
    // µs-floored going into the stream, like the batch twin's µs floor).
    "stream_range_join" -> ((s, dir) => {
      val name = "graft_stream_rangejoin_gate"
      val ev = GraphIO.eventsStream(s, dir)
        .withColumn("ts", timestamp_micros(expr("ts div 1000")))
      s.catalog.dropTempView(name) // idempotent re-run in one session
      val q = EventPipelines.rangeJoinStream(ev)
        .writeStream.outputMode("append").format("memory").queryName(name)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      requireSingleBatch(q, "stream_range_join")
      s.table(name)
        .select(col("err_id"), col("click_id"),
          (unix_micros(col("err_ts")) - unix_micros(col("click_ts")))
            .as("lag_us"))
        .orderBy(col("err_id"), col("click_id"))
    }),
    // STREAMING exact dedup: dropDuplicatesWithinWatermark keeps one
    // row per (user_id, event_type) with state bounded by the watermark
    // horizon. Which payload row survives depends on intra-batch arrival
    // order, so the gate projects only the key columns — the emitted KEY
    // set on a finite drain is exactly the distinct pairs, which is what
    // the DuckDB oracle checks.
    "stream_dedup" -> ((s, dir) => {
      val name = "graft_stream_dedup_gate"
      val ev = GraphIO.eventsStream(s, dir)
        .withColumn("ts", timestamp_micros(expr("ts div 1000")))
      s.catalog.dropTempView(name) // idempotent re-run in one session
      val q = EventPipelines.streamingDedup(ev)
        .writeStream.outputMode("append").format("memory").queryName(name)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      requireSingleBatch(q, "stream_dedup")
      s.table(name).select(col("user_id"), col("event_type"))
        .orderBy(col("user_id"), col("event_type"))
    }),
    // STREAMING percentiles: the integer-cents histogram aggregates in
    // complete mode (state = the VALUE DOMAIN, the same bound that
    // makes the batch formulation spill-proof — the histogram IS the
    // streaming quantile state), the drain hands the counted histogram
    // to the shared interpolation tail, and the batch percentiles
    // oracle passes UNCHANGED.
    "stream_percentiles" -> ((s, dir) => {
      val name = "graft_stream_pct_gate"
      val ev = GraphIO.eventsStream(s, dir)
      s.catalog.dropTempView(name) // idempotent re-run in one session
      val hist = ev.select(col("event_type"),
          round(col("value") * lit(100.0)).cast("long").as("c"))
        .groupBy(col("event_type"), col("c")).agg(count(lit(1)).as("cnt"))
      val q = hist
        .writeStream.outputMode("complete").format("memory").queryName(name)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      val p = graft.pipelines.Quantiles.contFromCounts(s.table(name),
        Seq("event_type"), "c", "cnt", Seq(0.5, 0.9, 0.99))
      p.groupBy(col("event_type"))
        .agg(max(col("n")).as("n"),
          round(max(when(col("q") === 0.5, col("p"))), 6).as("p50"),
          round(max(when(col("q") === 0.9, col("p"))), 6).as("p90"),
          round(max(when(col("q") === 0.99, col("p"))), 6).as("p99"))
        .orderBy(col("event_type"))
    }),
    // STREAMING percentiles, BOUNDED-STATE twin: the fixed-bin sketch
    // aggregator ([[graft.functions.FixedBinHistogramAgg]]) replaces
    // the exact value histogram — state is O(nbins) int64s per
    // event_type REGARDLESS of how many distinct values the stream
    // carries (the exact twin's state is value-domain-bounded, a
    // property only integer-cents-like domains enjoy). Exact-vs-approx
    // pairing, the ANN-recall-audit pattern: the gate emits the sketch
    // estimates NEXT TO the exact percentiles plus the observed
    // max-abs error, and asserts the documented width/2 bound — all
    // recomputed independently by the DuckDB oracle.
    "stream_percentiles_sketch" -> ((s, dir) => {
      val name = "graft_stream_pct_sketch_gate"
      val (lo, width, nbins) = PctSketchBins
      val ev = GraphIO.eventsStream(s, dir)
      s.catalog.dropTempView(name) // idempotent re-run in one session
      val sketch =
        graft.functions.FixedBinHistogramAgg.asUdaf(lo, width, nbins)
      // NaN filtered next to NULL on BOTH legs: the aggregator skips
      // NaN (no meaningful bin), so the exact twin below must not count
      // it either — and the DuckDB oracle's least/greatest clamp would
      // place NaN differently anyway (ADVICE r13).
      val q = ev.filter(col("value").isNotNull && !isnan(col("value")))
        .groupBy(col("event_type")).agg(sketch(col("value")).as("bins"))
        .writeStream.outputMode("complete").format("memory").queryName(name)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      val binned = s.table(name)
        .select(col("event_type"),
          posexplode(col("bins")).as(Seq("bin", "cnt")))
        .filter(col("cnt") > 0)
        .select(col("event_type"),
          graft.pipelines.Quantiles.binMidpoint(col("bin"), lo, width)
            .as("m"),
          col("cnt"))
      val qs = Seq(0.5, 0.9, 0.99)
      val est = graft.pipelines.Quantiles.contFromCounts(binned,
        Seq("event_type"), "m", "cnt", qs)
      val exactHist = GraphIO.events(s, dir)
        .filter(col("value").isNotNull && !isnan(col("value")))
        .groupBy(col("event_type"), col("value"))
        .agg(count(lit(1)).as("cnt"))
      val exact = graft.pipelines.Quantiles.contFromCounts(exactHist,
        Seq("event_type"), "value", "cnt", qs)
      def wide(df: DataFrame, tag: String) = df.groupBy(col("event_type"))
        .agg(max(col("n")).as(s"n_$tag"),
          round(max(when(col("q") === 0.5, col("p"))), 6).as(s"p50_$tag"),
          round(max(when(col("q") === 0.9, col("p"))), 6).as(s"p90_$tag"),
          round(max(when(col("q") === 0.99, col("p"))), 6).as(s"p99_$tag"))
      val joined = wide(est, "sketch")
        .join(wide(exact, "exact"), Seq("event_type"))
      val errs = Seq("p50", "p90", "p99").map(p =>
        abs(col(s"${p}_sketch") - col(s"${p}_exact")))
      joined.select(col("event_type"), col("n_sketch").as("n"),
          col("p50_sketch"), col("p90_sketch"), col("p99_sketch"),
          col("p50_exact"), col("p90_exact"), col("p99_exact"),
          round(greatest(errs: _*), 6).as("err_max"))
        .withColumn("within_bound",
          when(col("err_max") <= lit(width / 2), 1).otherwise(0))
        .orderBy(col("event_type"))
    }),
    // STREAMING percentiles, UNBOUNDED-DOMAIN twin — the quantile
    // ladder's last rung: Spark's own Greenwald-Khanna summary
    // (percentile_approx, a TypedImperativeAggregate) as the streaming
    // state — O(1/ε·log εn) per group over ANY orderable domain, no
    // schema knowledge needed (the fixed-bin sketch needs [lo, hi)).
    // The GK estimate value is arrival-order dependent, so the gate
    // emits the GUARANTEE instead: each drained estimate's true rank
    // bracket is recomputed against the batch corpus
    // (Quantiles.approxRankAudit) and checked against the ε bound; the
    // DuckDB oracle supplies the (event_type × q) universe, n, and the
    // expected all-1 flags, so a bound violation hash-mismatches.
    "stream_percentiles_gk" -> ((s, dir) => {
      val name = "graft_stream_pct_gk_gate"
      val acc = 1000 // ε = 1/1000 → rank error ≤ n/1000 + 1
      val qs = Seq(0.5, 0.9, 0.99)
      val ev = GraphIO.eventsStream(s, dir)
      s.catalog.dropTempView(name) // idempotent re-run in one session
      val q = ev.filter(col("value").isNotNull)
        .groupBy(col("event_type"))
        .agg(percentile_approx(col("value"), array(qs.map(lit): _*),
          lit(acc)).as("est"))
        .writeStream.outputMode("complete").format("memory").queryName(name)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      val est = s.table(name).select(col("event_type"),
        posexplode(col("est")).as(Seq("qi", "est")))
      graft.pipelines.Quantiles.approxRankAudit(
        GraphIO.events(s, dir), "event_type", col("value"), est, qs, acc)
    }),
    // STREAM → CURATE composition — the first end-to-end
    // ingest-to-training-set path: a documents INGEST stream (the
    // corpus plus re-ingested copies of every 3rd doc under shifted
    // ids — re-crawls/duplicate submissions) flows through a
    // WATERMARKED streaming dedup keyed on the normalized text (state
    // = keys inside the horizon; at 100 TB key on the wide fingerprint
    // instead of the text), and the deduplicated classes feed the
    // BATCH near-dup canonical pick. The STREAM's contract is the
    // KEY SET — each normalized-text class emitted exactly once within
    // the horizon (asserted below; which payload row carries the key
    // out is intra-batch arrival order, which is not a curation
    // policy) — while SURVIVOR IDENTITY is materialized batch-side by
    // the min-doc_id rule, exactly what the DuckDB oracle replays:
    // min-id survivor per class, then the canonical chain over that
    // subset.
    "stream_ingest_curate" -> ((s, dir) => {
      val name = "graft_stream_ingest_gate"
      val reShift = 1000000000L
      val docs = GraphIO.documents(s, dir)
        .select(col("doc_id"), col("source"), col("text"))
      val ingest = docs.unionByName(
        docs.filter(col("doc_id") % 3 === 0)
          .withColumn("doc_id", col("doc_id") + lit(reShift)))
      val srcDir = "target/graft-ingest-" + dir.replaceAll("[^a-zA-Z0-9]", "_")
      ingest.coalesce(1).write.mode("overwrite").parquet(srcDir)
      val schema = s.read.parquet(srcDir).schema
      s.catalog.dropTempView(name) // idempotent re-run in one session
      val q = s.readStream.schema(schema).parquet(srcDir)
        .withColumn("norm_text", TF.normalizeText(s, col("text")))
        .withColumn("event_time", timestamp_micros(col("doc_id")))
        .withWatermark("event_time", "1 hour")
        .dropDuplicatesWithinWatermark("norm_text")
        .writeStream.outputMode("append").format("memory").queryName(name)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      requireSingleBatch(q, "stream_ingest_curate")
      val drainedKeys = s.table(name).select(col("norm_text"))
      // per-class min-id survivors — the deterministic identity rule
      val expected = ingest
        .select(TF.normalizeText(s, col("text")).as("norm_text"),
          col("doc_id"))
        .groupBy(col("norm_text")).agg(min(col("doc_id")).as("doc_id"))
      // the streaming dedup's contract, asserted loudly: the emitted
      // key set IS the class set, each key exactly once (a dropped or
      // duplicated key here means broken dedup state, not noise)
      val extra = drainedKeys
        .join(expected.select(col("norm_text")), Seq("norm_text"),
          "left_anti").count()
      val missing = expected.select(col("norm_text"))
        .join(drainedKeys, Seq("norm_text"), "left_anti").count()
      val dupEmits = drainedKeys.count() - expected.count()
      require(extra == 0 && missing == 0 && dupEmits == 0,
        s"stream_ingest_curate: streamed key set diverges from the " +
          s"normalized-text classes ($extra unknown, $missing missing, " +
          s"$dupEmits duplicate emissions) — streaming dedup state is " +
          "broken; fix before trusting the oracle")
      Dedup.canonicalByPriority(s,
        ingest.join(expected.select(col("doc_id")), Seq("doc_id"))
          .select(col("doc_id"), col("source"), col("text")),
        expr("substring(source, 4)").cast("int") % 5)
    }),
    // ---- retrieval: keyword, hybrid sparse+dense, inverted index ----
    "search_bm25" -> ((s, dir) =>
      Retrieval.bm25(GraphIO.documents(s, dir), SearchTerms)),
    "search_hybrid_rrf" -> ((s, dir) =>
      Retrieval.hybridRrf(GraphIO.documents(s, dir),
        GraphIO.embeddings(s, dir), SearchTerms, queryVecId = 0L)),
    "text_inverted_index" -> ((s, dir) =>
      Retrieval.invertedIndex(GraphIO.documents(s, dir),
        minDf = 2, maxDf = 400)))

  /** The stream_range_join / stream_dedup gates are batch-equivalent
    * ONLY when the AvailableNow drain processes all input files in one
    * micro-batch: a watermark advance between batches would silently
    * drop cross-batch pairs/keys and diverge from the batch oracle. The
    * parquet source does that today (no maxFilesPerTrigger set); this
    * assertion makes a future source-config change fail loudly instead
    * of corrupting the gate. */
  private def requireSingleBatch(
      q: org.apache.spark.sql.streaming.StreamingQuery,
      gate: String): Unit = {
    val dataBatches = q.recentProgress.count(_.numInputRows > 0)
    require(dataBatches == 1,
      s"$gate: expected ONE data micro-batch on the AvailableNow drain " +
        s"(cross-batch watermark eviction would corrupt the gate); " +
        s"saw $dataBatches")
  }

  /** sfDir-scoped table prefix for the bucketed layout, so one JVM
    * touching several scale factors can never read a stale layout. */
  private def bucketedPrefix(s: SparkSession, dir: String): String =
    "graft_bucketed_" + dir.replaceAll("[^a-zA-Z0-9]", "_")

  /** Oracle-aligned projection of [[Multimodal.extractFeatures]] rows:
    * 6-decimal rounding on the float features, histogram exploded to
    * (pos, hist_v) scalar rows — the driver's comparator sorts result
    * columns with pandas, which cannot order an array-typed column. The
    * native array-valued API ([[Multimodal.extractFeatures]]) is
    * unchanged. */
  private def featureRows(feats: DataFrame): DataFrame =
    feats.select(col("doc_id"), col("n_bytes"),
      round(col("byte_mean"), 6).as("byte_mean"),
      posexplode(transform(col("hist"), v => round(v, 6)))
        .as(Seq("pos", "hist_v")))
      .select(col("doc_id"), col("n_bytes"), col("byte_mean"),
        col("pos").cast("long").as("pos"), col("hist_v"))
      .orderBy(col("doc_id"), col("pos"))

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. */
  def oracleSql: Map[String, String] = Map(
    "hits_base" -> Oracles.hitsBase,
    "hits_weighted" -> Oracles.hitsWeighted,
    "hits_weighted_alt" -> Oracles.hitsWeightedAlt,
    "hits_teleport" -> Oracles.hitsTeleport(),
    "hits_topic" -> Oracles.hitsTopic(Topic),
    "hits_topic_exclusive" -> Oracles.hitsTopicExclusive(Topic),
    "hits_query_dependent" -> Oracles.hitsQueryDependent(Topic),
    "hits_bucketed" -> Oracles.hitsBase,
    "graph_bucketed_write" -> Oracles.bucketedWrite,
    "salsa_simplified" -> Oracles.salsaSimplifiedBase,
    "salsa_iterative" -> Oracles.salsaIterativeBase,
    "salsa_bucketed" -> Oracles.salsaIterativeBase,
    "salsa_weighted" -> Oracles.salsaWeighted,
    "salsa_teleport" -> Oracles.salsaTeleport(),
    "salsa_topic" -> Oracles.salsaTopic(Topic),
    "salsa_query_dependent" -> Oracles.salsaQueryDependent(Topic),
    "topics_list" -> Oracles.topicsList,
    "graph_degrees" -> Oracles.degrees,
    "graph_triangles" -> Oracles.triangles(),
    "evt_graph_triangles" ->
      Oracles.triangles(graph = Oracles.eventGraphCtes),
    "evt_graph_label_prop" ->
      Oracles.labelProp(graph = Oracles.eventGraphCtes),
    "graph_link_predict" -> Oracles.linkPredict(),
    "graph_label_prop" -> Oracles.labelProp(),
    "graph_kcore" -> Oracles.kCore(),
    // The *_indexed gates share the from-scratch oracles VERBATIM —
    // that sharing IS the lifecycle proof (persisted projection ==
    // recomputed projection, bit for bit).
    "graph_triangles_weighted" -> Oracles.trianglesWeighted(),
    "graph_kcore_weighted" -> Oracles.kCoreWeighted(),
    "graph_label_prop_weighted" -> Oracles.labelProp(weighted = true),
    "graph_triangles_approx" -> Oracles.trianglesApprox(),
    "evt_graph_link_predict" ->
      Oracles.linkPredict(graph = Oracles.eventGraphCtes),
    "evt_graph_kcore" -> Oracles.kCore(graph = Oracles.eventGraphCtes),
    "graph_link_predict_weighted" -> Oracles.linkPredictWeighted(),
    "graph_triangles_indexed" -> Oracles.triangles(),
    "graph_link_predict_indexed" -> Oracles.linkPredict(),
    "graph_label_prop_indexed" -> Oracles.labelProp(),
    "graph_kcore_indexed" -> Oracles.kCore(),
    "graph_kcore_weighted_indexed" -> Oracles.kCoreWeighted(),
    "graph_triangles_weighted_indexed" -> Oracles.trianglesWeighted(),
    "graph_label_prop_weighted_indexed" -> Oracles.labelProp(weighted = true),
    "graph_link_predict_weighted_indexed" -> Oracles.linkPredictWeighted(),
    "graph_components" -> Oracles.graphComponents(),
    "graph_components_weighted" ->
      Oracles.graphComponents(minStrength = ComponentStrengthFloor),
    "evt_graph_components" ->
      Oracles.graphComponents(graph = Oracles.eventGraphCtes),
    "graph_components_indexed" -> Oracles.graphComponents(),
    "graph_components_weighted_indexed" ->
      Oracles.graphComponents(minStrength = ComponentStrengthFloor),
    "graph_ktruss" -> Oracles.kTruss(),
    "graph_ktruss_indexed" -> Oracles.kTruss(),
    "rank_topk" -> Oracles.rankTopK(),
    "sample_hash" -> Oracles.sampleHash(),
    "render_model" -> Oracles.renderModel(),
    "evt_hits_base" -> Oracles.hitsEventBase,
    "pagerank" -> Oracles.pageRank(),
    "pagerank_personalized" -> Oracles.pageRankPersonalized(Topic),
    "pagerank_converged" -> Oracles.pageRankConverged(numIter = 25),
    "evt_salsa_weighted" -> Oracles.salsaEventWeighted,
    "hits_converged" -> Oracles.hitsConverged(numIter = 12),
    "salsa_converged" -> Oracles.salsaConverged(numIter = 13),
    "events_sessionize" -> Oracles.sessionize(),
    "events_sessionize_native" -> Oracles.sessionize(),
    "events_sessionize_salted" -> Oracles.sessionize(),
    "events_window" -> Oracles.eventsWindow,
    "events_rollup" -> Oracles.eventsRollup,
    "events_active_time" -> Oracles.eventsActiveTime(),
    "events_decayed" -> Oracles.eventsDecayedCounts(),
    "events_running_totals" -> Oracles.eventsRunningTotals(),
    "skew_salted_join" -> Oracles.skewSaltedJoin,
    "events_props_json" -> Oracles.eventsPropsJson,
    "events_asof" -> Oracles.eventsAsof,
    "events_range_join" -> Oracles.eventsRangeJoin(),
    "events_top_users" -> Oracles.eventsTopUsers,
    "events_kmv_users" -> Oracles.eventsKmvUsers(),
    "corpus_shingle_kmv" -> Oracles.corpusShingleKmv(),
    "corpus_source_overlap_kmv" -> Oracles.corpusSourceOverlapKmv(),
    "text_stats" -> Oracles.textStats,
    "text_repetition" -> Oracles.textRepetition,
    "text_tfidf" -> Oracles.textTfidf,
    "text_scrub" -> Oracles.textScrub("(customer|supplier)", "[X]"),
    "corpus_mixture" -> Oracles.corpusMixture,
    "sample_quota" -> Oracles.sampleQuota(),
    "sample_split" -> Oracles.sampleSplit(),
    "corpus_shuffle" -> Oracles.corpusShuffle,
    "pack_sequences" -> Oracles.packSequences(),
    "pack_manifest" -> Oracles.packManifest(),
    "decontaminate" -> Oracles.decontaminate(),
    "decontaminate_bloom" -> Oracles.decontaminateBloom(),
    "embed_quantize" -> Oracles.embedQuantize,
    "ann_topk_q8" -> Oracles.annTopKQ8(),
    "ann_topk_pq" -> Oracles.annTopKPq(),
    "ann_topk_pq_ivf" -> Oracles.annTopKPqIvf(),
    "ann_topk_q8_ivf" -> Oracles.annTopKQ8Ivf(),
    "ann_topk_q8_ivf_sampled" -> Oracles.annTopKQ8Ivf(trainPermille = 500),
    "events_percentiles" -> Oracles.eventsPercentiles,
    "stream_percentiles" -> Oracles.eventsPercentiles,
    "stream_percentiles_sketch" -> Oracles.eventsPercentilesSketch(
      PctSketchBins._1, PctSketchBins._2, PctSketchBins._3),
    "stream_percentiles_gk" -> Oracles.eventsPercentilesGk(
      Seq(0.5, 0.9, 0.99)),
    "text_fingerprint" -> Oracles.textFingerprint,
    "text_normalize" -> Oracles.textNormalize,
    "pipeline_clean_corpus" -> Oracles.pipelineCleanCorpus(),
    "dedup_exact" -> Oracles.dedupExact,
    "dedup_exact_hash" -> Oracles.dedupExactHash,
    "text_langid_ngram" -> Oracles.textLangIdNgram,
    "text_bpe_tokens" -> Oracles.textBpeTokensTrained(),
    "bpe_train" -> Oracles.bpeTrain(),
    "bpe_train_fast" -> Oracles.bpeTrain(),
    "dedup_simhash" -> Oracles.dedupSimhash,
    "dedup_clusters" -> Oracles.dedupClusters,
    "dedup_canonical_priority" -> Oracles.dedupCanonicalPriority(
      "CAST(substr(source, 4) AS INT) % 5"),
    "stream_ingest_curate" -> Oracles.streamIngestCurate(
      "CAST(substr(source, 4) AS INT) % 5", reShift = 1000000000L,
      everyK = 3),
    "dedup_canonical_priority_indexed" -> Oracles.dedupCanonicalPriority(
      "CAST(substr(source, 4) AS INT) % 5"),
    "sample_token_budget" -> Oracles.sampleTokenBudget(1500L),
    "sample_token_budget_sliced" -> Oracles.sampleTokenBudget(1500L),
    "dedup_clusters_star" -> Oracles.dedupClusters,
    "pipeline_near_dedup" -> Oracles.pipelineNearDedup,
    "dedup_minhash_lsh" -> Oracles.dedupMinHashLsh,
    "dedup_minhash_signature" -> Oracles.dedupMinHashSignature,
    "dedup_ngram_jaccard" -> Oracles.dedupNgramJaccard(),
    "dedup_passages" -> Oracles.dedupPassages(),
    "dedup_spans" -> Oracles.dedupSpans(),
    "dedup_spans_occ" -> Oracles.dedupSpans(minOcc = 2),
    "dedup_spans_clean" -> Oracles.dedupSpansClean(),
    "dedup_embedding" -> Oracles.dedupEmbedding(0.3),
    "dedup_semantic" -> Oracles.dedupSemantic(0.3),
    "ann_topk" -> Oracles.annTopK(),
    "ann_recall_audit" -> Oracles.annRecallAudit(),
    "ann_recall_audit_appended" -> Oracles.annRecallAuditAppended(),
    "ann_topk_ivf_persisted" -> Oracles.annTopKIvf(),
    "ann_topk_ivf_appended" -> Oracles.annTopKIvf(),
    "corpus_clusters" -> Oracles.corpusClusters(),
    "ann_topk_mrl" -> Oracles.annTopKMrl(),
    "ann_topk_mrl_ivf" -> Oracles.annTopKMrlIvf(),
    "ann_topk_lsh" -> Oracles.annTopKLsh(),
    "ann_topk_ivf" -> Oracles.annTopKIvf(),
    "multimodal_chunks" -> Oracles.multimodalChunks(),
    "multimodal_meta" -> Oracles.multimodalMeta,
    "multimodal_features" -> Oracles.multimodalFeatures,
    "multimodal_image_roundtrip" -> Oracles.multimodalImageRoundtrip,
    "multimodal_audio_roundtrip" -> Oracles.multimodalAudioRoundtrip,
    "multimodal_resize" -> Oracles.multimodalResize(),
    "multimodal_resize_real" -> Oracles.multimodalResizeReal(factor = 2),
    "multimodal_frames" -> Oracles.multimodalFrames(stride = 2),
    "corpus_quote_matrix" -> Oracles.corpusQuoteMatrix(),
    "dedup_containment" -> Oracles.dedupContainment(threshold = 0.5),
    "pipeline_curate" -> Oracles.pipelineCurate(
      minQuality = 0.5, lang = "en", total = 100, alpha = 0.5),
    "dedup_incremental" -> Oracles.dedupIncremental,
    "dedup_incremental_minhash" -> Oracles.dedupIncrementalMinhash,
    "band_index_lifecycle" -> Oracles.bandIndexLifecycle,
    "dedup_clusters_incremental" -> Oracles.dedupClusters,
    "dedup_clusters_incremental_indexed" -> Oracles.dedupClusters,
    "dedup_minhash_estimate" -> Oracles.dedupMinhashEstimate,
    "text_chunks" -> Oracles.textChunks(size = 32, stride = 16),
    "dedup_winnow" -> Oracles.dedupWinnow(k = 3, w = 4),
    "layout_zorder" -> Oracles.layoutZorder(bits = 8),
    "sample_topk_quality" -> Oracles.sampleTopkQuality(k = 10),
    "sample_topk_quality_agg" -> Oracles.sampleTopkQuality(k = 10),
    "text_char_entropy" -> Oracles.textCharEntropy,
    "text_unigram_nll" -> Oracles.textUnigramNll,
    "classify_nb" -> Oracles.classifyNaiveBayes("lang"),
    "classify_nb_source" -> Oracles.classifyNaiveBayes("source"),
    "text_bigram_nll" -> Oracles.textBigramNll,
    "sample_quality_cutoff_by_source" ->
      Oracles.sampleQualityCutoffBySource(),
    "text_vocabulary" -> Oracles.textVocabulary(),
    "sample_temperature" -> Oracles.sampleTemperature(total = 200, alpha = 0.5),
    "sample_weighted" -> Oracles.sampleWeighted(n = 50),
    "sample_quality_cutoff" -> Oracles.sampleQualityCutoff(),
    "corpus_token_cms" -> Oracles.corpusTokenCms(CmsProbes),
    "stream_token_cms" -> Oracles.streamTokenCms,
    "stream_sessionize" -> Oracles.streamSessionize(),
    "stream_sessionize_tws" -> Oracles.streamSessionize(),
    "stream_running_totals" -> Oracles.eventsRunningTotals(),
    "stream_restart_evolved" -> Oracles.eventsRunningTotalsEvolved(),
    // restart gates share the single-drain oracles VERBATIM: state
    // restore across a checkpointed restart must be indistinguishable
    // from never having stopped
    "stream_restart_totals" -> Oracles.eventsRunningTotals(),
    "stream_restart_sessionize" -> Oracles.streamSessionize(),
    // resized-session restart: state partitioning is pinned by the
    // checkpoint, so the oracle is again the never-stopped fold
    "stream_restart_repartitioned" -> Oracles.eventsRunningTotals(),
    "stream_restart_tws" -> Oracles.streamSessionize(),
    "stream_restart_tws_repartitioned" -> Oracles.streamSessionize(),
    "stream_window" -> Oracles.streamWindow,
    "stream_two_drains" -> Oracles.streamTwoDrains(),
    "stream_range_join" -> Oracles.streamRangeJoin(),
    "stream_dedup" -> Oracles.streamDedup,
    "corpus_heavy_tokens" -> Oracles.corpusHeavyTokens(),
    "search_bm25" -> Oracles.bm25Search(SearchTerms),
    "search_hybrid_rrf" -> Oracles.hybridRrf(SearchTerms, queryVecId = 0L),
    "text_inverted_index" -> Oracles.invertedIndex(2, 400))
}
