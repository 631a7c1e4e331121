package graft.pipelines

import graft.functions.{GraftHash, KmvAgg}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic K-minimum-values (KMV) sketch — approximate distinct
  * counting whose sketch AND estimate are integer-exact across engines,
  * so even the approximate answer is DuckDB-oracle-gateable (stock
  * sketches — HLL++, approx_count_distinct — hash differently per
  * engine and can only be checked against error bounds).
  *
  * Per value, a deterministic ~60-bit hash `c = graft_hash(ext) ·
  * (1e9+9) + graft_hash2(ext)` over the salted-repeat extension `ext =
  * v‖'|'‖v‖'#'‖v` (the repetition forces the polynomial folds through
  * many modulus wraps, decorrelating short inputs; the pair (h1, h2) is
  * then ~uniform on its product range `R = (1e9+7)·(1e9+9)` and the
  * pairing is a bijection, so `c` is ~uniform on `[0, R)`). The sketch
  * is the group's K smallest distinct `c` values; with `c_(K)` the Kth
  * smallest, the standard KMV estimator is
  *
  *   n̂ = (K−1) · R / c_(K),   exact when the group holds < K distinct
  *
  * (order statistics of uniforms; σ ≈ 1/√(K−2) ≈ 6.3% at K = 256 —
  * measured +2.4% at 20k and +6.8% at 1M true distinct). Unlike HLL it
  * needs no power-of-two hash domain — only uniformity on the hash's
  * ACTUAL range — which is what makes a mod-prime-hash sketch sound.
  *
  * Scale shape: [[graft.functions.KmvAgg]] is algebraic — map-side
  * partials ship ≤ K int64s per (partition, group) regardless of input
  * size, duplicates are absorbed in the buffer (no upstream distinct
  * shuffle), and sketches of different partitions / days / corpora
  * merge by k-smallest-of-union ([[kmvMerge]]) into the sketch of the
  * combined corpus. */
object Sketches {

  val K = 256

  /** The ~60-bit deterministic hash of a string column (salted-repeat
    * extension + paired polynomial folds — see object doc). Uses the
    * fused [[GraftHash.widePair]] expression: both folds in one pass
    * over the (tripled) extension. */
  def wideHash(spark: SparkSession, c: Column): Column =
    GraftHash.widePair(spark, concat(c, lit("|"), c, lit("#"), c))

  /** Per-group KMV sketch: `(grp, sketch)` with `sketch` the sorted
    * array of the group's ≤ K smallest distinct hash values. `value`
    * must be a string column (cast ids explicitly so the oracle hashes
    * the same characters); null values are excluded. */
  def kmvSketch(spark: SparkSession, df: DataFrame, group: Column,
      value: Column): DataFrame = {
    import spark.implicits._
    // The group column is cast to string here (matching how callers cast
    // the value column): a numeric group would otherwise fail the typed
    // .as[(String, Long)] with an opaque up-cast AnalysisException.
    df.filter(value.isNotNull)
      .select(group.cast("string").as("grp"), wideHash(spark, value).as("h"))
      .as[(String, Long)]
      .groupByKey(_._1).mapValues(_._2)
      .agg(new KmvAgg(K).toColumn.name("sketch"))
      .toDF("grp", "sketch")
  }

  /** Merge sketch tables — the sketch of the union of the inputs. */
  def kmvMerge(spark: SparkSession, tables: DataFrame*): DataFrame = {
    import spark.implicits._
    tables.reduce(_ unionAll _)
      .select(col("grp"), explode(col("sketch")).as("h"))
      .as[(String, Long)]
      .groupByKey(_._1).mapValues(_._2)
      .agg(new KmvAgg(K).toColumn.name("sketch"))
      .toDF("grp", "sketch")
  }

  /** Estimate per group from a sketch table: `(grp, kmv_distinct)`,
    * rounded to 4 decimals. The estimator constant is written in the
    * oracle's exact operation order so both engines run the identical
    * IEEE expression over the identical integer `c_(K)`. */
  def kmvEstimate(sketch: DataFrame): DataFrame =
    sketch.select(col("grp"),
      round(when(size(col("sketch")) < K,
          size(col("sketch")).cast("double"))
        .otherwise(lit((K - 1).toDouble) * lit(1.000000007e9 * 1.000000009e9) /
          element_at(col("sketch"), K).cast("double")), 4)
        .as("kmv_distinct"))

  /** Approximate distinct `value` per `group` in one call. */
  def kmvDistinct(spark: SparkSession, df: DataFrame, group: Column,
      value: Column): DataFrame =
    kmvEstimate(kmvSketch(spark, df, group, value)).orderBy(col("grp"))

  /** Sketch-based Jaccard between every pair of groups — the
    * source-overlap audit of a training-data pipeline (which corpora
    * duplicate each other) without ever joining the underlying value
    * sets: with `M` the K smallest of the two sketches' union,
    *
    *   Ĵ(A,B) = |M ∩ S(A) ∩ S(B)| / |M|
    *
    * (M is a uniform sample of A∪B, so the member fraction estimates
    * |A∩B|/|A∪B|; exact when the union holds < K distinct values;
    * σ ≈ √(J(1−J)/K)). Everything is integer set algebra on ≤K-element
    * arrays — codegen'd array ops over the tiny sketch table, no
    * shuffle of the raw data beyond the sketch aggregation itself. */
  // ----------------------- Count-Min sketch -----------------------

  /** CMS geometry: `CmsDepth` pairwise-decorrelated row hashes over
    * `CmsWidth` buckets — d·w = 2048 int64 cells total, the fixed-size
    * frequency summary a pipeline keeps per corpus/day/shard. Error is
    * the standard CMS bound: overestimate only, ≤ 2N/w with prob.
    * 1 − (1/2)^d over the row hashes. */
  val CmsDepth = 4
  val CmsWidth = 512

  private val P = 1000000007L
  private val L2 = 1000000009L

  /** Row-hash multipliers — the first `CmsDepth` of the MinHash slot
    * params: `bucket_r = ((a_r·h1 + b_r·h2) mod P) mod w`, linear in
    * both ~30-bit components of the wide hash (`a·h1 + b·h2 < 2.7e11 ≪
    * 2⁶³`, no overflow — see [[graft.MinHashParams]]). */
  private def cmsRowParams: Seq[(Long, Long)] =
    graft.MinHashParams.params.take(CmsDepth)

  /** Count-Min sketch of `value` occurrences (WITH multiplicity —
    * unlike [[kmvSketch]], which counts distincts): `(r, bucket, cnt)`
    * with exactly ≤ `CmsDepth`·`CmsWidth` rows regardless of input
    * size. Algebraic and order-independent (bucket counts are sums), so
    * partial sketches of shards merge by adding cell counts — and the
    * whole sketch is oracle-gateable bit-exact, like the KMV family.
    *
    * Scale shape: one codegen'd projection (hash + explode to d rows)
    * into one hash aggregation whose key space is the FIXED d·w cell
    * grid — map-side combine reduces every partition to ≤ 2048 rows
    * before the (trivial) shuffle. Nothing scales with corpus size.
    *
    * Streaming: pass a `readStream` DataFrame and write with
    * `outputMode("complete")` — the aggregation state IS the d·w cell
    * grid, bounded by construction, so this is the rare unbounded-key-
    * free streaming aggregate that needs no watermark (spec-gated
    * against the batch twin in `EventStreamingSpec`). */
  def cmsSketch(spark: SparkSession, df: DataFrame,
      value: Column): DataFrame =
    cmsCells(spark, df.select(value.cast("string").as("v")))

  private def cmsCells(spark: SparkSession, vals: DataFrame): DataFrame =
    withCoords(spark, vals)
      .groupBy(col("r"), col("bucket"))
      .agg(count(lit(1)).as("cnt"))

  /** Adds exploded `(r, bucket)` coords to `vals` (string column `v`,
    * other columns preserved). */
  private def withCoords(spark: SparkSession, vals: DataFrame): DataFrame = {
    val keep = vals.columns.filter(_ != "v").map(col).toSeq
    val hh = vals.filter(col("v").isNotNull)
      .select(keep :+ wideHash(spark, col("v")).as("wh"): _*)
      .select(keep :+ expr(s"wh div $L2").as("h1") :+
        (col("wh") % lit(L2)).as("h2"): _*)
    val cells = cmsRowParams.zipWithIndex.map { case ((a, b), r) =>
      struct(lit(r.toLong).as("r"),
        (((lit(a) * col("h1") + lit(b) * col("h2")) % lit(P)) %
          lit(CmsWidth.toLong)).as("bucket"))
    }
    hh.select(keep :+ explode(array(cells: _*)).as("rb"): _*)
      .select(keep :+ col("rb.r").as("r") :+ col("rb.bucket").as("bucket"): _*)
  }

  /** CMS point estimates for a literal probe set, next to the exact
    * occurrence counts: `(probe, n_exact, cms_count)` with `cms_count =
    * min_r cnt[r][bucket_r(probe)]` (0 when a cell is empty; CMS never
    * underestimates, so `cms_count >= n_exact` always). The probe side
    * is a broadcast literal; the exact side filters the scan to the
    * probe values (scan-local predicate) before its tiny aggregation —
    * the corpus is read once per side and never shuffled wide. */
  def cmsCounts(spark: SparkSession, df: DataFrame, value: Column,
      probes: Seq[String]): DataFrame = {
    import spark.implicits._
    require(probes.nonEmpty, "cmsCounts needs at least one probe value")
    val vals = df.select(value.cast("string").as("v"))
    val cells = cmsCells(spark, vals)
    val pr = probes.toDF("probe")
    val pb = withCoords(spark, pr.select(col("probe"), col("probe").as("v")))
    val est = pb.join(cells, Seq("r", "bucket"), "left")
      .groupBy(col("probe"))
      .agg(min(coalesce(col("cnt"), lit(0L))).as("cms_count"))
    val exact = vals.filter(col("v").isin(probes: _*))
      .groupBy(col("v")).agg(count(lit(1)).as("cnt_exact"))
    broadcast(pr).join(exact, col("v") === col("probe"), "left")
      .select(col("probe"), coalesce(col("cnt_exact"), lit(0L)).as("n_exact"))
      .join(est, Seq("probe"))
      .orderBy(col("probe"))
  }

  /** EXACT heavy hitters in two bounded passes — every value whose
    * frequency exceeds `n/(k+1)`, with its exact count:
    *
    *  1. a [[graft.functions.MisraGriesAgg]] pass folds the stream
    *     into ≤ k candidate values (map-side-combined, ≤ k counters
    *     per partition — the bounded-state pass that makes this
    *     feasible at 100 TB, where a full `groupBy(value).count()`
    *     would hash-aggregate the whole vocabulary);
    *  2. the stream is re-scanned once, semi-joined against the
    *     broadcast ≤ k-row candidate list, and only candidates are
    *     exactly recounted.
    *
    * The MG guarantee (every value with true count > n/(k+1) survives
    * any merge tree) makes the final `cnt·(k+1) > n` filter
    * MERGE-ORDER-INDEPENDENT: the candidate set may wobble near the
    * threshold between runs, but the values that pass the exact-count
    * filter are exactly the true heavy hitters every time — which is
    * what lets an order-sensitive sketch power an oracle-gated
    * operator. The threshold compares `cnt·(k+1) > n` in exact int64
    * arithmetic (no division-semantics drift cross-engine). The total
    * count rides the candidate aggregate as an in-plan 1-row broadcast
    * (no driver action). */
  def heavyHitters(spark: SparkSession, df: DataFrame, value: Column,
      k: Int = 64): DataFrame = {
    import spark.implicits._
    require(k >= 1, s"k must be >= 1, got $k")
    val vals = df.select(value.cast("string").as("v"))
      .filter(col("v").isNotNull)
    val cand = vals.as[String]
      .select(new graft.functions.MisraGriesAgg(k).toColumn.name("cand"),
        count(lit(1)).as[Long]) // 1 row: candidates + total stream count
      .toDF("cand", "n")
    val candidates = cand
      .select(explode(col("cand")).as("v"), col("n")) // ≤ k rows
    vals.join(broadcast(candidates), Seq("v"), "inner")
      .groupBy(col("v"), col("n"))
      .agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") * lit(k + 1L) > col("n"))
      .select(col("v"), col("cnt"))
      .orderBy(col("cnt").desc, col("v"))
  }

  def kmvPairwiseJaccard(spark: SparkSession, df: DataFrame, group: Column,
      value: Column): DataFrame = {
    // Materialize the (tiny — one row per group) sketch table before the
    // self-join: both join sides would otherwise re-run the corpus-wide
    // sketch aggregation, doubling the only expensive stage.
    val sk = graft.Checkpoints.materialize(kmvSketch(spark, df, group, value))
    val x = sk.select(col("grp").as("a"), col("sketch").as("sa"))
    val y = sk.select(col("grp").as("b"), col("sketch").as("sb"))
    x.join(y, col("a") < col("b"))
      .select(col("a"), col("b"), col("sa"), col("sb"),
        slice(array_sort(array_union(col("sa"), col("sb"))), 1, K).as("m"))
      .select(col("a"), col("b"),
        round(size(array_intersect(col("m"),
            array_intersect(col("sa"), col("sb")))).cast("double") /
          size(col("m")).cast("double"), 6).as("kmv_jaccard"))
      .orderBy(col("a"), col("b"))
  }
}
