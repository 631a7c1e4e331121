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
