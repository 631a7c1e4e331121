package graft.pipelines

import graft.functions.GraftHash
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic corpus sampling for mixture construction — the step
  * after [[TextMetrics.mixtureReport]] decides per-source quotas: take
  * exactly `n` documents per group, chosen by a seedless deterministic
  * hash order so any engine (and the DuckDB oracle) draws the same
  * sample. The graph-side seeded Bernoulli sample
  * (`RankOutput.sample`, reference `src/base_hits.py:78-79`) covers
  * rate-based sampling; this covers exact-count quotas.
  */
object Sampling {

  /** Exactly `n` docs per `group` column value, ordered by
    * `graft_hash(id)` with an id tiebreak (hash collisions cannot make
    * the draw ambiguous). Returns `(group, id, rn)`.
    *
    * Scale shape: one shuffle keyed by the group column; within a
    * partition the sort is by (hash, id). Group count is small (it is
    * a mixture dimension), so per-group data can be large — rank is
    * computed by a window but never materializes more than `n` rows
    * per group downstream, and a skewed group is one sort partition,
    * the same cost profile as any per-group top-k. */
  def quotaPerGroup(spark: SparkSession, df: DataFrame, group: String,
      id: String, n: Int): DataFrame = {
    val w = Window.partitionBy(col(group))
      .orderBy(GraftHash.graftHash(spark, col(id).cast("string")), col(id))
    df.select(col(group), col(id))
      .withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= n)
      .orderBy(col(group), col("rn"))
  }

  /** Quality-ranked curation: keep the `k` best rows per group by a
    * caller-supplied metric column (descending, id tiebreak) — "best n
    * documents per domain" selection. Returns `(group, id, metric,
    * rn)` with the metric rounded to 6 decimals for output; RANKING
    * uses the unrounded value (both engines compute the identical
    * per-row double, so the order is reproducible; the id tiebreak
    * covers exact score ties).
    *
    * Scale shape: identical to [[quotaPerGroup]] — one shuffle keyed by
    * the group column, per-group sort, nothing beyond rank `k`
    * materializes downstream. */
  def topKPerGroup(df: DataFrame, group: String, id: String,
      metric: org.apache.spark.sql.Column, k: Int): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val w = Window.partitionBy(col(group))
      .orderBy(col("metric").desc, col(id))
    df.select(col(group), col(id), metric.as("metric"))
      .withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= k)
      .select(col(group), col(id), round(col("metric"), 6).as("metric"),
        col("rn"))
      .orderBy(col(group), col("rn"))
  }

  /** Weighted sampling without replacement (Efraimidis–Spirakis):
    * draw `n` rows where selection probability tracks a weight column
    * — quality-weighted corpus subsetting. Each row gets the key
    * `u^(1/w)` with `u` a deterministic hash-uniform in (0, 1]
    * (`graft_hash(id‖salt)` scaled), and the n largest keys win — the
    * classic one-pass weighted reservoir, made reproducible by
    * replacing the RNG with the hash. Returns
    * `(id, weight, rn)`.
    *
    * Determinism note: keys are transcendental (`pow`), so they are
    * rounded to 9 decimals and ordered with an id tiebreak — the same
    * ulp posture as every scored ranking here (a flip requires two
    * keys within 1e-9 AND a cross-engine ulp straddle). Weights must
    * be strictly positive.
    *
    * Scale shape: a per-row codegen'd key + one TakeOrderedAndProject
    * — no shuffle beyond the top-n. */
  /** TOKEN-BUDGET curation — "the best `budget` tokens per source",
    * the selection a mixture builder actually runs once per-source
    * token budgets are decided: within each `group`, documents are
    * ranked quality-first (caller-supplied `metric` desc, id asc
    * tiebreak) and the kept set is the maximal ranked PREFIX whose
    * running token total stays ≤ `budget` — a document that would
    * cross the budget is dropped along with everything ranked below it
    * (strict prefix, so the draw is deterministic and a single
    * over-long top document yields an empty group rather than an
    * over-budget one). Returns `(group, id, n_toks, cum_toks, rn)`.
    *
    * Scale shape: one shuffle keyed by the group column, one per-group
    * sort carrying `(metric, id, n_toks)` — integer running sum, no
    * second pass. Groups are mixture dimensions (bounded count); a
    * pathologically hot group is one sort partition, the
    * [[quotaPerGroup]] cost profile — when one group becomes
    * event-scale, use [[tokenBudgetPerGroupSliced]], the
    * range-partitioned prefix-scan twin whose per-task sort is bounded
    * by the range-partition size however hot the group (gated on this
    * formulation's unchanged oracle). */
  def tokenBudgetPerGroup(df: DataFrame, group: String, id: String,
      metric: org.apache.spark.sql.Column,
      tokens: org.apache.spark.sql.Column, budget: Long): DataFrame = {
    require(budget >= 1, s"budget must be >= 1, got $budget")
    // rank over the PROJECTED metric column — the caller's expression
    // references input columns the projection below drops
    val w = Window.partitionBy(col(group)).orderBy(col("__m").desc, col(id))
    df.select(col(group), col(id), tokens.cast("long").as("n_toks"),
        metric.as("__m"))
      .withColumn("rn", row_number().over(w).cast("long"))
      .withColumn("cum_toks",
        sum(col("n_toks")).over(w.rowsBetween(Window.unboundedPreceding, 0)))
      // token counts are ≥ 0 so the running total is monotone: this
      // filter IS the maximal prefix — a later small doc can never
      // sneak under a budget an earlier larger one crossed
      .filter(col("cum_toks") <= budget)
      .select(col(group), col(id), col("n_toks"), col("cum_toks"), col("rn"))
      .orderBy(col(group), col("rn"))
  }

  /** SKEW-PROOF twin of [[tokenBudgetPerGroup]] — identical output
    * from BOUNDED partitions, for the corpus where one giant source
    * makes the per-group window a single hot sort partition (the r13
    * `weak`-watch item: at 100 TB a group holding half the corpus is
    * half the corpus on one task).
    *
    * This is the classic DISTRIBUTED PREFIX SCAN, not a hash-salt
    * decomposition: a prefix sum is defined by the global
    * `(metric desc, id)` order, which hash slices destroy (a row's
    * running total needs the tokens of every better-ranked row in
    * EVERY other slice — an interleave-merge, not a bounded offset
    * join), while RANGE slices preserve it — every row in slice `i`
    * precedes every row in slice `i+1` in the total order
    * `(group, metric desc, id)`, so:
    *
    *  1. `repartitionByRange` on that order splits even a single hot
    *     group across many slices of bounded size;
    *  2. within each `(slice, group)` block — never larger than a
    *     range partition — a local sort yields local ranks and local
    *     running token sums;
    *  3. per-(slice, group) totals (`slices × groups` rows — tiny)
    *     turn into cross-slice offsets by a prefix sum over slice
    *     index, broadcast back;
    *  4. `global cum = local cum + offset`, same for rank.
    *
    * The result is partition-boundary-INDEPENDENT (offsets absorb
    * wherever the sampler cuts the ranges), so the gate runs against
    * the window formulation's oracle VERBATIM — the gate IS the
    * output-equality proof. `slices <= 0` derives the slice count from
    * `spark.sql.shuffle.partitions` (falling back to
    * `defaultParallelism` when that conf is non-numeric, e.g. "auto").
    *
    * The per-slice locals are CHECKPOINT-MATERIALIZED before fan-out:
    * the offset table and the final join both read the one evaluation
    * (not two scans + two window sorts — measured 2.6× the window
    * twin's wall before the fix), which also pins a single snapshot of
    * a non-deterministic input so the offsets can never diverge from
    * the rows they offset. */
  def tokenBudgetPerGroupSliced(df: DataFrame, group: String, id: String,
      metric: org.apache.spark.sql.Column,
      tokens: org.apache.spark.sql.Column, budget: Long,
      slices: Int = 0): DataFrame = {
    require(budget >= 1, s"budget must be >= 1, got $budget")
    val p = if (slices > 0) slices
      else scala.util.Try(
        df.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt)
        .getOrElse(df.sparkSession.sparkContext.defaultParallelism)
    // The projection is MATERIALIZED before the range partitioning:
    // `repartitionByRange` runs a sampling job over its child first, so
    // an unmaterialized projection would evaluate the caller's metric
    // and token expressions over the WHOLE corpus twice — at 100 TB
    // that second pass is an entire extra corpus scan (measured: ~12 s
    // of a 44 s wall at a 20M-doc rung). The checkpoint is released as
    // soon as the per-slice locals (which subsume it) materialize.
    val projected = graft.Checkpoints.materialize(df
      .select(col(group), col(id), tokens.cast("long").as("n_toks"),
        metric.as("__m")))
    val ranged = projected
      .repartitionByRange(p, col(group), col("__m").desc, col(id))
      // captured IN the range-partitioned stage, before any further
      // exchange can renumber the tasks
      .withColumn("slice", spark_partition_id())
    // each (slice, group) window block is bounded by the range-partition
    // size — the balanced-sort property the whole decomposition buys
    val w1 = Window.partitionBy(col("slice"), col(group))
      .orderBy(col("__m").desc, col(id))
    // MATERIALIZED once: `local` feeds both the offset table and the
    // final join — unmaterialized, the scan + metric/token expressions
    // + per-slice window sort all run TWICE (exchange reuse dedupes
    // only the range shuffle, not the window above it; measured 2.6×
    // the window formulation's wall at a 20M-doc rung). The checkpoint
    // also pins one evaluation, so a non-deterministic input cannot
    // diverge between the two consumers. Callers release the blocks
    // via Checkpoints.releaseAll on the returned frame's plan.
    val local = graft.Checkpoints.materialize(ranged
      .withColumn("l_rn", row_number().over(w1).cast("long"))
      .withColumn("l_cum",
        sum(col("n_toks")).over(w1.rowsBetween(Window.unboundedPreceding, 0))))
    // the locals subsume the projection — free its blocks now, not at
    // ContextCleaner GC time (it no longer appears in the final plan,
    // so the caller's releaseAll could never reach it)
    graft.Checkpoints.release(projected)
    val totals = local.groupBy(col("slice"), col(group))
      .agg(count(lit(1)).as("t_n"), sum(col("n_toks")).as("t_toks"))
    // slices × groups rows: the offset table is broadcast-sized by
    // construction, so the "join back" costs no corpus shuffle
    val w2 = Window.partitionBy(col(group)).orderBy(col("slice"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = totals
      .withColumn("o_rn", coalesce(sum(col("t_n")).over(w2), lit(0L)))
      .withColumn("o_toks", coalesce(sum(col("t_toks")).over(w2), lit(0L)))
      .select(col("slice"), col(group), col("o_rn"), col("o_toks"))
    local.join(broadcast(offsets), Seq("slice", group))
      .select(col(group), col(id), col("n_toks"),
        (col("l_cum") + col("o_toks")).as("cum_toks"),
        (col("l_rn") + col("o_rn")).as("rn"))
      .filter(col("cum_toks") <= budget)
      .orderBy(col(group), col("rn"))
  }

  def weightedSample(spark: SparkSession, df: DataFrame, id: String,
      weight: org.apache.spark.sql.Column, n: Int,
      salt: String = "|wsample"): DataFrame = {
    require(n > 0, s"n must be positive, got $n")
    val P = 1000000007L
    val u = (GraftHash.graftHash(spark,
      concat(col(id).cast("string"), lit(salt))) + lit(1L)).cast("double") /
      lit((P + 1).toDouble)
    val key = round(pow(u, lit(1.0) / weight.cast("double")), 9)
    val cand = df.select(col(id), weight.cast("double").as("weight"),
        key.as("k"))
      .orderBy(col("k").desc, col(id)).limit(n)
    val w = Window.orderBy(col("k").desc, col(id))
    cand.withColumn("rn", row_number().over(w).cast("long"))
      .select(col(id), round(col("weight"), 6).as("weight"), col("rn"))
      .orderBy(col("rn"))
  }

  /** [[topKPerGroup]]'s bounded-aggregator formulation — identical
    * output, different physics: the window form sorts each whole group
    * (a skewed group = one giant sort partition); this folds the
    * stream through [[graft.functions.TopKAgg]]'s k-bounded buffer, so
    * map-side combine ships ≤ k `(id, metric)` pairs per (partition,
    * group) and no full-group sort ever exists. The k best of a set
    * under the (metric desc, id asc) total order is
    * partition-independent, so the two formulations are oracle-equal
    * bit for bit — both gates share one DuckDB twin. */
  def topKPerGroupAgg(spark: SparkSession, df: DataFrame, group: String,
      id: String, metric: org.apache.spark.sql.Column, k: Int): DataFrame = {
    import spark.implicits._
    require(k > 0, s"k must be positive, got $k")
    df.select(col(group).cast("string").as("g"),
        col(id).cast("long").as("i"), metric.cast("double").as("m"))
      .as[(String, Long, Double)]
      .groupByKey(_._1).mapValues(t => (t._2, t._3))
      .agg(new graft.functions.TopKAgg(k).toColumn.name("top"))
      .toDF("g", "top")
      .select(col("g"), posexplode(col("top")).as(Seq("p", "e")))
      .select(col("g").as(group), col("e._1").as(id),
        round(col("e._2"), 6).as("metric"),
        (col("p") + 1).cast("long").as("rn"))
      .orderBy(col(group), col("rn"))
  }

  /** Temperature-scaled mixture sample — the multilingual/multi-source
    * rebalancing draw (mT5-style): source `s` holding `N_s` documents
    * gets quota `⌊total · N_s^α / Σ_t N_t^α + 0.5⌋` (α < 1 upweights
    * tail sources, α = 1 is proportional), then exactly that many
    * documents are drawn per source in the same deterministic
    * hash-order as [[quotaPerGroup]]. Returns
    * `(group, id, rn, quota)` for the sampled rows.
    *
    * Determinism: `N^α` is the one transcendental — it is immediately
    * rounded to integer micro-units so the cross-source normalization
    * sum is an exact long sum (a raw double sum would depend on
    * partition order and could not hash-match any oracle), and the
    * final quota is an explicit `floor` (Spark's long cast truncates
    * but DuckDB's rounds — floor is the portable spelling).
    *
    * Scale shape: the quota table is one row per source (a mixture
    * dimension — small) built from one count aggregate and broadcast
    * back; the draw itself is [[quotaPerGroup]]'s shape, one shuffle
    * keyed by the group column. */
  def temperatureSample(spark: SparkSession, df: DataFrame, group: String,
      id: String, total: Int, alpha: Double): DataFrame = {
    require(total > 0, s"total must be positive, got $total")
    require(alpha > 0.0 && alpha <= 1.0, s"alpha must be in (0, 1], got $alpha")
    require(!Seq("rn", "quota", "n_docs", "pw").contains(group) &&
      !Seq("rn", "quota", "n_docs", "pw").contains(id),
      s"group/id columns may not be named rn/quota/n_docs/pw")
    val pw = df.groupBy(col(group)).agg(count(lit(1)).as("n_docs"))
      .select(col(group), col("n_docs"),
        round(pow(col("n_docs").cast("double"), lit(alpha)) * lit(1e6))
          .cast("long").as("pw"))
    val tot = pw.agg(sum(col("pw")).as("pw_sum"))
    val quotas = pw.crossJoin(broadcast(tot))
      .select(col(group),
        floor(col("pw").cast("double") * lit(total.toDouble) /
          col("pw_sum").cast("double") + lit(0.5)).cast("long").as("quota"))
    val w = Window.partitionBy(col(group))
      .orderBy(GraftHash.graftHash(spark, col(id).cast("string")), col(id))
    df.select(col(group), col(id))
      .withColumn("rn", row_number().over(w).cast("long"))
      .join(broadcast(quotas), Seq(group))
      .filter(col("rn") <= col("quota"))
      .select(col(group), col(id), col("rn"), col("quota"))
      .orderBy(col(group), col("rn"))
  }

  /** Deterministic corpus shuffle — reproducible training order: the
    * full input row plus a `sort_key` column, sorted by
    * `graft_hash(id || '|shuffle')` with an id tiebreak. The salt
    * decorrelates the permutation from sampling/split/packing hashes of
    * the same ids, and re-salting (e.g. `|shuffle2`) is a fresh epoch
    * permutation. Payload columns ride along so the shuffled corpus is
    * directly consumable — no join back onto the input (which would cost
    * the extra shuffle this operator exists to avoid).
    *
    * Scale shape: one range exchange + per-partition sort (Spark's
    * global orderBy) — no global window, no single-task stage; any
    * engine derives the identical order, so a resumed training run
    * replays the same sequence. */
  def shuffleByHash(spark: SparkSession, df: DataFrame, id: String,
      salt: String = "|shuffle"): DataFrame = {
    require(!df.columns.contains("sort_key"),
      "input already has a 'sort_key' column; rename it before shuffleByHash")
    val h = GraftHash.graftHash(spark,
      concat(col(id).cast("string"), lit(salt)))
    df.select(df.columns.map(col) :+ h.as("sort_key"): _*)
      .orderBy(col("sort_key"), col(id))
  }

  /** Deterministic train/val/test (or any) split: the full input row
    * plus a `split` column — each id lands in the split whose cumulative
    * per-mille range covers `graft_hash(id || '|split') % 1000`. Weights
    * are per-mille and must sum to 1000, so the assignment is total and
    * disjoint by construction. The `|split` salt decorrelates the draw
    * from every other hash use of the same id (sampling, bucketing,
    * packing). Payload columns ride along so each split is directly
    * writable — no join back onto the input.
    *
    * Scale shape: a pure per-row codegen'd projection — no shuffle, no
    * state; membership of any id is recomputable by any engine, so
    * train/test placement survives re-runs, engine swaps, and
    * incremental corpus growth (new docs never move old ones). */
  def splitByHash(spark: SparkSession, df: DataFrame, id: String,
      splits: Seq[(String, Int)]): DataFrame = {
    require(!df.columns.contains("split"),
      "input already has a 'split' column; rename it before splitByHash")
    require(splits.nonEmpty && splits.forall(_._2 > 0),
      s"splits need positive per-mille weights, got $splits")
    require(splits.map(_._2).sum == 1000,
      s"per-mille weights must sum to 1000, got ${splits.map(_._2).sum}")
    val b = GraftHash.graftHash(spark,
      concat(col(id).cast("string"), lit("|split"))) % 1000
    val bounds = splits.scanLeft(0)(_ + _._2).tail // cumulative upper bounds
    val label = splits.zip(bounds).init.foldRight(lit(splits.last._1)) {
      case (((name, _), upper), rest) => when(b < upper, name).otherwise(rest)
    }
    df.select(df.columns.map(col) :+ label.as("split"): _*)
  }
}
