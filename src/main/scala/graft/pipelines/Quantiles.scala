package graft.pipelines

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact continuous percentiles WITHOUT the multiset buffer.
  *
  * Spark's exact `percentile` aggregate holds a group's entire value
  * MULTISET in one aggregation buffer — a single global group (the
  * corpus quality cutoff) or one hot group key buffers the full 100 TB
  * column on one task. This helper computes the identical continuous
  * percentile from the group's value HISTOGRAM instead:
  *
  *  1. `groupBy(group, value).count()` — a hash aggregation whose
  *     state is bounded by the VALUE DOMAIN (integer micro-units /
  *     cents: ≤ ~10⁶-10⁸ distinct), not the row count;
  *  2. a running-count window over the histogram rows (per-group
  *     partition; for the global case a single partition over the
  *     domain-bounded histogram — bounded by the domain, never the
  *     corpus);
  *  3. per quantile `q`: `idx = q·(n−1)`, the values at 0-based ranks
  *     `⌊idx⌋`/`⌈idx⌉` picked by conditional min over the cumulative
  *     counts, then `lo + (idx − ⌊idx⌋)·(hi − lo)` — operand-for-
  *     operand the interpolation Spark's `Percentile.getPercentile`
  *     and DuckDB's `quantile_cont` evaluate, so results are
  *     bit-identical to the aggregate they replace (the oracle gates
  *     prove it: they were authored against `percentile` /
  *     `quantile_cont` and pass unchanged).
  */
object Quantiles {

  /** `(group..., q, n, p)` — exact continuous percentile `p` of the
    * integer-valued `value` for each group × each `qs` entry. Pass
    * `groupCols = Nil` for one global group.
    *
    * NULL `value` rows are skipped — the same null semantics as
    * Spark's `percentile` and DuckDB's `quantile_cont` (counting
    * nulls would shift every rank on null-containing input). The
    * value domain must be INTEGER-VALUED: a non-integral value would
    * silently truncate under `cast(long)` and diverge from the
    * aggregates this replaces, so the plan raises an error on the
    * first non-integral row instead (a codegen'd comparison per row —
    * no extra pass). */
  def contFromHistogram(df: DataFrame, groupCols: Seq[String],
      value: Column, qs: Seq[Double]): DataFrame = {
    require(qs.nonEmpty, "need at least one quantile")
    val spark = df.sparkSession
    import spark.implicits._
    // null-skip FIRST (so the integral guard below can't fire on a
    // null, whose comparison is null and would fall into the error arm)
    val nn = df.filter(value.isNotNull)
    val vlong = value.cast("long")
    val guarded = when(value.cast("double") === vlong.cast("double"), vlong)
      .otherwise(raise_error(concat(
        lit("Quantiles.contFromHistogram: non-integral value "),
        value.cast("string"),
        lit(" — pre-scale to integer micro-units (see scaladoc)"))))
    // a constant key stands in for the global group so every step
    // below is the one grouped code path
    val (base, gcols) =
      if (groupCols.isEmpty)
        (nn.select(lit(1).as("__g"), guarded.as("v")), Seq("__g"))
      else
        (nn.select(groupCols.map(col) :+ guarded.as("v"): _*),
          groupCols)
    val g = gcols.map(col)
    val hist = base.groupBy(g :+ col("v"): _*).agg(count(lit(1)).as("cnt"))
    val sel = contFromCounts(hist, gcols, "v", "cnt", qs)
    if (groupCols.isEmpty) sel.drop("__g") else sel
  }

  /** Bin-index → bin-midpoint mapping for the fixed-bin quantile
    * sketch ([[graft.functions.FixedBinHistogramAgg]]): feeding these
    * midpoints to [[contFromCounts]] yields the sketch's quantile
    * ESTIMATE — the exact continuous percentile of the binned
    * multiset, within `width/2` of the true quantile for in-domain
    * values (see the aggregator's scaladoc for the bound's proof
    * sketch and its clamping caveat). Written as
    * `lo + width·(bin + 0.5)` — operand-for-operand what the DuckDB
    * oracle evaluates, so the estimate is cross-engine bit-exact. */
  def binMidpoint(bin: Column, lo: Double, width: Double): Column =
    lit(lo) + lit(width) * (bin.cast("double") + lit(0.5))

  /** ε-rank-guarantee audit for approximate quantile estimates — the
    * gate shape for Spark's own Greenwald-Khanna summary
    * (`percentile_approx`), which completes the quantile ladder at the
    * unbounded-domain end: exact histogram (state bounded by the value
    * DOMAIN) → fixed-bin sketch (state O(nbins), needs `[lo, hi)`
    * from schema knowledge) → GK (state O(1/ε·log εn), ANY orderable
    * domain, no domain knowledge).
    *
    * The GK estimate VALUE is arrival-order dependent (legitimately so
    * — any mergeable ε-summary is), so no cross-engine oracle can
    * replay it. What IS deterministic is the GUARANTEE: the returned
    * value's true rank lies within `n/accuracy + 1` of the target rank
    * `⌈q·n⌉`. This audit recomputes each estimate's true rank bracket
    * `[count(<est)+1, count(≤est)]` against the raw data in one
    * broadcast join + hash aggregation and emits
    * `(group, q, n, within_eps)` — a DuckDB oracle supplies the
    * (group × q) universe, `n`, and the expected all-1 flags, so an
    * ε-bound violation hash-mismatches the gate.
    *
    * `est` carries `(groupCol, qi, est)` with `qi` the 0-based index
    * into `qs` (the `posexplode` of a `percentile_approx(value, qs)`
    * array). Ties: the bracket is the estimate's full rank interval,
    * so duplicate values cannot fail the check spuriously. */
  def approxRankAudit(data: DataFrame, groupCol: String, value: Column,
      est: DataFrame, qs: Seq[Double], accuracy: Int): DataFrame = {
    require(accuracy >= 1, s"accuracy must be >= 1, got $accuracy")
    val qArr = array(qs.map(lit): _*)
    val rows = data.filter(value.isNotNull)
      .select(col(groupCol).as("__g"), value.as("__v"))
      .join(broadcast(est), col("__g") === col(groupCol))
      .groupBy(col(groupCol), col("qi"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("__v") < col("est"), 1L).otherwise(0L)).as("cnt_lt"),
        sum(when(col("__v") <= col("est"), 1L).otherwise(0L)).as("cnt_le"))
    val q = element_at(qArr, col("qi") + 1)
    val target = ceil(q * col("n").cast("double")).cast("long")
    val tol = (col("n") / lit(accuracy)).cast("long") + lit(1L)
    // the estimate's rank interval [cnt_lt+1, cnt_le] must intersect
    // [target - tol, target + tol]
    rows.select(col(groupCol), q.as("q"), col("n"),
        when(col("cnt_lt") + 1 <= target + tol &&
          col("cnt_le") >= target - tol, 1).otherwise(0).as("within_eps"))
      .orderBy(col(groupCol), col("q"))
  }

  /** Interpolation half of [[contFromHistogram]], entered with an
    * ALREADY-COUNTED histogram `(group..., value, count)` — the shape a
    * streaming complete-mode aggregation drains (the bounded histogram
    * IS the streaming quantile state), or a pre-aggregated rollup table.
    * Null-valued histogram rows are skipped (same semantics as the
    * raw-row path). Identical arithmetic to [[contFromHistogram]] —
    * same window, same rank picks, same interpolation operands. */
  def contFromCounts(hist0: DataFrame, groupCols: Seq[String],
      valueCol: String, cntCol: String, qs: Seq[Double]): DataFrame = {
    require(qs.nonEmpty, "need at least one quantile")
    require(groupCols.nonEmpty,
      "contFromCounts needs explicit group columns (a constant for global)")
    val spark = hist0.sparkSession
    import spark.implicits._
    val g = groupCols.map(col)
    val hist = hist0.filter(col(valueCol).isNotNull)
      .select(g ++ Seq(col(valueCol).as("v"), col(cntCol).as("cnt")): _*)
    val w = Window.partitionBy(g: _*).orderBy(col("v"))
    // group total as a whole-partition window over the SAME sort — no
    // hist-vs-aggregate self-join (which also trips attribute-conflict
    // resolution when hist is a memory-sink view), no second shuffle
    val wAll = Window.partitionBy(g: _*)
    val cum = hist.select(g ++ Seq(col("v"), col("cnt"),
      sum(col("cnt")).over(w).as("cum"),
      sum(col("cnt")).over(wAll).as("n")): _*)
    val qdf = qs.toDF("q")
    cum.crossJoin(broadcast(qdf))
      .withColumn("idx", col("q") * (col("n") - 1).cast("double"))
      .groupBy(g ++ Seq(col("q"), col("n"), col("idx")): _*)
      .agg(min(when(col("cum") > floor(col("idx")), col("v"))).as("lo"),
        min(when(col("cum") > ceil(col("idx")), col("v"))).as("hi"))
      .select(g ++ Seq(col("q"), col("n"),
        (col("lo").cast("double") +
          (col("idx") - floor(col("idx")).cast("double")) *
          (col("hi") - col("lo")).cast("double")).as("p")): _*)
  }
}
