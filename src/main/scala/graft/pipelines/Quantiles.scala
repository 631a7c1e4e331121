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
