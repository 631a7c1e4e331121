package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Fixed-bin histogram sketch: folds a group's (finite, non-null)
  * double values into `nbins` equi-width counters over
  * `[lo, lo + width·nbins)` — the BOUNDED-STATE quantile sketch that
  * replaces the exact value-histogram where the value domain is not
  * known to be small.
  *
  * Why it exists: the exact streaming-percentile state
  * ([[graft.pipelines.Quantiles.contFromCounts]] over a
  * `groupBy(value).count()` histogram) is bounded by the DOMAIN —
  * fine for integer cents, a scale-killer for arbitrary doubles,
  * where state grows with every distinct value seen. This sketch's
  * state is `nbins` int64s per group — O(1) in both row count and
  * distinct-value count — at the cost of a bounded, documented error:
  *
  * **Error bound**: estimating quantiles from the histogram places
  * every value at its bin MIDPOINT, displacing each sample by at most
  * `width/2`; any continuous (interpolated) quantile of the binned
  * multiset therefore differs from the exact quantile by at most
  * `width/2` (`quantile_cont` is a monotone convex combination of two
  * order statistics, each displaced ≤ width/2). The bound holds only
  * for in-domain values: out-of-range values CLAMP into the edge bins
  * (displacement unbounded), so size `[lo, lo+width·nbins)` from
  * schema knowledge — the `stream_percentiles_sketch` gate recomputes
  * the estimate-vs-exact error in DuckDB and asserts the bound.
  *
  * The buffer is a dense primitive array, so partial/merge is
  * algebraic (element-wise add): map-side combine ships `nbins` int64s
  * per (partition, group) however large the input — mergeable-sketch
  * property, same contract as [[KmvAgg]]. Nulls are the caller's to
  * filter (Spark feeds the typed Aggregator unboxed doubles); NaN is
  * handled HERE — skipped, never counted. NaN has no meaningful bin,
  * and before r14 it fell through both clamp branches (NaN comparisons
  * are false) into bin 0, silently shifting every quantile estimate
  * low while the DuckDB oracle's least/greatest clamp sent the same
  * value elsewhere — a silent cross-engine gate divergence (ADVICE
  * r13). Skipping makes the sketch's row count the count of FINITE
  * values, which is also what the gate's exact twin now counts (both
  * legs filter `isnan` next to `isNotNull`).
  */
class FixedBinHistogramAgg(lo: Double, width: Double, nbins: Int)
    extends Aggregator[Double, Array[Long], Array[Long]] {
  require(width > 0.0, s"width must be > 0, got $width")
  require(nbins > 0, s"nbins must be > 0, got $nbins")

  override def zero: Array[Long] = new Array[Long](nbins)

  override def reduce(buf: Array[Long], v: Double): Array[Long] = {
    // NaN is skipped, not binned (see class scaladoc): both clamp
    // comparisons below are false for NaN, so without this guard it
    // would silently land in bin 0.
    if (v.isNaN) return buf
    // Same IEEE ops as the oracle's floor((v - lo) / width), clamped
    // into [0, nbins) — the cross-engine bin identity the gate's
    // DuckDB twin replays literally.
    val raw = math.floor((v - lo) / width)
    val bin =
      if (raw < 0.0) 0
      else if (raw >= nbins.toDouble) nbins - 1
      else raw.toInt
    buf(bin) += 1L
    buf
  }

  override def merge(x: Array[Long], y: Array[Long]): Array[Long] = {
    var i = 0
    while (i < nbins) { x(i) += y(i); i += 1 }
    x
  }

  override def finish(buf: Array[Long]): Array[Long] = buf

  override def bufferEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
}

object FixedBinHistogramAgg {
  /** The sketch as an untyped aggregate column — usable in a plain
    * (including streaming) `groupBy(...).agg(...)`. */
  def asUdaf(lo: Double, width: Double,
      nbins: Int): org.apache.spark.sql.expressions.UserDefinedFunction =
    org.apache.spark.sql.functions.udaf(
      new FixedBinHistogramAgg(lo, width, nbins), Encoders.scalaDouble)
}
