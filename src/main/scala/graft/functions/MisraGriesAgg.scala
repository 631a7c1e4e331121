package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** Misra-Gries heavy-hitters summary: folds a value stream into at most
  * `k` (value, count) counters. The classic guarantee — preserved under
  * ARBITRARY merge trees (Agarwal et al., "Mergeable Summaries") — is
  * that every value with true frequency > n/(k+1) survives in the
  * summary, and each stored count undercounts its value's true
  * frequency by at most n/(k+1).
  *
  * The summary alone is NOT deterministic under Spark's
  * partition-order-dependent merge tree (which counters survive near
  * the threshold, and their residual counts, depend on merge order) —
  * so the oracle-gated operator built on it
  * ([[graft.pipelines.Sketches.heavyHitters]]) uses the summary only
  * as a CANDIDATE GENERATOR and recounts candidates exactly: the final
  * `count·(k+1) > n` filter yields precisely the true heavy hitters,
  * which the guarantee makes merge-order-independent. This spec'd
  * split is the repo's standard posture for order-sensitive sketches.
  *
  * Scale shape: the buffer is a bounded map (≤ k entries), so the
  * partial/merge path is algebraic — map-side combine ships at most
  * k (string, int64) pairs per partition however large the stream.
  * The decrement-all step is O(k) but amortized O(1) per row (each
  * decrement pays for a prior increment). */
class MisraGriesAgg(k: Int)
    extends Aggregator[String, Map[String, Long], Array[String]] {
  require(k >= 1, s"k must be >= 1, got $k")

  override def zero: Map[String, Long] = Map.empty

  override def reduce(buf: Map[String, Long], v: String): Map[String, Long] =
    buf.get(v) match {
      case Some(c) => buf.updated(v, c + 1)
      case None if buf.size < k => buf.updated(v, 1L)
      case None =>
        // full and v absent: decrement every counter, drop zeros
        buf.iterator
          .map { case (key, c) => key -> (c - 1) }
          .filter(_._2 > 0)
          .toMap
    }

  override def merge(x: Map[String, Long], y: Map[String, Long])
      : Map[String, Long] = {
    val sum = y.foldLeft(x) { case (acc, (v, c)) =>
      acc.updated(v, acc.getOrElse(v, 0L) + c)
    }
    if (sum.size <= k) sum
    else {
      // subtract the (k+1)-th largest count from all, drop <= 0 —
      // the mergeable-summaries reduction back to k counters
      val cut = sum.valuesIterator.toArray.sortBy(-_).apply(k)
      sum.iterator
        .map { case (v, c) => v -> (c - cut) }
        .filter(_._2 > 0)
        .toMap
    }
  }

  /** Candidate values, sorted for a stable output shape. Counts are
    * intentionally NOT exposed: they are merge-order-dependent
    * underestimates — consumers recount exactly. */
  override def finish(buf: Map[String, Long]): Array[String] =
    buf.keysIterator.toArray.sorted

  override def bufferEncoder: Encoder[Map[String, Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Map[String, Long]]()
  override def outputEncoder: Encoder[Array[String]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[String]]()
}
