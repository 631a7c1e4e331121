package graft.functions

import graft.MinHashParams
import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed MinHash-signature aggregator: folds a group's wide shingle
  * hash pairs `(h1, h2)` into the 16-slot minimum vector in one pass
  * (mutable primitive-array buffer, no per-row allocation), then
  * combines the slots into a single BIGINT signature with the same
  * mod-P fold the banding scheme uses — so the output is exactly
  * reproducible in plain SQL.
  *
  * The slot hash is `(a_j·h1 + b_j·h2) mod P` over the 60-bit pair
  * (see [[MinHashParams.params]]) — two shingles colliding in one
  * 30-bit fold still separate in the slot, which keeps the signature
  * sound at ≥10⁹-document corpus scale.
  *
  * Demonstrates the `Aggregator[IN, BUF, OUT]` extension point (SURVEY.md
  * §7.3); the column-expression formulation in [[graft.pipelines.Dedup]]
  * computes identical per-slot minima with built-in `min` aggregates.
  */
object MinHashAgg extends Aggregator[(Long, Long), Array[Long], Long] {
  private val P = MinHashParams.P
  private val params = MinHashParams.params.toArray

  override def zero: Array[Long] = Array.fill(params.length)(Long.MaxValue)

  override def reduce(buf: Array[Long], h: (Long, Long)): Array[Long] = {
    var j = 0
    while (j < params.length) {
      val (a, b) = params(j)
      val v = (a * h._1 + b * h._2) % P
      if (v < buf(j)) buf(j) = v
      j += 1
    }
    buf
  }

  override def merge(x: Array[Long], y: Array[Long]): Array[Long] = {
    var j = 0
    while (j < x.length) { if (y(j) < x(j)) x(j) = y(j); j += 1 }
    x
  }

  /** Fold all 16 slots into one signature: sig = fold(0)((s, m) =>
    * (s*31 + m) mod P) — empty groups (all MaxValue) cannot occur since
    * the aggregator only sees groups with >= 1 row. */
  override def finish(buf: Array[Long]): Long = {
    var s = 0L
    var j = 0
    while (j < buf.length) { s = (s * 31 + buf(j)) % P; j += 1 }
    s
  }

  override def bufferEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Long] = Encoders.scalaLong
}
