package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** Bounded top-k aggregator: folds a group's `(id, metric)` stream into
  * its k best entries under the total order (metric DESC, id ASC) —
  * the shuffle-light alternative to the window-function top-k
  * ([[graft.pipelines.Sampling.topKPerGroup]]): a window must SORT the
  * whole group (a skewed group is one giant sort partition), whereas
  * this buffer is algebraic — map-side combine ships at most k
  * `(id, metric)` pairs per (partition, group) no matter how large the
  * group, and merging partials is a bounded sorted-array merge. Same
  * deterministic result on any partitioning: the k best of a set under
  * a total order is partition-independent, so the output is
  * oracle-exact against the window formulation.
  *
  * Buffer layout: parallel-sorted arrays by (metric desc, id asc).
  * Typical-row cost once saturated is one comparison against the
  * current cutoff. */
class TopKAgg(k: Int)
    extends Aggregator[(Long, Double), (Array[Long], Array[Double]),
      Array[(Long, Double)]] {
  require(k > 0, s"k must be > 0, got $k")

  type Buf = (Array[Long], Array[Double])

  override def zero: Buf = (Array.emptyLongArray, Array.emptyDoubleArray)

  /** true iff (id1, m1) ranks strictly better than (id2, m2).
    * Total order via `java.lang.Double.compare` so NaN ranks above
    * every finite metric — matching Spark's `desc` sort order in the
    * window formulation ([[graft.pipelines.Sampling.topKPerGroup]]);
    * naive `>` would never admit a NaN row, breaking the claimed
    * bit-exact equivalence of the two formulations. `-0.0` is
    * normalized to `0.0` first (Double.compare splits them; Spark's
    * ordering does not). */
  private def better(m1: Double, id1: Long, m2: Double, id2: Long): Boolean = {
    val a = if (m1 == 0.0) 0.0 else m1
    val b = if (m2 == 0.0) 0.0 else m2
    val c = java.lang.Double.compare(a, b)
    c > 0 || (c == 0 && id1 < id2)
  }

  override def reduce(buf: Buf, row: (Long, Double)): Buf = {
    val (ids, ms) = buf
    val n = ids.length
    val (id, m) = row
    if (n == k && !better(m, id, ms(n - 1), ids(n - 1))) return buf
    // find insertion point in (metric desc, id asc) order
    var ins = 0
    while (ins < n && !better(m, id, ms(ins), ids(ins))) ins += 1
    if (n < k) {
      val oi = new Array[Long](n + 1); val om = new Array[Double](n + 1)
      System.arraycopy(ids, 0, oi, 0, ins); System.arraycopy(ms, 0, om, 0, ins)
      oi(ins) = id; om(ins) = m
      System.arraycopy(ids, ins, oi, ins + 1, n - ins)
      System.arraycopy(ms, ins, om, ins + 1, n - ins)
      (oi, om)
    } else {
      System.arraycopy(ids, ins, ids, ins + 1, n - ins - 1)
      System.arraycopy(ms, ins, ms, ins + 1, n - ins - 1)
      ids(ins) = id; ms(ins) = m
      buf
    }
  }

  override def merge(x: Buf, y: Buf): Buf = {
    val n = math.min(k, x._1.length + y._1.length)
    val oi = new Array[Long](n); val om = new Array[Double](n)
    var i = 0; var j = 0; var o = 0
    while (o < n) {
      val takeX = j >= y._1.length ||
        (i < x._1.length && better(x._2(i), x._1(i), y._2(j), y._1(j)))
      if (takeX) { oi(o) = x._1(i); om(o) = x._2(i); i += 1 }
      else { oi(o) = y._1(j); om(o) = y._2(j); j += 1 }
      o += 1
    }
    (oi, om)
  }

  override def finish(buf: Buf): Array[(Long, Double)] =
    buf._1.zip(buf._2)

  override def bufferEncoder: Encoder[Buf] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Buf]()
  override def outputEncoder: Encoder[Array[(Long, Double)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[(Long, Double)]]()
}
