package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** K-minimum-values sketch aggregator: folds a group's hash values into
  * the sorted array of its K smallest DISTINCT values (duplicates are
  * absorbed by the sketch itself — no upstream `distinct()` shuffle
  * needed). The buffer is a bounded sorted primitive array, so the
  * partial/merge path is algebraic: map-side combine ships at most K
  * int64s per (partition, group) however large the input — the
  * mergeable-sketch property that makes distinct counting feasible at
  * 100 TB.
  *
  * Typical-row cost is one binary search ending in rejection (value ≥
  * current max once the sketch saturates); inserts are O(K) array
  * copies but only K·ln(n) of them happen in expectation over a
  * group's whole stream. */
class KmvAgg(k: Int) extends Aggregator[Long, Array[Long], Array[Long]] {
  require(k > 1, s"k must be > 1, got $k")

  override def zero: Array[Long] = Array.emptyLongArray

  override def reduce(buf: Array[Long], h: Long): Array[Long] = {
    val n = buf.length
    if (n == k && h >= buf(n - 1)) return buf
    val i = java.util.Arrays.binarySearch(buf, h)
    if (i >= 0) return buf // already present
    val ins = -i - 1
    if (n < k) {
      val out = new Array[Long](n + 1)
      System.arraycopy(buf, 0, out, 0, ins)
      out(ins) = h
      System.arraycopy(buf, ins, out, ins + 1, n - ins)
      out
    } else {
      // full: drop the current max, insert in place
      System.arraycopy(buf, ins, buf, ins + 1, n - ins - 1)
      buf(ins) = h
      buf
    }
  }

  override def merge(x: Array[Long], y: Array[Long]): Array[Long] = {
    // merge two sorted distinct arrays, keep the K smallest distinct
    val out = new Array[Long](math.min(k, x.length + y.length))
    var i = 0; var j = 0; var o = 0
    while (o < out.length && (i < x.length || j < y.length)) {
      val v =
        if (j >= y.length || (i < x.length && x(i) <= y(j))) { val t = x(i); i += 1; t }
        else { val t = y(j); j += 1; t }
      if (o == 0 || out(o - 1) != v) { out(o) = v; o += 1 }
    }
    if (o == out.length) out else java.util.Arrays.copyOf(out, o)
  }

  override def finish(buf: Array[Long]): Array[Long] = buf

  override def bufferEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
}
