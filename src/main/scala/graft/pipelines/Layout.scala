package graft.pipelines

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multi-dimensional write layout: Morton (Z-order) clustering, the
  * standard trick for making ONE sort order serve range predicates on
  * TWO columns. Interleaving the bits of both keys means rows close in
  * z-value are close in BOTH dimensions, so a parquet file sorted by z
  * carries tight min/max footer stats for each column and a scan with
  * a predicate on either one prunes most files — at 100 TB the
  * difference between touching a few hundred files and touching all of
  * them. (Single-column layouts — the bucketed graph layout, the range
  * sort in [[Sampling.shuffleByHash]] — cover one predicate dimension;
  * this covers the two-dimensional case.)
  *
  * Everything is integer bit arithmetic on non-negative keys — exact,
  * engine-portable (the z-value gate replays in DuckDB bit-for-bit).
  */
object Layout {

  /** Morton interleave of the low `bits` bits of two non-negative
    * integer columns: `a`'s bit i lands at position 2i, `b`'s at 2i+1.
    * Inputs are masked to `bits` via `pmod` (callers pre-bucket
    * real-range dimensions into `[0, 2^bits)`; pmod keeps a stray
    * negative input's residue non-negative, where `%` would hand a
    * negative long to the shift cascade and interleave garbage — and
    * Spark/DuckDB `%` parity on negatives is not guaranteed). Pure
    * codegen'd shifts/masks — one expression, no shuffle. */
  def zValue(a: Column, b: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= 31, s"bits must be in [1, 31], got $bits")
    val mask = 1L << bits
    val am = pmod(a.cast("long"), lit(mask))
    val bm = pmod(b.cast("long"), lit(mask))
    (0 until bits).map { i =>
      shiftleft(shiftright(am, i).bitwiseAND(lit(1L)), 2 * i)
        .bitwiseOR(
          shiftleft(shiftright(bm, i).bitwiseAND(lit(1L)), 2 * i + 1))
    }.reduce(_ bitwiseOR _)
  }

  /** The write-side layout: append the z-value of `(dimA, dimB)` and
    * range-repartition + locally sort by it, so each output partition
    * (→ parquet file) covers a compact z-range — compact min/max
    * envelopes in BOTH dimensions.
    *
    * Scale shape: one range exchange (sampled bounds) + per-partition
    * sort — exactly the cost of any global sort, paid ONCE at write
    * time; every later scan with a predicate on either dimension prunes
    * by footer stats for free. The z column is kept in the output so
    * readers can also range-filter on it directly. */
  def zOrderLayout(df: DataFrame, dimA: Column, dimB: Column,
      bits: Int = 16, partitions: Int = 0): DataFrame = {
    require(!df.columns.contains("z"),
      "input already has a 'z' column; rename it before zOrderLayout")
    val withZ = df.withColumn("z", zValue(dimA, dimB, bits))
    val parted =
      if (partitions > 0) withZ.repartitionByRange(partitions, col("z"))
      else withZ.repartitionByRange(col("z"))
    parted.sortWithinPartitions(col("z"))
  }
}
