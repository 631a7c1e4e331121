package graft

import graft.pipelines.Layout
import org.apache.spark.sql.functions._

class LayoutSpec extends SparkSuite {

  test("zValue interleaves bits: closed-form examples") {
    import spark.implicits._
    val d = Seq((10L, 6L), (0L, 0L), (15L, 0L), (0L, 15L), (255L, 255L))
      .toDF("a", "b")
    val got = d.select(Layout.zValue(col("a"), col("b"), 8).as("z"))
      .collect().map(_.getLong(0)).toSeq
    // 10=1010, 6=0110 → a at even positions, b at odd:
    // pos2(a1)+pos3(b1)+pos5(b2)+pos6(a3) = 4+8+32+64 = 108
    assert(got(0) == 108L)
    assert(got(1) == 0L)
    // a=1111 alone → bits at even positions 0,2,4,6 = 1+4+16+64 = 85
    assert(got(2) == 85L)
    // b=1111 alone → odd positions = 2+8+32+128 = 170
    assert(got(3) == 170L)
    // both maxed at 8 bits → all 16 low bits set
    assert(got(4) == 65535L)
  }

  test("zValue masks inputs to the bit budget") {
    import spark.implicits._
    val d = Seq((256L + 10L, 512L + 6L)).toDF("a", "b")
    val got = d.select(Layout.zValue(col("a"), col("b"), 8).as("z"))
      .head.getLong(0)
    assert(got == 108L) // high bits beyond 8 are dropped by the mask
  }

  test("zValue keeps negative inputs in-range via pmod") {
    // `%` yields a NEGATIVE remainder for negative inputs; shifting a
    // negative long through the interleave cascade produces garbage
    // z-values (and Spark/DuckDB `%` parity on negatives is not
    // guaranteed). pmod maps -246 ≡ 10 (mod 256), -250 ≡ 6, so the
    // z-value must equal the closed-form (10, 6) example — in [0, 2^16).
    import spark.implicits._
    val d = Seq((-246L, -250L)).toDF("a", "b")
    val got = d.select(Layout.zValue(col("a"), col("b"), 8).as("z"))
      .head.getLong(0)
    assert(got == 108L, s"expected the pmod residue interleave, got $got")
  }

  test("zOrderLayout range-partitions by z and sorts within partitions") {
    import spark.implicits._
    val d = (0L until 256L).map(i => (i, i % 16, (i / 16) % 16))
      .toDF("id", "x", "y")
    val laid = Layout.zOrderLayout(d, col("x"), col("y"), bits = 4,
      partitions = 4)
    val plan = laid.queryExecution.executedPlan.toString
    assert(plan.contains("rangepartitioning") ||
      plan.contains("RangePartitioning") || plan.contains("Exchange range"),
      s"expected a range exchange on z in:\n$plan")
    // within every partition, z must be locally sorted
    val parts = laid.select(spark_partition_id().as("p"), col("z"))
      .collect().groupBy(_.getInt(0))
    parts.values.foreach { rows =>
      val zs = rows.map(_.getLong(1)).toSeq
      assert(zs == zs.sorted)
    }
    // z-locality: the max z inside a 2x2 spatial block is bounded — all
    // four cells of block (0,0) come before any cell of block (2,2)
    val z = (a: Long, b: Long) => d.sparkSession.range(1)
      .select(Layout.zValue(lit(a), lit(b), 4).as("z")).head.getLong(0)
    val block00 = Seq(z(0, 0), z(1, 0), z(0, 1), z(1, 1))
    assert(block00.max < z(4, 4)) // a later block starts at a higher z
  }
}
