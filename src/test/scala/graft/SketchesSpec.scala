package graft

import graft.pipelines.Sketches
import org.apache.spark.sql.functions._

/** Count-Min sketch semantics: exactness without collisions, the
  * never-underestimate guarantee, empty-cell probes, and shard-merge
  * additivity (the property that makes the sketch useful per-day /
  * per-corpus at scale). */
class SketchesSpec extends SparkSuite {

  private def vals(rows: String*) = {
    import spark.implicits._
    rows.toDF("v")
  }

  test("cmsCounts: exact counts for present probes, 0 for absent") {
    val d = vals(Seq.fill(7)("alpha") ++ Seq.fill(3)("beta") :+ "gamma": _*)
    val got = Sketches.cmsCounts(spark, d, col("v"),
      Seq("alpha", "beta", "gamma", "missing")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == Seq(("alpha", 7L, 7L), ("beta", 3L, 3L),
      ("gamma", 1L, 1L), ("missing", 0L, 0L)))
  }

  test("cmsCounts never underestimates (cms_count >= n_exact), even crowded") {
    // 600 distinct values over 512 buckets forces collisions in every
    // row — estimates may exceed the exact count but never fall below.
    val d = vals((1 to 600).map(i => s"val$i"): _*)
    val probes = (1 to 20).map(i => s"val${i * 30}")
    val got = Sketches.cmsCounts(spark, d, col("v"), probes).collect()
    got.foreach { r =>
      assert(r.getLong(2) >= r.getLong(1),
        s"${r.getString(0)}: cms ${r.getLong(2)} < exact ${r.getLong(1)}")
      assert(r.getLong(1) == 1L)
    }
  }

  test("cmsSketch cell grid is bounded and shard-merge is additive") {
    val a = vals(Seq.fill(5)("x") :+ "y": _*)
    val b = vals(Seq.fill(2)("x") :+ "z": _*)
    val sa = Sketches.cmsSketch(spark, a, col("v"))
    val sb = Sketches.cmsSketch(spark, b, col("v"))
    val union = Sketches.cmsSketch(spark, a.unionAll(b), col("v"))
    assert(union.count() <= Sketches.CmsDepth.toLong * Sketches.CmsWidth)
    // merging = summing cell counts: union sketch == cell-wise sum
    val merged = sa.unionAll(sb).groupBy("r", "bucket")
      .agg(sum("cnt").as("cnt"))
    val diff = merged.join(union, Seq("r", "bucket"))
      .where(merged("cnt") =!= union("cnt")).count()
    assert(diff == 0L)
    assert(merged.count() == union.count())
  }
}
