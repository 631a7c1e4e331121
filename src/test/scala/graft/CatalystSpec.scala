package graft

import graft.functions.{GraftHash, MinHashAgg}
import graft.plans.DisjunctiveSemiJoinRewrite
import org.apache.spark.sql.functions._

/** Custom Catalyst surface: the disjunctive-semi-join optimizer rule and
  * the typed MinHash aggregator. */
class CatalystSpec extends SparkSuite {

  test("DisjunctiveSemiJoinRewrite removes the nested-loop join and " +
      "preserves the semi-join result set") {
    import spark.implicits._
    val edges = Seq(("a", "b"), ("a", "b"), ("b", "c"), ("c", "d"), ("x", "y"))
      .toDF("src", "dst")
    val topic = Seq("a", "c").toDF("id")

    def literal() = edges.join(topic,
      edges("src") === topic("id") || edges("dst") === topic("id"), "left_semi")

    val before = literal().queryExecution.executedPlan.toString
    assert(before.contains("BroadcastNestedLoopJoin")) // the problem

    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ DisjunctiveSemiJoinRewrite
    try {
      val after = literal()
      val plan = after.queryExecution.executedPlan.toString
      assert(!plan.contains("BroadcastNestedLoopJoin"))
      // Same rows, same multiplicity (the duplicate a->b edge survives twice)
      val got = after.collect().map(r => (r.getString(0), r.getString(1)))
        .toSeq.sorted
      assert(got == Seq(("a", "b"), ("a", "b"), ("b", "c"), ("c", "d")))
    } finally {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations
          .filterNot(_ == DisjunctiveSemiJoinRewrite)
    }
  }

  test("MinHashAgg matches the 16-min-column formulation") {
    import spark.implicits._
    val docs = Seq(
      (1L, "one two three four five six"),
      (2L, "completely different words here now ok"),
      (3L, "one two three four five six")).toDF("doc_id", "text")
    val got = graft.pipelines.Dedup.minhashSignature(spark, docs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // identical docs -> identical signatures; different docs differ
    assert(got(1L) == got(3L) && got(1L) != got(2L))
    // cross-check slot computation against a direct Scala fold
    val hashes = Seq("one two three", "two three four", "three four five",
      "four five six").map { s =>
      s.codePoints().toArray.foldLeft(0L)((a, c) => (a * 31 + c) % 1000000007L)
    }
    val mins = MinHashParams.params.map { case (a, b) =>
      hashes.map(h => (a * h + b) % MinHashParams.P).min
    }
    val sig = mins.foldLeft(0L)((s, m) => (s * 31 + m) % MinHashParams.P)
    assert(got(1L) == sig)
  }

  test("MinHashAgg merge combines partial buffers slot-wise") {
    val b1 = MinHashAgg.reduce(MinHashAgg.zero, 42L)
    val b2 = MinHashAgg.reduce(MinHashAgg.zero, 7L)
    val merged = MinHashAgg.merge(b1.clone(), b2)
    MinHashParams.params.zipWithIndex.foreach { case ((a, b), j) =>
      val expect = math.min((a * 42L + b) % MinHashParams.P,
        (a * 7L + b) % MinHashParams.P)
      assert(merged(j) == expect)
    }
  }
}
