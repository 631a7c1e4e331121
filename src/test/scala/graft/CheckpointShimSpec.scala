package graft

import org.apache.spark.sql.execution.LogicalRDD
import org.apache.spark.sql.catalyst.plans.physical.HashPartitioning
import org.apache.spark.sql.functions._

/** The partitioning-preserving localCheckpoint
  * ([[org.apache.spark.sql.graftshim.CheckpointShim]], behind
  * [[Checkpoints.materializeKeyed]] — the kernel loops' score-vector
  * checkpoints): same rows as stock
  * `localCheckpoint`, but the checkpointed frame keeps the executed
  * plan's hash partitioning, so the iterative kernels' per-iteration
  * score join no longer re-exchanges the |V|-sized vector (r19
  * optimization — guide §2.4). */
class CheckpointShimSpec extends SparkSuite {

  private def np = spark.conf.get("spark.sql.shuffle.partitions").toInt

  test("materialize preserves the aggregation's hash partitioning " +
      "and keeps the rows") {
    import spark.implicits._
    val df = (1 to 100).map(i => (s"id${i % 7}", i.toDouble))
      .toDF("id", "score")
    // `want` from a SEPARATE plan instance: executing the same Dataset
    // beforehand would memoize an executedPlan whose final shuffle AQE
    // already coalesced — the shim can only preserve the partitioning
    // of plans it executes itself.
    val want = df.groupBy("id").agg(sum("score").as("score"))
      .collect().map(r => (r.getString(0), r.getDouble(1))).toMap
    val ck = Checkpoints.materializeKeyed(
      df.groupBy("id").agg(sum("score").as("score")))
    val lr = ck.queryExecution.analyzed.collectFirst {
      case l: LogicalRDD => l
    }.getOrElse(fail("materialize must produce a LogicalRDD"))
    lr.outputPartitioning match {
      case h: HashPartitioning =>
        assert(h.numPartitions == np)
        assert(h.expressions.map(_.references.head.name) == Seq("id"))
      case other => fail(s"expected HashPartitioning, got $other")
    }
    val got = ck.collect().map(r => (r.getString(0), r.getDouble(1))).toMap
    assert(got == want)
    Checkpoints.release(ck)
  }

  test("a co-keyed join against the checkpoint plans no exchange on " +
      "the checkpoint side") {
    import spark.implicits._
    val df = (1 to 200).map(i => (s"id${i % 13}", i.toDouble))
      .toDF("id", "score")
    val ck = Checkpoints.materializeKeyed(
      df.groupBy("id").agg(sum("score").as("score")))
    val edges = (1 to 50).map(i => (s"id${i % 13}", s"id${(i + 1) % 13}"))
      .toDF("dst", "src").repartition(np, col("dst")).persist()
    try {
      val joined = edges.join(ck.hint("SHUFFLE_HASH"),
        edges("dst") === ck("id"))
      // AQE final plan: both sides arrive hash-clustered on the join
      // key at np partitions — EnsureRequirements must not insert a
      // ShuffleExchange anywhere (the pre-r19 behavior re-exchanged
      // the checkpoint side every iteration). Collect physical nodes
      // (a cached relation's historical plan text is not part of the
      // operator tree, so string-matching would false-positive on it).
      val finalPlan = joined.queryExecution.executedPlan match {
        case a: org.apache.spark.sql.execution.adaptive
            .AdaptiveSparkPlanExec => a.finalPhysicalPlan
        case p => p
      }
      assert(finalPlan.collect {
        case e: org.apache.spark.sql.execution.exchange
            .ShuffleExchangeExec => e
      }.isEmpty, s"expected an exchange-free join, got:\n$finalPlan")
      assert(finalPlan.collect {
        case j: org.apache.spark.sql.execution.joins
            .ShuffledHashJoinExec => j
      }.nonEmpty)
      // and the result set is the plain join's
      assert(joined.count() ==
        edges.join(df.groupBy("id").agg(sum("score").as("score")),
          edges("dst") === col("id")).count())
    } finally {
      edges.unpersist(false)
      Checkpoints.release(ck)
    }
  }

  test("non-hash-partitioned results fall back to unknown partitioning " +
      "with identical rows (old behavior)") {
    import spark.implicits._
    val df = (1 to 20).map(i => (i.toLong, s"v$i")).toDF("k", "v")
      .orderBy(desc("k")) // range-partitioned root — NOT claimable as hash
    val ck = Checkpoints.materializeKeyed(df)
    val lr = ck.queryExecution.analyzed.collectFirst {
      case l: LogicalRDD => l
    }.get
    assert(!lr.outputPartitioning.isInstanceOf[HashPartitioning])
    assert(ck.orderBy(desc("k")).as[(Long, String)].collect().toSeq ==
      (1 to 20).map(i => (i.toLong, s"v$i")).sortBy(-_._1))
    Checkpoints.release(ck)
  }
}
