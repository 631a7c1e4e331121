package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.LogicalRDD

/** Deterministic lifecycle for per-iteration plan checkpoints.
  *
  * Every iterative kernel (HITS, SALSA, PageRank, connected components)
  * truncates its growing logical plan by checkpointing the fresh score
  * vector each iteration. Spark frees a checkpoint's storage blocks only
  * when the ContextCleaner notices the dead RDD reference — which
  * requires a driver GC to run first. Over a long multi-query run
  * (exactly what a 100 TB pipeline is) the superseded MEMORY_AND_DISK
  * blocks accumulate between GCs and heap health becomes a GC-timing
  * lottery; round 4's scoring harness died of it. The fix is
  * structural, not JVM flags: each loop keeps a handle to the previous
  * iteration's checkpointed plan and [[release]]s its blocks as soon as
  * the next one is materialized, so the live block set per kernel stays
  * O(2·|V|) regardless of run length.
  *
  * [[materialize]] also carries the fault-tolerance knob for real
  * clusters: `localCheckpoint` stores blocks on the executors and is NOT
  * executor-loss-safe — on a 1000-executor cluster one lost executor
  * kills a 16-iteration run. Setting `spark.graft.checkpoint.reliable=
  * true` (with `spark.graft.checkpoint.dir` pointing at shared storage,
  * e.g. HDFS) switches every kernel loop to reliable `checkpoint`, which
  * survives executor loss at the cost of writing each iteration's
  * |V|-sized vector to the checkpoint dir (and recomputing it once for
  * the write — the standard reliable-checkpoint trade).
  */
object Checkpoints {

  /** Conf key: "true" switches kernel loops to reliable checkpoints. */
  val ReliableKey = "spark.graft.checkpoint.reliable"
  /** Conf key: checkpoint directory for the reliable mode (shared
    * storage on a real cluster). */
  val DirKey = "spark.graft.checkpoint.dir"

  /** Eagerly materialize `df` with truncated lineage: `localCheckpoint`
    * by default, reliable `checkpoint` when [[ReliableKey]] is set. */
  def materialize(df: DataFrame): DataFrame =
    materialize(df, eager = true)

  /** [[materialize]] with the caller choosing the materializing action:
    * `eager = false` returns the lazily-checkpointed frame, and the
    * caller MUST immediately run a FULL-SCAN action on it (a global
    * aggregate — never `limit`/`head`, which compute only some
    * partitions). That action computes every partition and thereby
    * persists the checkpoint — so a required audit aggregate can double
    * as the materializing pass instead of costing a dedicated job
    * (ADVICE r9 on [[graft.pipelines.Similarity.semanticDuplicates]]). */
  def materialize(df: DataFrame, eager: Boolean): DataFrame = {
    val spark = df.sparkSession
    if (spark.conf.get(ReliableKey, "false").toBoolean) {
      if (spark.sparkContext.getCheckpointDir.isEmpty)
        spark.sparkContext.setCheckpointDir(spark.conf.get(DirKey,
          sys.props("java.io.tmpdir") + "/graft-checkpoints"))
      df.checkpoint(eager = eager)
    } else df.localCheckpoint(eager = eager)
  }

  /** [[materialize]] for KERNEL-SHAPED loops — a |V|-sized keyed vector
    * that the next iteration immediately re-joins on its hash key
    * against a co-clustered cached side. Stock `localCheckpoint` drops
    * the hash partitioning under AQE (`AdaptiveSparkPlanExec` reports
    * `UnknownPartitioning`), which cost every such loop one |V|-sized
    * Exchange per iteration; this path preserves it — and disables AQE
    * partition coalescing for the checkpointed query only, so there IS
    * a hash layout to preserve (guide §2.4; see
    * [[org.apache.spark.sql.graftshim.CheckpointShim]]).
    *
    * NOT the default: for checkpoints whose consumers re-key anyway
    * (the structural peels re-aggregate degrees from scratch and
    * semi-join on alternating keys; the wedge pipelines union both
    * endpoint orientations), the preserved partitioning buys nothing
    * while the coalesce-off runs every tiny late-round stage at full
    * `shuffle.partitions` width — measured 4× slower on the k-truss
    * peel at sf0.1. Keyed checkpoints are for vectors consumed BY KEY.
    * Falls back to [[materialize]] under the reliable-checkpoint conf
    * (cluster fault-tolerance mode — partitioning preservation is an
    * optimization, not a contract). */
  def materializeKeyed(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    if (spark.conf.get(ReliableKey, "false").toBoolean) materialize(df)
    else org.apache.spark.sql.graftshim.CheckpointShim
      .localCheckpoint(df, eager = true)
  }

  /** Eagerly release the storage behind a [[materialize]]d (or
    * `localCheckpoint`ed) DataFrame. Callers guarantee the plan is never
    * consumed again — its lineage is truncated, so the data is
    * unrecoverable after this. Local checkpoints free their storage
    * blocks; reliable checkpoints also delete their files (the
    * ContextCleaner's `cleanCheckpoints` path is GC-timing-dependent and
    * off by default — the same lottery this object exists to end, on the
    * storage axis). No-op for non-checkpoint plans. */
  def release(df: DataFrame): Unit =
    df.queryExecution.analyzed match {
      case lr: LogicalRDD => releaseRdd(df.sparkSession, lr)
      case _ => ()
    }

  /** [[release]] for a CONSUMED query result whose checkpoints sit below
    * other operators (sort, project, join…): walks the analyzed plan and
    * releases every checkpoint leaf. A long multi-query run (bench,
    * verify, a 100 TB pipeline driver) calls this after each query's
    * sink completes, so final per-query score vectors don't accumulate
    * as dead blocks between driver GCs. */
  def releaseAll(df: DataFrame): Unit =
    df.queryExecution.analyzed.foreach {
      case lr: LogicalRDD => releaseRdd(df.sparkSession, lr)
      case _ => ()
    }

  private def releaseRdd(spark: org.apache.spark.sql.SparkSession,
      lr: LogicalRDD): Unit = {
    lr.rdd.unpersist(blocking = false)
    lr.rdd.getCheckpointFile.foreach { dir =>
      val p = new org.apache.hadoop.fs.Path(dir)
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      try fs.delete(p, true)
      catch { case _: java.io.IOException => () } // best-effort reclaim
    }
  }
}
