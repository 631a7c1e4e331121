package graft

import graft.streaming.{EventPipelines, Restart}
import org.apache.spark.sql.functions._

/** Checkpointed-restart harness ([[graft.streaming.Restart]]): the
  * gates prove restart output equals the single-drain oracle; these
  * tests prove the equality is NOT vacuous — state genuinely crosses
  * the phase boundary (a session straddling the restart comes back
  * merged; a fold continues from its restored accumulator) rather than
  * the split happening to land between sessions. */
class RestartSpec extends SparkSuite {

  private val S = 1000000000L // seconds → nanos
  // realistic epoch base: an event AT epoch 0 sits exactly on the
  // initial watermark and is dropped as late by the event-time-timeout
  // sessionizer — a fixture artifact, not a pipeline property
  private val T0 = 1600000000L * S

  // u1's session straddles the mid-ts split (mid = T0 + 2500 s): events
  // at +0/+1000 s drain in phase 1 (session left OPEN in the
  // checkpointed state), +2600 s arrives after the restart within the
  // 1800 s gap, and u2's +5000 s event pushes the watermark past u1's
  // +4400 s deadline so the merged session flushes in phase 2.
  private def events = {
    import spark.implicits._
    Seq(
      (1L, 1L, T0, "click", 1.25),
      (2L, 1L, T0 + 1000L * S, "click", 2.50),
      (3L, 1L, T0 + 2600L * S, "click", 4.00),
      (4L, 2L, T0 + 5000L * S, "click", 8.00))
      .toDF("event_id", "user_id", "ts", "event_type", "value")
  }

  test("restarted sessionizer extends a session left open at the stop — " +
      "the straddling session emerges merged, not split") {
    // slicesPerPhase = 1: the 4-event fixture pins WHERE each event
    // lands; the multi-batch admission path has its own test below
    val out = Restart.twoPhaseDrain(spark, events, "spec-sess", "spec",
        src => EventPipelines.sessionizeStream(spark, src,
          watermarkDelay = "0 seconds").toDF(), slicesPerPhase = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // ONE u1 session covering all three events, 2600 s long: only
    // possible if phase 2 restored (start=+0, last=+1000, n=2) from the
    // checkpoint and extended it. A lost state store would emit
    // (1, 1, 0) for the orphaned +2600 s event instead.
    assert(out.toSet == Set((1L, 3L, 2600L * S)), out.mkString(", "))
  }

  test("restarted running-totals fold continues from the restored " +
      "accumulator") {
    val out = Restart.twoPhaseDrain(spark, events, "spec-tot", "spec",
        src => EventPipelines.runningTotalsStream(spark, src).toDF(),
        slicesPerPhase = 1)
      .collect().map(r => (r.getLong(1), r.getLong(2))).toMap
    // event 3 lands after the restart; its running total must include
    // phase 1's 1.25 + 2.50 — a fresh accumulator would emit 400
    assert(out == Map(1L -> 125L, 2L -> 375L, 3L -> 775L, 4L -> 800L), out)
  }

  test("multi-batch phases: 4 time-ordered micro-batches per phase, " +
      "mid-drain watermark flushes, restart — output equals the " +
      "never-stopped sessionization") {
    import spark.implicits._
    // u1-u3: one 16-event session each (600 s spacing < 1800 s gap);
    // u4: an early 2-event session (flushed MID-PHASE-1 once the
    // watermark passes its +2450 s deadline — a flush between batches,
    // not at the stop) and a late 2-event session whose deadline
    // outlives the stream (stays open, correctly absent). Both phases
    // hold 17+ events, so every one of the 4 range slices is non-empty
    // (twoPhaseDrain asserts one data batch per slice file).
    val rows = (for {
      u <- 1L to 3L; k <- 0L to 15L
    } yield (u * 100 + k, u, T0 + k * 600 * S, "click", 1.0)) ++
      Seq((401L, 4L, T0 + 50L * S, "click", 1.0),
        (402L, 4L, T0 + 650L * S, "click", 1.0),
        (403L, 4L, T0 + 12000L * S, "click", 1.0),
        (404L, 4L, T0 + 12600L * S, "click", 1.0))
    val ev = rows.toDF("event_id", "user_id", "ts", "event_type", "value")
    val out = Restart.twoPhaseDrain(spark, ev, "spec-multi", "spec",
        src => EventPipelines.sessionizeStream(spark, src,
          watermarkDelay = "0 seconds").toDF())
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // final watermark = +12600 s: u1-u3's deadline +10800 flushes, u4's
    // late session (+14400) does not — same semantics as a single drain
    assert(out == Set((1L, 16L, 9000L * S), (2L, 16L, 9000L * S),
      (3L, 16L, 9000L * S), (4L, 2L, 600L * S)), out.mkString(", "))
  }

  test("restart across an INCOMPATIBLE change — the stateful operator " +
      "itself swapped between phases — is refused loudly, not silently " +
      "recomputed") {
    // The accepted evolution shape (stateless filter deployed upstream
    // of an unchanged stateful fold) is gate-proven by
    // stream_restart_evolved; this is the documented-behavior OTHER
    // side: phase 2 resumes the checkpoint with a DIFFERENT stateful
    // operator (running-totals fold -> sessionizer, GroupState[Double]
    // -> GroupState[SessionState]). Spark pins the stateful operator's
    // state schema in the checkpoint and must refuse the mismatch —
    // a silent rebuild-from-scratch here would be data corruption in
    // deployment, so the contract worth a regression test is "this
    // fails, and fails before emitting output".
    val ex = intercept[Exception] {
      Restart.twoPhaseDrain(spark, events, "spec-evolve-bad", "spec",
        src => EventPipelines.runningTotalsStream(spark, src).toDF(),
        slicesPerPhase = 1,
        pipeline2 = Some(src => EventPipelines.sessionizeStream(spark, src,
          watermarkDelay = "0 seconds").toDF()))
    }
    // The refusal must be the state layer's schema/compat check (or the
    // harness's own conservation guard tripping on the aborted phase),
    // not an incidental NPE: require a recognizably stateful message
    // somewhere in the cause chain.
    val msgs = Iterator.iterate(ex: Throwable)(_.getCause)
      .takeWhile(_ != null).map(t => Option(t.getMessage).getOrElse(""))
      .mkString(" | ").toLowerCase
    assert(msgs.contains("state") || msgs.contains("schema") ||
      msgs.contains("compat"), s"unexpected failure shape: $msgs")
  }

  test("without the shared checkpoint the source replays everything — " +
      "the signal the harness's source-log conservation guard catches") {
    val ev = events
    val base = "target/graft-restart/spec-guard-spec"
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(rm); f.delete()
    }
    rm(new java.io.File(base))
    val src = s"$base/src"
    val mid = T0 + 2500L * S
    ev.filter(col("ts") <= mid).coalesce(1)
      .write.mode("overwrite").parquet(src)
    val schema = spark.read.parquet(src).schema
    def drain(ckpt: String, sink: String): Long = {
      val q = EventPipelines.runningTotalsStream(spark,
          spark.readStream.schema(schema).parquet(src)).toDF()
        .writeStream.outputMode("append").format("parquet")
        .option("path", sink).option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      q.recentProgress.map(_.numInputRows).sum
    }
    assert(drain(s"$base/ckpt1", s"$base/sink1") == 2L)
    ev.filter(col("ts") > mid).coalesce(1)
      .write.mode("append").parquet(src)
    // fresh checkpoint → the file-source log is empty → ALL 4 rows are
    // read again (2 + 4 > corpus 4): exactly the replay that
    // twoPhaseDrain's source-log check (phase-2 batches must admit
    // ONLY phase-2's new files) turns into a loud failure
    assert(drain(s"$base/ckpt2", s"$base/sink2") == 4L)
  }
}
