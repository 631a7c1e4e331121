package graft

import graft.streaming.EventPipelines
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import java.nio.file.Files

/** Structured-Streaming shape of the events pipeline: parquet source →
  * watermark → tumbling window → memory sink, checked against the batch
  * twin on the same data. */
class EventStreamingSpec extends SparkSuite {

  test("asofPurchaseView matches the most recent view at or before") {
    import spark.implicits._
    val u = 1000L // ts are nanos; outputs are µs-floored
    val rows = Seq(
      // (event_id, user_id, ts, type, value)
      (1L, 1L, 100 * u, "view", 5.0),
      (2L, 1L, 200 * u, "purchase", 9.0), // matches view@100µs
      (3L, 1L, 300 * u, "view", 6.0),
      (4L, 1L, 300 * u, "purchase", 9.5), // equal-ts view matches (>= rule)
      (5L, 2L, 50 * u, "purchase", 1.0),  // no prior view → nulls
      (6L, 2L, 60 * u, "view", 7.0),      // future view must not match id 5
      (7L, 2L, 60 * u, "view", 3.0),      // equal-ts tie → max value wins
      (8L, 2L, 70 * u, "purchase", 2.0))
    val df = rows.toDF("event_id", "user_id", "ts", "event_type", "value")
    val got = EventPipelines.asofPurchaseView(df).collect()
      .map(r => (r.getLong(0),
        if (r.isNullAt(4)) None else Some(r.getLong(4)),
        if (r.isNullAt(5)) None else Some(r.getDouble(5))))
    assert(got.toSeq == Seq(
      (2L, Some(100 * u), Some(5.0)),
      (4L, Some(300 * u), Some(6.0)),
      (5L, None, None),
      (8L, Some(60 * u), Some(7.0))))
  }

  test("rangeJoin finds same-user clicks in the window across bins") {
    import spark.implicits._
    val W = 3600L * 1000000000L
    val rows = Seq(
      // (event_id, user_id, ts, type, value)
      (1L, 1L, W + 1000L, "click", 0.0),      // just after a bin boundary
      (2L, 1L, W - 1000L, "click", 0.0),      // previous bin, in window
      (3L, 1L, 2L * W - 1000L, "error", 0.0), // matches both clicks
      (4L, 1L, 3L * W, "error", 0.0),         // both clicks outside window
      (5L, 2L, W + 1000L, "click", 0.0),      // other user: never matches
      (6L, 1L, 2L * W - 1000L, "view", 0.0))  // wrong type: never matches
    val df = rows.toDF("event_id", "user_id", "ts", "event_type", "value")
    val got = EventPipelines.rangeJoinClicksBeforeErrors(df)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq == Seq(
      (3L, 1L, W - 2000L),
      (3L, 2L, W)))
  }

  test("stateful streaming sessionization splits on the gap like batch") {
    import spark.implicits._
    val gap = 30L * 60 * 1000000000L // 30 min in ns
    val m = 60L * 1000000000L
    // Realistic epoch base: event times at epoch 0 tie with the initial
    // watermark (0) and get dropped as late by the event-time-timeout
    // operator's pre-filter.
    val b = 1700000000L * 1000000000L
    // user 1: events at 0,1,2 min then a 60-min gap then 2 more;
    // user 2: single event.
    val rows = Seq((1L, b + 0L * m, 10L), (1L, b + 1L * m, 11L),
      (1L, b + 2L * m, 12L), (1L, b + 62L * m, 13L), (1L, b + 63L * m, 14L),
      (2L, b + 5L * m, 20L))
    val df = rows.toDF("user_id", "ts", "event_id")
    val batch = EventPipelines.sessionizeBatch(df).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val mUs = m / 1000 // batch output is µs-resolution
    assert(batch.toSeq == Seq((1L, 1L, 3L, 2L * mUs), (1L, 2L, 2L, 1L * mUs),
      (2L, 1L, 1L, 0L)))
    // Streaming flavor: closed sessions are emitted when the next event
    // arrives past the gap; open sessions stay in state.
    val dir = java.nio.file.Files.createTempDirectory("graft-sess").toFile
    dir.deleteOnExit()
    df.write.mode("overwrite").parquet(dir.getAbsolutePath)
    val stream = spark.readStream.schema(df.schema).parquet(dir.getAbsolutePath)
    val q = EventPipelines.sessionizeStream(spark, stream)
      .writeStream.outputMode("append").format("memory")
      .queryName("graft_sess_test")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination(60000)
    val emitted = spark.sql("SELECT * FROM graft_sess_test").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // only user 1's first session is closed by a later event
    assert(emitted == Set((1L, 3L, 2L * m)))
  }

  test("sessionizeSalted equals sessionizeBatch, including nested-slice " +
    "intervals, duplicate timestamps, and every salt width") {
    import spark.implicits._
    val m = 60L * 1000000000L
    val b = 1700000000L * 1000000000L
    val rnd = new scala.util.Random(7)
    // Adversarial mix: user 1 dense run whose slices nest (a long
    // within-slice interval spanning another salt's short one); user 2
    // duplicate-timestamp burst (the time-shard-proof case); user 3
    // random spray with gaps; user 4 single event.
    val rows =
      (0 until 40).map(i => (1L, b + i * m, 100L + i)) ++ // one long session
        Seq((1L, b + 200L * m, 150L), (1L, b + 201L * m, 151L)) ++
        (0 until 25).map(i => (2L, b + 7L * m, 200L + i)) ++ // same instant
        (0 until 30).map(i =>
          (3L, b + rnd.nextInt(5000).toLong * m, 300L + i)) ++
        Seq((4L, b, 400L))
    val df = rows.toDF("user_id", "ts", "event_id")
    val want = EventPipelines.sessionizeBatch(df).collect().map(_.toSeq).toSeq
    for (salts <- Seq(1, 2, 3, 16, 64)) {
      val got = EventPipelines.sessionizeSalted(df, salts = salts)
        .collect().map(_.toSeq).toSeq
      assert(got == want, s"salted($salts) diverges from batch")
    }
  }

  test("event-time timeout boundary: deadline == watermark does NOT " +
    "flush (strict <), deadline < watermark does — the invariant the " +
    "stream_sessionize oracle encodes") {
    import spark.implicits._
    val MsNs = 1000000L
    val gapMs = 30L * 60 * 1000
    val b = 1700000000000L // ms, ms-aligned so µs floors are exact
    // maxUser's single event at T defines the delay-0 watermark.
    val T = b + 10 * gapMs
    val rows = Seq(
      (9L, T * MsNs, 90L), // watermark holder: deadline T+gap > wm, open
      // user 1: deadline = (T - gap) + gap = T == wm exactly -> boundary
      (1L, (T - gapMs) * MsNs, 10L),
      // user 2: deadline = (T - gap - 1ms) + gap = wm - 1ms < wm -> flush
      (2L, (T - gapMs - 1) * MsNs, 20L))
    val dir = java.nio.file.Files.createTempDirectory("graft-bnd").toFile
    dir.deleteOnExit()
    rows.toDF("user_id", "ts", "event_id")
      .coalesce(1).write.mode("overwrite").parquet(dir.getAbsolutePath)
    val schema = spark.read.parquet(dir.getAbsolutePath).schema
    val stream = spark.readStream.schema(schema)
      .parquet(dir.getAbsolutePath)
    spark.catalog.dropTempView("graft_bnd_test")
    val q = EventPipelines.sessionizeStream(spark, stream,
        watermarkDelay = "0 seconds")
      .toDF().writeStream.outputMode("append").format("memory")
      .queryName("graft_bnd_test")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination(60000)
    val flushed = spark.sql("SELECT user_id FROM graft_bnd_test")
      .collect().map(_.getLong(0)).toSet
    assert(flushed == Set(2L),
      s"expected only user 2 (deadline < wm) flushed, got $flushed — " +
        "if user 1 appears, Spark's timeout comparison is no longer " +
        "strict and Oracles.streamSessionize must change `<` accordingly")
  }

  test("runningTotalsStream: state carries across microbatches and " +
    "matches the batch window") {
    import spark.implicits._
    val b = 1700000000L * 1000000000L
    val m = 60L * 1000000000L
    // integer values so cross-check is exact regardless of fold grouping
    val early = Seq((1L, b + 0 * m, 10L, 2.0), (1L, b + 1 * m, 11L, 3.0),
      (2L, b + 0 * m, 20L, 5.0))
    val late = Seq((1L, b + 2 * m, 12L, 4.0), (2L, b + 3 * m, 21L, 1.0))
    val dir = java.nio.file.Files.createTempDirectory("graft-rt").toFile
    dir.deleteOnExit()
    // two files, ts-ordered by file, drained one file per batch — the
    // second batch must resume from the first's accumulator
    early.toDF("user_id", "ts", "event_id", "value")
      .coalesce(1).write.mode("append").parquet(dir.getAbsolutePath)
    late.toDF("user_id", "ts", "event_id", "value")
      .coalesce(1).write.mode("append").parquet(dir.getAbsolutePath)
    val schema = spark.read.parquet(dir.getAbsolutePath).schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(dir.getAbsolutePath)
    spark.catalog.dropTempView("graft_rt_test")
    val q = EventPipelines.runningTotalsStream(spark, stream)
      .toDF().writeStream.outputMode("append").format("memory")
      .queryName("graft_rt_test")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination(60000)
    val got = spark.sql("SELECT * FROM graft_rt_test").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val want = EventPipelines
      .runningTotals((early ++ late).toDF("user_id", "ts", "event_id", "value"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == want) // 12 -> 900 cents, 21 -> 600: state carried
  }

  test("idle session is flushed by the event-time timeout and state removed") {
    import spark.implicits._
    val m = 60L * 1000000000L // 1 min in ns
    val dir = Files.createTempDirectory("graft-sess-timeout").toFile
    dir.deleteOnExit()
    val schema = Seq((0L, 0L, 0L)).toDF("user_id", "ts", "event_id").schema
    def write(rows: Seq[(Long, Long, Long)]): Unit = {
      rows.toDF("user_id", "ts", "event_id").coalesce(1)
        .write.mode("append").parquet(dir.getAbsolutePath)
      Thread.sleep(1100) // distinct mod-times => deterministic batch order
    }
    // Batch 1: user 1's only events. Batch 2 advances the watermark far
    // past user 1's gap deadline (0-second delay); batch 3 is the batch
    // in which the engine evaluates that timeout — user 1 never gets
    // another event, so only the event-time timeout can flush it.
    val b = 1700000000L * 1000000000L // see epoch-base note in test 1
    write(Seq((1L, b + 0L * m, 10L), (1L, b + 1L * m, 11L),
      (1L, b + 2L * m, 12L)))
    write(Seq((2L, b + 90L * m, 20L)))
    write(Seq((2L, b + 91L * m, 21L)))
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(dir.getAbsolutePath)
    val q = EventPipelines
      .sessionizeStream(spark, stream, watermarkDelay = "0 seconds")
      .writeStream.outputMode("append").format("memory")
      .queryName("graft_sess_timeout")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val emitted = spark.sql("SELECT * FROM graft_sess_timeout").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // user 1's idle session (3 events, 2 min) emitted by timeout; user
    // 2's session is still live inside the watermark, so state-only.
    assert(emitted == Set((1L, 3L, 2L * m)))
  }

  test("streaming dedup drops duplicate keys within the watermark") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-dedup").toFile
    dir.deleteOnExit()
    val rows = Seq(
      (1L, new java.sql.Timestamp(1700000000000L), "click", 1.0),
      (1L, new java.sql.Timestamp(1700000060000L), "click", 2.0), // dup key
      (1L, new java.sql.Timestamp(1700000120000L), "view", 3.0),
      (2L, new java.sql.Timestamp(1700000180000L), "click", 4.0))
    val df = rows.toDF("user_id", "ts", "event_type", "value")
    df.write.mode("overwrite").parquet(dir.getAbsolutePath)
    val stream = spark.readStream.schema(df.schema).parquet(dir.getAbsolutePath)
    val q = EventPipelines.streamingDedup(stream)
      .writeStream.outputMode("append").format("memory")
      .queryName("graft_dedup_test")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination(60000)
    val got = spark.sql(
      "SELECT user_id, event_type FROM graft_dedup_test")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(got == Set((1L, "click"), (1L, "view"), (2L, "click")))
  }

  test("activeTime: overlapping windows never double-count") {
    import spark.implicits._
    val m = 60L * 1000000000L
    val W = 30 * m
    // user 1: events at 0, 10, 100 min → union = [0,40) ∪ [100,130)
    //   = 10 min (capped gap) + 30 + 30 = 70 min
    // user 2: one event → exactly W
    val rows = Seq((1L, 1L, 0 * m), (2L, 1L, 10 * m), (3L, 1L, 100 * m),
      (4L, 2L, 5 * m)).toDF("event_id", "user_id", "ts")
    val byUser = EventPipelines.activeTime(rows, W).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(byUser(1L) == ((3L, 70 * m)))
    assert(byUser(2L) == ((1L, W)))
  }

  test("decayedCounts: newest events weigh ~1, old decay toward 0") {
    import spark.implicits._
    val h = 3600L * 1000000000L
    val rows = Seq((1L, 1L, 0 * h, "a", 0.0), (2L, 1L, 1 * h, "a", 0.0),
      (3L, 2L, 1 * h, "b", 0.0)).toDF("event_id", "user_id", "ts",
      "event_type", "value")
    val got = EventPipelines.decayedCounts(rows).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    // anchor = 1h; type a: exp(0) + exp(-1); type b: exp(0)
    val expA = (math.rint(1e6) + math.rint(math.exp(-1.0) * 1e6)) / 1e6
    assert(got("a") == ((2L, expA)))
    assert(got("b") == ((1L, 1.0)))
  }

  test("sessionizeNative matches the batch twin's sessions, batch + stream") {
    import spark.implicits._
    val m = 60L * 1000000000L // one minute in ns
    // user 1: events at 0, 10 (one session), 50 and 100 min each past
    // the 30-min gap (two singleton sessions); user 2: single event
    val rows = Seq(
      (1L, 1L, 0 * m), (2L, 1L, 10 * m), (3L, 1L, 50 * m),
      (4L, 1L, 100 * m), (5L, 2L, 5 * m))
      .toDF("event_id", "user_id", "ts")
    val native = EventPipelines.sessionizeNative(rows).collect()
      .map(r => (r.getLong(0), r.getLong(3)))
    val batch = EventPipelines.sessionizeBatch(rows).collect()
      .map(r => (r.getLong(0), r.getLong(2)))
    // same multiset of (user, session size) on both implementations
    assert(native.sorted.toSeq == batch.sorted.toSeq)
    assert(native.sorted.toSeq ==
      Seq((1L, 1L), (1L, 1L), (1L, 2L), (2L, 1L)))
    // identical code over a stream: watermark + append emits the closed
    // sessions once the watermark passes them
    val dir = Files.createTempDirectory("graft-sessnative").toFile
    dir.deleteOnExit()
    rows.write.mode("overwrite").parquet(dir.getAbsolutePath)
    val stream = spark.readStream.schema(rows.schema)
      .parquet(dir.getAbsolutePath)
    val q = EventPipelines.sessionizeNative(stream,
        watermarkDelay = Some("0 seconds"))
      .writeStream.outputMode("append").format("memory")
      .queryName("graft_sess_native")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(60000)
    val emitted = spark.sql(
      "SELECT user_id, n_events FROM graft_sess_native")
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    // every session except the one still open at max watermark flushes
    assert(emitted.nonEmpty && emitted.toSet.subsetOf(native.toSet))
  }

  test("streaming KMV sketch (complete mode) equals the batch sketch") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-kmv-stream").toFile
    dir.deleteOnExit()
    val rows = (1 to 40).map(i => ("g" + (i % 2), s"value$i"))
    val df = rows.toDF("grp", "v")
    df.write.mode("overwrite").parquet(dir.getAbsolutePath)
    val stream = spark.readStream.schema(df.schema)
      .parquet(dir.getAbsolutePath)
    val q = graft.pipelines.Sketches
      .kmvSketch(spark, stream, col("grp"), col("v"))
      .writeStream.outputMode("complete").format("memory")
      .queryName("graft_kmv_stream")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(60000)
    val got = spark.sql("SELECT grp, sketch FROM graft_kmv_stream")
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1).toSeq).toMap
    val want = graft.pipelines.Sketches
      .kmvSketch(spark, df, col("grp"), col("v"))
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1).toSeq).toMap
    assert(got == want && want.keySet == Set("g0", "g1"))
  }

  test("streaming CMS sketch (complete mode) equals the batch cell grid") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-cms-stream").toFile
    dir.deleteOnExit()
    val rows = Seq.fill(5)("alpha") ++ Seq.fill(3)("beta") ++ Seq("gamma")
    val df = rows.toDF("v")
    df.write.mode("overwrite").parquet(dir.getAbsolutePath)
    val stream = spark.readStream.schema(df.schema)
      .parquet(dir.getAbsolutePath)
    val q = graft.pipelines.Sketches.cmsSketch(spark, stream, col("v"))
      .writeStream.outputMode("complete").format("memory")
      .queryName("graft_cms_stream")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(60000)
    val got = spark.sql("SELECT r, bucket, cnt FROM graft_cms_stream")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val want = graft.pipelines.Sketches.cmsSketch(spark, df, col("v"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == want && want.nonEmpty)
  }

  test("streaming Misra-Gries summary keeps every heavy hitter " +
      "(complete mode over a file stream)") {
    // The MG survival guarantee holds under ANY merge tree — including
    // the incremental one a streaming complete-mode aggregation builds
    // — so a continuous-ingest pipeline can maintain the candidate set
    // online and run the exact recount as a periodic batch pass.
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-mg-stream").toFile
    dir.deleteOnExit()
    val rows = Seq.fill(40)("hot") ++ Seq.fill(15)("warm") ++
      (1 to 30).map(i => s"tail$i")
    val df = rows.toDF("v")
    df.write.mode("overwrite").parquet(dir.getAbsolutePath)
    val k = 4
    val stream = spark.readStream.schema(df.schema)
      .parquet(dir.getAbsolutePath)
    val q = stream.select(col("v")).as[String]
      .select(new graft.functions.MisraGriesAgg(k).toColumn.name("cand"))
      .writeStream.outputMode("complete").format("memory")
      .queryName("graft_mg_stream")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(60000)
    val cand = spark.sql("SELECT cand FROM graft_mg_stream")
      .collect().head.getSeq[String](0).toSet
    assert(cand.size <= k)
    val n = rows.length // 85; heavy = freq > 85/5 = 17 -> "hot" only
    val heavy = rows.groupBy(identity)
      .collect { case (v, g) if g.size.toLong * (k + 1) > n => v }.toSet
    assert(heavy == Set("hot") && heavy.subsetOf(cand),
      s"stream summary lost heavy hitters: $heavy vs $cand")
  }

  test("stream-stream interval join pairs errors with in-window clicks " +
      "and matches the batch range join") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-ssjoin").toFile
    dir.deleteOnExit()
    val base = 1700000000000L // ms
    val min = 60000L
    // user 1: clicks at 0, 30, 70 min; errors at 50, 130 min (1h window:
    // error@50 pairs with clicks@0,30; error@130 pairs with click@70).
    // user 2: click at 10 min, no error. user 3: error with no clicks.
    val rows = Seq(
      (10L, 1L, base + 0 * min, "click"), (11L, 1L, base + 30 * min, "click"),
      (12L, 1L, base + 70 * min, "click"), (50L, 1L, base + 50 * min, "error"),
      (51L, 1L, base + 130 * min, "error"), (20L, 2L, base + 10 * min, "click"),
      (60L, 3L, base + 40 * min, "error"))
      .map { case (id, u, ms, et) => (id, u, new java.sql.Timestamp(ms), et) }
    val df = rows.toDF("event_id", "user_id", "ts", "event_type")
    df.write.mode("overwrite").parquet(dir.getAbsolutePath)
    val stream = spark.readStream.schema(df.schema).parquet(dir.getAbsolutePath)
    val q = EventPipelines.rangeJoinStream(stream)
      .writeStream.outputMode("append").format("memory")
      .queryName("graft_ssjoin_test")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(60000)
    val got = spark.sql("SELECT err_id, click_id FROM graft_ssjoin_test")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((50L, 10L), (50L, 11L), (51L, 12L)))
    // agrees with the batch twin's pair set on the ns-integer input
    val batchInput = rows.map { case (id, u, ts, et) =>
      (id, u, ts.getTime * 1000000L, et, 0.0) }
      .toDF("event_id", "user_id", "ts", "event_type", "value")
    val batch = EventPipelines.rangeJoinClicksBeforeErrors(batchInput)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(batch == got)
  }

  test("streaming windowed stats equals the batch aggregation") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-stream").toFile
    dir.deleteOnExit()
    val rows = (0 until 200).map { i =>
      (i.toLong, new java.sql.Timestamp(1700000000000L + i * 60000L),
        s"type${i % 3}", (i % 7).toDouble)
    }
    val df = rows.toDF("event_id", "ts", "event_type", "value")
    df.write.mode("overwrite").parquet(dir.getAbsolutePath)

    val stream = spark.readStream.schema(df.schema)
      .parquet(dir.getAbsolutePath)
    val q = EventPipelines.windowedStats(stream)
      .writeStream.outputMode("complete")
      .format("memory").queryName("graft_stream_test")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(60000)

    val streamed = spark.sql(
      """SELECT CAST(window.start AS LONG) AS w, event_type, n, total
        |FROM graft_stream_test""".stripMargin)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getDouble(3))).toSet
    val batch = df.groupBy(
        unix_timestamp(date_trunc("hour", col("ts"))).as("w"),
        col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("total"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getDouble(3))).toSet
    assert(streamed == batch && streamed.nonEmpty)
  }
}
