package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured-Streaming pipelines over the `events` stream table, plus
  * their batch twins (the twins are what the DuckDB oracle checks; the
  * streaming shape is exercised by `EventStreamingSpec`).
  *
  * At scale: tumbling-window aggregation with a watermark is the
  * canonical bounded-state plan — state size is O(windows × event
  * types), independent of input volume.
  */
object EventPipelines {

  /** Streaming: hourly tumbling window per event type. Works on a
    * `readStream` DataFrame; append mode after the watermark closes. */
  def windowedStats(events: DataFrame): DataFrame =
    events.withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("total"))

  /** Batch twin of [[windowedStats]] with an oracle-stable output shape
    * (epoch seconds instead of a window struct). `ts` arrives as
    * epoch-nanos BIGINT (see [[graft.GraphIO.events]]); the hour bucket
    * is pure integer arithmetic. */
  def windowedStatsBatch(events: DataFrame): DataFrame =
    events.groupBy(
        expr("CAST(ts div 3600000000000 AS BIGINT) * 3600").as("hour_ts"),
        col("event_type"))
      .agg(count(lit(1)).as("n"), countDistinct(col("user_id")).as("n_users"),
        round(sum(col("value")), 6).as("total"))
      .orderBy(col("hour_ts"), col("event_type"))

  /** Gap-based sessionization, batch shape: a new session starts when a
    * user's inter-event gap exceeds `gapNs`. All-integer output
    * (session index, event count, nanosecond duration) — an exact
    * cross-engine oracle with zero FP involvement. `ts` is epoch-nanos
    * BIGINT. */
  def sessionizeBatch(events: DataFrame,
      gapUs: Long = 30L * 60 * 1000000L): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // Microsecond resolution on both sides: DuckDB timestamps carry µs
    // (nanos layouts truncate on read), so the oracle can only see µs —
    // the normalized ns input is floored identically here (integer div,
    // no FP).
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("e"), col("event_id"))
    val flagged = events
      .select(col("user_id"), expr("ts div 1000").as("e"), col("event_id"))
      .withColumn("is_new",
        when(col("e") - lag(col("e"), 1).over(w) > gapUs, 1)
          .when(lag(col("e"), 1).over(w).isNull, 1).otherwise(0))
      .withColumn("sess", sum(col("is_new"))
        .over(w.rowsBetween(Window.unboundedPreceding, 0)))
    flagged.groupBy(col("user_id"), col("sess"))
      .agg(count(lit(1)).as("n_events"),
        (max(col("e")) - min(col("e"))).as("dur_us"))
      .orderBy(col("user_id"), col("sess"))
  }

  /** [[sessionizeBatch]] via Spark's NATIVE `session_window` operator,
    * BOUNDARY-ALIGNED so it passes the lag formulation's oracle
    * VERBATIM — the exact twin of [[sessionizeNative]] (which keeps
    * the operator's own strict-`< gap` boundary and is spec-gated
    * against the batch twin off the boundary). Alignment:
    * `session_window` merges on `next − last < gap` (an event at
    * exactly `last + gap` starts a new session), the lag formulation
    * on `next − last ≤ gap`; event times here are integer
    * MICROSECONDS, so `< gap + 1µs ⟺ ≤ gap` and the native gap is
    * `gapUs + 1` — equality becomes structural, not measure-zero.
    *
    * Scale shape: one shuffle on user_id, session merge inside the
    * aggregation (Spark's UpdatingSessionsIterator), one
    * session-count-sized ordinal window — vs the lag formulation's
    * event-sized double window pass. Session end = last event + gap,
    * so `dur_us = end − gap − start` recovers `max(e) − min(e)`. */
  def sessionizeNativeExact(events: DataFrame,
      gapUs: Long = 30L * 60 * 1000000L): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val gapP1 = gapUs + 1
    events
      .select(col("user_id"),
        timestamp_micros(expr("ts div 1000")).as("t"))
      .groupBy(col("user_id"),
        session_window(col("t"), s"$gapP1 microseconds"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"),
        unix_micros(col("session_window.start")).as("lo"),
        (unix_micros(col("session_window.end")) - lit(gapP1)).as("hi"),
        col("n_events"))
      .withColumn("sess", row_number().over(Window.partitionBy(col("user_id"))
        .orderBy(col("lo"))).cast("long"))
      .select(col("user_id"), col("sess"), col("n_events"),
        (col("hi") - col("lo")).as("dur_us"))
      .orderBy(col("user_id"), col("sess"))
  }

  /** SKEW-PROOF sessionization — identical output to
    * [[sessionizeBatch]] from two BOUNDED stages, for the corpus where
    * one giant user makes the per-user sort window a single hot
    * partition (the canonical window-family skew exposure).
    *
    * Stage 1 keys the window by `(user_id, salt)` with
    * `salt = event_id % salts`, so a user's events — however many —
    * sort in `salts` independent partitions, and collapses each
    * slice to its within-slice session summaries `(n, lo, hi)`.
    * Stage 2 re-merges each user's summaries: sorted by interval
    * start, an interval opens a NEW session iff its start is more than
    * `gapUs` past the RUNNING MAX of previous ends (running max, not
    * `lag` — slices interleave, so an interval can nest inside an
    * earlier one). Per-user stage-2 input is session-count-sized
    * (≤ true sessions + salts−1 extra splits), never event-sized.
    *
    * Output equality is structural, not approximate: gap-tolerance
    * interval merging computes the connected components of the
    * "within gap" relation on the sorted event timestamps, and
    * pre-merging any disjoint slice subsets first cannot change the
    * components (each stage-1 interval sits inside one true session;
    * stage 2 links exactly the cross-slice pairs within tolerance).
    * The `events_sessionize_salted` gate runs against the UNCHANGED
    * [[sessionizeBatch]] oracle to prove it. */
  def sessionizeSalted(events: DataFrame,
      gapUs: Long = 30L * 60 * 1000000L, salts: Int = 16): DataFrame = {
    require(salts >= 1, s"salts must be >= 1, got $salts")
    import org.apache.spark.sql.expressions.Window
    val w1 = Window.partitionBy(col("user_id"), col("salt"))
      .orderBy(col("e"), col("event_id"))
    val sliced = events.select(col("user_id"), expr("ts div 1000").as("e"),
      col("event_id"), pmod(col("event_id"), lit(salts.toLong)).as("salt"))
    val iv = sliced
      .withColumn("is_new",
        when(col("e") - lag(col("e"), 1).over(w1) > gapUs, 1)
          .when(lag(col("e"), 1).over(w1).isNull, 1).otherwise(0))
      .withColumn("s1", sum(col("is_new"))
        .over(w1.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col("user_id"), col("salt"), col("s1"))
      .agg(count(lit(1)).as("n"), min(col("e")).as("lo"),
        max(col("e")).as("hi"))
    val w2 = Window.partitionBy(col("user_id"))
      .orderBy(col("lo"), col("hi"), col("salt"), col("s1"))
    val runMax = max(col("hi"))
      .over(w2.rowsBetween(Window.unboundedPreceding, -1))
    iv
      .withColumn("is_new",
        when(col("lo") - runMax > gapUs, 1)
          .when(runMax.isNull, 1).otherwise(0))
      .withColumn("sess", sum(col("is_new"))
        .over(w2.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col("user_id"), col("sess"))
      .agg(sum(col("n")).as("n_events"),
        (max(col("hi")) - min(col("lo"))).as("dur_us"))
      .orderBy(col("user_id"), col("sess"))
  }

  /** Streaming sessionization via explicit state: one open session per
    * user, flushed either when an event arrives past the gap or when the
    * event-time watermark passes the session's gap deadline (so an idle
    * user's last session is emitted and its state removed, instead of
    * living forever). State is O(users active within the watermark) —
    * the canonical bounded-state `flatMapGroupsWithState` design.
    *
    * `ts` is epoch-nanos BIGINT (see [[graft.GraphIO.events]]); the
    * watermark needs a TimestampType column, so a µs-truncated
    * `event_time` twin is derived for it while the session arithmetic
    * stays in exact integer nanos. */
  final case class Ev(user_id: Long, ts: Long, event_id: Long)
  final case class SessionState(start: Long, last: Long, n: Long)
  final case class Session(user_id: Long, n_events: Long, dur_ns: Long)

  def sessionizeStream(spark: SparkSession, events: DataFrame,
      gapNs: Long = 30L * 60 * 1000000000L,
      watermarkDelay: String = "1 hour"): Dataset[Session] = {
    import spark.implicits._
    def update(user: Long, evs: Iterator[Ev],
        state: GroupState[SessionState]): Iterator[Session] = {
      if (state.hasTimedOut) {
        // Watermark passed last-event + gap with no new events: the open
        // session can never be extended — flush it and free the state.
        val out = state.getOption.map(s => Session(user, s.n, s.last - s.start))
        state.remove()
        out.iterator
      } else {
        var out = List.empty[Session]
        var st = state.getOption
        evs.toSeq.sortBy(e => (e.ts, e.event_id)).foreach { e =>
          st match {
            case Some(s) if e.ts - s.last > gapNs =>
              out ::= Session(user, s.n, s.last - s.start)
              st = Some(SessionState(e.ts, e.ts, 1))
            case Some(s) =>
              st = Some(SessionState(s.start, e.ts, s.n + 1))
            case None =>
              st = Some(SessionState(e.ts, e.ts, 1))
          }
        }
        st.foreach { s =>
          state.update(s)
          // Deadline = last event + gap (ms for the state API). Late data
          // can put that at/behind the current watermark, which the API
          // rejects — clamp just past it; the timeout then fires on the
          // next watermark advance, which is the earliest legal flush.
          val deadlineMs = s.last / 1000000L + gapNs / 1000000L
          state.setTimeoutTimestamp(
            math.max(deadlineMs, state.getCurrentWatermarkMs() + 1))
        }
        out.reverseIterator
      }
    }
    events.select(col("user_id"), col("ts"), col("event_id"),
        // integer div, never `/`: Spark's `/` is DOUBLE division, and
        // epoch-nanos exceed double's 53-bit mantissa (ulp ≈ 256 ns) —
        // the FP path puts event_time 1 µs low for ~half of all
        // timestamps, which skews the watermark the timeout flush
        // (and its oracle) depend on
        timestamp_micros(expr("ts div 1000")).as("event_time"))
      .withWatermark("event_time", watermarkDelay)
      .as[Ev]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout)(update)
  }

  /** Native `session_window` sessionization — the built-in merging-
    * window twin of [[sessionizeStream]]/[[sessionizeBatch]]: one
    * expression, identical code over batch and `readStream` input
    * (watermark + append mode in streaming; spec-gated both ways).
    * Returns `(user_id, start, end, n_events)` per session with the µs
    * floor of the batch twin.
    *
    * Boundary note: an event arriving EXACTLY `gap` after its
    * predecessor merges in [[sessionizeBatch]] (`> gap` splits) but
    * splits here (native sessions merge only on strict overlap, and
    * `end = ts + gap` meets, not overlaps, the next window) — the two
    * agree everywhere off that measure-zero boundary. For structural
    * equality, [[sessionizeNativeExact]] aligns the boundary with a
    * `gap + 1µs` window and is gated on the lag formulation's oracle
    * verbatim.
    *
    * Scale shape: Spark plans this as one shuffle on the grouping key
    * plus a per-partition merge of sorted session ranges — the same
    * profile as the explicit-state twin, with the state machinery
    * inside the engine. */
  def sessionizeNative(events: DataFrame, gap: String = "30 minutes",
      watermarkDelay: Option[String] = None): DataFrame = {
    val base = events.select(col("user_id"),
      timestamp_micros(expr("ts div 1000")).as("event_time"))
    // Streaming callers pass the watermark delay (append mode requires
    // one); it must be declared on THIS projection — a watermark set
    // upstream dies when the column is re-derived.
    val src = watermarkDelay.fold(base)(base.withWatermark("event_time", _))
    src.groupBy(col("user_id"),
        session_window(col("event_time"), gap).as("sw"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"), col("sw.start").as("start"),
        col("sw.end").as("end"), col("n_events"))
  }

  /** As-of join, composed from existing operators (Spark has no native
    * one; DuckDB's `ASOF LEFT JOIN` is the oracle twin): each purchase
    * event gets the user's most recent view at or before it.
    *
    * Shape: union-tag both inputs, then one running
    * `last(..., ignoreNulls)` over a single `(user_id)`-partitioned
    * time sort — both inputs shuffle exactly once on the join key and
    * no per-row range probe exists, which is the 100 TB-safe form of a
    * time-series as-of (a theta-join `r.ts <= l.ts` would plan as a
    * nested loop). Right rows sort before left rows at equal ts
    * (side 0 < 1), so an exactly-simultaneous view matches, like
    * ASOF's `>=`. Equal-ts view ties are pre-collapsed with `max` so
    * the matched row is engine-independent; the carried (ts, value)
    * pair travels as one struct so a NULL view value can never split
    * the match across two different view rows. */
  def asofPurchaseView(events: DataFrame): DataFrame = {
    val views = events.filter(col("event_type") === "view")
      .groupBy(col("user_id"), col("ts"))
      .agg(max(col("value")).as("view_value"))
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"), col("value"))
    val tsType = events.schema("ts").dataType
    val taggedR = views.select(col("user_id"), col("ts"), lit(0).as("side"),
      lit(null).cast("long").as("event_id"),
      lit(null).cast("double").as("value"),
      struct(col("ts").as("r_ts"), col("view_value")).as("m"))
    val taggedL = purchases.select(col("user_id"), col("ts"),
      lit(1).as("side"), col("event_id"), col("value"),
      lit(null).cast(s"struct<r_ts:${tsType.sql},view_value:double>").as("m"))
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // Output timestamps are floored to µs: DuckDB materializes
    // TIMESTAMP(NANOS) parquet at its native µs precision, so the
    // cross-engine contract for *emitted* times is µs. Matching itself
    // runs on full-ns values (events in the corpus are ≥ms apart, so a
    // sub-µs ordering flip cannot change which view wins).
    def us(c: org.apache.spark.sql.Column) = (c - pmod(c, lit(1000L)))
    taggedR.unionAll(taggedL)
      .withColumn("mm", last(col("m"), ignoreNulls = true).over(w))
      .filter(col("side") === 1)
      .select(col("event_id"), col("user_id"), us(col("ts")).as("ts"),
        col("value"), us(col("mm.r_ts")).as("view_ts"),
        col("mm.view_value").as("view_value"))
      .orderBy(col("event_id"))
  }

  /** Range join via time-bucketed equi-join — the scale-correct form of
    * `r.ts BETWEEN l.ts - W AND l.ts` (a raw theta-join plans as a
    * nested loop; at 100 TB that is all-pairs per user). Each error
    * event is joined to the same user's clicks in the preceding
    * `windowNs`. Both sides bucket ts into W-sized bins; a click within
    * the window is always in the error's bin or the one before, so the
    * candidate join is an equi-join on (user, bin) with each error
    * probing exactly two bins, then the exact range predicate filters
    * residuals. Timestamps are µs-floored on both engines before
    * comparing (DuckDB materializes TIMESTAMP(NANOS) at µs), so window
    * membership is bit-identical cross-engine. */
  def rangeJoinClicksBeforeErrors(events: DataFrame,
      windowNs: Long = 3600L * 1000000000L): DataFrame = {
    def us(c: org.apache.spark.sql.Column) = c - pmod(c, lit(1000L))
    val errs = events.filter(col("event_type") === "error")
      .select(col("event_id").as("err_id"), col("user_id"),
        us(col("ts")).as("err_ts"))
    val clicks = events.filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id"),
        us(col("ts")).as("click_ts"))
    val probes = errs
      .withColumn("bin0", expr(s"err_ts div $windowNs"))
      .withColumn("bin", explode(array(col("bin0"), col("bin0") - 1)))
    val binned = clicks.withColumn("bin", expr(s"click_ts div $windowNs"))
    probes.join(binned, Seq("user_id", "bin"))
      .filter(col("click_ts") <= col("err_ts") &&
        col("click_ts") >= col("err_ts") - lit(windowNs))
      .select(col("err_id"), col("click_id"),
        (col("err_ts") - col("click_ts")).as("lag_ns"))
      .orderBy(col("err_id"), col("click_id"))
  }

  /** Stream-stream interval join — the streaming twin of
    * [[rangeJoinClicksBeforeErrors]]: each error event joins the same
    * user's click events in the preceding `window` (inclusive bounds,
    * matching the batch twin). Both sides carry watermarks and the join
    * condition bounds the event-time distance, so Spark derives a state
    * retention horizon for BOTH buffers — rows are evicted as the
    * watermark advances, the canonical bounded-state stream-stream
    * join (state is O(events inside the watermark+window horizon),
    * independent of stream length). `ts` must be the TimestampType
    * event-time column of a `readStream` DataFrame. */
  def rangeJoinStream(events: DataFrame, window: String = "1 hour",
      watermarkDelay: String = "1 hour"): DataFrame = {
    val clicks = events.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("ts").as("click_ts"),
        col("event_id").as("click_id"))
      .withWatermark("click_ts", watermarkDelay)
    val errs = events.filter(col("event_type") === "error")
      .select(col("user_id").as("e_user"), col("ts").as("err_ts"),
        col("event_id").as("err_id"))
      .withWatermark("err_ts", watermarkDelay)
    errs.join(clicks,
        col("e_user") === col("c_user") &&
          col("click_ts") <= col("err_ts") &&
          col("click_ts") >= col("err_ts") - expr(s"INTERVAL $window"))
      .select(col("err_id"), col("click_id"), col("e_user").as("user_id"),
        col("click_ts"), col("err_ts"))
  }

  /** JSON-metadata extraction over the `props` column (training
    * pipelines routinely carry JSON sidecar metadata): per event type,
    * count and sum of the extracted integer field. Exact-integer
    * oracle. */
  def propsJsonStats(events: DataFrame): DataFrame =
    events.select(col("event_type"),
        get_json_object(col("props"), "$.k").cast("long").as("k"))
      .groupBy(col("event_type"))
      .agg(count(col("k")).as("n_with_k"), sum(col("k")).as("k_total"))
      .orderBy(col("event_type"))

  /** Hierarchical totals via ROLLUP (event_type -> grand total): the
    * grouping-sets surface the reference lacks entirely. Exact-integer
    * cents. */
  /** Per-user ACTIVE time: the length of the union of `[t, t+window)`
    * intervals over the user's events — "how long was this user
    * actually doing something", the engagement metric sessionization's
    * per-session durations don't directly give (overlapping activity
    * windows must not double-count). Classic sweep without an interval
    * tree: sorted by time, each event contributes
    * `min(gap_to_next, window)`, the last contributes `window` — pure
    * integer nanos end to end, so the result is exact on any engine.
    *
    * Scale shape: one user-keyed shuffle + per-user time sort (the
    * lead window), one hash aggregation. Same profile as every
    * per-user window here. */
  def activeTime(events: DataFrame,
      windowNs: Long = 30L * 60 * 1000000000L): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    events.select(col("user_id"), col("ts"), col("event_id"))
      .withColumn("contrib",
        least(lit(windowNs), coalesce(lead(col("ts"), 1).over(w) - col("ts"),
          lit(windowNs))))
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("contrib")).as("active_ns"))
      .orderBy(col("user_id"))
  }

  /** Per-type exponentially time-decayed event count
    * `Σ exp(−λ·age_seconds)` with age measured from the corpus's max
    * timestamp (a deterministic "now" — the operator form a monitoring
    * pipeline evaluates at watermark time). Each row's decay factor is
    * rounded to integer micro-units BEFORE the sum, so the cross-row
    * aggregation is an exact long sum (order-independent) and the
    * APPROXIMATE decayed count is oracle-gateable like the sketch
    * family. λ defaults to 1/hour.
    *
    * Scale shape: one 1-row max-ts aggregate broadcast back to the
    * scan, then one hash aggregation keyed by event_type. */
  def decayedCounts(events: DataFrame,
      lambdaPerSec: Double = 1.0 / 3600): DataFrame = {
    val mx = events.agg(max(col("ts")).as("t_max"))
    events.select(col("event_type"), col("ts"))
      .crossJoin(broadcast(mx))
      .select(col("event_type"),
        round(exp(lit(-lambdaPerSec) *
            ((col("t_max") - col("ts")).cast("double") / lit(1e9))) *
          lit(1e6)).cast("long").as("d_micro"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        round(sum(col("d_micro")).cast("double") / lit(1e6), 6)
          .as("decayed_count"))
      .orderBy(col("event_type"))
  }

  def typeRollup(events: DataFrame): DataFrame =
    events.rollup(col("event_type"))
      .agg(count(lit(1)).as("n"),
        round(sum(col("value")) * lit(100.0)).cast("long").as("cents"))
      .orderBy(col("event_type").asc_nulls_first)

  /** Per-user running total over time (cumulative window) in exact
    * integer cents; ns timestamps ordered as integers with event_id
    * tiebreak. Restricted to user_id < 20 to keep the gate output
    * bounded while still exercising the unbounded-preceding frame. */
  def runningTotals(events: DataFrame, maxUser: Long = 20): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    events.filter(col("user_id") < maxUser)
      .select(col("user_id"), col("event_id"),
        round(sum(col("value")).over(w) * lit(100.0)).cast("long")
          .as("running_cents"))
      .orderBy(col("user_id"), col("event_id"))
  }

  final case class VEv(user_id: Long, ts: Long, event_id: Long,
    value: Double)
  final case class Running(user_id: Long, event_id: Long,
    running_cents: Long)

  /** STREAMING running totals — the explicit-state twin of
    * [[runningTotals]]: one accumulator double per user, each event
    * emitted immediately with its running value in cents. Within a
    * batch the fold visits a user's events in `(ts, event_id)` order —
    * the left-to-right association the batch window's
    * unbounded-preceding frame uses — and the per-event rounding
    * replicates Spark's `round` (`BigDecimal.valueOf`, HALF_UP), so on
    * an in-order drain (the AvailableNow gate: one file, one batch)
    * the emitted rows are BIT-IDENTICAL to the batch twin and the
    * `events_running_totals` oracle passes unchanged.
    *
    * CROSS-BATCH state is one double per active user; WITHIN a batch
    * the group's events are buffered and sorted to fold in event-time
    * order (the same per-batch buffering [[sessionizeStream]] does),
    * so per-task memory is bounded by the hottest user's events per
    * MICROBATCH — size microbatches via admission control
    * (`maxFilesPerTrigger`/`maxBytesPerTrigger`) when one user can
    * dominate a batch. No watermark is involved because nothing is
    * ever flushed-by-time (every event produces output at arrival).
    * At scale, cross-batch DISORDER is the caveat: an event arriving
    * after a later-ts event was already folded gets the accumulator
    * as-of arrival, the standard eventual-consistency trade of
    * per-event emission; deployments needing strict event-time order
    * buffer behind a watermark first. */
  def runningTotalsStream(spark: SparkSession, events: DataFrame,
      maxUser: Long = 20): Dataset[Running] = {
    import spark.implicits._
    def fold(user: Long, evs: Iterator[VEv],
        state: GroupState[Double]): Iterator[Running] = {
      var acc = state.getOption.getOrElse(0.0)
      val out = evs.toSeq.sortBy(e => (e.ts, e.event_id)).map { e =>
        acc += e.value
        Running(user, e.event_id,
          java.math.BigDecimal.valueOf(acc * 100.0)
            .setScale(0, java.math.RoundingMode.HALF_UP).longValue())
      }
      state.update(acc)
      out.iterator
    }
    events.filter(col("user_id") < maxUser)
      .select(col("user_id"), col("ts"), col("event_id"), col("value"))
      .as[VEv]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.NoTimeout)(fold)
  }

  /** Exact continuous percentiles (p50/p90/p99) of event value per
    * event type. Computed over exact integer cents so both engines
    * interpolate between identical integers (the only floats in play
    * are the interpolation weights), then rounded.
    *
    * Computed from the per-type cents HISTOGRAM
    * ([[graft.pipelines.Quantiles.contFromHistogram]]) — Spark's exact
    * `percentile` aggregate buffers a group's whole value multiset in
    * one task, which a hot event type at 100 TB turns into an OOM; the
    * histogram path's state is bounded by the cents DOMAIN per type.
    * Bit-identical results (same interpolation arithmetic — the
    * quantile_cont oracle passes unchanged). */
  def typePercentiles(events: DataFrame): DataFrame = {
    val cents = round(col("value") * lit(100.0)).cast("long")
    val p = graft.pipelines.Quantiles.contFromHistogram(
      events.select(col("event_type"), cents.as("c")),
      Seq("event_type"), col("c"), Seq(0.5, 0.9, 0.99))
    p.groupBy(col("event_type"))
      .agg(max(col("n")).as("n"),
        round(max(when(col("q") === 0.5, col("p"))), 6).as("p50"),
        round(max(when(col("q") === 0.9, col("p"))), 6).as("p90"),
        round(max(when(col("q") === 0.99, col("p"))), 6).as("p99"))
      .orderBy(col("event_type"))
  }

  /** Streaming exact dedup: drop duplicate (user_id, event_type) pairs
    * arriving within the watermark horizon of the first occurrence — the
    * streaming flavor of exact dedup. `dropDuplicatesWithinWatermark`
    * (not plain `dropDuplicates`): with dedup keys that exclude the
    * event-time column, plain streaming dropDuplicates never evicts its
    * key state (the watermark only bounds state when the event-time
    * column is part of the subset), so on an unbounded stream the seen-set
    * grows forever. The WithinWatermark variant expires each key once the
    * watermark passes its first-seen event time + delay, keeping state
    * O(keys active inside the horizon) — the 100 TB/continuous-ingest
    * posture. `ts` must be the TimestampType event-time column of a
    * `readStream` DataFrame. */
  def streamingDedup(events: DataFrame,
      watermarkDelay: String = "1 hour"): DataFrame =
    events.withWatermark("ts", watermarkDelay)
      .dropDuplicatesWithinWatermark("user_id", "event_type")

  /** Top-3 users per event type by total value, ranked on exact integer
    * cents (cross-engine-stable ordering; values have 2 decimals, so
    * cent totals are exact integers). */
  def topUsers(events: DataFrame, k: Int = 3): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val s = events.groupBy(col("event_type"), col("user_id"))
      .agg(round(sum(col("value")) * lit(100.0)).cast("long").as("cents"))
    val w = Window.partitionBy(col("event_type"))
      .orderBy(col("cents").desc, col("user_id"))
    s.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select(col("event_type"), col("user_id"), col("cents"), col("rn"))
      .orderBy(col("event_type"), col("rn"))
  }
}
