package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types._

/** Structured Streaming surface over the `events` table (SURVEY.md
  * §2.8 + north-star): the reference's ingest is a bounded push stream
  * with a barrier; the real streaming capabilities added here are
  * watermarked window aggregation and stateful sessionization.
  *
  * The transformations are shared with the batch forms in
  * [[graft.operators.EventQueries]] — same windows, same session-gap
  * rule — so the DuckDB-checked batch results also pin the streaming
  * semantics (verified by the streaming specs running both and
  * comparing).
  */
object EventStreams {

  /** Physical schema of the events fixture at `path`, probed with a
    * batch read so the streaming source (which requires an explicit
    * schema) adapts to whichever `ts` encoding the fixture shipped —
    * legacy TIMESTAMP(NANOS)-as-long or native TIMESTAMP(MICROS). See
    * [[graft.sources.Tables.normalizeEventTs]]. */
  def probeSchema(s: SparkSession, path: String): StructType = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    s.read.parquet(path).schema
  }

  /** File-source stream over a directory of event parquet parts (one
    * file per micro-batch locally; a directory listing feed at scale),
    * normalized to a session-local `ts` regardless of fixture encoding. */
  def readSplitStream(s: SparkSession, dir: String): DataFrame =
    graft.sources.Tables.normalizeEventTs(
      s.readStream
        .schema(probeSchema(s, dir))
        .option("maxFilesPerTrigger", "1")
        .parquet(dir))

  /** File-source stream of the events table itself. */
  def readEventStream(s: SparkSession, dir: String): DataFrame =
    graft.sources.Tables.normalizeEventTs(
      s.readStream
        .schema(probeSchema(s, s"$dir/events.parquet"))
        .option("pathGlobFilter", "events.parquet")
        .option("maxFilesPerTrigger", "1")
        .parquet(dir))

  /** Watermarked tumbling-window aggregate — the streaming form of
    * q_hourly_events. Late events beyond 10 minutes are dropped;
    * state is bounded by (watermark horizon × types). */
  def hourlyCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), round(sum("value"), 2).as("total_value"))
      .select(
        date_format(col("w.start"), "yyyy-MM-dd HH:mm:ss").as("hour_start"),
        col("event_type"), col("n_events"), col("total_value"))

  /** Sliding-window twin of the batch q_sliding_window: 1-hour windows
    * every 15 minutes under the same watermark rule as [[hourlyCounts]]
    * (each event feeds 4 open windows; state is bounded by watermark ×
    * windows-per-event × types). */
  def slidingCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour", "15 minutes").as("w"),
        col("event_type"))
      .agg(count(lit(1)).as("n_events"))
      .select(
        date_format(col("w.start"), "yyyy-MM-dd HH:mm:ss").as("win_start"),
        col("event_type"), col("n_events"))

  /** Streaming dedup: drop repeated event_ids arriving within the
    * watermark horizon (exactly-once-per-key downstream semantics over
    * an at-least-once transport). State is bounded by the watermark —
    * the 100 TB-stream-safe form of exact dedup. */
  def dedupWithinWatermark(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .dropDuplicatesWithinWatermark("event_id")

  /** Stream-stream interval join: purchases within 30 minutes after a
    * click by the same user. Both sides carry watermarks, so the
    * symmetric hash-join state is bounded: a buffered click can be
    * dropped once the watermark passes click_ts + 30 min (no purchase
    * can legally match it any more), and vice versa — the condition's
    * time bounds are what let Spark derive the state TTL. Inner join ⇒
    * rows emit as soon as both sides arrive (the watermark only
    * governs state cleanup and late-data drop). Batch twin:
    * [[graft.operators.EventQueries]]'s q_click_purchase_join
    * (DuckDB-oracle-checked). */
  def clickPurchaseJoin(events: DataFrame): DataFrame = {
    val clicks = events.filter(col("event_type") === "click")
      .select(col("user_id"), col("event_id").as("click_id"),
        col("ts").as("click_ts"))
      .withWatermark("click_ts", "1 hour")
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("event_id").as("purchase_id"),
        col("ts").as("purchase_ts"), col("value"))
      .withWatermark("purchase_ts", "1 hour")
    clicks.join(purchases,
        col("user_id") === col("p_user") &&
        col("purchase_ts") >= col("click_ts") &&
        col("purchase_ts") <= col("click_ts") + expr("INTERVAL 30 MINUTES"))
      .select(col("user_id"), col("click_id"), col("purchase_id"),
        round(col("value"), 2).as("purchase_value"))
  }

  /** Stream-stream LEFT OUTER interval join (round-13 verdict item 5)
    * — the eviction-emits-null semantics people actually get wrong:
    * matched (click, purchase) pairs emit as soon as both sides
    * arrive, exactly like [[clickPurchaseJoin]]; an UNMATCHED click
    * emits exactly once, with null purchase columns, only when the
    * watermark passes `click_ts + 30 min + 1 h` — the first moment
    * Spark can PROVE no matching purchase can still arrive (earlier
    * emission would be wrong: a purchase inside the window may still
    * be in flight; never emitting would silently drop the
    * no-conversion rows a funnel report needs). The same watermarks
    * that bound the symmetric hash-join state are what schedule the
    * null emission, so a stream that stops feeding data never
    * releases its tail clicks — the spec's flush sentinel exists for
    * exactly that reason, and a deployment's steady arrival stream
    * plays that role in production. Batch twin:
    * `q_click_purchase_outer` (DuckDB-oracle-checked); stream ≡ batch
    * parity + mid-run restart pinned in `StreamingSpec`. */
  def clickPurchaseLeftOuter(events: DataFrame): DataFrame = {
    val clicks = events.filter(col("event_type") === "click")
      .select(col("user_id"), col("event_id").as("click_id"),
        col("ts").as("click_ts"))
      .withWatermark("click_ts", "1 hour")
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("event_id").as("purchase_id"),
        col("ts").as("purchase_ts"), col("value"))
      .withWatermark("purchase_ts", "1 hour")
    clicks.join(purchases,
        col("user_id") === col("p_user") &&
        col("purchase_ts") >= col("click_ts") &&
        col("purchase_ts") <= col("click_ts") + expr("INTERVAL 30 MINUTES"),
        "left_outer")
      .select(col("user_id"), col("click_id"), col("purchase_id"),
        round(col("value"), 2).as("purchase_value"))
  }

  /** Streaming-ETL sink: append each micro-batch into a
    * date-partitioned parquet table (the standard landing-zone shape —
    * readers prune on the partition column; see
    * [[graft.sources.ImdbTsv.snapshotPartitioned]] for the batch
    * form). Uses Spark's NATIVE file sink — each batch commits to the
    * `_spark_metadata` manifest atomically, so a micro-batch replayed
    * after a crash mid-write is not double-counted by readers. (An
    * earlier foreachBatch + blind-append form was only at-least-once
    * on that crash path: the re-run batch landed twice with nothing
    * skipping the duplicate.) */
  def writePartitionedStream(events: DataFrame, path: String,
      checkpoint: String): org.apache.spark.sql.streaming.StreamingQuery =
    events
      .withColumn("day", to_date(col("ts")))
      .writeStream
      .format("parquet")
      .option("path", path)
      .option("checkpointLocation", checkpoint)
      .partitionBy("day")
      .outputMode("append")
      .start()

  final case class Ev(user_id: Long, tsUs: Long, value: Double)
  final case class SessionState(
      sid: Long, startUs: Long, lastUs: Long, n: Long, value: Double)
  final case class Session(
      user_id: Long, sid: Long, n_events: Long,
      session_start: Long, session_end: Long, session_value: Double)

  val gapUs: Long = 1800L * 1000000L  // 30-minute inactivity gap

  /** Shared fold of one group's arrivals into the session state: sort
    * by time, close a session at every >30-min gap, leave the open
    * session in `state`. Returns the CLOSED sessions. Both sessionize
    * variants run exactly this, so their gap semantics cannot drift.
    *
    * `timeSid`: sid = the session's start timestamp instead of a
    * per-user counter. The counter lives in the state entry, so any
    * variant that REMOVES state (the idle flush) would restart a
    * returning user at sid 0 and emit duplicate (user_id, sid) keys;
    * start-timestamp sids are unique for a user forever (sessions are
    * time-disjoint and a session's start is one of its event times)
    * without keeping anything after the flush. */
  private def foldSessions(user: Long, arrivals: Seq[(Long, Double)],
      state: GroupState[SessionState],
      timeSid: Boolean = false): Iterator[Session] = {
    val sorted = arrivals.sortBy(_._1)
    var cur = state.getOption.orNull
    val closed = Seq.newBuilder[Session]
    var nextSid = if (cur == null) 0L else cur.sid
    def sidFor(counter: Long, startUs: Long): Long =
      if (timeSid) startUs else counter
    sorted.foreach { case (tsUs, value) =>
      if (cur == null) {
        cur = SessionState(sidFor(nextSid, tsUs), tsUs, tsUs, 1L, value)
      } else if (tsUs - cur.lastUs > gapUs) {
        closed += Session(user, cur.sid, cur.n, cur.startUs, cur.lastUs, cur.value)
        nextSid = cur.sid + 1
        cur = SessionState(sidFor(nextSid, tsUs), tsUs, tsUs, 1L, value)
      } else {
        cur = cur.copy(lastUs = tsUs, n = cur.n + 1, value = cur.value + value)
      }
    }
    if (cur != null) state.update(cur)
    closed.result().iterator
  }

  /** Stateful sessionization via flatMapGroupsWithState: per user,
    * order the batch's events by time, close a session whenever the
    * gap exceeds 30 minutes, carry the open session in state. The
    * same gap rule as the batch q_sessionize.
    *
    * NoTimeout semantics, deliberately: a session only closes when a
    * LATER event of the same user proves the gap — right for bounded
    * replays where the stream ends and state is discarded. For a
    * forever stream this never emits an idle user's last session and
    * holds one state entry per user unboundedly — use
    * [[sessionizeIdleFlush]] there. */
  def sessionize(events: Dataset[Ev]): Dataset[Session] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, Session](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (user: Long, evs: Iterator[Ev], state: GroupState[SessionState]) =>
          foldSessions(user, evs.map(e => (e.tsUs, e.value)).toSeq, state)
      }
  }

  /** [[Ev]] plus the timestamp column the watermark rides on. */
  final case class EvT(user_id: Long, tsUs: Long, value: Double,
      ts: java.sql.Timestamp)

  /** [[sessionize]] with an event-time idle flush — the forever-stream
    * form: same 30-min gap rule (the shared [[foldSessions]]), plus an
    * `EventTimeTimeout` that EMITS a user's open session once the
    * WATERMARK has passed `last event + gap` — the gap has then
    * provably elapsed in event time (no on-time event can reopen it),
    * not merely in wall-clock. The timeout also removes the entry, so
    * state is bounded by users active within the watermark horizon
    * instead of one entry per user ever seen. Same operational class
    * as [[DedupStreams.bandVerdicts]]'s TTL, but watermark-driven:
    * emission is part of the result contract here, not just eviction.
    *
    * `watermarkDelay` (late-data allowance) must stay below the 30-min
    * gap: the flush timestamp `last + gap` is then always ahead of the
    * watermark when armed, and a flushed session can never be
    * contradicted by an admissible late event.
    *
    * `sid` here is the session's START TIMESTAMP (micros), not the
    * per-user counter [[sessionize]] uses: the flush REMOVES the state
    * entry that carries the counter, so a returning user would restart
    * at sid 0 and collide with their own earlier sessions; start-time
    * sids stay unique for the user's whole lifetime with zero retained
    * state. */
  def sessionizeIdleFlush(events: Dataset[Ev],
      watermarkDelay: String = "10 minutes"): Dataset[Session] = {
    import events.sparkSession.implicits._
    events
      .withColumn("ts", timestamp_micros(col("tsUs")))
      .withWatermark("ts", watermarkDelay)
      .as[EvT]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, Session](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (user: Long, evs: Iterator[EvT], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            // idle past the gap in event time: the open session IS the
            // final session — emit it and release the user's state
            val cur = state.get
            state.remove()
            Iterator.single(
              Session(user, cur.sid, cur.n, cur.startUs, cur.lastUs, cur.value))
          } else {
            val out = foldSessions(user,
              evs.map(e => (e.tsUs, e.value)).toSeq, state, timeSid = true)
            // (re)arm the flush for the open session; max() guards the
            // engine's timeout>watermark requirement against a
            // just-inside-the-delay late event
            state.getOption.foreach { cur =>
              state.setTimeoutTimestamp(math.max((cur.lastUs + gapUs) / 1000L,
                state.getCurrentWatermarkMs() + 1))
            }
            out
          }
      }
  }

  /** Typed event for the funnel state machine. */
  final case class FEv(user_id: Long, tsUs: Long, event_type: String)

  /** Per-user funnel progress: earliest view, earliest qualifying
    * click strictly after it, earliest qualifying purchase strictly
    * after that — `Long.MaxValue` = step not yet reached. `maxTs` is
    * the largest RELEVANT event time folded in earlier batches: the
    * in-order-replay contract says no later batch may deliver an
    * older relevant event, and checking against maxTs (not just the
    * locked steps) also catches disorder that would silently DROP a
    * transition — e.g. purchase@200 discarded in batch 1 because no
    * click existed yet, then click@150 arriving in batch 2. */
  final case class FunnelState(t1: Long, t2: Long, t3: Long,
      maxTs: Long = Long.MinValue)

  /** One step transition: `user_id` reached `step` at `tsUs`. */
  final case class FunnelHit(user_id: Long, step: Int, tsUs: Long)

  private val Unset = Long.MaxValue

  /** Streaming form of the batch q_funnel_steps (view → click →
    * purchase): a per-user state machine via flatMapGroupsWithState
    * that emits one [[FunnelHit]] the moment a user crosses each step.
    * State is THREE longs per user — bounded, no cross-batch event
    * retention — versus the batch form's three join passes. Counting
    * emitted hits per step reproduces the batch n_users exactly
    * (`StreamingSpec` pins parity), under the same arrival-order
    * contract as [[sessionize]]: WITHIN a batch arrival order is
    * irrelevant (the fold below takes per-step candidate minima — one
    * O(n) pass, no sort), but ACROSS batches events must replay in
    * event-time order, because each batch locks in its transitions.
    * Cross-batch disorder is DETECTED, not silently mis-counted
    * (round-9 ADVICE): with `failOnDisorder` (default) an
    * out-of-order arrival throws iff it COULD change the funnel — an
    * event that would have won a locked step's min, or any
    * older-than-history event whose step is still open (a companion
    * it needed may already be discarded). Provably-harmless disorder
    * (e.g. a click after the locked t2, which no ordering could
    * promote) passes through, so a long-running stream does not abort
    * on noise that cannot affect output. Switch to
    * [[funnelStreamWatermarked]] for sources with real bounded
    * disorder. Note: `maxTs` in [[FunnelState]] is new in round 10 —
    * restarting from a pre-round-10 checkpoint needs a fresh
    * checkpoint (state schema adds a column).
    * Per-batch memory: the fold buffers only the timestamps of
    * still-relevant event types for the user in THIS micro-batch
    * (cleared every batch; a hot user costs one Long per relevant
    * event per batch, never retained across batches). */
  def funnelStream(events: Dataset[FEv],
      failOnDisorder: Boolean = true): Dataset[FunnelHit] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[FunnelState, FunnelHit](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (user: Long, evs: Iterator[FEv], state: GroupState[FunnelState]) =>
          val st0 = state.getOption.getOrElse(FunnelState(Unset, Unset, Unset))
          // one pass: bucket candidate timestamps per still-open step.
          // Disorder check: an out-of-order arrival throws ONLY when it
          // could change the outcome — soundness without aborting a
          // stream on provably-harmless disorder. Per step (min-rule
          // analysis; each condition is exactly "this event could move
          // a locked time or resurrect a discarded transition"):
          //  - step LOCKED: harmful iff the event would have WON the
          //    min (view < t1; click in (t1, t2); purchase in
          //    (t2, t3)). An event at/after the locked time leaves
          //    every min unchanged — ignored, as an in-order replay
          //    would have ignored it.
          //  - step OPEN: harmful iff the event is older than any
          //    event a previous batch BUFFERED for a then-open step
          //    (maxTs) — an older companion (e.g. a purchase discarded
          //    while its click was missing) may already be gone, so
          //    the dropped transition cannot be reconstructed. Events
          //    IGNORED at a locked step never tighten the check: they
          //    are no-ops under every replay order (they lost a min
          //    that can no longer change), so e.g. a click older than
          //    an ignored later view must NOT abort the stream
          //    (round-10 ADVICE). The check is conservatively sound,
          //    not exact — a buffered-but-disqualified event (e.g. a
          //    purchase below a t2 locked in its own batch) still
          //    raises maxTs even though replaying it earlier changes
          //    nothing; false aborts err on the side of correctness.
          val views = scala.collection.mutable.ArrayBuffer.empty[Long]
          val clicks = scala.collection.mutable.ArrayBuffer.empty[Long]
          val purchases = scala.collection.mutable.ArrayBuffer.empty[Long]
          var batchMax = st0.maxTs
          def disorder(e: FEv): Nothing = throw new IllegalStateException(
            s"funnelStream: cross-batch disorder for user $user — " +
              s"${e.event_type} at ${e.tsUs} arrives out of order against " +
              s"state (t1=${st0.t1}, t2=${st0.t2}, t3=${st0.t3}, " +
              s"maxTs=${st0.maxTs}) and could change the funnel; use " +
              "funnelStreamWatermarked for this source")
          evs.foreach { e =>
            def buffer(buf: scala.collection.mutable.ArrayBuffer[Long]): Unit = {
              if (failOnDisorder && e.tsUs < st0.maxTs) disorder(e)
              if (e.tsUs > batchMax) batchMax = e.tsUs
              buf += e.tsUs
            }
            e.event_type match {
              case "view" =>
                if (st0.t1 == Unset) buffer(views)
                else if (failOnDisorder && e.tsUs < st0.t1) disorder(e)
              case "click" =>
                if (st0.t2 == Unset) buffer(clicks)
                else if (failOnDisorder &&
                    e.tsUs > st0.t1 && e.tsUs < st0.t2) disorder(e)
              case "purchase" =>
                if (st0.t3 == Unset) buffer(purchases)
                else if (failOnDisorder &&
                    e.tsUs > st0.t2 && e.tsUs < st0.t3) disorder(e)
              case _ => ()
            }
          }
          // min-based transitions — equivalent to replaying the batch
          // sorted: t1 = earliest view; t2 = earliest qualifying click
          // strictly after t1; t3 = earliest qualifying purchase after t2
          var st = st0
          val hits = Seq.newBuilder[FunnelHit]
          if (st.t1 == Unset && views.nonEmpty) {
            val m = views.min
            st = st.copy(t1 = m); hits += FunnelHit(user, 1, m)
          }
          if (st.t1 != Unset && st.t2 == Unset) {
            val q = clicks.filter(_ > st.t1)
            if (q.nonEmpty) {
              val m = q.min
              st = st.copy(t2 = m); hits += FunnelHit(user, 2, m)
            }
          }
          if (st.t2 != Unset && st.t3 == Unset) {
            val q = purchases.filter(_ > st.t2)
            if (q.nonEmpty) {
              val m = q.min
              st = st.copy(t3 = m); hits += FunnelHit(user, 3, m)
            }
          }
          state.update(st.copy(maxTs = batchMax))
          hits.result().iterator
      }
  }

  /** One event buffered inside [[WFunnelState]] until the watermark
    * finalizes it. */
  final case class PendEv(tsUs: Long, event_type: String)

  /** Watermark-bounded funnel state: locked steps + the events still
    * inside the disorder window. Bounded by the watermark delay per
    * user, not by the stream. */
  final case class WFunnelState(t1: Long, t2: Long, t3: Long,
      pending: Seq[PendEv])

  /** Watermark-bounded funnel — the cross-batch-disorder-tolerant
    * form of [[funnelStream]] (round-9 verdict item 3 / ADVICE):
    * events buffer in state until the event-time watermark passes
    * them, then fold through the strict state machine in event-time
    * order. Semantics pinned by `WatermarkGateSpec`:
    *  - events arriving out of order WITHIN the watermark delay land
    *    in their correct event-time position (identical hits to the
    *    batch funnel over the same events);
    *  - an event later than the watermark allows is DROPPED by the
    *    engine before the state function runs (never mis-ordered
    *    into a locked step) — the emitted hits equal the batch funnel
    *    over the ON-TIME subset;
    *  - emission lags by the watermark delay (a hit is emitted when
    *    the watermark passes its step's event, i.e. once it can no
    *    longer be contradicted).
    * State cost: locked steps (3 longs) + the pending buffer, whose
    * size is bounded by the user's event rate × the watermark delay —
    * the price of tolerating disorder; completed funnels clear their
    * buffer and stop timing out. */
  def funnelStreamWatermarked(events: Dataset[FEv],
      delay: String = "10 seconds"): Dataset[FunnelHit] = {
    import events.sparkSession.implicits._
    events
      .withColumn("ts", timestamp_micros(col("tsUs")))
      .withWatermark("ts", delay)
      .as[FEv]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[WFunnelState, FunnelHit](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (user: Long, evs: Iterator[FEv], state: GroupState[WFunnelState]) =>
          val st0 = state.getOption.getOrElse(
            WFunnelState(Unset, Unset, Unset, Nil))
          val wmUs = state.getCurrentWatermarkMs() * 1000L
          val all = st0.pending ++
            evs.map(e => PendEv(e.tsUs, e.event_type))
          // finalize: everything strictly below the watermark can no
          // longer be contradicted — fold it in event-time order
          val (ripe, rest) = all.partition(_.tsUs < wmUs)
          var (t1, t2, t3) = (st0.t1, st0.t2, st0.t3)
          val hits = Seq.newBuilder[FunnelHit]
          ripe.sortBy(_.tsUs).foreach { e =>
            e.event_type match {
              case "view" if t1 == Unset =>
                t1 = e.tsUs; hits += FunnelHit(user, 1, e.tsUs)
              case "click" if t1 != Unset && t2 == Unset && e.tsUs > t1 =>
                t2 = e.tsUs; hits += FunnelHit(user, 2, e.tsUs)
              case "purchase" if t2 != Unset && t3 == Unset && e.tsUs > t2 =>
                t3 = e.tsUs; hits += FunnelHit(user, 3, e.tsUs)
              case _ => ()
            }
          }
          // a completed funnel needs no buffer; otherwise keep the
          // not-yet-final events and wake when the watermark passes
          // the oldest one
          val keep = if (t3 != Unset) Nil else rest
          state.update(WFunnelState(t1, t2, t3, keep))
          if (keep.nonEmpty)
            state.setTimeoutTimestamp(math.max(
              keep.map(_.tsUs).min / 1000L + 1,
              state.getCurrentWatermarkMs() + 1))
          hits.result().iterator
      }
  }

  /** One closed hour's count for one series — [[anomalyStream]]'s
    * input (produced upstream by a watermarked hourly window
    * aggregation; pre-aggregated so THIS operator's state is exactly
    * the moment fold, not an event buffer). */
  final case class HourCount(event_type: String, hourUs: Long, cnt: Long)
  final case class MomState(n: Long, s: Long, ss: Long, maxUs: Long)
  final case class AnomalyHit(event_type: String, hourUs: Long, cnt: Long,
      side: String)

  /** Streaming prequential anomaly detection — the stateful twin of
    * the batch `q_anomaly_prequential` row: per event type, each
    * arriving closed hour is tested against the moments of the hours
    * already folded (exact-integer 2σ: (n·cnt−S)² > 4(n·SS−S²), n ≥
    * `warmup`), THEN folded in. State is four longs per key — (n, S,
    * SS, last hour) — bounded forever, versus the batch form's full
    * history window; this is the monitor a 100 TB event stream runs,
    * with per-key state the size of a cache line. The fold is
    * order-sensitive (a verdict must never use the future), so within
    * a batch hours are processed in event-time order and a
    * cross-batch regression (an hour at or before the last folded
    * one) throws rather than silently contaminating the moments —
    * the upstream windowed aggregation emits closed windows in
    * watermark order, so in the intended composition the check never
    * fires. `StreamingSpec` pins stream ≡ batch on the fixture.
    *
    * Overflow horizon: the moments grow forever (n per hour, S with
    * Σcnt, SS with Σcnt²), and the verdict terms n·SS and S² grow as
    * n²·cnt² — at cnt ~ 10⁶/hour they cross 2⁶³ after n ≈ 3·10³
    * hours (~4 months). Unlike the batch twin (which runs under
    * Spark ANSI and sizes its history in the scaladoc), plain JVM
    * Long math wraps SILENTLY, flipping verdicts in exactly the
    * long-horizon monitor this operator advertises — so every
    * multiply/add below is `Math.multiplyExact`/`addExact`, making
    * the horizon a loud ArithmeticException (the same fail-loud
    * contract as the event-time-regression throw). Past the horizon
    * the operational fix is a baseline reset or exponentially
    * decayed moments, not bigger integers. */
  def anomalyStream(counts: Dataset[HourCount],
      warmup: Long = 8): Dataset[AnomalyHit] = {
    import counts.sparkSession.implicits._
    import java.lang.Math.{addExact, multiplyExact, subtractExact}
    counts
      .groupByKey(_.event_type)
      .flatMapGroupsWithState[MomState, AnomalyHit](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (et: String, rows: Iterator[HourCount], state: GroupState[MomState]) =>
          var st = state.getOption.getOrElse(MomState(0L, 0L, 0L, Long.MinValue))
          val out = Seq.newBuilder[AnomalyHit]
          rows.toSeq.sortBy(_.hourUs).foreach { r =>
            if (r.hourUs <= st.maxUs)
              throw new IllegalStateException(
                s"anomalyStream($et): hour ${r.hourUs} arrived at/before " +
                s"already-folded ${st.maxUs} — prequential moments would " +
                "use the future; replay closed windows in event-time order")
            if (st.n >= warmup) {
              val dev = subtractExact(multiplyExact(st.n, r.cnt), st.s)
              val lhs = multiplyExact(dev, dev)
              val rhs = multiplyExact(4L,
                subtractExact(multiplyExact(st.n, st.ss),
                  multiplyExact(st.s, st.s)))
              if (lhs > rhs)
                out += AnomalyHit(et, r.hourUs, r.cnt,
                  if (dev > 0) "high" else "low")
            }
            st = MomState(addExact(st.n, 1L), addExact(st.s, r.cnt),
              addExact(st.ss, multiplyExact(r.cnt, r.cnt)), r.hourUs)
          }
          state.update(st)
          out.result().iterator
      }
  }

  /** One raw event for [[hourlyAnomalyChain]] (µs event time). */
  final case class RawEv(event_type: String, tsUs: Long)
  /** [[hourlyAnomalyChain]] state: the OPEN (not yet watermark-closed)
    * hour counts plus the prequential moments of the closed prefix —
    * bounded by the watermark horizon (open hours ≤ delay/1h + 1) plus
    * four longs, per key. */
  final case class ChainState(open: Map[Long, Long], mom: MomState)

  /** The COMPOSED monitor (round-11 verdict item 5): raw events →
    * watermarked event-time hourly aggregation → closed windows in
    * watermark order → prequential anomaly verdicts — as ONE
    * restartable stateful query, instead of [[anomalyStream]]'s
    * pre-closed-window input contract. One `flatMapGroupsWithState`
    * with an EVENT-TIME timeout carries both stages per event type:
    * arriving events bump their open hour's count; whenever the
    * watermark passes an open hour's end (on data or on timeout), that
    * hour CLOSES — in ascending event-time order, so the ordering
    * contract [[anomalyStream]] makes its caller promise holds here by
    * construction — is tested against the moments of the hours before
    * it (same exact-integer 2σ algebra, same overflow-exact math), and
    * folds in. Events for an already-closed hour (late beyond the
    * watermark) are dropped, exactly what the windowed aggregation
    * this fuses would have done. Why fused rather than agg →
    * flatMapGroupsWithState chained: Spark does not allow arbitrary
    * stateful ops downstream of a streaming aggregation in append
    * mode — and the fused form is one state store, one shuffle on the
    * key, per-key state = open hours (≤ watermark horizon) + 4 longs.
    * Parity: over an event-time-ordered replay with a final flush
    * sentinel, emitted hits ≡ the batch `q_anomaly_prequential` row —
    * `q_anomaly_chain` hash-checks it against that oracle and
    * `StreamingSpec` pins it across a mid-run stop/restart. */
  def hourlyAnomalyChain(events: DataFrame, delay: String = "1 second",
      warmup: Long = 8): Dataset[AnomalyHit] = {
    import events.sparkSession.implicits._
    import java.lang.Math.{addExact, multiplyExact, subtractExact}
    val HourUs = 3600L * 1000000L
    events
      .select(col("event_type"), col("ts"))
      .withWatermark("ts", delay)
      // keep the watermarked `ts` attribute in the plan (projecting it
      // away would strip the event-time watermark the timeout needs);
      // the encoder binds RawEv's fields by name and ignores it
      .withColumn("tsUs", unix_micros(col("ts")))
      .as[RawEv]
      .groupByKey(_.event_type)
      .flatMapGroupsWithState[ChainState, AnomalyHit](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (et: String, rows: Iterator[RawEv], state: GroupState[ChainState]) =>
          var st = state.getOption.getOrElse(
            ChainState(Map.empty, MomState(0L, 0L, 0L, Long.MinValue)))
          var open = st.open
          val wmUs = state.getCurrentWatermarkMs() * 1000L
          rows.foreach { r =>
            val h = r.tsUs - java.lang.Math.floorMod(r.tsUs, HourUs)
            // late-data rule, BOTH halves of what the fused windowed
            // aggregation would do (round-12 advice): an hour at/before
            // the folded frontier is already closed, and an hour whose
            // END is at/behind the current watermark is already expired
            // even if never seen (a gap hour arriving late) — admitting
            // it would close it instantly on a partial count and
            // contaminate the moments with a window the aggregation
            // this fuses would have dropped. Drop both, never throw —
            // unlike anomalyStream, THIS operator owns window closing.
            if (h > st.mom.maxUs && h + HourUs > wmUs)
              open = open.updated(h, open.getOrElse(h, 0L) + 1L)
          }
          val out = Seq.newBuilder[AnomalyHit]
          var mom = st.mom
          open.keys.toSeq.sorted
            .takeWhile(h => h + HourUs <= wmUs)
            .foreach { h =>
              val cnt = open(h)
              if (mom.n >= warmup) {
                val dev = subtractExact(multiplyExact(mom.n, cnt), mom.s)
                val rhs = multiplyExact(4L,
                  subtractExact(multiplyExact(mom.n, mom.ss),
                    multiplyExact(mom.s, mom.s)))
                if (multiplyExact(dev, dev) > rhs)
                  out += AnomalyHit(et, h, cnt, if (dev > 0) "high" else "low")
              }
              mom = MomState(addExact(mom.n, 1L), addExact(mom.s, cnt),
                addExact(mom.ss, multiplyExact(cnt, cnt)), h)
              open -= h
            }
          state.update(ChainState(open, mom))
          if (open.nonEmpty)
            state.setTimeoutTimestamp(math.max(
              (open.keys.min + HourUs) / 1000L,
              state.getCurrentWatermarkMs() + 1L))
          out.result().iterator
      }
  }

  /** [[hourlyCusumChain]] state: open hour counts + the baseline
    * accumulators (first calendar week per key) + the CUSUM fold. */
  final case class CusumChainState(open: Map[Long, Long], h0: Long,
      n0: Long, s0: Long, p: Long, minP: Long, maxUs: Long)

  /** The composed CUSUM monitor — [[hourlyAnomalyChain]]'s fused
    * events → watermarked hourly windows → closed-in-order pattern
    * feeding the [[cusumStream]] fold, with the BASELINE learned
    * online: each key's first calendar week of closed hours (hour <
    * h0 + 168 h, exactly the batch `q_cusum_drift` baseline rule, so
    * gaps count as missing hours there too) accumulates (n₀, S₀) and
    * emits nothing; every later closed hour folds the 2n₀-scaled
    * deviation and emits (stat, drifted) — so a deployed monitor
    * needs NO pre-trained constants, just the stream. Ordering holds
    * by construction (hours close in watermark order); state is the
    * open-hours map (watermark-horizon-bounded) + six longs.
    * `q_cusum_chain` aggregates the emitted hits to the batch row's
    * per-type summary and hash-checks it against the SAME oracle. */
  def hourlyCusumChain(events: DataFrame, delay: String = "1 second",
      baselineUs: Long = 604800000000L,
      thresholdNum: Long = 8L): Dataset[CusumHit] = {
    import events.sparkSession.implicits._
    import java.lang.Math.{addExact, multiplyExact, subtractExact}
    val HourUs = 3600L * 1000000L
    events
      .select(col("event_type"), col("ts"))
      .withWatermark("ts", delay)
      // the watermarked `ts` attribute must stay in the plan (the
      // hourlyAnomalyChain lesson)
      .withColumn("tsUs", unix_micros(col("ts")))
      .as[RawEv]
      .groupByKey(_.event_type)
      .flatMapGroupsWithState[CusumChainState, CusumHit](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (et: String, rows: Iterator[RawEv], state: GroupState[CusumChainState]) =>
          var st = state.getOption.getOrElse(CusumChainState(
            Map.empty, Long.MinValue, 0L, 0L, 0L, 0L, Long.MinValue))
          var open = st.open
          val wmUs = state.getCurrentWatermarkMs() * 1000L
          rows.foreach { r =>
            val h = r.tsUs - java.lang.Math.floorMod(r.tsUs, HourUs)
            // same two-sided late rule as [[hourlyAnomalyChain]]: drop
            // hours behind the closed frontier AND hours already
            // expired per the watermark (never-seen gap hours included)
            if (h > st.maxUs && h + HourUs > wmUs)
              open = open.updated(h, open.getOrElse(h, 0L) + 1L)
          }
          val out = Seq.newBuilder[CusumHit]
          var (h0, n0, s0, p, minP) = (st.h0, st.n0, st.s0, st.p, st.minP)
          var maxUs = st.maxUs
          open.keys.toSeq.sorted
            .takeWhile(h => h + HourUs <= wmUs)
            .foreach { h =>
              val cnt = open(h)
              if (h0 == Long.MinValue) h0 = h
              if (h < h0 + baselineUs) {
                n0 = addExact(n0, 1L); s0 = addExact(s0, cnt)
              } else {
                val d = subtractExact(multiplyExact(2L, multiplyExact(n0, cnt)),
                  multiplyExact(3L, s0))
                p = addExact(p, d)
                minP = math.min(minP, p)
                val stat = subtractExact(p, math.min(0L, minP))
                out += CusumHit(et, h, stat,
                  stat > multiplyExact(thresholdNum, s0))
              }
              maxUs = h
              open -= h
            }
          state.update(CusumChainState(open, h0, n0, s0, p, minP, maxUs))
          if (open.nonEmpty)
            state.setTimeoutTimestamp(math.max(
              (open.keys.min + HourUs) / 1000L,
              state.getCurrentWatermarkMs() + 1L))
          out.result().iterator
      }
  }

  final case class CusumState(p: Long, minP: Long, maxUs: Long)
  final case class CusumHit(event_type: String, hourUs: Long,
      stat: Long, drifted: Boolean)

  /** Streaming CUSUM drift monitor — the stateful twin of the batch
    * `q_cusum_drift` row's window identity: per event type, THREE
    * longs of state (running deviation sum P, its running minimum,
    * and the last folded hour) reproduce S_t = P_t − min(0, min P_i)
    * incrementally — bounded state forever, one emit per closed hour
    * with the scaled statistic and the 8·S₀ threshold verdict. The
    * baseline (n₀, S₀) is the batch-trained constant a deployed
    * monitor ships with (passed in, not learned online — retraining
    * is a redeploy). Ordering contract identical to [[anomalyStream]]:
    * hours fold in event-time order within a batch; a cross-batch
    * regression throws (a CUSUM that folds the future before the past
    * reports wrong change points silently otherwise). */
  def cusumStream(counts: Dataset[HourCount], n0: Long, s0: Long,
      thresholdNum: Long = 8L): Dataset[CusumHit] = {
    import counts.sparkSession.implicits._
    counts
      .groupByKey(_.event_type)
      .flatMapGroupsWithState[CusumState, CusumHit](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (et: String, rows: Iterator[HourCount], state: GroupState[CusumState]) =>
          var st = state.getOption.getOrElse(
            CusumState(0L, 0L, Long.MinValue))
          val out = Seq.newBuilder[CusumHit]
          rows.toSeq.sortBy(_.hourUs).foreach { r =>
            if (r.hourUs <= st.maxUs)
              throw new IllegalStateException(
                s"cusumStream($et): hour ${r.hourUs} arrived at/before " +
                s"already-folded ${st.maxUs} — the statistic would fold " +
                "the future before the past; replay closed windows in " +
                "event-time order")
            val p = st.p + (2L * n0 * r.cnt - 3L * s0)
            val minP = math.min(st.minP, p)
            val stat = p - math.min(0L, minP)
            out += CusumHit(et, r.hourUs, stat, stat > thresholdNum * s0)
            st = CusumState(p, minP, r.hourUs)
          }
          state.update(st)
          out.result().iterator
      }
  }

  /** A click or purchase for [[attributionStream]] (µs event time;
    * cents only meaningful on purchases). */
  final case class TouchEv(user_id: Long, tsUs: Long, event_id: Long,
      event_type: String, cents: Long)
  final case class TouchState(lastClickUs: Long, maxUs: Long,
      maxId: Long)
  /** One purchase verdict: attributed iff a click by the same user
    * preceded it within the lookback. */
  final case class AttribVerdict(user_id: Long, tsUs: Long,
      attributed: Boolean, cents: Long)

  /** Streaming last-touch attribution — the stateful twin of the
    * batch `q_attribution` row: per user, ONE long of state (the last
    * click's event time) classifies every purchase the moment it
    * arrives, versus the batch form's full per-user window pass. This
    * is the live marketing monitor shape: bounded state per user
    * forever, verdicts final on emit.
    *
    * Ordering contract (same family as [[anomalyStream]]): a verdict
    * must never miss a click from its past, so within a batch events
    * fold in (tsUs, event_id) order — the batch rule's exact total
    * order — and a cross-batch regression (an event older than the
    * newest already-folded event) THROWS: the late arrival could be
    * the click that flips an already-emitted verdict. The upstream
    * watermarked sort (or a per-user FIFO source) satisfies the
    * contract; detection beats silent wrong credit. */
  def attributionStream(events: Dataset[TouchEv],
      lookbackUs: Long = 86400000000L): Dataset[AttribVerdict] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[TouchState, AttribVerdict](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (user: Long, evs: Iterator[TouchEv], state: GroupState[TouchState]) =>
          var st = state.getOption.getOrElse(
            TouchState(Long.MinValue, Long.MinValue, Long.MinValue))
          val out = Seq.newBuilder[AttribVerdict]
          evs.toSeq.sortBy(e => (e.tsUs, e.event_id)).foreach { e =>
            // disorder = older than the fold frontier in the batch
            // rule's TOTAL order (tsUs, event_id) — an equal-ts click
            // with a smaller id would still precede an already-folded
            // purchase, so ties check the id too
            if (e.tsUs < st.maxUs ||
                (e.tsUs == st.maxUs && e.event_id < st.maxId))
              throw new IllegalStateException(
                s"attributionStream($user): event (${e.tsUs}, ${e.event_id}) " +
                s"arrived after (${st.maxUs}, ${st.maxId}) was folded — an " +
                "emitted verdict may have missed this touch; replay " +
                "per-user events in event-time order")
            e.event_type match {
              case "click" =>
                st = TouchState(e.tsUs, e.tsUs, e.event_id)
              case "purchase" =>
                val attributed = st.lastClickUs != Long.MinValue &&
                  e.tsUs - st.lastClickUs <= lookbackUs
                out += AttribVerdict(user, e.tsUs, attributed, e.cents)
                st = st.copy(maxUs = e.tsUs, maxId = e.event_id)
              case other =>
                throw new IllegalArgumentException(
                  s"attributionStream: unexpected event_type '$other' — " +
                  "filter to click/purchase upstream")
            }
          }
          state.update(st)
          out.result().iterator
      }
  }
}
