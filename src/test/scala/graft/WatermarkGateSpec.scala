package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.streaming.EventStreams
import graft.streaming.EventStreams.FEv

/** The late-data/watermark gate the round-9 verdict asked for (item
  * 3): drives out-of-order events through the watermark-bounded
  * funnel and pins EXACTLY which rows are dropped vs emitted —
  *  - disorder WITHIN the watermark delay lands in correct event-time
  *    position (a click arriving after the purchase still slots
  *    between view and purchase);
  *  - an event OLDER than the watermark is dropped by the engine
  *    before the state function sees it (the locked steps can never
  *    be contradicted);
  *  - emission waits for the watermark to pass the event (a hit is
  *    final when emitted) — events still inside the window are
  *    buffered, not emitted;
  * plus the strict funnel's disorder DETECTION (round-9 ADVICE): the
  * cheap no-buffer form must fail loudly on cross-batch disorder, not
  * silently lock wrong step times. */
class WatermarkGateSpec extends SparkSpec {
  private val us = 1000000L

  private def hits(table: String): Set[(Long, Int, Long)] =
    spark.table(table).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet

  test("watermarked funnel: in-window disorder reorders, late data drops, " +
      "emission waits for the watermark") {
    import spark.implicits._
    val in = MemoryStream[FEv](spark)
    val q = EventStreams.funnelStreamWatermarked(in.toDS(), "10 seconds")
      .writeStream.format("memory").queryName("wm_funnel")
      .outputMode("append").start()
    try {
      // user 1: view@100 and purchase@105 arrive FIRST...
      in.addData(FEv(1L, 100 * us, "view"), FEv(1L, 105 * us, "purchase"))
      q.processAllAvailable()
      // ...the click@103 arrives a batch LATER but inside the 10 s
      // watermark window — it must still slot between view and purchase
      in.addData(FEv(1L, 103 * us, "click"))
      q.processAllAvailable()
      assert(hits("wm_funnel").isEmpty,
        "nothing may emit while the events sit inside the watermark window")
      // watermark ticks (user 9) push the watermark past user 1's events
      in.addData(FEv(9L, 200 * us, "view"))
      q.processAllAvailable()
      in.addData(FEv(9L, 210 * us, "view"))
      q.processAllAvailable()
      assert(hits("wm_funnel") ==
        Set((1L, 1, 100 * us), (1L, 2, 103 * us), (1L, 3, 105 * us)),
        s"user 1 must complete with the REORDERED click: ${hits("wm_funnel")}")
      // user 4: a view at 50 s is far older than the watermark (~200 s)
      // -> dropped by the engine; the on-time view at 300 s defines step 1
      in.addData(FEv(4L, 50 * us, "view"), FEv(4L, 300 * us, "view"))
      q.processAllAvailable()
      in.addData(FEv(9L, 400 * us, "view"))
      q.processAllAvailable()
      in.addData(FEv(9L, 410 * us, "view"))
      q.processAllAvailable()
    } finally q.stop()
    val got = hits("wm_funnel")
    assert(got((4L, 1, 300 * us)) && !got.exists(h => h._1 == 4L && h._3 == 50 * us),
      s"the late view@50 must be dropped, the on-time view@300 kept: $got")
    // user 9's first view finalizes once the watermark passes it; its
    // trailing ticks are still inside the window -> exactly one hit
    assert(got.filter(_._1 == 9L) == Set((9L, 1, 200 * us)), got.toString)
    assert(got.size == 5, s"no other emission allowed: $got")
  }

  test("strict funnel fails loudly on cross-batch disorder instead of " +
      "locking wrong step times") {
    import spark.implicits._
    val in = MemoryStream[FEv](spark)
    val q = EventStreams.funnelStream(in.toDS())
      .writeStream.format("memory").queryName("strict_funnel")
      .outputMode("append").start()
    val err =
      try {
        in.addData(FEv(1L, 100 * us, "view"), FEv(1L, 150 * us, "click"))
        q.processAllAvailable()
        // a view OLDER than the locked step-1 time arrives in a later
        // batch — the contract is violated and must not pass silently
        in.addData(FEv(1L, 90 * us, "view"))
        intercept[Exception] { q.processAllAvailable() }
      } finally q.stop()
    def causes(t: Throwable): Seq[Throwable] =
      Option(t).toSeq.flatMap(x => x +: causes(x.getCause))
    assert(causes(err).exists(c =>
      Option(c.getMessage).exists(_.contains("cross-batch disorder"))),
      s"want the disorder diagnostic in the failure chain, got: $err")
  }

  test("strict funnel detects disorder against UNLOCKED steps too " +
      "(the silently-dropped-transition case)") {
    import spark.implicits._
    val in = MemoryStream[FEv](spark)
    val q = EventStreams.funnelStream(in.toDS())
      .writeStream.format("memory").queryName("strict_funnel2")
      .outputMode("append").start()
    val err =
      try {
        // batch 1: the purchase is discarded (no click yet, step 2
        // open) — nothing is LOCKED beyond step 1
        in.addData(FEv(1L, 100 * us, "view"), FEv(1L, 200 * us, "purchase"))
        q.processAllAvailable()
        // batch 2: a click BEFORE the already-seen purchase — a
        // locked-step-only check would silently lock t2=150 and lose
        // step 3 forever (the purchase is gone); the maxTs contract
        // must fail loudly instead
        in.addData(FEv(1L, 150 * us, "click"))
        intercept[Exception] { q.processAllAvailable() }
      } finally q.stop()
    def causes(t: Throwable): Seq[Throwable] =
      Option(t).toSeq.flatMap(x => x +: causes(x.getCause))
    assert(causes(err).exists(c =>
      Option(c.getMessage).exists(_.contains("cross-batch disorder"))),
      s"want the disorder diagnostic in the failure chain, got: $err")
    // the watermarked form handles the same replay correctly
    val in2 = MemoryStream[FEv](spark)
    val q2 = EventStreams.funnelStreamWatermarked(in2.toDS(), "200 seconds")
      .writeStream.format("memory").queryName("wm_funnel2")
      .outputMode("append").start()
    try {
      in2.addData(FEv(1L, 100 * us, "view"), FEv(1L, 200 * us, "purchase"))
      q2.processAllAvailable()
      in2.addData(FEv(1L, 150 * us, "click"))
      q2.processAllAvailable()
      in2.addData(FEv(9L, 500 * us, "view"))
      q2.processAllAvailable()
      in2.addData(FEv(9L, 510 * us, "view"))
      q2.processAllAvailable()
    } finally q2.stop()
    assert(hits("wm_funnel2").filter(_._1 == 1L) ==
      Set((1L, 1, 100 * us), (1L, 2, 150 * us), (1L, 3, 200 * us)),
      s"watermarked replay must recover all three steps: ${hits("wm_funnel2")}")
  }

  test("watermarked funnel ≡ batch funnel over the on-time subset " +
      "(the q_funnel_watermarked rule, driven event-by-event)") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // The gate row q_funnel_watermarked classifies late events with the
    // continuous rule: arrival = ts + (event_id % 4)·5 min, late iff
    // ts < max(ts arrived before it) − 60 s. A one-event-per-micro-batch
    // stream enforces EXACTLY that rule (the engine watermark after
    // batch k is max event time of batches ≤ k minus the delay), so
    // driving the same events one per batch through
    // funnelStreamWatermarked must emit the batch funnel of the
    // survivors — the row's documented equivalence, pinned here.
    val arrived = graft.sources.Tables.events(spark, "/root/testdata/sf0.001")
      .select(col("user_id"), col("event_type"), col("event_id"),
        unix_micros(col("ts")).as("ts_us"),
        (unix_micros(col("ts")) + (col("event_id") % 4) * 300000000L)
          .as("arrival_us"))
      .orderBy("arrival_us", "event_id")
      .limit(40)
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(3)))
    // expected: continuous-watermark classification + event-time fold
    var runningMax = Long.MinValue
    val onTime = arrived.filter { case (_, _, ts) =>
      val ok = runningMax == Long.MinValue || ts >= runningMax - 60000000L
      if (ts > runningMax) runningMax = ts
      ok
    }
    assert(arrived.length - onTime.length >= 1,
      "fixture must actually contain late events")
    val expected = onTime.sortBy(_._3).groupBy(_._1).toSeq.flatMap {
      case (user, evs) =>
        val t1 = evs.collectFirst { case (_, "view", ts) => ts }
        val t2 = t1.flatMap(a => evs.collectFirst {
          case (_, "click", ts) if ts > a => ts })
        val t3 = t2.flatMap(b => evs.collectFirst {
          case (_, "purchase", ts) if ts > b => ts })
        t1.map(ts => (user, 1, ts)) ++ t2.map(ts => (user, 2, ts)) ++
          t3.map(ts => (user, 3, ts))
    }.toSet
    val in = MemoryStream[FEv](spark)
    val q = EventStreams.funnelStreamWatermarked(in.toDS(), "60 seconds")
      .writeStream.format("memory").queryName("wm_parity")
      .outputMode("append").start()
    try {
      arrived.foreach { case (user, et, ts) =>
        in.addData(FEv(user, ts, et))
        q.processAllAvailable()
      }
      // flush: push the watermark far past every buffered event
      val flushTs = arrived.map(_._3).max + 86400L * 1000000L
      in.addData(FEv(999999L, flushTs, "view"))
      q.processAllAvailable()
      in.addData(FEv(999999L, flushTs + 86400L * 1000000L, "view"))
      q.processAllAvailable()
    } finally q.stop()
    val got = hits("wm_parity").filter(_._1 != 999999L)
    assert(got == expected,
      s"stream-vs-batch divergence:\n  only-stream=${got -- expected}" +
        s"\n  only-batch=${expected -- got}")
  }

  test("strict funnel tolerates provably-harmless disorder (no step could change)") {
    import spark.implicits._
    val in = MemoryStream[FEv](spark)
    val q = EventStreams.funnelStream(in.toDS())
      .writeStream.format("memory").queryName("strict_funnel3")
      .outputMode("append").start()
    try {
      // lock all three steps in order
      in.addData(FEv(1L, 100 * us, "view"), FEv(1L, 200 * us, "click"),
        FEv(1L, 300 * us, "purchase"))
      q.processAllAvailable()
      // out-of-order arrivals that CANNOT change any min under any
      // replay order: a view after t1, a click after t2, a purchase
      // after t3 — a long-running stream must not abort on these
      in.addData(FEv(1L, 150 * us, "view"), FEv(1L, 250 * us, "click"),
        FEv(1L, 350 * us, "purchase"))
      q.processAllAvailable()
    } finally q.stop()
    assert(hits("strict_funnel3") ==
      Set((1L, 1, 100 * us), (1L, 2, 200 * us), (1L, 3, 300 * us)),
      s"harmless disorder must neither throw nor re-emit: ${hits("strict_funnel3")}")
  }
}
