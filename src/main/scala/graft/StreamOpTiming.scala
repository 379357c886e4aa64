package graft

/** Progress-based operator timing for gate-harness streaming rows
  * (round-12 verdict item 4).
  *
  * The chain rows (`q_anomaly_chain`, `q_cusum_chain`) run a REAL
  * Structured Streaming query, but their wall clock times the
  * MemoryStream feed — a driver-side collect, `addData` of the whole
  * events table, and `processAllAvailable` commit barriers — as much
  * as the monitored query itself, which is why those rows carried
  * `extra_noisy` flags in their own bench launches: the harness
  * self-loads 32 cores and its feed jitter lands in the measurement.
  *
  * The honest operator cost is what a deployment reads off its own
  * metrics: the sum of `StreamingQueryProgress.durationMs
  * ("triggerExecution")` over the run's micro-batches — all time Spark
  * spent planning + executing + committing the monitored stateful
  * query, none of the time the harness spent manufacturing input on
  * the driver. Each harness run deposits that figure here under its
  * catalog row name; [[Bench.measure]] takes the deposit (if one
  * appeared during the run) in place of the wall clock and records the
  * row under `progress_timed` in the full artifact so the provenance
  * of the number is explicit (docs/bench_protocol.md).
  *
  * Deposits are THREAD-scoped (round-13 advice): the harness run
  * deposits on the same thread that invoked the catalog fn, and Bench
  * takes on that same thread — so a concurrent invocation of the same
  * catalog row elsewhere in the session (bench racing verify; the race
  * the chain rows' unique memory-sink names already exist for) can
  * never deposit between this run's clear and take and get its
  * `triggerExecution` sum recorded as this run's figure.
  *
  * Take-and-clear semantics keep a failed run from serving a stale
  * deposit: Bench clears before each run and takes after it, so a
  * deposit is only ever consumed by the run that produced it.
  */
object StreamOpTiming {
  private val local =
    ThreadLocal.withInitial[scala.collection.mutable.Map[String, Double]](
      () => scala.collection.mutable.Map.empty)

  /** Deposit the operator seconds for catalog row `name` (visible only
    * to [[take]] calls on this same thread). */
  def record(name: String, seconds: Double): Unit =
    local.get.put(name, seconds)

  /** Remove and return this thread's most recent deposit for `name`. */
  def take(name: String): Option[Double] = local.get.remove(name)
}
