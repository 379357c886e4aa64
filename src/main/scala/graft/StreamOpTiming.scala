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
  * Take-and-clear semantics keep a failed run from serving a stale
  * deposit: Bench clears before each run and takes after it, so a
  * deposit is only ever consumed by the run that produced it.
  */
object StreamOpTiming {
  private val last = new java.util.concurrent.ConcurrentHashMap[String, java.lang.Double]()

  /** Deposit the operator seconds for catalog row `name`. */
  def record(name: String, seconds: Double): Unit = last.put(name, seconds)

  /** Remove and return the most recent deposit for `name`, if any. */
  def take(name: String): Option[Double] =
    Option(last.remove(name)).map(_.doubleValue)
}
