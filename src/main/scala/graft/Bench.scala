package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: runs the headline queries against
  * `SPARK_GRAFT_SF_DIR` and prints ONE JSON line
  * `{"metric":...,"value":N,"unit":"sec","queries":{...},"sf":...}`.
  *
  * Each query is forced with `.count()` (full plan execution, no
  * collect of wide results). Protocol (kept stable round over round so
  * the driver's comparison stays attributable):
  *  - one untimed warm-up of every query (JIT + codegen compile +
  *    parquet footer caches — without it the first run is a 2-6x
  *    outlier and p90 measures the JIT, not the plan);
  *  - 5 measured runs per query, executed ROUND-ROBIN (run every query
  *    once, then repeat 5x) rather than back-to-back: a machine-wide
  *    contention window then lands on ONE run of each query instead of
  *    all 5 runs of whichever query it overlapped — which is how round
  *    2's q_broadcast_join_agg median absorbed a 7x noise spike;
  *  - per-query time is the MEDIAN of the successful runs; `quantiles`
  *    reports p10/p50/p90 (min/median/max of 5) so a regression can be
  *    told apart from a spike;
  *  - the 1-minute system load average is sampled before and after each
  *    measurement pass (`loadavg` in the JSON) so the artifact itself
  *    shows whether the box was quiet — bench numbers without that
  *    context proved unattributable in round 2;
  *  - a second scale point (`sf2`/`queries_sf2`, medians at the sibling
  *    sf0.01 directory or `SPARK_GRAFT_SF_DIR2`) keeps each query's
  *    scaling slope visible round over round.
  *
  * Failure handling: a query that throws is recorded under `errors`
  * (first message), its failed runs are EXCLUDED from the median — a
  * broken query must never bench as ~0 s and "improve" the total — and
  * the process exits nonzero. [[Bench.measure]] is the pure harness
  * core; `BenchHarnessSpec` proves a deliberately broken query fails
  * loudly instead of silently passing.
  */
object Bench {
  private val Runs = 5

  /** Timing + error outcome of one query across all measured runs. */
  final case class QResult(name: String, times: Seq[Double], err: Option[String]) {
    def ok: Boolean = times.nonEmpty
    def median: Double = times.sorted.apply(times.size / 2)
  }

  /** Run `queries` against `dir`: one untimed warm-up each, then
    * `runs` round-robin measurement passes. Failed runs record the
    * error and contribute no time. */
  def measure(spark: SparkSession, dir: String, queries: Seq[Q],
      runs: Int = Runs): Seq[QResult] = {
    val errs = scala.collection.mutable.LinkedHashMap[String, String]()
    def runOne(q: Q): Option[Double] = {
      val t0 = System.nanoTime()
      try { q.fn(spark, dir).count(); Some((System.nanoTime() - t0) / 1e9) }
      catch {
        case e: Throwable =>
          errs.getOrElseUpdate(q.name,
            s"${e.getClass.getSimpleName}: ${Option(e.getMessage).getOrElse("").take(200)}")
          None
      }
    }
    queries.foreach(runOne) // warm-up pass (untimed; errors still recorded)
    val times = queries.map(q => q.name ->
      scala.collection.mutable.ArrayBuffer[Double]()).toMap
    (1 to runs).foreach { _ =>
      queries.foreach(q => runOne(q).foreach(times(q.name) += _))
    }
    queries.map(q => QResult(q.name, times(q.name).toSeq, errs.get(q.name)))
  }

  private def loadAvg: Double =
    java.lang.management.ManagementFactory
      .getOperatingSystemMXBean.getSystemLoadAverage

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-bench")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val headline = Catalog.all.filter(_.headline)

    def jnum(v: Double): String = f"$v%.3f"
    def jmap(entries: Seq[(String, String)]): String =
      entries.map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")

    val load0 = loadAvg
    val results = measure(spark, sfDir, headline)
    val load1 = loadAvg
    val ok = results.filter(_.ok)
    val qs = jmap(ok.map(r => r.name -> jnum(r.median)))
    val quant = jmap(ok.map { r =>
      val ts = r.times.sorted
      r.name -> jmap(Seq("p10" -> jnum(ts.head), "p50" -> jnum(r.median),
        "p90" -> jnum(ts.last)))
    })
    val total = ok.map(_.median).sum
    val errors = results.flatMap(r => r.err.map(e => r.name -> ("\"" + e.replace("\"", "'").replace("\\", "/") + "\"")))
    val errPart = if (errors.isEmpty) "" else s""","errors":${jmap(errors)}"""

    // Second scale point for the scaling slope (best-effort: skip when
    // absent so the bench contract never breaks on a custom sfDir).
    val sf2Dir = sys.env.get("SPARK_GRAFT_SF_DIR2")
      .orElse(Some(sfDir.replace("sf0.1", "sf0.01"))
        .filter(d => d != sfDir && new java.io.File(d).isDirectory))
    val sf2Part = sf2Dir match {
      case Some(d) =>
        val r2 = measure(spark, d, headline)
        val qs2 = jmap(r2.filter(_.ok).map(r => r.name -> jnum(r.median)))
        s""","sf2":"$d","queries_sf2":$qs2"""
      case None => ""
    }
    val load2 = loadAvg

    val line =
      s"""{"metric":"total","value":${jnum(total)},"unit":"sec","queries":$qs,"quantiles":$quant$errPart$sf2Part,"loadavg":{"start":${jnum(load0)},"mid":${jnum(load1)},"end":${jnum(load2)}},"sf":"$sfDir"}"""
    println(line)
    // Also write the line verbatim to a file: under sbt, stdout is
    // "[info]"-prefixed, which defeats line-oriented JSON parsers —
    // the file is the clean artifact of record a change log can cite
    // (copy it to BENCH_rNN_local.json and commit it).
    // Best-effort: an unwritable path must not mask the error summary
    // and nonzero exit below (stdout already carries the line).
    val outPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "bench_last.json")
    try java.nio.file.Files.write(java.nio.file.Paths.get(outPath),
      (line + "\n").getBytes("UTF-8"))
    catch {
      case e: Exception =>
        System.err.println(s"bench: could not write $outPath: $e")
    }
    spark.stop()
    if (results.exists(_.err.isDefined)) {
      System.err.println(
        s"bench FAILED: ${results.count(_.err.isDefined)} queries threw — see 'errors' in the JSON line")
      sys.exit(1)
    }
  }
}
