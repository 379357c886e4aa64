package graft

import org.apache.spark.sql.SparkSession

/** Dev utility: time individual catalog queries without the full bench.
  * `runMain graft.TimeQuery <sfDir> <runs> <name> [<name> ...]` —
  * one warm-up plus `runs` timed executions per query, bench-identical
  * session settings.
  */
object TimeQuery {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3, "usage: TimeQuery <sfDir> <runs> <query> [...]")
    val dir = args(0)
    val runs = args(1).toInt
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .appName("graft-timequery")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    args.drop(2).foreach { name =>
      val q = Catalog.byName.getOrElse(name, sys.error(s"unknown query: $name"))
      q.fn(spark, dir).count() // warm-up
      val times = (1 to runs).map { _ =>
        val t0 = System.nanoTime()
        q.fn(spark, dir).count()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[time] $name runs=${times.map(t => f"$t%.2f").mkString(",")} " +
        f"median=${times.sorted.apply(times.size / 2)}%.2f s")
    }
    spark.stop()
  }
}
