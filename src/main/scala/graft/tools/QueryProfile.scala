package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Per-job/stage profiler for catalog queries (optimization-round
  * diagnostic; guide §1 "measure first"). For each named query: one
  * untimed warm-up, then one measured run with a listener recording
  * every job's wall time and every stage's task-time / shuffle
  * read+write bytes, printed in submission order. This answers "which
  * internal job of a multi-job operator (BFS levels, checkpoint cuts,
  * CC rounds) carries the wall clock" — the attribution the flat bench
  * median cannot give.
  *
  * Usage: QueryProfile <sfDir> <q1,q2,...> [runs]
  */
object QueryProfile {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: QueryProfile <sfDir> <q1,q2,...> [runs]")
    val sfDir = args(0)
    val names = args(1).split(",").map(_.trim).filter(_.nonEmpty).toSeq
    val runs = if (args.length > 2) args(2).toInt else 1
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-profile")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    final case class JobRow(id: Int, desc: String, var ms: Long = -1,
        var stages: Seq[Int] = Nil)
    final case class StageRow(id: Int, name: String, tasks: Int,
        taskTimeMs: Long, shufReadMB: Double, shufWriteMB: Double,
        inputMB: Double)

    val jobs = scala.collection.mutable.LinkedHashMap[Int, JobRow]()
    val jobStart = scala.collection.mutable.Map[Int, Long]()
    val stages = scala.collection.mutable.LinkedHashMap[Int, StageRow]()
    val listener = new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit = {
        val d = Option(e.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description")))
          .getOrElse("")
        jobs.synchronized {
          jobs(e.jobId) = JobRow(e.jobId, d,
            stages = e.stageInfos.map(_.stageId).toSeq)
          jobStart(e.jobId) = e.time
        }
      }
      override def onJobEnd(e: SparkListenerJobEnd): Unit =
        jobs.synchronized {
          jobs.get(e.jobId).foreach(j =>
            j.ms = e.time - jobStart.getOrElse(e.jobId, e.time))
        }
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
        val si = e.stageInfo
        val m = si.taskMetrics
        stages.synchronized {
          stages(si.stageId) = StageRow(si.stageId,
            si.name.take(60), si.numTasks, m.executorRunTime,
            m.shuffleReadMetrics.totalBytesRead / 1e6,
            m.shuffleWriteMetrics.bytesWritten / 1e6,
            m.inputMetrics.bytesRead / 1e6)
        }
      }
    }

    def jit: Long = java.lang.management.ManagementFactory
      .getCompilationMXBean.getTotalCompilationTime
    // driver-side Janino compile time + generated-class count — cache
    // misses show up here as per-run compile work that never amortizes
    def janinoMs: Long = org.apache.spark.metrics.source.CodegenMetrics
      .METRIC_COMPILATION_TIME.getSnapshot.getValues.sum / 1000000
    def janinoN: Long = org.apache.spark.metrics.source.CodegenMetrics
      .METRIC_COMPILATION_TIME.getCount

    names.foreach { n =>
      val q = graft.Catalog.byName.getOrElse(n, sys.error(s"unknown query: $n"))
      q.fn(spark, sfDir).count() // warm-up
      (1 to runs).foreach { r =>
        jobs.synchronized(jobs.clear()); stages.synchronized(stages.clear())
        spark.sparkContext.addSparkListener(listener)
        val j0 = jit
        val g0 = janinoN
        val t0 = System.nanoTime()
        q.fn(spark, sfDir).count()
        val wall = (System.nanoTime() - t0) / 1e9
        // drain listener events before reading (private bus: just wait)
        Thread.sleep(300)
        spark.sparkContext.removeSparkListener(listener)
        println(f"==== $n run $r wall=$wall%.3f s jit_delta=${jit - j0} ms codegen_compiles=${janinoN - g0} ====")
        jobs.values.foreach { j =>
          val ss = j.stages.flatMap(stages.get)
          val tt = ss.map(_.taskTimeMs).sum
          val sr = ss.map(_.shufReadMB).sum
          val sw = ss.map(_.shufWriteMB).sum
          val in = ss.map(_.inputMB).sum
          val tasks = ss.map(_.tasks).sum
          println(f"job ${j.id}%3d ${j.ms}%6d ms taskTime=$tt%6d ms tasks=$tasks%3d in=$in%8.1fMB sr=$sr%7.2fMB sw=$sw%7.2fMB ${j.desc.take(50)}")
          if (j.ms > 150) ss.foreach(s =>
            println(f"      stage ${s.id}%4d tasks=${s.tasks}%3d tt=${s.taskTimeMs}%6d ms ${s.name}"))
        }
      }
    }
    spark.stop()
  }
}
