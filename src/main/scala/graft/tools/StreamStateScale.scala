package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** State-size evidence for the fused streaming monitors (round-12
  * verdict item 6): the chains claim watermark-bounded state — this
  * harness drives [[graft.streaming.EventStreams.hourlyAnomalyChain]]
  * over `factor`× the sf-dir's events table as a REAL multi-batch
  * stream (file source, one file per micro-batch, event-time order)
  * and records `stateOperators` rows/bytes from every
  * `StreamingQueryProgress`, so "state plateaus at the horizon bound"
  * is a measured series, not a design claim.
  *
  * Replication = `factor` interleaved copies with timestamps UNCHANGED
  * (the [[EventScale]] calendar-replica construction): per-hour counts
  * scale ×factor while every intensive statistic is invariant, so the
  * emitted (type, hour, side) hit set must be IDENTICAL at every
  * factor (`hits_invariant`) and per-hit counts exactly ×factor —
  * the run self-checks correctness while it measures state.
  *
  * What bounded state means here: the FMGWS state rows equal the
  * number of keys (event types) — constant — and the state BYTES per
  * key hold the open-hours map (≤ watermark horizon / 1 h + 1 entries
  * under ordered replay) plus four moment longs, so total state bytes
  * must plateau after warm-up instead of growing with stream length.
  * `state_mem_plateau` asserts max(second half) ≤ 1.5 × max(first
  * half) of the post-warmup series; `state_rows_*` record the row
  * series bounds.
  *
  * One JSON line per factor on stdout; append to STREAM_STATE_r{N}.jsonl.
  */
object StreamStateScale {

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val factors = sys.env.getOrElse("SPARK_GRAFT_SCALE_FACTORS", "1,10")
      .split(",").map(_.trim.toInt).toSeq
    val nFiles = sys.env.getOrElse("SPARK_GRAFT_STREAM_BATCHES", "24").toInt
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("graft-stream-state-scale")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.streaming.numRecentProgressUpdates", "200")
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val ev = graft.sources.Tables.events(spark, sfDir)
      .select(col("event_type"), unix_micros(col("ts")).as("tsUs"))

    var hits1: Map[(String, Long, String), Long] = Map.empty
    for (factor <- factors) {
      val fact = (0 until factor).map(_ => ev).reduce(_ unionAll _)
        .localCheckpoint()
      val n = fact.count()
      val maxTs = fact.agg(max("tsUs")).head.getLong(0)

      // event-time-ordered replay: ntile the timeline into nFiles
      // one-file slices + a flush sentinel file that closes every hour
      val root = java.nio.file.Files
        .createTempDirectory("graft_sss").toString
      val srcDir = s"$root/src"
      val outDir = s"$root/out"
      val ckpt = s"$root/ck"
      new java.io.File(srcDir).mkdirs()
      val slices = fact.withColumn("slice",
          ntile(nFiles).over(org.apache.spark.sql.expressions.Window
            .orderBy("tsUs", "event_type")))
      (1 to nFiles).foreach { sl =>
        val tmp = s"$root/tmp$sl"
        slices.filter(col("slice") === sl).drop("slice")
          .orderBy("tsUs").coalesce(1)
          .write.mode("overwrite").parquet(tmp)
        val part = new java.io.File(tmp).listFiles()
          .find(_.getName.endsWith(".parquet")).get
        java.nio.file.Files.move(part.toPath,
          java.nio.file.Paths.get(srcDir, f"$sl%03d.parquet"))
      }
      Seq(("~flush", maxTs + 3L * 3600000000L)).toDF("event_type", "tsUs")
        .coalesce(1).write.mode("overwrite").parquet(s"$root/tmpf")
      java.nio.file.Files.move(
        new java.io.File(s"$root/tmpf").listFiles()
          .find(_.getName.endsWith(".parquet")).get.toPath,
        java.nio.file.Paths.get(srcDir, "999.parquet"))

      val t0 = System.nanoTime()
      val q = graft.streaming.EventStreams.hourlyAnomalyChain(
          spark.readStream.schema("event_type string, tsUs long")
            .option("maxFilesPerTrigger", "1").parquet(srcDir)
            .select(col("event_type"), timestamp_micros(col("tsUs")).as("ts")))
        .writeStream.format("parquet")
        .option("path", outDir).option("checkpointLocation", ckpt)
        .outputMode("append").start()
      try q.processAllAvailable() finally q.stop()
      val sec = (System.nanoTime() - t0) / 1e9

      // per-batch state series (batches that carried state metrics)
      val series = q.recentProgress.toSeq
        .filter(_.stateOperators.nonEmpty)
        .map(p => (p.batchId,
          p.stateOperators.map(_.numRowsTotal).sum,
          p.stateOperators.map(_.memoryUsedBytes).sum))
      val rows = series.map(_._2)
      val mems = series.map(_._3)
      // plateau check over the post-warmup window (skip the first 4
      // batches: store init + first fills dominate)
      val warm = mems.drop(4)
      val (h1, h2) = warm.splitAt(warm.length / 2)
      val plateau = h1.nonEmpty && h2.nonEmpty &&
        h2.max <= math.max(1.5 * h1.max, h1.max + (64 << 10))
      // correctness self-check: intensive hit-set invariance ×factor,
      // extensive counts exactly ×factor
      val hits = spark.read.parquet(outDir)
        .select("event_type", "hourUs", "cnt", "side").collect()
        .map(r => ((r.getString(0), r.getLong(1), r.getString(3)),
          r.getLong(2))).toMap
      val baseFactor = factors.head
      if (factor == baseFactor && hits1.isEmpty) hits1 = hits
      // intensive invariance: same (type, hour, side) set at every
      // factor; extensive exactness: counts scale exactly x(f/base)
      val invariant = hits.keySet == hits1.keySet &&
        hits.forall { case (k, c) => c * baseFactor == hits1(k) * factor }
      println(s"""{"metric":"stream_state","factor":$factor,"sf":"$sfDir",""" +
        s""""n_events":$n,"n_batches":${series.length},""" +
        s""""wall_sec":${f"$sec%.2f"},""" +
        s""""state_rows_max":${if (rows.isEmpty) 0 else rows.max},""" +
        s""""state_rows_final":${rows.lastOption.getOrElse(0L)},""" +
        s""""state_mem_first_half_max":${if (h1.isEmpty) 0 else h1.max},""" +
        s""""state_mem_second_half_max":${if (h2.isEmpty) 0 else h2.max},""" +
        s""""state_mem_plateau":$plateau,""" +
        s""""n_hits":${hits.size},"hits_invariant":$invariant}""")
    }
    spark.stop()
  }
}
