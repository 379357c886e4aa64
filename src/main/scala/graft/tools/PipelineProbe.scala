package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.pipeline.Curation
import graft.sources.Tables

/** Variance probe for `q_pipeline_e2e` (temporary diagnostic):
  * runs the composed pipeline N times at SPARK_GRAFT_SF_DIR and
  * prints, per run, the wall time, the per-stage wall split (stage
  * boundaries forced with count()), the GC time delta and the
  * storage-memory block count — to localize which stage carries the
  * p90/p50 spread the round-6 verdict flagged (9.65/6.25 local).
  */
object PipelineProbe {
  private def gcMillis: Long = {
    import scala.jdk.CollectionConverters._
    java.lang.management.ManagementFactory.getGarbageCollectorMXBeans
      .asScala.map(_.getCollectionTime).sum
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val n = sys.env.getOrElse("PROBE_RUNS", "8").toInt
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("graft-pipeline-probe")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.codegen.cache.maxEntries",
        sys.env.getOrElse("PROBE_CODEGEN_CACHE", "100"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def timed[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val a = f
      (a, (System.nanoTime() - t0) / 1e9)
    }

    def stages(docs: DataFrame): Seq[(String, Double)] = {
      val cfg = Curation.Config()
      val buf = scala.collection.mutable.ArrayBuffer.empty[(String, Double)]
      def step[A](name: String)(f: => A): A = {
        val (a, t) = timed(f); buf += name -> t; a
      }
      val s1 = step("s1_exact_cut") {
        val d = graft.query.Checkpoints.cut(Curation.exactDedup(docs), None); d.count(); d
      }
      val s2 = {
        import org.apache.spark.sql.functions._
        import graft.functions.TextFunctions
        val pairs = step("s2a_pairs") {
          val p = TextFunctions.jaccardPairs(
            TextFunctions.shingles(s1, "doc_id", "text", cfg.shingleN)
              .select(col("doc_id"),
                conv(substring(md5(col("shingle")), 1, 12), 16, 10).cast("long")
                  .as("shingle")),
            "doc_id", cfg.jaccardThreshold, cfg.maxDf)
          val c = graft.query.Checkpoints.cut(p, None); c.count(); c
        }
        val comps = step("s2b_cc") {
          val c = graft.query.ConnectedComponents.run(pairs, "id_a", "id_b"); c.count(); c
        }
        step("s2c_anti") {
          val losers = comps.filter(col("vertex") =!= col("component"))
            .select(col("vertex").as("doc_id"))
          val d = s1.join(losers, Seq("doc_id"), "left_anti"); d.count(); d
        }
      }
      val sp = step("s3_split_cut") {
        val d = graft.query.Checkpoints.cut(Curation.assignSplits(s2), None); d.count(); d
      }
      val tr = step("s4_decontam") {
        val d = Curation.decontaminate(sp, cfg); d.count(); d
      }
      val kept = step("s5_quality") {
        val d = Curation.qualityLangFilter(tr, cfg); d.count(); d
      }
      step("s6_8_mix_chunk_pack") {
        Curation.pack(Curation.chunk(Curation.mixtureSample(kept), cfg), cfg).count()
      }
      buf.toSeq
    }

    val docs = Tables.documents(spark, sfDir)
    // warm-up (JIT + codegen + parquet footers), matching bench protocol
    Curation.run(docs).count()

    def jitMillis: Long =
      java.lang.management.ManagementFactory.getCompilationMXBean.getTotalCompilationTime

    println("run,total_s,gc_delta_ms,jit_delta_ms,stages")
    (1 to n).foreach { i =>
      val g0 = gcMillis
      val j0 = jitMillis
      val mode = sys.env.getOrElse("PROBE_MODE", "whole")
      val blocks0 = spark.sparkContext.getRDDStorageInfo.length
      if (mode == "stages") {
        val (ss, t) = timed(stages(docs))
        val detail = ss.map { case (k, v) => f"$k=$v%.2f" }.mkString(" ")
        println(f"$i,$t%.3f,${gcMillis - g0},${jitMillis - j0},rdds=$blocks0,$detail")
      } else {
        val (_, t) = timed(Curation.run(docs).count())
        println(f"$i,$t%.3f,${gcMillis - g0},${jitMillis - j0},rdds=$blocks0,-")
      }
    }
    spark.stop()
  }
}
