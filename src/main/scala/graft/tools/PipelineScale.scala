package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.dedup.Dedup
import graft.pipeline.Admission

/** Scale-evidence run for the dedup/admission pipeline (round-9
  * verdict item 7): the graph path has IMDB_SCALE_r04.jsonl; this
  * main gives the document pipeline the same measured-slope evidence
  * beyond sf0.1.
  *
  * Corpus construction: `factor` replicas of the sf-dir `documents`
  * table, each replica's doc_ids shifted into a disjoint range and
  * every TOKEN salted with the replica id. Token-salting (not text
  * prefixing) makes replicas pairwise disjoint in shingle space, so
  * the true duplicate structure is exactly `factor` independent
  * copies of the 1× structure — near-dup work should scale ~linearly
  * in the corpus (the LSH/prefix-filter design claim), where
  * unsalted replicas would instead plant factor²-sized cross-replica
  * duplicate clusters and measure an artifact of the generator.
  *
  * Measured per factor (one JSON line each, appended to stdout):
  *  - `neardup_sec`: [[Dedup.nearDupPairs]] at the gate parameters
  *    (J ≥ 0.8, maxDf 200) — the PPJoin prefix-filter path;
  *  - `bloom_sec`: [[Dedup.bloomAdmit]] of the non-seed slice against
  *    the seed slice's digest set (the gate row's split);
  *  - `adm1_sec`/`adm2_sec`: the two-increment [[Admission]] loop into
  *    fresh state; `compact_sec`: folding both increments;
  *    `adm3_post_compact_sec`: a third increment admitted against the
  *    COMPACTED base — the state-read path a years-long daily loop
  *    lives on;
  *  - plan invariants: the near-dup and admission decision plans must
  *    stay cartesian-free at every factor (checked, recorded);
  *  - `fold_big_sec` vs `fold_minor_secs` (round 11): one big fold,
  *    then three 2%-sized daily increments each followed by a compact
  *    — the tiered design's claim is minor-fold cost ∝ increment, not
  *    total state (the round-10 full-rewrite design paid O(total)
  *    every fold);
  *  - `stream_*` (round 11): streaming admission with compactEvery=2,
  *    STOPPED after the mid-run compaction and restarted from the
  *    checkpoint — the restarted run must land exactly the one-shot
  *    admitted set on top of the generation >= 1 state.
  */
object PipelineScale {

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val factors = sys.env.getOrElse("SPARK_GRAFT_SCALE_FACTORS", "1,10")
      .split(",").map(_.trim.toInt).toSeq
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("graft-pipeline-scale")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def timed[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val a = f
      (a, (System.nanoTime() - t0) / 1e9)
    }
    def j(v: Double): String = f"$v%.2f"

    val base = graft.sources.Tables.documents(spark, sfDir)
      .select("doc_id", "text", "source")

    for (factor <- factors) {
      val work = java.nio.file.Files
        .createTempDirectory(s"graft_pscale_f$factor").toString

      // ---- corpus generation (timed separately — not pipeline cost)
      val (corpusPath, genSec) = timed {
        val reps = (0 until factor).map { r =>
          base.select(
            (col("doc_id") + lit(r.toLong * 10000000L)).as("doc_id"),
            (if (r == 0) col("text")
             else concat_ws(" ", transform(split(col("text"), "\\s+"),
               w => concat(w, lit(s"~$r"))))).as("text"),
            col("source"))
        }
        val p = s"$work/docs"
        reps.reduce(_ unionByName _).write.mode("overwrite").parquet(p)
        p
      }
      val docs = spark.read.parquet(corpusPath)
      val nDocs = docs.count()

      // ---- near-dup pairs (PPJoin prefix filter, gate parameters)
      val ndPlanStr = Dedup
        .nearDupPairs(docs, "doc_id", "text", 0.8, maxDf = 200)
        .queryExecution.executedPlan.toString
      val ndCartesianFree =
        !ndPlanStr.contains("CartesianProduct") &&
        !ndPlanStr.contains("BroadcastNestedLoopJoin")
      val (ndPairs, ndSec) = timed(
        Dedup.nearDupPairs(docs, "doc_id", "text", 0.8, maxDf = 200).count())

      // ---- Bloom-prefiltered admission (gate split: seed = id%5==0)
      val digests = docs.select(col("doc_id"), md5(col("text")).as("digest"))
      val seed = digests.filter(col("doc_id") % 5 === 0).select("digest")
      val freshSlice = digests.filter(col("doc_id") % 5 =!= 0)
      val (bloomAdmitted, bloomSec) = timed(
        Dedup.bloomAdmit(freshSlice, seed, "doc_id", "digest").count())

      // ---- two-increment admission + compaction + post-compact inc
      val mx = docs.agg(max("doc_id")).head.getLong(0)
      val root = s"$work/adm"
      val (n1, adm1Sec) = timed(
        Admission.admit(docs.filter(col("doc_id") <= mx / 3), root, "d1").count())
      val (n2, adm2Sec) = timed(
        Admission.admit(docs.filter(col("doc_id") > mx / 3 &&
          col("doc_id") <= 2 * mx / 3), root, "d2").count())
      val (_, compactSec) = timed(Admission.compact(spark, root))
      val (n3, adm3Sec) = timed(
        Admission.admit(docs.filter(col("doc_id") > 2 * mx / 3), root, "d3").count())

      // ---- tiered-compaction generations (round-10 verdict item 3's
      // "done" bar): one BIG fold, then small daily increments — each
      // minor fold must cost ~the increment, never ~total state. The
      // small increments are token-salted fresh docs in disjoint id
      // ranges (2% of the corpus each), so every admit is all-fresh
      // and the fold size is exactly the increment size.
      val root2 = s"$work/adm_gens"
      Admission.admit(docs, root2, "big")
      val (_, foldBigSec) = timed(Admission.compact(spark, root2))
      val small = (1 to 3).map { i =>
        base.filter(col("doc_id") % 50 === 0).select(
          (col("doc_id") + lit(900000000L + i.toLong * 10000000L)).as("doc_id"),
          concat_ws(" ", transform(split(col("text"), "\\s+"),
            w => concat(w, lit(s"~e$i")))).as("text"),
          col("source"))
      }
      val foldMinorSecs = small.zipWithIndex.map { case (inc, i) =>
        Admission.admit(inc, root2, s"e${i + 1}")
        val (_, sec) = timed(Admission.compact(spark, root2))
        sec
      }
      val gensState = Admission.readManifest(spark, root2)
      val nSmall = small.head.count()

      // ---- streaming admission across a compaction boundary with a
      // mid-run stop/restart (round-10 verdict item 6): 3 one-file
      // micro-batches, compactEvery=2; the stream is STOPPED after the
      // compaction fired and restarted from the checkpoint for the
      // last batch — the restarted run must admit exactly the one-shot
      // set on top of the compacted (generation >= 1) state.
      val srcDir = java.nio.file.Files.createTempDirectory("graft_pscale_src")
      def writeOne(df: DataFrame, name: String): Unit = {
        val tmp = java.nio.file.Files.createTempDirectory("graft_pscale_one").toString
        df.coalesce(1).write.mode("overwrite").parquet(tmp)
        val part = new java.io.File(tmp).listFiles()
          .find(_.getName.endsWith(".parquet")).get
        java.nio.file.Files.move(part.toPath, srcDir.resolve(name),
          java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      }
      val root3 = s"$work/adm_stream"
      val ckpt = s"$work/ckpt"
      val (_, streamP1Sec) = timed {
        writeOne(docs.filter(col("doc_id") <= mx / 3), "00_a.parquet")
        writeOne(docs.filter(col("doc_id") > mx / 3 &&
          col("doc_id") <= 2 * mx / 3), "01_b.parquet")
        val q = Admission.admitStream(
          spark.readStream.schema(docs.schema)
            .option("maxFilesPerTrigger", "1").parquet(srcDir.toString),
          root3, ckpt, cfg = None, compactEvery = 2)
        try q.processAllAvailable() finally q.stop()
      }
      val genAfterP1 = Admission.readManifest(spark, root3).generation
      val (_, streamP2Sec) = timed {
        writeOne(docs.filter(col("doc_id") > 2 * mx / 3), "02_c.parquet")
        val q = Admission.admitStream(
          spark.readStream.schema(docs.schema)
            .option("maxFilesPerTrigger", "1").parquet(srcDir.toString),
          root3, ckpt, cfg = None, compactEvery = 2)
        try q.processAllAvailable() finally q.stop()
      }
      val streamAdmitted = Admission.corpus(spark, root3)
        .select("doc_id").distinct().count()
      val streamParity = streamAdmitted == n1 + n2 + n3

      // ---- PQ-compressed semantic state bytes (round-11 verdict
      // item 2's "done" bar): one semantic increment over the scaled
      // corpus with deterministic synthetic embeddings, compacted, then
      // vecs bytes/doc measured against the round-11 float-format
      // counterfactual (the same rows written as (id, e, n) parquet).
      // 16-bit SRP tables keep the within-increment candidate join
      // sparse at every factor (this measures STATE BYTES, not LSH
      // constants — those live in the neardup rows above); sin() gives
      // full-mantissa doubles like real embeddings, so the float
      // counterfactual cannot cheat via dictionary encoding.
      val embScaled = docs.select(col("doc_id"),
        expr("transform(sequence(0, 63), i -> " +
          "sin(doc_id * 31 + i * 17))").as("embedding"))
      val root4 = s"$work/adm_sem"
      val (_, semAdmSec) = timed(Admission.admitWithEmbeddings(
        docs, embScaled, root4, "d1", cosThreshold = 0.9,
        nBits = 16, nTables = 4).count())
      Admission.compact(spark, root4)
      // a second small increment against the compacted codes state —
      // the steady-state read path (codes scanned, floats fetched only
      // for ADC survivors)
      val inc2 = small.head
      val emb2 = embScaled.unionByName(inc2.select(col("doc_id"),
        expr("transform(sequence(0, 63), i -> " +
          "sin(doc_id * 31 + i * 17))").as("embedding")))
      val (_, semAdm2Sec) = timed(Admission.admitWithEmbeddings(
        inc2, emb2, root4, "d2", cosThreshold = 0.9,
        nBits = 16, nTables = 4).count())
      def dirBytes(p: String): Long = {
        val pp = new org.apache.hadoop.fs.Path(p)
        val fs2 = pp.getFileSystem(spark.sparkContext.hadoopConfiguration)
        if (fs2.exists(pp)) fs2.getContentSummary(pp).getLength else 0L
      }
      val vecsBytes = dirBytes(s"$root4/vecs_base") +
        dirBytes(s"$root4/vecs") + dirBytes(s"$root4/pqcb")
      val floatDump = s"$work/float_dump"
      embScaled.select(col("doc_id"),
          col("embedding").cast("array<double>").as("e"))
        .withColumn("n", sqrt(expr("aggregate(e, 0D, (acc, v) -> acc + v * v)")))
        .write.mode("overwrite").parquet(floatDump)
      val floatBytes = dirBytes(floatDump)
      val vecsPerDoc = vecsBytes.toDouble / nDocs
      val floatPerDoc = floatBytes.toDouble / nDocs

      println(
        s"""{"metric":"pipeline_scale","factor":$factor,"sf":"$sfDir","n_docs":$nDocs,""" +
        s""""gen_sec":${j(genSec)},"neardup_sec":${j(ndSec)},"neardup_pairs":$ndPairs,""" +
        s""""neardup_cartesian_free":$ndCartesianFree,""" +
        s""""bloom_sec":${j(bloomSec)},"bloom_admitted":$bloomAdmitted,""" +
        s""""adm1_sec":${j(adm1Sec)},"adm2_sec":${j(adm2Sec)},""" +
        s""""compact_sec":${j(compactSec)},"adm3_post_compact_sec":${j(adm3Sec)},""" +
        s""""admitted":${n1 + n2 + n3},""" +
        s""""fold_big_sec":${j(foldBigSec)},"fold_big_rows":$nDocs,""" +
        s""""fold_minor_secs":[${foldMinorSecs.map(j).mkString(",")}],""" +
        s""""fold_minor_rows":$nSmall,"segments_live":${gensState.segments.size},""" +
        s""""stream_phase1_sec":${j(streamP1Sec)},"stream_gen_at_restart":$genAfterP1,""" +
        s""""stream_phase2_sec":${j(streamP2Sec)},"stream_parity":$streamParity,""" +
        s""""sem_admit_sec":${j(semAdmSec)},"sem_adm2_post_compact_sec":${j(semAdm2Sec)},""" +
        s""""vecs_bytes_per_doc":${j(vecsPerDoc)},"float_bytes_per_doc":${j(floatPerDoc)},""" +
        s""""vecs_compression":${j(floatPerDoc / vecsPerDoc)}}""")

      // cleanup the generated corpus + state
      Admission.reset(spark, root)
      Admission.reset(spark, root2)
      Admission.reset(spark, root3)
      Admission.reset(spark, root4)
      val fs = new org.apache.hadoop.fs.Path(work)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.delete(new org.apache.hadoop.fs.Path(work), true)
    }
    spark.stop()
  }
}
