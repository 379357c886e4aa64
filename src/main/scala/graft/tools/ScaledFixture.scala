package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Build a factor-N text/vector corpus that MIRRORS the sf-tier layout
  * (one parquet file, one row group per table) so the scale-adaptive
  * scan fan-out faces the same under-split input it was built for —
  * the round-14 verdict noted sf0.1 can no longer demonstrate
  * parallelism claims (post-optimization, every core-count ratio is ≈1
  * because the wall is driver overhead), so the round-15 scaling
  * artifact (`CORE_SCALE_r15.jsonl`) runs the text/vector heavies on
  * THIS fixture at 8 vs 32 cores.
  *
  * Replication schemes (both deterministic):
  *  - `documents`: the [[PipelineScale]] construction — replica r
  *    shifts doc_ids into a disjoint range and salts every TOKEN with
  *    `~r`, so replicas are pairwise disjoint in shingle space and the
  *    true duplicate structure is exactly `factor` independent copies
  *    of the 1x structure (near-dup work scales ~linearly, the design
  *    claim; unsalted replicas would plant factor²-sized cross-replica
  *    clusters and measure a generator artifact).
  *  - `embeddings`: replica r shifts vec_ids and flips the SIGN of
  *    coordinate i by the parity of (r·31 + i·13) — within-replica
  *    geometry is exactly preserved (both sides of a pair flip the
  *    same signs), while a vector and its replicated twin land at
  *    cosine ≈ Σ±e_i²/‖e‖² ≈ 0, so replication does not plant
  *    cosine-1.0 cross-replica pairs.
  *
  * Usage: ScaledFixture <srcSfDir> <outDir> <factor>
  * Writes `<outDir>/documents.parquet` and `<outDir>/embeddings.parquet`
  * (the only tables the measured queries read).
  */
object ScaledFixture {
  def main(args: Array[String]): Unit = {
    require(args.length == 3, "usage: ScaledFixture <srcSfDir> <outDir> <factor>")
    val (src, out, factor) = (args(0), args(1), args(2).toInt)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .appName("graft-scaled-fixture")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val docs = spark.read.parquet(s"$src/documents.parquet")
    val docReps = (0 until factor).map { r =>
      docs.select(
        (col("doc_id") + lit(r.toLong * 10000000L)).as("doc_id"),
        (if (r == 0) col("text")
         else concat_ws(" ", transform(split(col("text"), "\\s+"),
           w => concat(w, lit(s"~$r"))))).as("text"),
        col("lang"), col("source"), col("n_chars"))
    }
    docReps.reduce(_ unionByName _)
      .coalesce(1) // one file, one row group — the sf-tier layout
      .write.mode("overwrite").parquet(s"$out/documents.parquet")

    val emb = spark.read.parquet(s"$src/embeddings.parquet")
    val embReps = (0 until factor).map { r =>
      emb.select(
        (col("vec_id") + lit(r.toLong * 10000000L)).as("vec_id"),
        (if (r == 0) col("embedding")
         else transform(col("embedding"),
           (x, i) => x * ((lit(r) * 31 + i * 13) % 2 * 2 - 1))).as("embedding"),
        col("label"))
    }
    embReps.reduce(_ unionByName _)
      .coalesce(1)
      .write.mode("overwrite").parquet(s"$out/embeddings.parquet")

    println(s"""{"fixture":"$out","factor":$factor,"src":"$src"}""")
    spark.stop()
  }
}
