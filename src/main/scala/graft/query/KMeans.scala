package graft.query

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions

/** Spherical k-means (Lloyd iterations under cosine similarity) — the
  * clustering loop behind IVF index construction, topic bucketing and
  * embedding-space curation in a training-data pipeline.
  *
  * Iteration hygiene (the part that matters at 100 TB):
  *  - the corpus is persisted ONCE and never reshuffled: assignment is
  *    scan-stage dot products against a broadcast k×dim centroid
  *    table plus a per-vector 1-row window;
  *  - per iteration, only the centroid table (k·dim doubles) crosses
  *    the cluster — computed with a partial-aggregating
  *    posexplode/groupBy, localCheckpoint'ed so iteration N's plan
  *    does not re-derive iterations 1..N-1 (same shape as
  *    [[ConnectedComponents]] / [[BipartiteExpand]]);
  *  - cosine ignores centroid scale, so centroids are plain means —
  *    assignment maximizes each term and the mean direction maximizes
  *    the per-cluster sum, giving Lloyd's monotone objective
  *    (spec-pinned in `KMeansSpec`).
  *
  * The single-step catalog twin `q_kmeans_step` is DuckDB-oracle-
  * checked; this loop generalizes it to `iters` rounds from any
  * integer seed-assignment column.
  */
object KMeans {

  /** Mean centroid per cluster: (cluster, cvec array<double>). */
  def centroids(assigned: DataFrame, vecCol: String = "e",
      clusterCol: String = "cluster"): DataFrame =
    assigned
      .select(col(clusterCol), posexplode(col(vecCol)))
      .groupBy(clusterCol, "pos").agg(avg("col").as("m"))
      .groupBy(clusterCol)
      .agg(array_sort(collect_list(struct(col("pos"), col("m")))).as("cs"))
      .select(col(clusterCol),
        transform(col("cs"), x => x.getField("m")).as("cvec"))

  /** Max-cosine assignment of every vector to a centroid (ties break on
    * the smallest cluster id): adds/replaces `cluster` and `sim`.
    *
    * `tieDecimals >= 0` QUANTIZES the similarity to that many decimals
    * before the argmax ordering (the reported `sim` stays raw): callers
    * whose assignment must be reproducible across ENGINES (the trained
    * IVF gate rows replay this loop as DuckDB CTEs) round on both sides
    * so a summation-order difference of ~1e-15 between Spark's
    * array-order fold and the oracle's unordered SUM can never flip a
    * near-tied argmax — the same trick the final cos_sim output uses
    * (round-12 advice). */
  def assign(v: DataFrame, cent: DataFrame, idCol: String,
      vecCol: String = "e", clusterCol: String = "cluster",
      tieDecimals: Int = -1): DataFrame = {
    VectorFunctions.register(v.sparkSession)
    def dot(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
      VectorFunctions.vecDot(a, b)
    val tieKey =
      if (tieDecimals >= 0) round(col("graft_sim"), tieDecimals)
      else col("graft_sim")
    // The row_number window stays, deliberately (round-15 measured
    // rejection): replacing it with a partial-aggregating
    // max(struct(tieKey, −cluster, sim, cluster, e)) — the winner-
    // identical argmax — regressed every consumer ~20% in a
    // same-session A/B (q_kmeans_run 1.07→1.29 s, q_ivf_trained
    // 1.21→1.46 s, q_ivfpq_search 3.6→4.4 s): Max over a struct
    // carrying the 64-dim vector payload falls back to interpreted
    // ordering and buffer copying, costing more than the window's
    // n·k-row shuffle+sort saves at these k. The window's per-key
    // group is k rows (the broadcast centroid count), so it is NOT a
    // hub-size liability at scale.
    v.drop(clusterCol, "sim")
      .crossJoin(broadcast(cent.withColumnRenamed(clusterCol, "graft_c")))
      .withColumn("graft_sim",
        dot(col(vecCol), col("cvec")) /
          (sqrt(dot(col(vecCol), col(vecCol))) * sqrt(dot(col("cvec"), col("cvec")))))
      .withColumn("graft_rn", row_number().over(
        Window.partitionBy(idCol).orderBy(tieKey.desc, col("graft_c"))))
      .filter(col("graft_rn") === 1)
      .drop("cvec", "graft_rn")
      .withColumnRenamed("graft_c", clusterCol)
      .withColumnRenamed("graft_sim", "sim")
  }

  /** Run `iters` Lloyd rounds from `seedCol` (any integer column, e.g.
    * a label or an SRP bucket). Returns (idCol, cluster, sim). */
  def run(spark: SparkSession, df: DataFrame, idCol: String, vecCol: String,
      seedCol: String, iters: Int,
      checkpointDir: Option[String] = None): DataFrame = {
    val v = df.select(col(idCol), col(vecCol).cast("array<double>").as("e"),
        col(seedCol).cast("int").as("cluster"))
      .persist()
    var assigned = v
    (1 to iters).foreach { _ =>
      val cent = centroids(assigned)
      assigned = Checkpoints.cut(
        assign(v.select(idCol, "e"), cent, idCol), checkpointDir)
    }
    v.unpersist()
    assigned.select(col(idCol), col("cluster"), round(col("sim"), 4).as("sim"))
  }
}
