package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Q
import graft.sources.Tables

/** Similarity search over the `embeddings` table (Array[Float], dim=64):
  * brute-force cosine top-k as the correctness baseline, plus cluster
  * (label) centroid statistics — the scaffolding an IVF index builds on.
  *
  * Implementation notes:
  *  - dot products use `zip_with` + `aggregate` higher-order functions
  *    (codegen'd, no UDF); elements are cast to double FIRST so both
  *    engines do identical double arithmetic (float32 multiply would
  *    round differently from the oracle);
  *  - the query vector is a 1-row broadcast — at 100 TB the scan side
  *    streams while the query side is a broadcast nested loop, which is
  *    exactly the right plan for brute-force ANN scoring;
  *  - top-k goes through `orderBy(...).limit(k)`, which Spark executes
  *    as TakeOrderedAndProject (per-partition heap + driver merge), not
  *    a global sort.
  */
object VectorQueries {

  private def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  private def asDouble(c: Column): Column = c.cast("array<double>")

  /** Brute-force cosine top-10 against the vec_id=0 query vector. */
  private def cosineTopk(s: SparkSession, d: String): DataFrame = {
    val emb = Tables.embeddings(s, d)
    val q = emb.filter(col("vec_id") === 0)
      .select(asDouble(col("embedding")).as("qe"))
    emb.crossJoin(broadcast(q))
      .select(col("vec_id"),
        (dot(asDouble(col("embedding")), col("qe")) /
          (sqrt(dot(asDouble(col("embedding")), asDouble(col("embedding")))) *
           sqrt(dot(col("qe"), col("qe"))))).as("c"))
      .select(col("vec_id"), round(col("c"), 4).as("cos_sim"))
      .orderBy(col("cos_sim").desc, col("vec_id"))
      .limit(10)
  }

  /** Per-label centroid L2 norm (the IVF coarse-quantizer statistic). */
  private def centroidNorm(s: SparkSession, d: String): DataFrame =
    Tables.embeddings(s, d)
      .select(col("label"), posexplode(asDouble(col("embedding"))))
      .groupBy("label", "pos")
      .agg(avg("col").as("m"))
      .groupBy("label")
      .agg(round(sqrt(sum(col("m") * col("m"))), 4).as("centroid_norm"))
      .orderBy("label")

  /** Vector norms — scan-side feature extraction over the array column. */
  private def vectorNorms(s: SparkSession, d: String): DataFrame =
    Tables.embeddings(s, d)
      .select(col("vec_id"), col("label"),
        round(sqrt(dot(asDouble(col("embedding")), asDouble(col("embedding")))), 4)
          .as("l2_norm"))
      .orderBy("vec_id")

  val all: Seq[Q] = Seq(
    Q("q_cosine_topk", cosineTopk, Some(
      "WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0), " +
      "sc AS (SELECT e.vec_id, " +
      "sum(e.embedding[i]::DOUBLE * q.qe[i]::DOUBLE) AS d, " +
      "sum(e.embedding[i]::DOUBLE * e.embedding[i]::DOUBLE) AS na, " +
      "sum(q.qe[i]::DOUBLE * q.qe[i]::DOUBLE) AS nb " +
      "FROM embeddings e, q, range(1, 65) t(i) GROUP BY e.vec_id) " +
      "SELECT vec_id, round(d / (sqrt(na) * sqrt(nb)), 4) AS cos_sim FROM sc " +
      "ORDER BY cos_sim DESC, vec_id LIMIT 10"),
      headline = true),
    Q("q_centroid_norm", centroidNorm, Some(
      "WITH dims AS (SELECT label, i, avg(embedding[i]::DOUBLE) AS m " +
      "FROM embeddings, range(1, 65) t(i) GROUP BY label, i) " +
      "SELECT label, round(sqrt(sum(m * m)), 4) AS centroid_norm FROM dims " +
      "GROUP BY label ORDER BY label")),
    Q("q_vector_norms", vectorNorms, Some(
      "WITH n AS (SELECT vec_id, label, sum(embedding[i]::DOUBLE * embedding[i]::DOUBLE) AS nn " +
      "FROM embeddings, range(1, 65) t(i) GROUP BY vec_id, label) " +
      "SELECT vec_id, label, round(sqrt(nn), 4) AS l2_norm FROM n ORDER BY vec_id")),
  )
}
