package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Q
import graft.multimodal.Multimodal

/** Multimodal-column operators (see [[graft.multimodal.Multimodal]]):
  * metadata extraction is oracle-checked; the decode/feature pipeline
  * (stubbed codec, real Spark plumbing) gets the rows-only check since
  * a byte-fold checksum isn't reasonably SQL-expressible.
  */
object MultimodalQueries {

  /** Typed-metadata projection of the media table. */
  private def mediaMeta(s: SparkSession, d: String): DataFrame =
    Multimodal.fromDocuments(s, d).toDF()
      .select(col("doc_id"), col("meta.mime").as("mime"),
        col("meta.n_bytes").as("n_bytes"), col("meta.width").as("width"),
        col("meta.height").as("height"))
      .orderBy("doc_id")

  /** Decode + feature extraction through the partition-batched stub
    * codec; emits scalar features (no oracle — rows-only check). */
  private def mediaFeatures(s: SparkSession, d: String): DataFrame =
    Multimodal.features(s, d)
      .select(col("doc_id"), col("n_bytes"), col("checksum"),
        round(element_at(col("features"), 1).cast("double"), 3).as("f0"))
      .orderBy("doc_id")

  /** REAL image decode under the driver gate: executor-side PNG
    * encode ([[Multimodal.syntheticPngs]]) → `ImageCodec`
    * (javax.imageio) through the same partition-batched
    * `extractFeatures` pipeline — and because the fills are solid,
    * width/height/channel means are exact integer functions of doc_id,
    * hash-checked against a pure-arithmetic oracle (corrupt blobs must
    * come back as the documented zero vector). */
  private def mediaDecode(s: SparkSession, d: String): DataFrame =
    Multimodal.extractFeatures(Multimodal.syntheticPngs(s, d),
        codec = Multimodal.ImageCodec).toDF()
      .select(col("doc_id"),
        element_at(col("features"), 1).cast("int").as("width"),
        element_at(col("features"), 2).cast("int").as("height"),
        element_at(col("features"), 3).cast("int").as("mean_r"),
        element_at(col("features"), 4).cast("int").as("mean_g"),
        element_at(col("features"), 5).cast("int").as("mean_b"))
      .orderBy("doc_id")

  private val mediaDecodeSql =
    "WITH ids AS (SELECT doc_id FROM documents ORDER BY doc_id LIMIT 200), " +
    "d AS (SELECT doc_id, doc_id % 50 = 49 AS corrupt, " +
    "(doc_id * 2654435761) // 256 % 16777216 AS rgb FROM ids) " +
    "SELECT doc_id, " +
    "CAST(CASE WHEN corrupt THEN 0 ELSE doc_id % 16 + 1 END AS INT) AS width, " +
    "CAST(CASE WHEN corrupt THEN 0 ELSE doc_id % 8 + 1 END AS INT) AS height, " +
    "CAST(CASE WHEN corrupt THEN 0 ELSE rgb // 65536 END AS INT) AS mean_r, " +
    "CAST(CASE WHEN corrupt THEN 0 ELSE rgb // 256 % 256 END AS INT) AS mean_g, " +
    "CAST(CASE WHEN corrupt THEN 0 ELSE rgb % 256 END AS INT) AS mean_b " +
    "FROM d ORDER BY doc_id"

  val all: Seq[Q] = Seq(
    Q("q_media_decode", mediaDecode, Some(mediaDecodeSql)),
    Q("q_media_meta", mediaMeta, Some(
      "SELECT doc_id, 'text/plain' AS mime, " +
      "CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes, " +
      "CAST(doc_id % 64 + 1 AS INT) AS width, " +
      "CAST(doc_id % 48 + 1 AS INT) AS height " +
      "FROM documents ORDER BY doc_id")),
    Q("q_media_features", mediaFeatures, None),
  )
}
