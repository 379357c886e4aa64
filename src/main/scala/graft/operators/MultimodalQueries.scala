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

  val all: Seq[Q] = Seq(
    Q("q_media_meta", mediaMeta, Some(
      "SELECT doc_id, 'text/plain' AS mime, " +
      "CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes, " +
      "CAST(doc_id % 64 + 1 AS INT) AS width, " +
      "CAST(doc_id % 48 + 1 AS INT) AS height " +
      "FROM documents ORDER BY doc_id")),
    Q("q_media_features", mediaFeatures, None),
  )
}
