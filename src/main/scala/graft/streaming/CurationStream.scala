package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.pipeline.Curation

/** Streaming curation ingest — the continuous-crawl twin of the batch
  * pipeline's front half ([[Curation.run]] stages 1 + 5): documents
  * arrive as a stream, pass the IDENTICAL quality/language filter
  * (shared code — the stage is pure scan-stage expressions, so one
  * definition serves both engines' modes and the two cannot drift),
  * are exact-deduped against all previously admitted content, and
  * land in the same Hive-partitioned parquet layout [[Curation.write]]
  * ships, exactly-once under restart via the sink checkpoint.
  *
  * Dedup semantics deviation (documented): the batch stage keeps the
  * MIN-id document per distinct content ([[graft.dedup.Dedup.exact]]);
  * a stream cannot know a smaller id is still coming, so this keeps
  * the FIRST ARRIVAL per content digest. When arrival order is id
  * order (a replayed log, an ascending crawl), the two agree —
  * `CurationStreamSpec` pins that parity. State is one (digest) entry
  * per distinct admitted content; pass `watermarkHours` with an
  * event-time column to bound it (`dropDuplicatesWithinWatermark`),
  * trading re-admission of content re-seen after the horizon — the
  * same knob-and-trade as [[DedupStreams]]' TTL.
  *
  * Scale shape: the filter is scan-stage (no shuffle); dedup state is
  * hash-partitioned by digest across executors (only (digest) keys,
  * never text, enter state — the same raw-text-never-leaves-the-scan
  * posture as the batch chain); the sink appends per micro-batch.
  */
object CurationStream {

  /** Filter + streaming exact-dedup. `docs` must be a streaming frame
    * with at least (doc_id, source, text[, tsCol]). */
  def curate(docs: DataFrame, cfg: Curation.Config = Curation.Config(),
      watermarkHours: Option[(String, Int)] = None): DataFrame = {
    val kept = Curation.qualityLangFilter(docs, cfg)
      .withColumn("digest", md5(col("text")))
    val deduped = watermarkHours match {
      case Some((tsCol, hours)) =>
        kept.withWatermark(tsCol, s"$hours hours")
          .dropDuplicatesWithinWatermark("digest")
      case None => kept.dropDuplicates("digest")
    }
    // the digest is dedup-internal: shipped rows keep the batch
    // pipeline's schema (no 32-byte-per-row artifact bloat, no schema
    // drift between the stream and batch tables)
    deduped.drop("digest")
  }

  /** Sink: append curated docs to `path` partitioned by source (the
    * [[Curation.write]] layout). Uses Spark's NATIVE file sink, not
    * `foreachBatch` + blind append: the file sink commits each batch
    * to its `_spark_metadata` manifest atomically, so a micro-batch
    * replayed after a crash mid-append is NOT double-counted by
    * readers (a blind append in foreachBatch is only at-least-once —
    * the re-run batch lands twice). Spark readers follow the manifest;
    * foreign engines reading the bare files see at-least-once on the
    * crash path, exactly-once on any clean run. */
  def writeCurated(curated: DataFrame, path: String,
      checkpoint: String): StreamingQuery =
    curated
      .writeStream
      .format("parquet")
      .option("path", path)
      .option("checkpointLocation", checkpoint)
      .partitionBy("source")
      .outputMode("append")
      .start()
}
