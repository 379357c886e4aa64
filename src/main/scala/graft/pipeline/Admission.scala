package graft.pipeline

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.dedup.Dedup

/** Daily-crawl admission loop — the composed incremental form of the
  * curation front half (reference analogue: the incremental ingest
  * path, dataInit.erl:52-70, feeding the server's stored tables,
  * server.erl:161-167): each increment of crawled documents is matched
  * against the PERSISTED state of everything seen so far, survivors
  * are admitted, and the state is extended — without ever re-reading
  * or re-shingling previously seen text.
  *
  * Persisted state under `root` (all parquet, one `inc=<id>` subdir
  * per increment so a re-run of the same increment OVERWRITES its own
  * files — restart-idempotent by construction):
  *   - `corpus/`  admitted documents (original schema + `inc`);
  *   - `index/`   LSH band signatures of every SEEN exact-survivor —
  *     including near-dup REJECTED docs ([[Dedup.lshIndex]] rows);
  *   - `digests/` content digests of every seen exact-survivor.
  *
  * Admission rule, greedy by id (documents ascend across increments —
  * a crawl log's natural order; [[AdmissionSpec]] pins the parity):
  * a document is admitted iff (1) its content digest was never seen,
  * (2) no SEEN document shares an LSH band signature with it, and
  * (3) no smaller-id document of its own increment shares a digest or
  * band signature. Indexing the seen-not-admitted survivors is what
  * makes the loop COMPOSITIONAL: `admit(A); admit(B)` admits exactly
  * the same set as one-shot `admit(A ∪ B)` — a chain a~b~c (a<b<c,
  * a≁c) greedily admits only `a` in both forms, where an
  * admitted-only index would re-admit `c` in the two-step run.
  *
  * Scale shape: per increment, only the increment's text is shingled
  * (O(|inc|)); the corpus side of every match is a scan of 40-byte
  * index/digest rows with the equi-join broadcastable when the
  * increment is small; decision tables (ids, signatures of the
  * increment) are eagerly materialized BEFORE any state write so no
  * write's plan re-scans a state directory mid-update (at cluster
  * scale: reliable checkpoint instead of localCheckpoint, same
  * boundary). Raw text crosses no exchange — the corpus append is a
  * semi-join of the increment input against the admitted-id list.
  */
object Admission {

  private def indexSchema(idCol: String) = StructType(Seq(
    StructField(idCol, LongType), StructField("band", IntegerType),
    StructField("sig", StringType)))
  private val digestSchema = StructType(Seq(StructField("digest", StringType)))

  /** Seen-state reader. The CURRENT increment's own subdir is excluded:
    * a crashed-and-rerun increment must not see its previous partial
    * run as "already seen" (it would admit nothing and overwrite its
    * output with an empty set — the opposite of idempotence). */
  private def readSeen(s: SparkSession, path: String,
      schema: StructType, selfInc: String): DataFrame = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
    val dirs =
      if (fs.exists(p))
        fs.listStatus(p).filter(_.isDirectory).map(_.getPath)
          .filterNot(_.getName == s"inc=$selfInc").map(_.toString).toSeq
      else Seq.empty
    if (dirs.isEmpty)
      s.createDataFrame(s.sparkContext.emptyRDD[Row], schema)
    else s.read.schema(schema).parquet(dirs: _*)
  }

  /** Admit one increment against (and into) the state under `root`.
    * Returns the admitted rows as durably written. Re-running the same
    * `incId` is idempotent; `incId`s must be distinct per increment and
    * doc ids must ascend across increments for the one-shot parity. */
  /** Lazy decision plans for one increment — returned un-materialized
    * so `AdmissionSpec` can pin the join shapes (every corpus-side
    * match an equi/semi join, never a cartesian), the same
    * plan-exposure pattern as [[graft.dedup.Dedup
    * .embedNearDupBucketedPlan]]. Returns (freshKeys, incIndexOf,
    * admittedIdsOf): `incIndexOf` builds the increment's signature
    * rows from the (normally checkpointed) fresh keys, and
    * `admittedIdsOf` resolves the admitted ids from the index and
    * fresh keys. The admitted set starts from the FRESH key set, not
    * the index universe: a document too short to shingle (< shingleN
    * tokens) has no index rows, participates only in exact dedup,
    * and must still be admitted — deriving from the index would
    * silently drop it while its digest was already marked seen. */
  private[graft] def admitPlan(newDocs: DataFrame, seenIndex: DataFrame,
      seenDigests: DataFrame, idCol: String, textCol: String,
      shingleN: Int, k: Int, rowsPerBand: Int)
      : (DataFrame, DataFrame => DataFrame,
         (DataFrame, DataFrame) => DataFrame) = {
    // (1) within-increment exact: keep the min id per distinct content
    val digested = newDocs
      .select(col(idCol), md5(col(textCol)).as("digest"))
    val exactKeep = digested.groupBy("digest").agg(min(idCol).as(idCol))
    // (2) cross-exact: content already seen in ANY earlier increment
    val freshKeys = exactKeep
      .join(seenDigests, Seq("digest"), "left_anti")
    // (3) signatures for every fresh doc — seen-index rows, admitted or not
    val incIndexOf = (fk: DataFrame) => Dedup.lshIndex(
      newDocs.join(fk.select(idCol), Seq(idCol), "left_semi"),
      idCol, textCol, shingleN, k, rowsPerBand)
    val admittedIdsOf = (idx: DataFrame, fk: DataFrame) => {
      // (4) cross near-dup: any band collision with a seen document
      val crossLosers = idx
        .join(seenIndex.select("band", "sig"), Seq("band", "sig"), "left_semi")
        .select(idCol)
      // (5) within-increment near-dup, greedy: a band collision with a
      // smaller id of this increment rejects the larger id
      val withinLosers = idx.select(col(idCol).as("gr_b"), col("band"), col("sig"))
        .join(idx.select(col(idCol).as("gr_a"), col("band"), col("sig")),
          Seq("band", "sig"))
        .filter(col("gr_a") < col("gr_b"))
        .select(col("gr_b").as(idCol))
      fk.select(idCol)
        .join(crossLosers.union(withinLosers), Seq(idCol), "left_anti")
    }
    (freshKeys, incIndexOf, admittedIdsOf)
  }

  def admit(newDocs: DataFrame, root: String, incId: String,
      idCol: String = "doc_id", textCol: String = "text",
      shingleN: Int = 3, k: Int = 8, rowsPerBand: Int = 2): DataFrame = {
    val s = newDocs.sparkSession
    val seenIndex = readSeen(s, s"$root/index", indexSchema(idCol), incId)
    val seenDigests = readSeen(s, s"$root/digests", digestSchema, incId)
    val (freshKeysPlan, incIndexOf, admittedIdsOf) = admitPlan(
      newDocs, seenIndex, seenDigests, idCol, textCol, shingleN, k, rowsPerBand)
    // decision tables materialize BEFORE state writes
    val freshKeys = freshKeysPlan.localCheckpoint()
    val incIndex = incIndexOf(freshKeys).localCheckpoint()
    val freshDigests = freshKeys.select("digest")
    val admittedIds = admittedIdsOf(incIndex, freshKeys).localCheckpoint()

    // state writes — every plan below reads only newDocs + materialized
    // decision tables, never a state directory
    newDocs.join(admittedIds, Seq(idCol), "left_semi")
      .write.mode("overwrite").parquet(s"$root/corpus/inc=$incId")
    incIndex.write.mode("overwrite").parquet(s"$root/index/inc=$incId")
    freshDigests.write.mode("overwrite").parquet(s"$root/digests/inc=$incId")
    s.read.parquet(s"$root/corpus/inc=$incId")
  }

  /** Streaming admission — the continuous form of the daily loop
    * ([[graft.streaming.CurationStream]]'s ingest feeding this state):
    * every micro-batch is one increment whose id is the MICRO-BATCH
    * id. Structured Streaming replays a failed batch under the SAME
    * id, and [[admit]] is idempotent per increment id (a re-run
    * overwrites its own subdirs and excludes them from the seen
    * state), so the composed loop is exactly-once end-to-end under
    * crash/restart — no dedup-sink tricks needed, the admission state
    * itself is the sink. `cfg` applies the batch pipeline's
    * quality/language filter ([[Curation.qualityLangFilter]], pure
    * scan-stage expressions) before admission, completing the
    * ingest → filter → match-against-index → admit → append-index
    * chain as one restartable flow. Batch ids are zero-padded so
    * lexicographic `inc=` ordering equals arrival order. */
  def admitStream(docs: DataFrame, root: String, checkpoint: String,
      idCol: String = "doc_id", textCol: String = "text",
      cfg: Option[Curation.Config] = Some(Curation.Config()))
      : org.apache.spark.sql.streaming.StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpoint)
      .outputMode("append")
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[Row], batchId: Long) =>
        val kept = cfg.fold(batch.toDF())(c =>
          Curation.qualityLangFilter(batch.toDF(), c))
        admit(kept, root, f"b$batchId%09d", idCol, textCol)
        ()
      }
      .start()

  /** All admitted documents (original columns + `inc`, cast to string —
    * partition-value inference would otherwise strip a numeric id's
    * leading zeros). */
  def corpus(s: SparkSession, root: String): DataFrame =
    s.read.option("basePath", s"$root/corpus").parquet(s"$root/corpus/inc=*")
      .withColumn("inc", col("inc").cast("string"))

  /** The stored seen-signature index (idCol, band, sig, inc). */
  def index(s: SparkSession, root: String): DataFrame =
    s.read.option("basePath", s"$root/index").parquet(s"$root/index/inc=*")
      .withColumn("inc", col("inc").cast("string"))

  /** Drop all state under `root` (gate rows re-run from scratch). */
  def reset(s: SparkSession, root: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(root)
    val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) { fs.delete(p, true); () }
  }
}
