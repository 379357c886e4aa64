package graft.pipeline

import org.apache.hadoop.fs.{FileSystem, Path}
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
  * Persisted state under `root` (all parquet):
  *   - `corpus/`  admitted documents (original schema + `inc`), one
  *     `inc=<id>` subdir per increment so a re-run of the same
  *     increment OVERWRITES its own files — restart-idempotent by
  *     construction;
  *   - `index/`   LSH band signatures of every SEEN exact-survivor —
  *     including near-dup REJECTED docs ([[Dedup.lshIndex]] rows);
  *   - `digests/` content digests of every seen exact-survivor;
  *   - `index_base/g<N>`, `digests_base/g<N>` — COMPACTED base tables
  *     (see [[compact]]): the folded union of older increments,
  *     written as tables bucketed on their match keys;
  *   - `manifest/gen-<N>` — compaction manifests; the highest
  *     generation wins (each is written whole then renamed into
  *     place, so a reader never observes a partial manifest).
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
  *
  * Why [[compact]] exists: without it a daily loop run for years
  * accumulates one `inc=<id>` subdir per day in `index/` and
  * `digests/` — a listing/small-files problem — and every admission
  * re-shuffles the ever-growing seen state for its equi-joins.
  * Compaction folds the accumulated increments into ONE base table
  * per state kind, bucketed on the match key ((band, sig) for the
  * index, digest for the digests), so the seen side of every later
  * cross-match arrives pre-partitioned and plans WITHOUT an exchange
  * — only the day's increment shuffles. The reference's analogue is
  * its snapshot/merge recovery (server.erl:343-353): state that
  * survives without replaying everything.
  */
object Admission {

  private def indexSchema(idCol: String) = StructType(Seq(
    StructField(idCol, LongType), StructField("band", IntegerType),
    StructField("sig", StringType)))
  private val digestSchema = StructType(Seq(StructField("digest", StringType)))

  private def fsOf(s: SparkSession, path: String): FileSystem =
    new Path(path).getFileSystem(s.sparkContext.hadoopConfiguration)

  // ---------------------------------------------------------------------
  // Compaction manifest
  // ---------------------------------------------------------------------

  /** What a manifest generation records: which increment ids are
    * folded into the generation's base tables, and the bucket count /
    * id column the base tables were written with (needed to
    * re-register them in a fresh session's catalog). Generation 0 =
    * no compaction has ever run. */
  private[graft] final case class CompactionState(
      generation: Int, buckets: Int, idCol: String, folded: Set[String])

  private val EmptyState = CompactionState(0, 0, "doc_id", Set.empty)

  private def manifestDir(root: String) = s"$root/manifest"

  private val GenFile = "^gen-(\\d+)$".r

  /** Highest-generation manifest under `root`, or the empty state.
    * Manifests are immutable once renamed into place, so readers and
    * a concurrent [[compact]] never race on file contents — only on
    * WHICH generation is current, and any complete generation yields
    * a correct (if slightly stale) seen-state view. */
  private[graft] def readManifest(s: SparkSession, root: String): CompactionState = {
    val fs = fsOf(s, root)
    val dir = new Path(manifestDir(root))
    if (!fs.exists(dir)) return EmptyState
    val gens = fs.listStatus(dir).map(_.getPath.getName).collect {
      case GenFile(n) => n.toInt
    }
    if (gens.isEmpty) return EmptyState
    val gen = gens.max
    val in = fs.open(new Path(dir, s"gen-$gen"))
    val text =
      try scala.io.Source.fromInputStream(in, "UTF-8").mkString
      finally in.close()
    val kv = text.linesIterator.map(_.trim).filter(_.nonEmpty).toSeq
    def one(k: String): String = kv.collectFirst {
      case l if l.startsWith(s"$k=") => l.stripPrefix(s"$k=")
    }.getOrElse(sys.error(s"manifest gen-$gen missing '$k='"))
    CompactionState(gen, one("buckets").toInt, one("idcol"),
      kv.filter(_.startsWith("folded=")).map(_.stripPrefix("folded=")).toSet)
  }

  /** Write manifest generation `st.generation` whole-then-rename: the
    * rename is the commit point — a crash before it leaves the
    * previous generation current and the new base tables as harmless
    * orphans the next compaction overwrites. */
  private def writeManifest(s: SparkSession, root: String,
      st: CompactionState): Unit = {
    val fs = fsOf(s, root)
    val dir = new Path(manifestDir(root))
    fs.mkdirs(dir)
    val tmp = new Path(dir, s"gen-${st.generation}.tmp")
    val out = fs.create(tmp, true)
    try {
      val body = (Seq(s"buckets=${st.buckets}", s"idcol=${st.idCol}") ++
        st.folded.toSeq.sorted.map(f => s"folded=$f")).mkString("", "\n", "\n")
      out.write(body.getBytes("UTF-8"))
    } finally out.close()
    val dest = new Path(dir, s"gen-${st.generation}")
    if (fs.exists(dest)) fs.delete(dest, false) // re-run of a crashed compact
    if (!fs.rename(tmp, dest))
      sys.error(s"manifest commit failed: $tmp -> $dest")
  }

  /** Catalog table name for one base-table generation — deterministic
    * from (root, kind, gen) so any session can re-register it. */
  private def tableName(root: String, kind: String, gen: Int): String =
    s"graft_adm_${kind}_g${gen}_" +
      root.toLowerCase.replaceAll("[^a-z0-9]+", "_").dropWhile(_ == '_')

  private def basePath(root: String, kind: String, gen: Int): String =
    s"$root/${kind}_base/g$gen"

  /** Bucket/sort keys per state kind — the equi-join keys of the
    * admission cross-matches, so a scan of the base table satisfies
    * the join's required clustering with no exchange. */
  private def keysOf(kind: String): Seq[String] =
    if (kind == "index") Seq("band", "sig") else Seq("digest")

  private def ddlOf(kind: String, idCol: String): String =
    if (kind == "index") s"`$idCol` BIGINT, band INT, sig STRING, inc STRING"
    else "digest STRING, inc STRING"

  /** The base table of generation `gen`, re-registered in this
    * session's catalog if absent (base tables are self-describing
    * from the manifest — a fresh session re-creates the external
    * bucketed-table entry over the existing files). */
  private def baseTable(s: SparkSession, root: String, kind: String,
      st: CompactionState): DataFrame = {
    val name = tableName(root, kind, st.generation)
    if (!s.catalog.tableExists(name)) {
      val keys = keysOf(kind).mkString(", ")
      s.sql(s"CREATE TABLE $name (${ddlOf(kind, st.idCol)}) USING PARQUET " +
        s"CLUSTERED BY ($keys) SORTED BY ($keys) INTO ${st.buckets} BUCKETS " +
        s"LOCATION '${basePath(root, kind, st.generation)}'")
    }
    s.table(name)
  }

  /** Increment ids currently present as `inc=<id>` subdirs of
    * `$root/$kind`. */
  private def listIncs(s: SparkSession, root: String, kind: String): Seq[String] = {
    val p = new Path(s"$root/$kind")
    val fs = fsOf(s, root)
    if (!fs.exists(p)) Seq.empty
    else fs.listStatus(p).filter(_.isDirectory).map(_.getPath.getName)
      .filter(_.startsWith("inc=")).map(_.stripPrefix("inc=")).toSeq
  }

  /** [[listIncs]] restricted to dirs carrying the `_SUCCESS` job
    * commit marker — the only increments [[compact]] may fold. */
  private def committedIncs(s: SparkSession, root: String,
      kind: String): Seq[String] = {
    val fs = fsOf(s, root)
    listIncs(s, root, kind)
      .filter(id => fs.exists(new Path(s"$root/$kind/inc=$id/_SUCCESS")))
  }

  /** Seen-state reader: compacted base (if any) ∪ the increments not
    * yet folded. Exclusions, both crash-recovery stories:
    *  - the CURRENT increment's own subdir AND its own base rows
    *    (`inc` travels into the base exactly so this filter survives
    *    compaction): a crashed-and-rerun increment must not see its
    *    previous partial run as "already seen" — it would admit
    *    nothing and overwrite its output with an empty set. The
    *    streaming loop replays a batch under the same id, possibly
    *    AFTER a compaction folded that batch — still idempotent.
    *  - increments the manifest lists as folded, even if their
    *    subdirs still exist on disk (a crash between manifest commit
    *    and cleanup leaves debris; counting it twice is harmless for
    *    semi/anti semantics but the exclusion keeps reads bounded and
    *    lets [[compact]] delete the debris later).
    * When the state is FULLY compacted the returned frame is exactly
    * the bucketed base scan — later equi-joins on the match keys plan
    * with no exchange on this side ([[AdmissionCompactSpec]]). */
  private[graft] def readSeen(s: SparkSession, root: String, kind: String,
      idCol: String, selfInc: String): DataFrame = {
    val schema = if (kind == "index") indexSchema(idCol) else digestSchema
    val st = readManifest(s, root)
    val base =
      if (st.generation == 0) None
      else Some(baseTable(s, root, kind, st)
        .filter(col("inc") =!= lit(selfInc))
        .select(schema.fieldNames.map(col).toIndexedSeq: _*))
    val dirs = listIncs(s, root, kind)
      .filterNot(st.folded).filterNot(_ == selfInc)
      .map(id => s"$root/$kind/inc=$id")
    val incs =
      if (dirs.isEmpty) None
      else Some(s.read.schema(schema).parquet(dirs: _*))
    ((base, incs) match {
      case (Some(b), Some(i)) => Some(b.unionByName(i))
      case (b, i) => b.orElse(i)
    }).getOrElse(s.createDataFrame(s.sparkContext.emptyRDD[Row], schema))
  }

  /** Fold every un-folded `index/inc=*` and `digests/inc=*` increment
    * into ONE bucketed base table per state kind and commit a new
    * manifest generation. Afterwards [[readSeen]] serves the base
    * scan (pre-partitioned on the match keys — the admission joins
    * plan exchange-free on this side) instead of listing and
    * re-shuffling an unbounded directory set, and the folded subdirs
    * plus the previous generation's tables are deleted.
    *
    * Crash safety (spec-pinned by `AdmissionCompactSpec`):
    *  - before the manifest rename commits, nothing observable
    *    changed — new base files are orphans the next run overwrites;
    *  - after the commit, folded subdirs are already excluded by the
    *    manifest, so the cleanup phase is pure garbage collection; a
    *    crash inside it leaves debris the next [[compact]] removes;
    *  - a replayed increment that was ALREADY folded stays idempotent
    *    because its rows carry `inc` into the base and [[readSeen]]
    *    filters them out for that increment.
    * No-op (returns false) when nothing is un-folded — safe to call
    * every N batches from the streaming loop. `cleanup = false` is
    * the spec's crash-injection hook: commit the manifest, skip the
    * garbage collection. */
  def compact(s: SparkSession, root: String, idCol: String = "doc_id",
      buckets: Int = 8, cleanup: Boolean = true): Boolean = {
    val st = readManifest(s, root)
    // Fold only increments COMMITTED in BOTH state kinds. [[admit]]
    // writes corpus → index → digests, so an increment missing or
    // uncommitted in either kind is a crashed partial admit awaiting
    // replay — marking it folded would exclude its REPLAYED rows
    // forever (and garbage-collect them), silently losing dedup
    // state. "Committed" means the dir carries the _SUCCESS job
    // marker, not mere existence: the output committer creates the
    // directory at job SETUP, so a crash mid-write leaves an
    // existing-but-empty dir that bare listing cannot tell apart from
    // a legitimately empty increment. A healthy admit always commits
    // both dirs (an empty increment still writes empty parquet +
    // _SUCCESS); partial increments stay unfolded until replayed.
    val idxIncs = committedIncs(s, root, "index").toSet
    val unfolded = committedIncs(s, root, "digests")
      .filter(idxIncs).filterNot(st.folded)
    if (unfolded.isEmpty) {
      if (cleanup) collectGarbage(s, root, st)
      return false
    }
    val gen = st.generation + 1
    for (kind <- Seq("index", "digests")) {
      val schema = if (kind == "index") indexSchema(idCol) else digestSchema
      val withInc = StructType(schema.fields :+ StructField("inc", StringType))
      val dirs = listIncs(s, root, kind).filter(unfolded.contains)
        .map(id => s"$root/$kind/inc=$id")
      val incRows =
        if (dirs.isEmpty)
          s.createDataFrame(s.sparkContext.emptyRDD[Row], withInc)
        else s.read.option("basePath", s"$root/$kind").schema(withInc)
          .parquet(dirs: _*)
          .withColumn("inc", col("inc").cast("string"))
          .select(withInc.fieldNames.map(col).toIndexedSeq: _*)
      val all =
        if (st.generation == 0) incRows
        else baseTable(s, root, kind, st).unionByName(incRows)
      val keys = keysOf(kind)
      all.write.mode("overwrite")
        .option("path", basePath(root, kind, gen))
        .bucketBy(buckets, keys.head, keys.tail: _*)
        .sortBy(keys.head, keys.tail: _*)
        .format("parquet")
        .saveAsTable(tableName(root, kind, gen))
    }
    // COMMIT: once this rename lands, the new generation is current.
    writeManifest(s, root,
      CompactionState(gen, buckets, idCol, st.folded ++ unfolded))
    if (cleanup) collectGarbage(s, root, readManifest(s, root))
    true
  }

  /** Garbage collection after a committed compaction: folded `inc=`
    * subdirs (per the CURRENT manifest) and base generations below
    * the current one. Pure cleanup — everything deleted here is
    * already excluded from every read path. */
  private def collectGarbage(s: SparkSession, root: String,
      st: CompactionState): Unit = {
    if (st.generation == 0) return
    val fs = fsOf(s, root)
    for (kind <- Seq("index", "digests")) {
      for (id <- listIncs(s, root, kind) if st.folded(id))
        fs.delete(new Path(s"$root/$kind/inc=$id"), true)
      for (g <- 1 until st.generation) {
        val name = tableName(root, kind, g)
        if (s.catalog.tableExists(name)) s.sql(s"DROP TABLE $name")
        fs.delete(new Path(basePath(root, kind, g)), true)
      }
    }
  }

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

  /** Admit one increment against (and into) the state under `root`.
    * Returns the admitted rows as durably written. Re-running the same
    * `incId` is idempotent (even after a [[compact]] folded it);
    * `incId`s must be distinct per increment and doc ids must ascend
    * across increments for the one-shot parity. */
  def admit(newDocs: DataFrame, root: String, incId: String,
      idCol: String = "doc_id", textCol: String = "text",
      shingleN: Int = 3, k: Int = 8, rowsPerBand: Int = 2): DataFrame = {
    val s = newDocs.sparkSession
    val seenIndex = readSeen(s, root, "index", idCol, incId)
    val seenDigests = readSeen(s, root, "digests", idCol, incId)
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
    * lexicographic `inc=` ordering equals arrival order.
    *
    * `compactEvery = n` runs [[compact]] after every n-th batch, the
    * retention story that keeps a long-running stream's state-listing
    * bounded. The compaction is itself crash-safe (manifest commit
    * point) and a batch replayed across a compaction boundary stays
    * exactly-once because its folded rows still carry `inc` — pinned
    * by `AdmissionCompactSpec`. */
  def admitStream(docs: DataFrame, root: String, checkpoint: String,
      idCol: String = "doc_id", textCol: String = "text",
      cfg: Option[Curation.Config] = Some(Curation.Config()),
      compactEvery: Int = 0)
      : org.apache.spark.sql.streaming.StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpoint)
      .outputMode("append")
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[Row], batchId: Long) =>
        val kept = cfg.fold(batch.toDF())(c =>
          Curation.qualityLangFilter(batch.toDF(), c))
        admit(kept, root, f"b$batchId%09d", idCol, textCol)
        if (compactEvery > 0 && (batchId + 1) % compactEvery == 0)
          compact(batch.sparkSession, root, idCol)
        ()
      }
      .start()

  /** All admitted documents (original columns + `inc`, cast to string —
    * partition-value inference would otherwise strip a numeric id's
    * leading zeros). */
  def corpus(s: SparkSession, root: String): DataFrame =
    s.read.option("basePath", s"$root/corpus").parquet(s"$root/corpus/inc=*")
      .withColumn("inc", col("inc").cast("string"))

  /** The stored seen-signature index (idCol, band, sig, inc) —
    * compacted base rows plus the not-yet-folded increments. */
  def index(s: SparkSession, root: String): DataFrame = {
    val st = readManifest(s, root)
    val base =
      if (st.generation == 0) None else Some(baseTable(s, root, "index", st))
    val dirs = listIncs(s, root, "index").filterNot(st.folded)
      .map(id => s"$root/index/inc=$id")
    val incs =
      if (dirs.isEmpty) None
      else Some(s.read.option("basePath", s"$root/index").parquet(dirs: _*)
        .withColumn("inc", col("inc").cast("string")))
    (base, incs) match {
      case (Some(b), Some(i)) => b.unionByName(i.select(b.columns.map(col).toIndexedSeq: _*))
      case (Some(b), None) => b
      case (None, Some(i)) => i
      case (None, None) =>
        s.createDataFrame(s.sparkContext.emptyRDD[Row], StructType(
          indexSchema("doc_id").fields :+ StructField("inc", StringType)))
    }
  }

  /** Drop all state under `root` (gate rows re-run from scratch),
    * including any base-table catalog entries of the current
    * manifest's generation (their data dirs live under `root`). */
  def reset(s: SparkSession, root: String): Unit = {
    val st = readManifest(s, root)
    if (st.generation > 0)
      for (kind <- Seq("index", "digests"); g <- 1 to st.generation) {
        val name = tableName(root, kind, g)
        if (s.catalog.tableExists(name)) s.sql(s"DROP TABLE $name")
      }
    val p = new Path(root)
    val fs = fsOf(s, root)
    if (fs.exists(p)) { fs.delete(p, true); () }
  }
}
