package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Q
import graft.pipeline.Curation
import graft.sources.Tables

/** The composed curation pipeline as a gate row ([[graft.pipeline
  * .Curation]]): every stage is individually oracle-checked elsewhere
  * in the catalog; THIS row hash-checks their composition — the schema
  * handoffs, cross-stage determinism and final ordering of the chain a
  * training-data user actually ships. The DuckDB oracle is the same
  * eight stages as one recursive-CTE chain (the connected-components
  * stage is a transitive-closure CTE, as in `q_dedup_clusters`).
  *
  * At sf0.01 the chain exercises every stage non-trivially: 500 docs →
  * exact dedup 500 (corpus plants no exact dups at this SF) → near-dedup
  * drops 24 cluster losers → train split → decontamination drops 26
  * fingerprint-overlap docs → 348 → quality/lang keeps 310 → mixture
  * keeps 43 → 61 packed chunk rows.
  */
object PipelineQueries {

  private def pipelineE2e(s: SparkSession, d: String): DataFrame =
    Curation.run(Tables.documents(s, d))
      .orderBy("source", "bin", "doc_id", "chunk_id")

  private val wordHash =
    (1 to 8).map(j => s"ascii(substr(md5(x), $j, 1)) * $j").mkString(" + ")

  private val pipelineSql =
    "WITH RECURSIVE " +
    // stage 1: exact dedup (smallest id per content digest)
    "d0 AS (SELECT min(doc_id) AS doc_id FROM documents GROUP BY md5(text)), " +
    "s1 AS (SELECT d.* FROM documents d JOIN d0 USING (doc_id)), " +
    // stage 2: near-dup pair graph over s1 (J >= 0.8, df-ceiling 200)
    "w1 AS (SELECT doc_id, regexp_extract_all(text, '\\S+') AS w FROM s1), " +
    "sh AS (SELECT DISTINCT doc_id, shingle FROM " +
    "(SELECT doc_id, unnest(list_transform(range(1, len(w)-1), " +
    "i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS shingle " +
    "FROM w1 WHERE len(w) >= 3) q), " +
    // engine-portable 48-bit shingle hash: identical to the Spark side
    // (Curation.nearDedupClusters), so longs shuffle in the engine and
    // any collision perturbs both engines the same way
    "shh AS (SELECT doc_id, CAST('0x' || substr(md5(shingle), 1, 12) AS BIGINT) AS shingle FROM sh), " +
    "sizes AS (SELECT doc_id, count(*) AS sz FROM shh GROUP BY doc_id), " +
    "kept AS (SELECT shingle FROM shh GROUP BY shingle HAVING count(*) <= 200), " +
    "ov AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_common " +
    "FROM shh a JOIN shh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id " +
    "JOIN kept ON a.shingle = kept.shingle GROUP BY 1, 2), " +
    "pr AS (SELECT doc_a, doc_b FROM ov JOIN sizes sa ON doc_a = sa.doc_id " +
    "JOIN sizes sb ON doc_b = sb.doc_id " +
    "WHERE n_common / (sa.sz + sb.sz - n_common) >= 0.8), " +
    // connected components as a transitive closure; min label per vertex
    "e AS (SELECT doc_a AS v, doc_b AS u FROM pr UNION SELECT doc_b, doc_a FROM pr " +
    "UNION SELECT doc_a, doc_a FROM pr UNION SELECT doc_b, doc_b FROM pr), " +
    "r AS (SELECT v, u FROM e UNION SELECT r.v, e.u FROM r JOIN e ON r.u = e.v), " +
    "comp AS (SELECT v AS vertex, min(u) AS component FROM r GROUP BY v), " +
    "losers AS (SELECT vertex AS doc_id FROM comp WHERE vertex <> component), " +
    "s2 AS (SELECT * FROM s1 WHERE doc_id NOT IN (SELECT doc_id FROM losers)), " +
    // stage 3: deterministic 80/10/10 split
    "sp AS (SELECT *, CASE WHEN b < 80 THEN 'train' WHEN b < 90 THEN 'val' " +
    "ELSE 'test' END AS split FROM (SELECT *, " +
    "CAST(CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4) AS INT) % 100 AS INT) AS b " +
    "FROM s2) t), " +
    // stage 4: winnowing-fingerprint cross-split decontamination
    "w2 AS (SELECT doc_id, regexp_extract_all(text, '\\S+') AS w FROM sp), " +
    s"u2 AS (SELECT doc_id, list_transform(w, x -> CAST($wordHash AS BIGINT)) AS us " +
    "FROM w2 WHERE len(w) >= 4), " +
    "h2 AS (SELECT doc_id, list_transform(range(1, len(us) - 2), " +
    "i -> us[i] * 2248091 + us[i+1] * 17161 + us[i+2] * 131 + us[i+3]) AS whs FROM u2), " +
    "f2 AS (SELECT doc_id, unnest(list_distinct(list_transform(" +
    "range(1, greatest(len(whs) - 3, 1) + 1), i -> list_min(whs[i:i+3])))) AS fp FROM h2), " +
    "tfp AS (SELECT DISTINCT fp FROM f2 JOIN sp USING (doc_id) WHERE split = 'test'), " +
    "contam AS (SELECT DISTINCT f2.doc_id FROM f2 JOIN sp USING (doc_id) " +
    "WHERE split = 'train' AND fp IN (SELECT fp FROM tfp)), " +
    "tr AS (SELECT * FROM sp WHERE split = 'train' " +
    "AND doc_id NOT IN (SELECT doc_id FROM contam)), " +
    // stage 5: quality + language filter (same classifier as q_lang_id)
    "ql AS (SELECT *, " +
    "CAST(len(regexp_extract_all(text, '\\S+')) AS INT) AS n_words, " +
    "length(regexp_replace(text, '[a-z0-9\\s]', '', 'g')) / length(text) AS punct_ratio, " +
    "CAST(len(list_filter(regexp_extract_all(text, '\\S+'), x -> x IN ('the','a','of','and'))) AS INT) AS s_en, " +
    "CAST(len(list_filter(regexp_extract_all(text, '\\S+'), x -> x IN ('el','los','de','que'))) AS INT) AS s_es, " +
    "CAST(len(list_filter(regexp_extract_all(text, '\\S+'), x -> x IN ('der','die','und','das'))) AS INT) AS s_de, " +
    "CAST(len(list_filter(regexp_extract_all(text, '\\S+'), x -> x IN ('le','et','les','une'))) AS INT) AS s_fr " +
    "FROM tr), " +
    "qf AS (SELECT * FROM (SELECT *, greatest(s_en, s_es, s_de, s_fr) AS best FROM ql) g " +
    "WHERE NOT regexp_matches(text, '[\\x{4E00}-\\x{9FFF}]') AND best > 0 " +
    "AND CASE WHEN s_en = best THEN 'en' WHEN s_es = best THEN 'es' " +
    "WHEN s_de = best THEN 'de' WHEN s_fr = best THEN 'fr' ELSE 'unknown' END = 'en' " +
    "AND n_words >= 10 AND punct_ratio <= 0.3), " +
    // stage 6: deterministic weighted mixture sampling
    "mx AS (SELECT * FROM (SELECT *, " +
    "CAST(CAST('0x' || substr(md5('mix|' || CAST(doc_id AS VARCHAR)), 1, 4) AS INT) % 100 AS INT) AS mbucket, " +
    "CASE WHEN source IN ('src0', 'src1') THEN 50 WHEN source = 'src2' THEN 25 " +
    "ELSE 10 END AS rate_pct FROM qf) t WHERE mbucket < rate_pct), " +
    // stage 7: context-window chunking (64 tokens, stride 48)
    "ck AS (SELECT doc_id, source, CAST(chunk_id AS INT) AS chunk_id, " +
    "CAST(len(list_slice(w, chunk_id * 48 + 1, chunk_id * 48 + 64)) AS INT) AS n_tokens, " +
    "md5(array_to_string(list_slice(w, chunk_id * 48 + 1, chunk_id * 48 + 64), ' ')) AS chunk_md5 " +
    "FROM (SELECT doc_id, source, regexp_extract_all(text, '\\S+') AS w, " +
    "unnest(range(0, greatest(CAST(ceil((len(regexp_extract_all(text, '\\S+')) - 64) / 48.0) AS INT), 0) + 1)) AS chunk_id " +
    "FROM mx WHERE len(regexp_extract_all(text, '\\S+')) >= 1) c), " +
    // stage 8: greedy sequence packing into 2048-token bins per source
    "pk AS (SELECT *, CAST((cum - n_tokens) // 2048 AS INT) AS bin FROM " +
    "(SELECT *, sum(n_tokens) OVER (PARTITION BY source " +
    "ORDER BY doc_id, chunk_id ROWS UNBOUNDED PRECEDING) AS cum FROM ck) t) " +
    "SELECT source, bin, doc_id, chunk_id, n_tokens, chunk_md5 " +
    "FROM pk ORDER BY source, bin, doc_id, chunk_id"

  /** Sink location for the roundtrip gate row: the oracle SQL is a
    * static string, so the ROOT must be one both engines know; the
    * per-scale SUBDIR (the sf directory's basename) keeps concurrent
    * runs at different scales from clobbering each other between the
    * Spark write and the driver's DuckDB read (a bench extras pass at
    * sf0.1 racing a Verify gate at sf0.01 previously shared one
    * directory). The oracle is pinned to the driver's gate scale. */
  val sinkRoot = "/tmp/graft_pipeline_sink"

  /** `root/<basename of the sf dir>` — the one place the per-scale
    * subdir is derived, shared by every sink that uses the scheme. */
  private def scaleName(sfDir: String): String =
    new java.io.File(sfDir).getName
  private def scalePath(root: String, sfDir: String): String =
    s"$root/${scaleName(sfDir)}"

  def sinkPath(sfDir: String): String = scalePath(sinkRoot, sfDir)

  /** The driver runs the correctness gate at sf0.01 (TESTDATA.md /
    * driver contract) — the static oracle SQL reads that scale's
    * subdir. A gate run at any OTHER scale cannot silently compare
    * against stale sf0.01 files: every written row carries a
    * `sink_scale` stamp that both sides select, so a scale/oracle
    * mismatch hash-fails loudly (and an empty sink dir is a DuckDB
    * read error, equally loud). */
  private val gateSinkPath = s"$sinkRoot/sf0.01"

  /** Write → read-back roundtrip of the pipeline egress
    * ([[Curation.write]]): runs the full chain, ships it as the
    * partitioned parquet table a training job consumes, and returns
    * the READ-BACK rows. The DuckDB oracle reads the SAME files
    * (`read_parquet`, hive partitioning), so a green row proves the
    * shipped files are complete, losslessly typed and readable by a
    * foreign engine — content correctness of the chain itself is
    * `q_pipeline_e2e`'s independent recursive-CTE oracle. */
  private def pipelineSink(s: SparkSession, d: String): DataFrame = {
    val dest = sinkPath(d)
    val scale = scaleName(d)
    Curation.write(
      Curation.run(Tables.documents(s, d))
        .withColumn("sink_scale", org.apache.spark.sql.functions.lit(scale)),
      dest)
    s.read.parquet(dest)
      .select("source", "bin", "doc_id", "chunk_id", "n_tokens",
        "chunk_md5", "sink_scale")
      .orderBy("source", "bin", "doc_id", "chunk_id")
  }

  private val pipelineSinkSql =
    "SELECT source, bin, doc_id, chunk_id, n_tokens, chunk_md5, sink_scale " +
    s"FROM read_parquet('$gateSinkPath/*/*.parquet', hive_partitioning=true) " +
    "ORDER BY source, bin, doc_id, chunk_id"

  /** Corpus snapshot diff — the maintenance operator an incremental
    * pipeline runs between two crawl snapshots: classify every doc_id
    * as added / removed / changed (content digest moved) and emit the
    * non-unchanged rows. Two snapshots are simulated from the fixture
    * (old = ids ∉ 11ℤ; new = ids ∉ 13ℤ, with ids ∈ 17ℤ rewritten).
    *
    * Scale shape: each side reduces to (doc_id, digest) in its scan
    * stage — raw text never crosses the exchange — and the full-outer
    * join co-partitions both 24-byte-row sides on doc_id, the join key
    * a snapshot store would already be bucketed on (zero shuffle
    * there). Output is bounded by the churn, not the corpus. */
  private def snapshotDiff(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    val a = docs.filter(col("doc_id") % 11 =!= 0)
      .select(col("doc_id"), md5(col("text")).as("h_old"))
    val b = docs.filter(col("doc_id") % 13 =!= 0)
      .select(col("doc_id"), md5(
        when(col("doc_id") % 17 === 0, concat(col("text"), lit(" v2")))
          .otherwise(col("text"))).as("h_new"))
    a.join(b, Seq("doc_id"), "full_outer")
      .withColumn("status",
        when(col("h_old").isNull, lit("added"))
          .when(col("h_new").isNull, lit("removed"))
          .when(col("h_old") =!= col("h_new"), lit("changed"))
          .otherwise(lit("unchanged")))
      .filter(col("status") =!= "unchanged")
      .select("doc_id", "status")
      .orderBy("doc_id")
  }

  /** Sink root for the JSONL roundtrip row — same per-scale-subdir
    * scheme as [[sinkPath]] (see its scale-race rationale). */
  val jsonlRoot = "/tmp/graft_jsonl_sink"
  private def jsonlPath(sfDir: String): String = scalePath(jsonlRoot, sfDir)
  private val gateJsonlPath = s"$jsonlRoot/sf0.01"

  /** JSONL egress/ingress roundtrip — the interchange format every
    * crawl pipeline speaks: ship the documents table as
    * newline-delimited JSON, read it back through an EXPLICIT schema
    * (no inference scan), and hash the text through the roundtrip.
    * The DuckDB oracle parses the SAME files, so a green row proves
    * Spark's JSON escaping of arbitrary document text is lossless and
    * foreign-engine-readable — the failure mode this guards (quote /
    * control-char / unicode escaping drift) is invisible to a
    * parquet-only test. Scale note: the write keeps the scan's
    * natural partitioning (many part files; the oracle globs), and
    * every row carries a `sink_scale` stamp so a gate run at another
    * scale hash-fails loudly instead of reading stale files. */
  private def jsonlRoundtrip(s: SparkSession, d: String): DataFrame = {
    val dest = jsonlPath(d)
    val scale = scaleName(d)
    val docs = Tables.documents(s, d)
    docs.withColumn("sink_scale", lit(scale))
      .write.mode("overwrite").json(dest)
    val schema = org.apache.spark.sql.types.StructType(
      docs.schema.fields :+ org.apache.spark.sql.types.StructField(
        "sink_scale", org.apache.spark.sql.types.StringType))
    s.read.schema(schema).json(dest)
      .select(col("doc_id"), col("lang"), col("source"), col("n_chars"),
        md5(col("text")).as("text_md5"), col("sink_scale"))
      .orderBy("doc_id")
  }

  /** Sink root for the CSV roundtrip row — same per-scale-subdir
    * scheme as [[sinkPath]]. */
  val csvRoot = "/tmp/graft_csv_sink"
  private def csvPath(sfDir: String): String = scalePath(csvRoot, sfDir)
  private val gateCsvPath = s"$csvRoot/sf0.01"

  /** CSV egress/ingress roundtrip — the third interchange format
    * (after parquet and JSONL): ship the documents table as
    * RFC 4180 CSV, read it back through an explicit schema, hash the
    * text through the roundtrip, and have DuckDB parse the SAME
    * files. The fixture text contains no quote/comma/newline (probed),
    * so the write deliberately APPENDS a `, "csv" edge` suffix to
    * every document — otherwise the row would never exercise the
    * quoting/escaping path it exists to guard. Spark is pinned to
    * RFC 4180 doubling (`escape` = `"`; its default backslash escape
    * is a dialect DuckDB's reader does not speak). Embedded newlines
    * are excluded by construction and out of scope: reading them
    * needs `multiLine=true`, which makes CSV files unsplittable — at
    * 100 TB newline-bearing text belongs in parquet/JSONL
    * (`q_jsonl_roundtrip`), not CSV. Every row carries the
    * `sink_scale` stamp (same scale-race guard as the other sinks). */
  private def csvRoundtrip(s: SparkSession, d: String): DataFrame = {
    val dest = csvPath(d)
    val scale = scaleName(d)
    val docs = Tables.documents(s, d)
    docs.select(col("doc_id"),
        concat(col("text"), lit(", \"csv\" edge")).as("text"),
        col("lang"), col("source"), col("n_chars"),
        lit(scale).as("sink_scale"))
      .write.mode("overwrite")
      .option("header", "true").option("escape", "\"")
      .csv(dest)
    s.read
      .schema("doc_id BIGINT, text STRING, lang STRING, source STRING, " +
        "n_chars BIGINT, sink_scale STRING")
      .option("header", "true").option("escape", "\"")
      .csv(dest)
      .select(col("doc_id"), col("lang"), col("source"), col("n_chars"),
        md5(col("text")).as("text_md5"), col("sink_scale"))
      .orderBy("doc_id")
  }

  /** Sink root for the ORC roundtrip row — same per-scale-subdir
    * scheme as [[sinkPath]]. */
  val orcRoot = "/tmp/graft_orc_sink"
  private def orcPath(sfDir: String): String = scalePath(orcRoot, sfDir)

  /** ORC egress/ingress roundtrip — the fourth interchange format
    * (after parquet, JSONL, CSV): ship the documents table through
    * Spark's built-in columnar ORC datasource and hash the text
    * through the roundtrip. Unlike the JSONL/CSV rows, DuckDB has no
    * ORC reader, so the oracle is the SOURCE parquet (roundtrip
    * identity): a green row proves the ORC write/read is lossless and
    * schema-faithful on Spark's side — it cannot prove
    * foreign-engine readability, which stays the job of the
    * JSONL/CSV/parquet rows (scaladoc'd asymmetry, not an oversight).
    * The read goes through an explicit schema (no inference scan) and
    * every row carries the `sink_scale` stamp — same stale-file race
    * guard as the other sinks. */
  private def orcRoundtrip(s: SparkSession, d: String): DataFrame = {
    val dest = orcPath(d)
    val scale = scaleName(d)
    val docs = Tables.documents(s, d)
    docs.withColumn("sink_scale", lit(scale))
      .write.mode("overwrite").orc(dest)
    val schema = org.apache.spark.sql.types.StructType(
      docs.schema.fields :+ org.apache.spark.sql.types.StructField(
        "sink_scale", org.apache.spark.sql.types.StringType))
    s.read.schema(schema).orc(dest)
      .select(col("doc_id"), col("lang"), col("source"), col("n_chars"),
        md5(col("text")).as("text_md5"), col("sink_scale"))
      .orderBy("doc_id")
  }

  /** Sink root for the schema-evolution row — per-scale subdirs as
    * [[sinkPath]]. */
  val evoRoot = "/tmp/graft_evo_sink"
  private def evoPath(sfDir: String): String = scalePath(evoRoot, sfDir)
  private val gateEvoPath = s"$evoRoot/sf0.01"

  /** Schema evolution across store generations — the crawl-store
    * reality: generation 1 of the corpus was written WITHOUT a column
    * that generation 2 adds (here a `quality` score and a `pipeline`
    * tag). The read must union both generations by NAME, fill the
    * missing column with NULL for old rows, and keep projection
    * pushdown working across the mixed footers. Spark side:
    * `mergeSchema` parquet read over both generation dirs; oracle:
    * DuckDB `read_parquet(..., union_by_name=true)` over the SAME
    * files — a green row proves the evolved layout is readable and
    * NULL-semantics-identical from a foreign engine. Generations
    * split by id parity; `quality` is a deterministic integer-derived
    * double so the hash is stable. */
  private def schemaEvolution(s: SparkSession, d: String): DataFrame = {
    val dest = evoPath(d)
    val scale = scaleName(d)
    val docs = Tables.documents(s, d)
    docs.filter(col("doc_id") % 2 === 0)
      .select(col("doc_id"), col("source"), col("n_chars"),
        lit(scale).as("sink_scale"))
      .write.mode("overwrite").parquet(s"$dest/gen=1")
    docs.filter(col("doc_id") % 2 === 1)
      .select(col("doc_id"), col("source"), col("n_chars"),
        lit(scale).as("sink_scale"),
        round(col("n_chars") / lit(100.0), 4).as("quality"),
        lit("v2").as("pipeline"))
      .write.mode("overwrite").parquet(s"$dest/gen=2")
    s.read.option("mergeSchema", "true")
      .parquet(s"$dest/gen=1", s"$dest/gen=2")
      .select(col("doc_id"), col("source"), col("n_chars"),
        col("sink_scale"), col("quality"), col("pipeline"))
      .orderBy("doc_id")
  }

  /** MERGE / upsert application — the write-side twin of
    * [[snapshotDiff]]: apply a changeset (upserts that win over the
    * base, plus deletes) to a base snapshot, Delta-MERGE semantics
    * expressed as one digest-only full-outer join on doc_id plus a
    * broadcast-scale anti-join for the deletes. Base = ids ∉ 11ℤ;
    * upserts = ids ∈ 13ℤ (content rewritten); deletes = ids ∈ 19ℤ.
    * Raw text never crosses an exchange; at 100 TB both sides arrive
    * bucketed on doc_id and the merge is exchange-free. */
  private def mergeApply(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    val base = docs.filter(col("doc_id") % 11 =!= 0)
      .select(col("doc_id"), md5(col("text")).as("h_base"))
    val upserts = docs.filter(col("doc_id") % 13 === 0)
      .select(col("doc_id"), md5(concat(col("text"), lit(" v2"))).as("h_up"))
    val deletes = docs.filter(col("doc_id") % 19 === 0).select("doc_id")
    base.join(upserts, Seq("doc_id"), "full_outer")
      .select(col("doc_id"), coalesce(col("h_up"), col("h_base")).as("digest"))
      .join(deletes, Seq("doc_id"), "left_anti")
      .orderBy("doc_id")
  }

  /** SCD Type-2 dimension build (Kimball's slowly-changing-dimension
    * history table) from the orders changelog: each customer's order
    * stream becomes versioned validity intervals — valid_from =
    * this change's date, valid_to = the NEXT change's date (open
    * '9999-12-31' sentinel on the current version), version = change
    * ordinal, is_current on the last row. One lead()/row_number()
    * window partitioned by the dimension key — at 100 TB every key
    * versions independently (no global sort), and the changelog
    * arrives date-sorted within key from the shuffle sort, which is
    * exactly the SCD2 merge a warehouse runs daily. Ties on
    * (date) are broken by o_orderkey so the versioning is total. */
  private def scd2Build(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byKey = Window.partitionBy("o_custkey")
      .orderBy(col("o_orderdate"), col("o_orderkey"))
    val fmtD = (c: org.apache.spark.sql.Column) =>
      date_format(c, "yyyy-MM-dd HH:mm:ss")
    Tables.orders(s, d)
      .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"),
        col("o_orderpriority"))
      .withColumn("version", row_number().over(byKey))
      .withColumn("next_date", lead("o_orderdate", 1).over(byKey))
      .select(
        col("o_custkey"), col("version").cast("int").as("version"),
        col("o_orderpriority").as("attr"),
        fmtD(col("o_orderdate")).as("valid_from"),
        coalesce(fmtD(col("next_date")), lit("9999-12-31 00:00:00")).as("valid_to"),
        col("next_date").isNull.as("is_current"))
      .orderBy("o_custkey", "version")
  }

  /** Point-in-time (temporal) join against the SCD2 dimension built by
    * [[scd2Build]]: classify every lineitem by its customer's
    * order-priority version valid AT ship time vs the priority on its
    * own order — the "which dimension version was true when the fact
    * happened" join every warehouse backfill needs (and the one that
    * silently goes wrong when joined to the CURRENT version instead).
    * LEFT semantics: ~9% of items ship before the customer's first
    * version exists (the fixture's ship dates are not causally ordered
    * after order dates) and land in a NULL prio_at_ship bucket, so the
    * output partitions the full fact table — n_items sums to
    * count(lineitem). Plan: the version table joins on the EQUI key
    * (custkey) with the interval predicate as a residual filter —
    * per-key version counts are bounded (~10), so the fanout is a
    * constant, not a range-join blowup; at larger version histories
    * the binned range-join pattern of `q_range_join_binned` applies.
    * Versions come from one per-key lead() window (scd2Build's shape). */
  private def pitJoin(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byKey = Window.partitionBy("o_custkey")
      .orderBy(col("o_orderdate"), col("o_orderkey"))
    val scd = Tables.orders(s, d)
      .select(col("o_custkey"), col("o_orderkey"),
        col("o_orderdate"), col("o_orderpriority"))
      .withColumn("vt", lead("o_orderdate", 1).over(byKey))
      .select(col("o_custkey").as("c"), col("o_orderdate").as("vf"),
        col("vt"), col("o_orderpriority").as("pship"))
    val li = Tables.lineitem(s, d)
      .select(col("l_orderkey"), col("l_shipdate"))
      .join(Tables.orders(s, d).select(col("o_orderkey").as("l_orderkey"),
        col("o_custkey"), col("o_orderpriority").as("prio_at_order")),
        "l_orderkey")
    li.join(scd,
        col("o_custkey") === col("c") && col("l_shipdate") >= col("vf") &&
          (col("vt").isNull || col("l_shipdate") < col("vt")), "left")
      .groupBy(col("prio_at_order"), col("pship").as("prio_at_ship"))
      .agg(count(lit(1)).as("n_items"))
      .orderBy(col("prio_at_order"), col("prio_at_ship").asc_nulls_first)
  }

  /** Partitioned-layout write + partition-pruned read — THE scan-cost
    * lever at 100 TB: a date-partitioned table turns a "read the
    * month" query into a listing of one directory instead of a scan
    * of all of them. The gate row writes events Hive-partitioned by
    * event date, reads back with an equality filter on the partition
    * column, and aggregates — the filter is satisfied by directory
    * PRUNING (PartitionFilters in the scan, no data files of other
    * days opened; pinned in `PipelineSinkSpec`), never by row-level
    * evaluation. The oracle recomputes from the ORIGINAL events
    * table, so the green row proves the partitioned roundtrip is
    * lossless AND the pruned read is complete for the selected day. */
  val pruneRoot = "/tmp/graft_part_prune"

  /** Unlike the roundtrip sinks (whose oracle SQL must read the same
    * static path), the prune oracle recomputes from the ORIGINAL
    * events table — so this destination can and does carry a per-run
    * unique suffix (the Spark application id). Two concurrent runs
    * (bench racing verify, parallel sbt invocations) write disjoint
    * directories instead of interleaving `mode(overwrite)` on one
    * (round-11 advice); a same-JVM reader (the gate row, the spec's
    * plan pin) derives the identical path from its session. */
  def prunePath(s: SparkSession, sfDir: String): String =
    s"${scalePath(pruneRoot, sfDir)}/${s.sparkContext.applicationId}"

  /** The pruned day's aggregate, shared by the gate row (post-write
    * read-back) and the spec's plan pin. */
  def prunedDayAgg(s: SparkSession, dest: String): DataFrame =
    s.read.parquet(dest)
      .filter(col("event_date") === "2024-01-15")
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_events"),
        sum(col("cents")).as("total_cents"))
      .orderBy("event_type")

  /** Small-file compaction — the table-maintenance job every 100 TB
    * deployment schedules: a fragmented table (here deliberately
    * written as 64 splinter files, the shape a trickle of small
    * appends leaves behind) is rewritten into ⌈bytes / target⌉
    * right-sized files. At scale the small-files problem is a
    * listing/scheduling tax — a million 100 KB files means a million
    * scan tasks and a crawling namenode — and the fix is exactly this
    * read → coalesce(n) → write (coalesce, not repartition: no
    * shuffle, each output task concatenates whole input splits). The
    * hashed row carries the row count plus two verdict booleans
    * (`files_reduced`, `rows_equal` — the q_approx_distinct contract
    * pattern: file counts are engine internals no SQL oracle can
    * recompute, so the oracle asserts the CONTRACT while the spec
    * pins the physical file counts). Per-run unique destination (the
    * q_partition_prune race fix). */
  def compactRoot = "/tmp/graft_compact_files"
  def compactFilesRun(s: SparkSession, d: String,
      targetBytes: Long = 8L << 20): (DataFrame, Int, Int) = {
    val dest = s"${scalePath(compactRoot, d)}/${s.sparkContext.applicationId}"
    val ev = Tables.events(s, d)
      .select(col("event_id"), col("event_type"),
        round(col("value") * 100).cast("long").as("cents"))
    ev.repartition(64).write.mode("overwrite").parquet(s"$dest/frag")
    val fs = new org.apache.hadoop.fs.Path(dest)
      .getFileSystem(s.sparkContext.hadoopConfiguration)
    def files(p: String): Seq[org.apache.hadoop.fs.FileStatus] =
      fs.listStatus(new org.apache.hadoop.fs.Path(p))
        .filter(_.getPath.getName.endsWith(".parquet")).toSeq
    val frag = files(s"$dest/frag")
    // cap at frag.size - 1 (round-12 advice): once the fragmented
    // bytes reach 64× the target, the byte-derived count would make
    // coalesce a no-op and flip the files_reduced contract false at
    // larger scale factors — when the byte target implies no reduction,
    // compaction's structural promise (fewer files) still holds, it
    // just lands one file under the target size instead
    val byBytes = math.max(1L,
      (frag.map(_.getLen).sum + targetBytes - 1) / targetBytes).toInt
    val nOut = math.min(byBytes, math.max(1, frag.size - 1))
    if (nOut < byBytes)
      s.sparkContext.setJobDescription(
        s"compact_files: byte target implies $byBytes files >= ${frag.size} inputs; capped to $nOut")
    // the rewrite commits through the manifest protocol: a reader (or
    // a crash) mid-rewrite sees the PREVIOUS committed generation
    // whole, never a partial directory — CommittedTableSpec pins it
    val tbl = s"$dest/comp"
    graft.pipeline.CommittedTable.commit(s, tbl,
      s.read.parquet(s"$dest/frag"), _.coalesce(nOut))
    val comp = files(graft.pipeline.CommittedTable.dataDir(s, tbl))
    // degenerate single-fragment input (round-13 advice): with one
    // input file the nOut cap yields nOut = 1, so "fewer files" is
    // unattainable — the structural contract there is "no worse"
    // (comp.size <= frag.size), not strictly fewer
    val reduced =
      if (frag.size <= 1) comp.size <= frag.size else comp.size < frag.size
    val out = graft.pipeline.CommittedTable.read(s, tbl)
      .agg(count(lit(1)).as("n_rows"))
      .select(col("n_rows"),
        lit(reduced).as("files_reduced"),
        (col("n_rows") === ev.count()).as("rows_equal"))
    (out, frag.size, comp.size)
  }

  private def compactFiles(s: SparkSession, d: String): DataFrame =
    compactFilesRun(s, d)._1

  /** Right-to-be-forgotten delete — the GDPR/CCPA maintenance rewrite:
    * drop every event of a user cohort (here user_id ≡ 0 mod 97, a
    * stand-in for the deletion-request key list, which at scale
    * arrives as a table and anti-joins instead of the predicate) by
    * rewriting the table WITHOUT them, then prove completeness by
    * scanning the rewritten files for residual rows. The hashed row
    * carries (deleted, remaining, residual): deleted/remaining the
    * oracle recomputes from the original table, and residual is
    * MEASURED from the rewritten parquet but asserted 0 by the oracle
    * — so an incomplete delete (a missed file, a stale overwrite)
    * hash-fails the gate, not just a spec. At 100 TB the same rewrite
    * runs per partition-pruned slice (`q_partition_prune`'s layout
    * confines it to the partitions the cohort touches) and the
    * driver-side audit counts below are exactly the numbers the
    * compliance log wants. Per-run unique destination. */
  private def forgetUser(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val dest =
      s"${scalePath("/tmp/graft_forget", d)}/${s.sparkContext.applicationId}"
    val ev = Tables.events(s, d).select("event_id", "user_id", "event_type")
    val total = ev.count()
    // manifest-committed rewrite (round-12 verdict item 2): the cohort
    // delete replaces the table generation atomically — a compliance
    // auditor racing the rewrite reads the old OR the new table whole
    graft.pipeline.CommittedTable.commit(s, dest,
      ev.filter(pmod(col("user_id"), lit(97L)) =!= 0))
    val agg = graft.pipeline.CommittedTable.read(s, dest)
      .agg(count(lit(1)),
        sum(when(pmod(col("user_id"), lit(97L)) === 0, 1L).otherwise(0L)))
      .head
    val remaining = agg.getLong(0)
    val residual = if (agg.isNullAt(1)) 0L else agg.getLong(1)
    Seq((total - remaining, remaining, residual))
      .toDF("deleted_events", "remaining_events", "residual_rows")
  }

  private def partitionPrune(s: SparkSession, d: String): DataFrame = {
    val dest = prunePath(s, d)
    Tables.events(s, d)
      .select(col("event_id"), col("event_type"),
        round(col("value") * 100).cast("long").as("cents"),
        date_format(col("ts"), "yyyy-MM-dd").as("event_date"))
      .write.mode("overwrite").partitionBy("event_date").parquet(dest)
    prunedDayAgg(s, dest)
  }

  private val partitionPruneSql =
    "SELECT event_type, count(*) AS n_events, " +
    "CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS total_cents " +
    "FROM events WHERE strftime(ts, '%Y-%m-%d') = '2024-01-15' " +
    "GROUP BY 1 ORDER BY 1"

  /** Per-invocation suffix for [[tableTimeTravel]]'s table root: two
    * concurrent invocations in one session (bench racing verify) must
    * not interleave generations under one root, or "previous
    * generation" stops being THIS run's before-image. */
  private val ttRunId = new java.util.concurrent.atomic.AtomicLong()

  /** Generation time travel UNDER THE GATE (round-13 verdict item 7,
    * the oracle-checked face of [[graft.pipeline.CommittedTable]]'s
    * snapshot reads): commit the events projection as generation N,
    * commit the GDPR-style cohort delete as N+1, then read BOTH — the
    * live table via `read(root)` and the before-image via
    * `read(root, N)` — and emit (n_before, n_after, deleted). The
    * oracle recomputes all three from the source table, so a time
    * travel that resolves the wrong directory (e.g. serving the new
    * generation for the old manifest) hash-fails, not just
    * spec-fails. `retain = 3` keeps the before-image inside the GC
    * window while the next commit lands. */
  private def tableTimeTravel(s: SparkSession, d: String): DataFrame = {
    val dest = s"${scalePath("/tmp/graft_ttravel", d)}/" +
      s"${s.sparkContext.applicationId}/run-${ttRunId.incrementAndGet()}"
    val ev = Tables.events(s, d).select("event_id", "user_id")
    val gBefore = graft.pipeline.CommittedTable.commit(s, dest, ev, retain = 3)
    graft.pipeline.CommittedTable.commit(s, dest,
      ev.filter(pmod(col("user_id"), lit(97L)) =!= 0), retain = 3)
    val before = graft.pipeline.CommittedTable.read(s, dest, gBefore)
      .agg(count(lit(1)).as("n_before"))
    val after = graft.pipeline.CommittedTable.read(s, dest)
      .agg(count(lit(1)).as("n_after"))
    before.crossJoin(broadcast(after)) // 1-row x 1-row (allowlisted)
      .select(col("n_before"), col("n_after"),
        (col("n_before") - col("n_after")).as("deleted"))
  }

  val all: Seq[Q] = Seq(
    Q("q_table_time_travel", tableTimeTravel, Some(
      "SELECT (SELECT count(*) FROM events) AS n_before, " +
      "(SELECT count(*) FROM events WHERE user_id % 97 <> 0) AS n_after, " +
      "(SELECT count(*) FROM events WHERE user_id % 97 = 0) AS deleted")),
    Q("q_compact_files", compactFiles, Some(
      "SELECT count(*) AS n_rows, TRUE AS files_reduced, TRUE AS rows_equal " +
      "FROM events")),
    Q("q_forget_user", forgetUser, Some(
      "SELECT CAST(sum(CASE WHEN user_id % 97 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS deleted_events, " +
      "CAST(sum(CASE WHEN user_id % 97 <> 0 THEN 1 ELSE 0 END) AS BIGINT) AS remaining_events, " +
      "CAST(0 AS BIGINT) AS residual_rows FROM events")),
    Q("q_partition_prune", partitionPrune, Some(partitionPruneSql)),
    Q("q_pit_join", pitJoin, Some(
      "WITH scd AS (SELECT o_custkey AS c, o_orderdate AS vf, " +
      "lead(o_orderdate) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS vt, " +
      "o_orderpriority AS pship FROM orders), " +
      "li AS (SELECT l.l_shipdate, o.o_custkey, o.o_orderpriority AS prio_at_order " +
      "FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey) " +
      "SELECT li.prio_at_order, s.pship AS prio_at_ship, count(*) AS n_items " +
      "FROM li LEFT JOIN scd s ON li.o_custkey = s.c AND li.l_shipdate >= s.vf " +
      "AND (s.vt IS NULL OR li.l_shipdate < s.vt) " +
      "GROUP BY 1, 2 ORDER BY prio_at_order, prio_at_ship NULLS FIRST")),
    Q("q_scd2_build", scd2Build, Some(
      "WITH x AS (SELECT o_custkey, o_orderkey, o_orderdate, o_orderpriority, " +
      "row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS version, " +
      "lead(o_orderdate) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS next_date " +
      "FROM orders) " +
      "SELECT o_custkey, CAST(version AS INT) AS version, o_orderpriority AS attr, " +
      "strftime(o_orderdate, '%Y-%m-%d %H:%M:%S') AS valid_from, " +
      "coalesce(strftime(next_date, '%Y-%m-%d %H:%M:%S'), '9999-12-31 00:00:00') AS valid_to, " +
      "next_date IS NULL AS is_current FROM x ORDER BY o_custkey, version")),
    Q("q_pipeline_e2e", pipelineE2e, Some(pipelineSql), headline = true),
    Q("q_pipeline_sink", pipelineSink, Some(pipelineSinkSql)),
    Q("q_jsonl_roundtrip", jsonlRoundtrip, Some(
      "SELECT doc_id, lang, source, n_chars, md5(text) AS text_md5, sink_scale " +
      s"FROM read_json('$gateJsonlPath/*.json', format='newline_delimited', " +
      "columns={'doc_id': 'BIGINT', 'text': 'VARCHAR', 'lang': 'VARCHAR', " +
      "'source': 'VARCHAR', 'n_chars': 'BIGINT', 'sink_scale': 'VARCHAR'}) " +
      "ORDER BY doc_id")),
    Q("q_schema_evolution", schemaEvolution, Some(
      "SELECT doc_id, source, n_chars, sink_scale, quality, pipeline " +
      s"FROM read_parquet(['$gateEvoPath/gen=1/*.parquet', " +
      s"'$gateEvoPath/gen=2/*.parquet'], union_by_name=true) " +
      "ORDER BY doc_id")),
    Q("q_csv_roundtrip", csvRoundtrip, Some(
      "SELECT doc_id, lang, source, n_chars, md5(text) AS text_md5, sink_scale " +
      s"FROM read_csv('$gateCsvPath/*.csv', header=true, " +
      "columns={'doc_id': 'BIGINT', 'text': 'VARCHAR', 'lang': 'VARCHAR', " +
      "'source': 'VARCHAR', 'n_chars': 'BIGINT', 'sink_scale': 'VARCHAR'}) " +
      "ORDER BY doc_id")),
    Q("q_orc_roundtrip", orcRoundtrip, Some(
      // roundtrip-identity oracle over the SOURCE parquet (DuckDB has
      // no ORC reader — see the scaladoc'd asymmetry): the gate runs
      // at sf0.01, so the stamp the Spark side wrote is 'sf0.01'
      "SELECT doc_id, lang, source, n_chars, md5(text) AS text_md5, " +
      "'sf0.01' AS sink_scale FROM documents ORDER BY doc_id")),
    Q("q_merge_apply", mergeApply, Some(
      "WITH base AS (SELECT doc_id, md5(text) AS h FROM documents WHERE doc_id % 11 <> 0), " +
      "up AS (SELECT doc_id, md5(text || ' v2') AS h FROM documents WHERE doc_id % 13 = 0) " +
      "SELECT coalesce(base.doc_id, up.doc_id) AS doc_id, " +
      "coalesce(up.h, base.h) AS digest " +
      "FROM base FULL JOIN up ON base.doc_id = up.doc_id " +
      "WHERE coalesce(base.doc_id, up.doc_id) % 19 <> 0 " +
      "ORDER BY doc_id")),
    Q("q_snapshot_diff", snapshotDiff, Some(
      "WITH a AS (SELECT doc_id, md5(text) AS h FROM documents WHERE doc_id % 11 <> 0), " +
      "b AS (SELECT doc_id, md5(CASE WHEN doc_id % 17 = 0 THEN text || ' v2' ELSE text END) AS h " +
      "FROM documents WHERE doc_id % 13 <> 0) " +
      "SELECT doc_id, status FROM (" +
      "SELECT coalesce(a.doc_id, b.doc_id) AS doc_id, " +
      "CASE WHEN a.doc_id IS NULL THEN 'added' WHEN b.doc_id IS NULL THEN 'removed' " +
      "WHEN a.h <> b.h THEN 'changed' ELSE 'unchanged' END AS status " +
      "FROM a FULL JOIN b ON a.doc_id = b.doc_id) t " +
      "WHERE status <> 'unchanged' ORDER BY doc_id")))
}
