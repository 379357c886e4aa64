package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Q
import graft.multimodal.Multimodal
import graft.sources.Tables

/** Multimodal-column operators (see [[graft.multimodal.Multimodal]]):
  * metadata extraction is oracle-checked; the decode/feature pipeline
  * (stubbed codec, real Spark plumbing) is checked SEMANTICALLY — the
  * raw feature/checksum bytes are engine-specific, but the pipeline's
  * contract is hash-compared (see [[MultimodalQueries.mediaFeatures]]).
  */
object MultimodalQueries {

  /** Typed-metadata projection of the media table. */
  private def mediaMeta(s: SparkSession, d: String): DataFrame =
    Multimodal.fromDocuments(s, d).toDF()
      .select(col("doc_id"), col("meta.mime").as("mime"),
        col("meta.n_bytes").as("n_bytes"), col("meta.width").as("width"),
        col("meta.height").as("height"))
      .orderBy("doc_id")

  /** Feature-extraction CONTRACT over the REAL decode path (round-13
    * verdict item 3 — the last stand-in codec is out of the gate):
    * executor-encoded PNGs ([[Multimodal.syntheticPngs]]) through
    * [[Multimodal.ImageCodec]] via the same partition-batched
    * `extractFeatures` plumbing, semantically checked (the
    * `q_approx_distinct` pattern): where `q_media_decode` hash-checks
    * the decoded VALUES, this row hash-checks the pipeline's
    * INVARIANTS, each recomputed independently of the codec:
    *  - `width`/`height` — oracle-exact integer functions of doc_id
    *    (zero for the planted corrupt blobs);
    *  - `dim_ok`      — every vector has exactly `ImageCodec.dim` slots;
    *  - `luma_ok`     — feature 6 equals BT.601 luma recomputed from
    *    the decoded channel means (float-rounding tolerance);
    *  - `aspect_ok`   — feature 7 equals width/height (0 for the zero
    *    vector of a corrupt blob);
    *  - `alpha_ok`    — TYPE_INT_RGB payloads never report alpha;
    *  - `checksum_ok` — the pipeline checksum equals an independent
    *    byte fold over the raw payload (catches any dropped byte).
    * The DuckDB oracle asserts the contract (literal TRUEs) alongside
    * the arithmetic dims, so the gate fails if ANY invariant breaks. */
  private def mediaFeatures(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val rows = Multimodal.syntheticPngs(s, d)
    val truth = rows.map { r =>
      var ck = 1125899906842597L
      r.payload.foreach { b => ck = 31 * ck + b }
      (r.doc_id, ck)
    }.toDF("t_id", "ck")
    def el(i: Int) = element_at(col("features"), i).cast("double")
    val luma = lit(0.299) * el(3) + lit(0.587) * el(4) + lit(0.114) * el(5)
    Multimodal.extractFeatures(rows, codec = Multimodal.ImageCodec).toDF()
      .join(truth, col("doc_id") === col("t_id"))
      .select(col("doc_id"),
        el(1).cast("int").as("width"),
        el(2).cast("int").as("height"),
        (size(col("features")) === Multimodal.ImageCodec.dim).as("dim_ok"),
        (abs(el(6) - luma) <= lit(1e-3)).as("luma_ok"),
        when(el(2) === 0.0, el(7) === 0.0)
          .otherwise(abs(el(7) - el(1) / el(2)) <= lit(1e-4)).as("aspect_ok"),
        (el(8) === 0.0).as("alpha_ok"),
        (col("checksum") === col("ck")).as("checksum_ok"))
      .orderBy("doc_id")
  }

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

  /** REAL image resize under the gate: the same executor-encoded PNGs
    * as [[mediaDecode]], pushed through
    * [[Multimodal.ImageResizeCodec]]'s exact integer box filter
    * (deterministic by construction — no library scaler whose rounding
    * varies) to at most 4×4. Solid fills make the resized means an
    * exact integer function of doc_id and the dims `min(w, 4)` /
    * `min(h, 4)`, so the DuckDB oracle is pure arithmetic; the
    * pixel-level pooling math is pinned separately on non-uniform
    * images by `ImageResizeSpec`. */
  private def mediaResize(s: SparkSession, d: String): DataFrame =
    Multimodal.extractFeatures(Multimodal.syntheticPngs(s, d),
        codec = Multimodal.ImageResizeCodec(4, 4)).toDF()
      .select(col("doc_id"),
        element_at(col("features"), 1).cast("int").as("width"),
        element_at(col("features"), 2).cast("int").as("height"),
        element_at(col("features"), 3).cast("int").as("mean_r"),
        element_at(col("features"), 4).cast("int").as("mean_g"),
        element_at(col("features"), 5).cast("int").as("mean_b"))
      .orderBy("doc_id")

  private val mediaResizeSql =
    "WITH ids AS (SELECT doc_id FROM documents ORDER BY doc_id LIMIT 200), " +
    "d AS (SELECT doc_id, doc_id % 50 = 49 AS corrupt, " +
    "(doc_id * 2654435761) // 256 % 16777216 AS rgb FROM ids) " +
    "SELECT doc_id, " +
    "CAST(CASE WHEN corrupt THEN 0 ELSE LEAST(doc_id % 16 + 1, 4) END AS INT) AS width, " +
    "CAST(CASE WHEN corrupt THEN 0 ELSE LEAST(doc_id % 8 + 1, 4) END AS INT) AS height, " +
    "CAST(CASE WHEN corrupt THEN 0 ELSE rgb // 65536 END AS INT) AS mean_r, " +
    "CAST(CASE WHEN corrupt THEN 0 ELSE rgb // 256 % 256 END AS INT) AS mean_g, " +
    "CAST(CASE WHEN corrupt THEN 0 ELSE rgb % 256 END AS INT) AS mean_b " +
    "FROM d ORDER BY doc_id"

  /** REAL audio decode under the gate: executor-encoded RIFF/WAVE
    * square waves ([[Multimodal.syntheticWavs]]) through
    * [[Multimodal.AudioCodec]] (`javax.sound.sampled`) via the same
    * partition-batched `extractFeatures` plumbing as the image rows.
    * Square-wave construction makes every feature an exact integer:
    * RMS = amplitude, zero crossings = (n−1) div half-period, peak =
    * amplitude — so the DuckDB oracle is pure arithmetic and a one-
    * sample decode error (endianness, off-by-one frame, header bytes
    * misread as PCM) flips the hash. Corrupt blobs must come back as
    * the documented zero vector. */
  private def audioFeatures(s: SparkSession, d: String): DataFrame =
    Multimodal.extractFeatures(Multimodal.syntheticWavs(s, d),
        codec = Multimodal.AudioCodec).toDF()
      .select(col("doc_id"),
        element_at(col("features"), 1).cast("int").as("sample_rate"),
        element_at(col("features"), 2).cast("int").as("n_frames"),
        element_at(col("features"), 3).cast("int").as("rms"),
        element_at(col("features"), 4).cast("int").as("zero_crossings"),
        element_at(col("features"), 5).cast("int").as("peak"))
      .orderBy("doc_id")

  private val audioFeaturesSql =
    "WITH ids AS (SELECT doc_id FROM documents ORDER BY doc_id LIMIT 200), " +
    "d AS (SELECT doc_id, doc_id % 50 = 49 AS corrupt, " +
    "(doc_id % 64 + 1) * 8 AS n, doc_id % 4 + 1 AS p, " +
    "1000 + doc_id % 100 AS a FROM ids) " +
    "SELECT doc_id, " +
    "CAST(CASE WHEN corrupt THEN 0 ELSE 8000 END AS INT) AS sample_rate, " +
    "CAST(CASE WHEN corrupt THEN 0 ELSE n END AS INT) AS n_frames, " +
    "CAST(CASE WHEN corrupt THEN 0 ELSE a END AS INT) AS rms, " +
    "CAST(CASE WHEN corrupt THEN 0 ELSE (n - 1) // p END AS INT) AS zero_crossings, " +
    "CAST(CASE WHEN corrupt THEN 0 ELSE a END AS INT) AS peak " +
    "FROM d ORDER BY doc_id"

  /** Frame sampling from an opaque video-shaped binary column — the
    * multimodal operation a training pipeline runs on video payloads:
    * ONE binary column holds all frames; the engine slices every k-th
    * frame out by byte offset (substring on BinaryType — scan-stage,
    * no UDF, the payload never leaves the executor as anything but
    * the sampled slices) and fingerprints each sampled frame. The
    * synthetic payload is deterministic (frame f of doc = 32 bytes of
    * `(doc_id·31 + f·7) mod 256`), so the DuckDB oracle reconstructs
    * each EXPECTED sampled frame independently and md5-compares — a
    * one-byte slicing error in the Spark side mismatches every hash.
    * At scale the same plan applies per 100 MB payload: offsets are
    * metadata arithmetic; only sampled frames materialize. */
  private def frameSample(s: SparkSession, d: String): DataFrame = {
    val nFrames = 12; val frameBytes = 32; val every = 3
    val ids = Tables.documents(s, d).select(col("doc_id"))
      .orderBy("doc_id").limit(200)
    // build the "video": concat of per-frame 32-byte solid payloads
    val frameHex = (f: Int) =>
      lpad(hex((col("doc_id") * 31 + lit(f) * 7) % 256), 2, "0")
    val payload = unhex(concat(
      (0 until nFrames).map(f => repeat(frameHex(f), frameBytes)): _*))
    ids.withColumn("payload", payload)
      .select(col("doc_id"), col("payload"),
        explode(sequence(lit(0), lit(nFrames - 1), lit(every)))
          .as("frame_idx"))
      .select(col("doc_id"), col("frame_idx"),
        // fingerprint the sliced frame via its hex encoding (DuckDB's
        // md5 is VARCHAR-only); the BINARY slicing itself stays on
        // this side — a one-byte offset error still flips every hash
        md5(lower(hex(expr(s"substring(payload, " +
          s"frame_idx * $frameBytes + 1, $frameBytes)")))).as("frame_md5"))
      .orderBy("doc_id", "frame_idx")
  }

  private val frameSampleSql =
    "WITH ids AS (SELECT doc_id FROM documents ORDER BY doc_id LIMIT 200) " +
    "SELECT doc_id, CAST(f AS INT) AS frame_idx, " +
    "md5(repeat(lower(lpad(to_hex((doc_id * 31 + f * 7) % 256), 2, '0')), 32)) AS frame_md5 " +
    "FROM ids, range(0, 12, 3) t(f) ORDER BY doc_id, frame_idx"

  val all: Seq[Q] = Seq(
    Q("q_media_decode", mediaDecode, Some(mediaDecodeSql)),
    Q("q_media_resize", mediaResize, Some(mediaResizeSql)),
    Q("q_audio_features", audioFeatures, Some(audioFeaturesSql)),
    Q("q_frame_sample", frameSample, Some(frameSampleSql)),
    Q("q_media_meta", mediaMeta, Some(
      "SELECT doc_id, 'text/plain' AS mime, " +
      "CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes, " +
      "CAST(doc_id % 64 + 1 AS INT) AS width, " +
      "CAST(doc_id % 48 + 1 AS INT) AS height " +
      "FROM documents ORDER BY doc_id")),
    Q("q_media_features", mediaFeatures, Some(
      "WITH ids AS (SELECT doc_id FROM documents ORDER BY doc_id LIMIT 200), " +
      "d AS (SELECT doc_id, doc_id % 50 = 49 AS corrupt FROM ids) " +
      "SELECT doc_id, " +
      "CAST(CASE WHEN corrupt THEN 0 ELSE doc_id % 16 + 1 END AS INT) AS width, " +
      "CAST(CASE WHEN corrupt THEN 0 ELSE doc_id % 8 + 1 END AS INT) AS height, " +
      "TRUE AS dim_ok, TRUE AS luma_ok, TRUE AS aspect_ok, " +
      "TRUE AS alpha_ok, TRUE AS checksum_ok " +
      "FROM d ORDER BY doc_id")),
  )
}
