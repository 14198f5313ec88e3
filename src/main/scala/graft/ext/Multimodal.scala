package graft.ext

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata, processed per-partition in batches.
  *
  * The container ships no media codecs, so the decode step is a
  * clearly-marked deterministic STUB (`decodeStub`) — the Spark-side
  * plumbing is real: typed Dataset schema, mapPartitions batching
  * (amortizes per-batch decoder setup, the shape a JNI/FFmpeg/libjpeg
  * binding needs), partition sizing by byte budget, and frame
  * sampling over the binary payload.
  */
object Multimodal {

  /** An opaque media blob + its source id. */
  case class MediaRecord(doc_id: Long, media: Array[Byte])

  /** Typed decode output. */
  case class MediaMeta(doc_id: Long, n_bytes: Int, width: Int,
      height: Int, format: String, checksum: Long)

  private def crc(bytes: Array[Byte]): Long = {
    var h = 0L
    var i = 0
    while (i < bytes.length) { // cheap rolling checksum, not crypto
      h = (h * 31 + (bytes(i) & 0xff)) % 2147483647L
      i += 1
    }
    h
  }

  /** STUB decoder — stands in for a real codec call. Deterministic
    * function of the bytes only, so tests are stable. A production
    * build swaps this body for the real binding and nothing else
    * changes. */
  def decodeStub(bytes: Array[Byte]): MediaMeta = {
    val c = crc(bytes)
    val fmt: String = if (bytes.isEmpty) "empty"
      else Seq("jpeg", "png", "wav", "mp4")((bytes(0) & 0xff) % 4)
    MediaMeta(-1L, bytes.length, 1 + (c % 640).toInt,
      1 + ((c >> 8) % 480).toInt, fmt, c)
  }

  // --- real header parsers (pure JVM, no codec libraries) -----------

  private val PngSig: Array[Byte] =
    Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)

  /** Real PNG header parse: signature + IHDR (always the first chunk
    * per the PNG spec), big-endian width/height at offsets 16/20.
    * None when the bytes aren't a well-formed PNG header. */
  def pngMeta(b: Array[Byte]): Option[MediaMeta] = {
    def be32(o: Int): Long =
      ((b(o) & 0xffL) << 24) | ((b(o + 1) & 0xffL) << 16) |
        ((b(o + 2) & 0xffL) << 8) | (b(o + 3) & 0xffL)
    if (b.length >= 24 && b.startsWith(PngSig) &&
        b(12) == 'I' && b(13) == 'H' && b(14) == 'D' && b(15) == 'R') {
      val w = be32(16)
      val h = be32(20)
      if (w > 0 && w <= Int.MaxValue && h > 0 && h <= Int.MaxValue)
        Some(MediaMeta(-1L, b.length, w.toInt, h.toInt, "png", crc(b)))
      else None
    } else None
  }

  /** Real WAV (RIFF/WAVE) header parse: walks the chunk list to the
    * `fmt ` chunk and reports **width = sample rate, height =
    * channel count** — the audio analogue of pixel dimensions in this
    * schema (documented convention; a dedicated audio schema would
    * name them). None when not a well-formed RIFF/WAVE. */
  def wavMeta(b: Array[Byte]): Option[MediaMeta] = {
    def le16(o: Int): Int = (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)
    def le32(o: Int): Long =
      (b(o) & 0xffL) | ((b(o + 1) & 0xffL) << 8) |
        ((b(o + 2) & 0xffL) << 16) | ((b(o + 3) & 0xffL) << 24)
    def tag(o: Int): String =
      new String(b, o, 4, java.nio.charset.StandardCharsets.US_ASCII)
    if (b.length >= 36 && tag(0) == "RIFF" && tag(8) == "WAVE") {
      var off = 12
      while (off + 8 <= b.length) {
        val sz = le32(off + 4)
        if (tag(off) == "fmt " && sz >= 16 && off + 8 + 16 <= b.length) {
          val channels = le16(off + 10)
          val sampleRate = le32(off + 12)
          return if (channels > 0 && sampleRate > 0 &&
              sampleRate <= Int.MaxValue)
            Some(MediaMeta(-1L, b.length, sampleRate.toInt, channels,
              "wav", crc(b)))
          else None
        }
        if (sz < 0 || sz > Int.MaxValue - 9) return None
        off += 8 + sz.toInt + (sz.toInt & 1) // RIFF chunks word-align
      }
      None
    } else None
  }

  /** Decode one blob: REAL header parse for formats a bare JVM can
    * sniff (PNG, WAV); the deterministic stub for everything else
    * (no codec libraries in this container). */
  def decode(bytes: Array[Byte]): MediaMeta =
    pngMeta(bytes).orElse(wavMeta(bytes)).getOrElse(decodeStub(bytes))

  /** Batched per-partition decode: the iterator is consumed in groups
    * of `batchSize` so a real decoder could process one batch per
    * native call (the `mapInPandas`/Arrow-batch shape, expressed
    * Scala-native). Lazy iterators — no partition materialization.
    * PNG/WAV payloads get a real header parse ([[decode]]); other
    * formats fall back to the labeled stub. */
  def decodeMeta(records: Dataset[MediaRecord], batchSize: Int = 64)
      : Dataset[MediaMeta] = {
    import records.sparkSession.implicits._
    records.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        // one "decoder session" per batch
        batch.iterator.map(r => decode(r.media).copy(doc_id = r.doc_id))
      }
    }
  }

  /** Sample up to `n` fixed-width "frames" (byte slices) from a media
    * blob — the frame-sampling primitive for video-ish payloads,
    * expressed over the binary column with built-ins only. */
  def sampleFrames(media: org.apache.spark.sql.Column, n: Int,
      frameBytes: Int): org.apache.spark.sql.Column = {
    val len = length(media)
    filter(
      transform(sequence(lit(0), lit(n - 1)),
        i => substring(media, (i * greatest((len - frameBytes) /
          lit(math.max(n - 1, 1)), lit(1))).cast("int") + 1,
          lit(frameBytes))),
      f => length(f) > 0)
  }

  /** STUB feature extractor — stands in for an embedding model over
    * decoded media. One deterministic double per dimension from a
    * per-dimension polynomial byte hash, scaled to [-1, 1); a real
    * model swap replaces this body only. */
  val FeatureMults: Seq[Long] = Seq(31L, 37L, 41L, 43L, 47L, 53L, 59L, 61L)

  def featureStub(bytes: Array[Byte]): Array[Double] =
    FeatureMults.map { mult =>
      var h = 0L
      var i = 0
      while (i < bytes.length) {
        h = (h * mult + (bytes(i) & 0xff)) % 2147483647L
        i += 1
      }
      (h % 2000L - 1000L) / 1000.0
    }.toArray

  /** Typed feature record. */
  case class MediaFeatures(doc_id: Long, features: Array[Double])

  /** Batched per-partition feature extraction — same mapPartitions
    * shape as [[decodeMeta]] (one "model session" per batch). */
  def extractFeatures(records: Dataset[MediaRecord], batchSize: Int = 64)
      : Dataset[MediaFeatures] = {
    import records.sparkSession.implicits._
    records.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        batch.iterator.map(r =>
          MediaFeatures(r.doc_id, featureStub(r.media)))
      }
    }
  }

  /** Fit-within-box resize arithmetic over decoded dimensions — the
    * metadata half of an image resize (the pixel half is the codec
    * stub's concern). Pure Column math: scale = min(maxW/w, maxH/h, 1)
    * never upscales; output dimensions floor but stay ≥ 1. */
  def resizeDims(width: org.apache.spark.sql.Column,
      height: org.apache.spark.sql.Column, maxW: Int, maxH: Int)
      : (org.apache.spark.sql.Column, org.apache.spark.sql.Column) = {
    val scale = least(lit(maxW.toDouble) / width,
      lit(maxH.toDouble) / height, lit(1.0))
    (greatest((width * scale).cast("int"), lit(1)),
      greatest((height * scale).cast("int"), lit(1)))
  }

  /** documents.text re-cast as a media corpus (the container has no
    * real media files; byte payloads exercise identical plumbing). */
  def mediaFromDocuments(s: SparkSession, dir: String): Dataset[MediaRecord] = {
    import s.implicits._
    graft.Tables.documents(s, dir)
      .select(col("doc_id"), col("text").cast("binary").as("media"))
      .as[MediaRecord]
  }

  /** Full decode pipeline as a DataFrame query (rows-only check). */
  def decodePipeline(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    decodeMeta(mediaFromDocuments(s, dir)).toDF()
      .orderBy("doc_id")
  }
}
