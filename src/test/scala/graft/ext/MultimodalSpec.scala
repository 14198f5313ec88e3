package graft.ext

import org.apache.spark.sql.functions._
import graft.SparkSpec

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  test("decode pipeline emits one typed meta row per media blob") {
    val meta = Multimodal.decodePipeline(spark, sf0001)
    val rows = meta.as[Multimodal.MediaMeta].collect()
    assert(rows.length == 500)
    assert(rows.forall(m => m.n_bytes > 0 && m.width >= 1 &&
      m.height >= 1 && Set("jpeg", "png", "wav", "mp4")(m.format)))
    // deterministic stub: re-running decodes to identical checksums
    val again = Multimodal.decodePipeline(spark, sf0001)
      .as[Multimodal.MediaMeta].collect()
    assert(rows.map(_.checksum).toSeq == again.map(_.checksum).toSeq)
  }

  test("decode parses a REAL png header: true width/height/format") {
    // genuine 1×1 PNG (full file, base64) — not a synthetic fixture
    val png = java.util.Base64.getDecoder.decode(
      "iVBORw0KGgoAAAANSUhEUgAAAAEAAAABCAYAAAAfFcSJAAAADUlEQVR42mP8" +
      "z8BQDwAEhQGAhKmMIQAAAABJRU5ErkJggg==")
    val m = Multimodal.decode(png)
    assert(m.format == "png" && m.width == 1 && m.height == 1)
    assert(m.n_bytes == png.length)
    // a wider header: craft sig+IHDR with width 640, height 480
    val hdr = new java.io.ByteArrayOutputStream()
    hdr.write(Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a)
      .map(_.toByte))
    hdr.write(Array[Byte](0, 0, 0, 13)) // IHDR length
    hdr.write("IHDR".getBytes("US-ASCII"))
    hdr.write(Array[Byte](0, 0, 2, 0x80.toByte)) // width 640 BE
    hdr.write(Array[Byte](0, 0, 1, 0xe0.toByte)) // height 480 BE
    hdr.write(Array[Byte](8, 6, 0, 0, 0))        // bitdepth/color/…
    val m2 = Multimodal.decode(hdr.toByteArray)
    assert(m2.format == "png" && m2.width == 640 && m2.height == 480)
  }

  test("decode parses a REAL wav header: sample rate + channels") {
    // canonical 44-byte PCM WAV header: stereo, 44100 Hz, 16-bit
    def le16(v: Int) = Array[Byte](v.toByte, (v >> 8).toByte)
    def le32(v: Int) = Array[Byte](v.toByte, (v >> 8).toByte,
      (v >> 16).toByte, (v >> 24).toByte)
    val out = new java.io.ByteArrayOutputStream()
    out.write("RIFF".getBytes("US-ASCII")); out.write(le32(36))
    out.write("WAVE".getBytes("US-ASCII"))
    out.write("fmt ".getBytes("US-ASCII")); out.write(le32(16))
    out.write(le16(1))      // PCM
    out.write(le16(2))      // channels
    out.write(le32(44100))  // sample rate
    out.write(le32(176400)) // byte rate
    out.write(le16(4))      // block align
    out.write(le16(16))     // bits/sample
    out.write("data".getBytes("US-ASCII")); out.write(le32(0))
    val m = Multimodal.decode(out.toByteArray)
    assert(m.format == "wav" && m.width == 44100 && m.height == 2)
    // a LIST chunk before fmt must be skipped, not trip the walk
    val out2 = new java.io.ByteArrayOutputStream()
    out2.write("RIFF".getBytes("US-ASCII")); out2.write(le32(48))
    out2.write("WAVE".getBytes("US-ASCII"))
    out2.write("LIST".getBytes("US-ASCII")); out2.write(le32(4))
    out2.write("INFO".getBytes("US-ASCII"))
    out2.write("fmt ".getBytes("US-ASCII")); out2.write(le32(16))
    out2.write(le16(1)); out2.write(le16(1)); out2.write(le32(16000))
    out2.write(le32(32000)); out2.write(le16(2)); out2.write(le16(16))
    val m2 = Multimodal.decode(out2.toByteArray)
    assert(m2.format == "wav" && m2.width == 16000 && m2.height == 1)
  }

  test("non-media bytes still take the deterministic stub path") {
    val text = "just some document text".getBytes("UTF-8")
    assert(Multimodal.decode(text) == Multimodal.decodeStub(text))
    assert(Multimodal.pngMeta(text).isEmpty)
    assert(Multimodal.wavMeta(text).isEmpty)
    // truncated magic: PNG sig alone (no IHDR) must not crash
    val sig = Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a)
      .map(_.toByte)
    assert(Multimodal.pngMeta(sig).isEmpty)
    assert(Multimodal.decode(sig) == Multimodal.decodeStub(sig))
  }

  test("frame sampling slices n frames from the binary payload") {
    val df = Seq(("x" * 1000)).toDF("t")
      .select(col("t").cast("binary").as("media"))
    val frames = df.select(Multimodal.sampleFrames(col("media"), 4, 16)
      .as("frames"))
      .select(size(col("frames"))).as[Int].collect().head
    assert(frames == 4)
  }

  test("feature extraction: deterministic, bounded, dim-stable") {
    val recs = Multimodal.mediaFromDocuments(spark, sf0001)
    val feats = Multimodal.extractFeatures(recs).collect()
    assert(feats.length == 500)
    assert(feats.forall(_.features.length ==
      Multimodal.FeatureMults.length))
    assert(feats.forall(_.features.forall(v => v >= -1.0 && v < 1.0)))
    // pure function of the bytes
    val again = Multimodal.extractFeatures(recs).collect()
      .map(f => f.doc_id -> f.features.toSeq).toMap
    feats.foreach(f => assert(again(f.doc_id) == f.features.toSeq))
  }

  test("resize dims fit the box, never upscale, floor at 1") {
    val df = Seq((640, 480), (320, 240), (100, 50), (1, 2000))
      .toDF("width", "height")
    val (w2, h2) = Multimodal.resizeDims(col("width"), col("height"),
      320, 240)
    val got = df.select(w2.as("w"), h2.as("h")).as[(Int, Int)].collect()
    assert(got.toSeq == Seq((320, 240), (320, 240), (100, 50), (1, 240)))
  }
}
