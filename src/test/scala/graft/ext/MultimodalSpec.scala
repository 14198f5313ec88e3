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

  // -- real PNG pixel decode ------------------------------------------

  /** Independent reference decode via the JDK's own ImageIO PNG codec
    * (pure JDK, headless-safe) — our Inflater+unfilter decoder is
    * validated against a codec we didn't write. */
  private def imageioRgb(png: Array[Byte]): (Int, Int, Array[Byte]) = {
    val img = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(png))
    val (w, h) = (img.getWidth, img.getHeight)
    val out = new Array[Byte](w * h * 3)
    for (y <- 0 until h; x <- 0 until w) {
      val argb = img.getRGB(x, y)
      val d = (y * w + x) * 3
      out(d) = ((argb >> 16) & 0xff).toByte
      out(d + 1) = ((argb >> 8) & 0xff).toByte
      out(d + 2) = (argb & 0xff).toByte
    }
    (w, h, out)
  }

  test("pngDecode recovers exact pixels from an ImageIO-written PNG " +
      "and pngEncode round-trips through ImageIO") {
    // deterministic 7×5 RGB test card written by the JDK encoder
    val w = 7; val h = 5
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w)
      img.setRGB(x, y, ((x * 36) << 16) | ((y * 51) << 8) | (x * y * 9))
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    val png = bos.toByteArray
    val got = Multimodal.pngDecode(png).get
    val (rw, rh, ref) = imageioRgb(png)
    assert(got.width == rw && got.height == rh)
    assert(got.rgb.toSeq == ref.toSeq,
      "our decoder must match the JDK codec pixel-for-pixel")
    // encode half: our PNG writer's output reads back identically in
    // BOTH decoders
    val ours = Multimodal.pngEncode(got)
    val (ew, eh, eref) = imageioRgb(ours)
    assert(ew == w && eh == h && eref.toSeq == got.rgb.toSeq)
    assert(Multimodal.pngDecode(ours).get.rgb.toSeq == got.rgb.toSeq)
  }

  test("pngDecode unfilters all five PNG filter types") {
    // hand-build a 3×5 truecolor PNG, one scanline per filter type
    // (0=None 1=Sub 2=Up 3=Average 4=Paeth), deflated raw
    val w = 3; val h = 5
    val stride = w * 3
    val rnd = new java.util.Random(7)
    val pixels = Array.fill[Byte](h * stride)(rnd.nextInt(256).toByte)
    def px(y: Int, x: Int): Int = pixels(y * stride + x) & 0xff
    val raw = new java.io.ByteArrayOutputStream()
    for (y <- 0 until h) {
      raw.write(y) // filter type = row index
      for (x <- 0 until stride) {
        val a = if (x >= 3) px(y, x - 3) else 0
        val b = if (y > 0) px(y - 1, x) else 0
        val c = if (x >= 3 && y > 0) px(y - 1, x - 3) else 0
        val v = y match {
          case 0 => px(y, x)
          case 1 => px(y, x) - a
          case 2 => px(y, x) - b
          case 3 => px(y, x) - (a + b) / 2
          case 4 =>
            val p = a + b - c
            val pa = math.abs(p - a); val pb = math.abs(p - b)
            val pc = math.abs(p - c)
            val pred = if (pa <= pb && pa <= pc) a
              else if (pb <= pc) b else c
            px(y, x) - pred
        }
        raw.write(v & 0xff)
      }
    }
    val defl = new java.util.zip.Deflater()
    defl.setInput(raw.toByteArray); defl.finish()
    val comp = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](8192)
    while (!defl.finished()) comp.write(buf, 0, defl.deflate(buf))
    defl.end()
    val out = new java.io.ByteArrayOutputStream()
    out.write(Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a)
      .map(_.toByte))
    def chunk(typ: String, data: Array[Byte]): Unit = {
      def be32(v: Int) = Array[Byte]((v >> 24).toByte, (v >> 16).toByte,
        (v >> 8).toByte, v.toByte)
      out.write(be32(data.length))
      val t = typ.getBytes("US-ASCII")
      out.write(t); out.write(data)
      val crc = new java.util.zip.CRC32()
      crc.update(t); crc.update(data)
      out.write(be32(crc.getValue.toInt))
    }
    val ihdr = new java.io.ByteArrayOutputStream()
    ihdr.write(Array[Byte](0, 0, 0, w.toByte, 0, 0, 0, h.toByte))
    ihdr.write(8); ihdr.write(2); ihdr.write(0); ihdr.write(0); ihdr.write(0)
    chunk("IHDR", ihdr.toByteArray)
    chunk("IDAT", comp.toByteArray)
    chunk("IEND", Array.emptyByteArray)
    val png = out.toByteArray
    val got = Multimodal.pngDecode(png).get
    assert(got.width == w && got.height == h)
    assert(got.rgb.toSeq == pixels.toSeq,
      "every filter type must unfilter to the original bytes")
    // and the JDK codec agrees our fixture was well-formed
    val (_, _, ref) = imageioRgb(png)
    assert(ref.toSeq == pixels.toSeq)
  }

  test("pngFeatures computes exact mean RGB / luma / histogram; " +
      "non-PNG falls back to stub in extractFeatures") {
    // 2×1: pure red + pure blue
    val png = Multimodal.pngEncode(Multimodal.PngPixels(2, 1,
      Array[Byte](255.toByte, 0, 0, 0, 0, 255.toByte)))
    val f = Multimodal.pngFeatures(png).get
    assert(f(0) == 127.5 && f(1) == 0.0 && f(2) == 127.5)
    // lumas: .299*255 = 76.245 and .114*255 = 29.07 → mean 52.6575
    assert(f(3) == 52.6575)
    // red's luma 76 → bin 1 ([64,128)); blue's 29 → bin 0 ([0,64))
    assert(f.slice(4, 8).toSeq == Seq(0.5, 0.5, 0.0, 0.0))
    assert(f.length == Multimodal.FeatureMults.length)
    // ascii text is not a PNG → stub path, identical output shape
    val text = "plain document".getBytes("UTF-8")
    assert(Multimodal.pngFeatures(text).isEmpty)
    import spark.implicits._
    val ds = Seq(Multimodal.MediaRecord(1L, png),
      Multimodal.MediaRecord(2L, text)).toDS()
    val got = Multimodal.extractFeatures(ds).collect()
      .map(r => r.doc_id -> r.features.toSeq).toMap
    assert(got(1L) == f.toSeq)
    assert(got(2L) == Multimodal.featureStub(text).toSeq)
  }

  test("pngDecode expands gray / gray+alpha / palette / RGBA to RGB") {
    def write(img: java.awt.image.BufferedImage): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }
    // grayscale (color type 0 when written by ImageIO). Raw raster
    // samples, not setRGB — getRGB/setRGB on TYPE_BYTE_GRAY pass
    // through a linear↔sRGB conversion, while the PNG holds the raw
    // samples our decoder (correctly) returns.
    val gray = new java.awt.image.BufferedImage(2, 2,
      java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    for (y <- 0 until 2; x <- 0 until 2)
      gray.getRaster.setSample(x, y, 0, 40 + 50 * (y * 2 + x))
    val gp = write(gray)
    val gGot = Multimodal.pngDecode(gp).get
    assert(gGot.rgb.toSeq == Seq(40, 40, 40, 90, 90, 90, 140, 140, 140,
      190, 190, 190).map(_.toByte).toSeq)
    // RGBA (color type 6): alpha dropped, not premultiplied
    val argb = new java.awt.image.BufferedImage(2, 1,
      java.awt.image.BufferedImage.TYPE_INT_ARGB)
    argb.setRGB(0, 0, 0x80ff2040)  // half-transparent
    argb.setRGB(1, 0, 0xff10ccee)
    val ap = write(argb)
    val aGot = Multimodal.pngDecode(ap).get
    assert(aGot.rgb.toSeq == Seq(0xff, 0x20, 0x40, 0x10, 0xcc, 0xee)
      .map(_.toByte))
    // palette (color type 3)
    val pal = new java.awt.image.BufferedImage(2, 1,
      java.awt.image.BufferedImage.TYPE_BYTE_INDEXED)
    pal.setRGB(0, 0, 0xff0000); pal.setRGB(1, 0, 0x0000ff)
    val pp = write(pal)
    val pGot = Multimodal.pngDecode(pp).get
    assert(pGot.rgb.toSeq == imageioRgb(pp)._3.toSeq)
  }

  test("pngResize downscales with nearest-neighbor, never upscales, " +
      "and yields a standards-valid PNG") {
    // 4×4 card of distinct colors
    val rgb = Array.tabulate(4 * 4 * 3) { i =>
      ((i / 3) * 16 + (i % 3)).toByte
    }
    val png = Multimodal.pngEncode(Multimodal.PngPixels(4, 4, rgb))
    val resized = Multimodal.pngResize(png, 2, 2).get
    val got = Multimodal.pngDecode(resized).get
    assert(got.width == 2 && got.height == 2)
    // nearest-neighbor at exact 2:1 picks source pixels (0,0) (2,0)
    // (0,2) (2,2)
    def src(y: Int, x: Int): Seq[Byte] =
      rgb.slice((y * 4 + x) * 3, (y * 4 + x) * 3 + 3).toSeq
    assert(got.rgb.toSeq == (src(0, 0) ++ src(0, 2) ++ src(2, 0) ++
      src(2, 2)))
    // ImageIO can read our resized output (valid CRCs, valid stream)
    assert(imageioRgb(resized)._3.toSeq == got.rgb.toSeq)
    // fits-already → re-encode at original size (no upscale)
    val same = Multimodal.pngDecode(
      Multimodal.pngResize(png, 8, 8).get).get
    assert(same.width == 4 && same.height == 4 && same.rgb.toSeq == rgb.toSeq)
    // non-PNG → None (caller keeps original blob)
    assert(Multimodal.pngResize("text".getBytes, 2, 2).isEmpty)
  }

  // -- real JPEG decode (JDK ImageIO codec) ---------------------------

  /** JPEG fixture written by the JDK's own encoder. */
  private def jpegBytes(w: Int, h: Int, rgb: (Int, Int) => Int)
      : Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, rgb(x, y))
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", bos)
    bos.toByteArray
  }

  test("jpegMeta parses the real SOF frame header; decode() routes " +
      "JPEG bytes to it") {
    val jpg = jpegBytes(17, 11, (x, y) => (x * 15) << 16 | (y * 23) << 8)
    assert(jpg.take(2).map(_ & 0xff).toSeq == Seq(0xff, 0xd8),
      "fixture must be a real JPEG")
    val m = Multimodal.jpegMeta(jpg).get
    assert(m.width == 17 && m.height == 11 && m.format == "jpeg")
    assert(Multimodal.decode(jpg).format == "jpeg")
    assert(Multimodal.decode(jpg).width == 17)
    // non-JPEG bytes: no codec round-trip, None
    assert(Multimodal.jpegMeta("plain text".getBytes).isEmpty)
    assert(Multimodal.jpegMeta(Array[Byte](0xff.toByte, 0xd8.toByte))
      .isEmpty, "SOI alone is not a frame header")
  }

  test("jpegDecode recovers known pixel stats from a real JPEG and " +
      "extractFeatures routes it to the real featurizer") {
    // uniform color decodes near-exactly even through lossy DCT
    val (r0, g0, b0) = (200, 100, 50)
    val jpg = jpegBytes(16, 12, (_, _) => (r0 << 16) | (g0 << 8) | b0)
    val img = Multimodal.jpegDecode(jpg).get
    assert(img.width == 16 && img.height == 12)
    val f = Multimodal.jpegFeatures(jpg).get
    assert(f.length == Multimodal.FeatureMults.length)
    // mean RGB within a few quantization levels of the source color
    assert(math.abs(f(0) - r0) <= 3, s"mean R ${f(0)} vs $r0")
    assert(math.abs(f(1) - g0) <= 3, s"mean G ${f(1)} vs $g0")
    assert(math.abs(f(2) - b0) <= 3, s"mean B ${f(2)} vs $b0")
    // luma of (200,100,50) = 124.2 — the histogram must concentrate
    // in bin 1 ([64,128))
    assert(f(4) == 0.0 && f(5) == 1.0 && f(6) == 0.0 && f(7) == 0.0)
    import spark.implicits._
    val text = "plain document".getBytes("UTF-8")
    val got = Multimodal.extractFeatures(Seq(
        Multimodal.MediaRecord(1L, jpg),
        Multimodal.MediaRecord(2L, text)).toDS())
      .collect().map(r => r.doc_id -> r.features.toSeq).toMap
    assert(got(1L) == f.toSeq, "JPEG routes to the real featurizer")
    assert(got(2L) == Multimodal.featureStub(text).toSeq)
  }

  test("MJPEG-in-MP4: demuxed JPEG samples decode to real pixel " +
      "stats through the frame-decode dispatch; unknown codecs keep " +
      "the labeled stub") {
    val f1 = jpegBytes(16, 12, (_, _) => (200 << 16) | (90 << 8) | 30)
    val f2 = jpegBytes(8, 8, (x, y) => ((x * 10) << 16) | ((y * 20) << 8))
    val mp4 = Multimodal.mp4Wrap(Seq(f1, f2))
    assert(Multimodal.mp4Info(mp4).nonEmpty, "fixture must be real BMFF")
    val samples = Multimodal.mp4Samples(mp4, 8).get
    assert(samples.length == 2)
    // demux is byte-exact, so frame decode ≡ decoding the sources
    val stats = samples.map(Multimodal.frameFeatures)
    assert(stats(0).toSeq == Multimodal.jpegFeatures(f1).get.toSeq)
    assert(stats(1).toSeq == Multimodal.jpegFeatures(f2).get.toSeq)
    // and it really decoded — the stub would hash, not measure: the
    // uniform-color frame's mean RGB is recoverable
    assert(math.abs(stats(0)(0) - 200) <= 3 &&
      math.abs(stats(0)(1) - 90) <= 3 && math.abs(stats(0)(2) - 30) <= 3)
    assert(stats(0).toSeq != Multimodal.featureStub(f1).toSeq)
    // an H.26x-ish NAL payload has no bare-JVM codec → stub, flagged
    // by decodeFrame returning None (never a wrong answer)
    val nal = Array[Byte](0, 0, 0, 1, 0x67, 42, 13, 7)
    assert(Multimodal.decodeFrame(nal).isEmpty)
    assert(Multimodal.frameFeatures(nal).toSeq ==
      Multimodal.featureStub(nal).toSeq)
    // PNG-in-MP4 rides the same dispatch
    val png = Multimodal.pngEncode(Multimodal.PngPixels(2, 2,
      Array[Byte](10, 20, 30, 40, 50, 60, 70, 80, 90, 100, 110, 120)))
    assert(Multimodal.decodeFrame(png).get.rgb.toSeq ==
      Multimodal.pngDecode(png).get.rgb.toSeq)
  }

  test("gifDecode recovers pixel stats from a real GIF through the " +
      "shared ImageIO tail; sniff and caps mirror the JPEG guards") {
    // GIF is palette-based: a two-color image survives quantization
    // exactly
    val img = new java.awt.image.BufferedImage(8, 6,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 6; x <- 0 until 8)
      img.setRGB(x, y, if (x < 4) 0xff0000 else 0x0000ff)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "gif", bos)
    val gif = bos.toByteArray
    assert(new String(gif, 0, 6, "US-ASCII").startsWith("GIF8"),
      "fixture must be a real GIF")
    val px = Multimodal.gifDecode(gif).get
    assert(px.width == 8 && px.height == 6)
    val f = Multimodal.gifFeatures(gif).get
    // half the pixels pure red, half pure blue → mean R = mean B
    assert(math.abs(f(0) - f(2)) <= 1, s"mean R ${f(0)} vs B ${f(2)}")
    assert(f(1) <= 1, s"mean G ${f(1)} must be ~0")
    // meta sniff: dims from the logical-screen descriptor, no decode
    val m = Multimodal.gifMeta(gif).get
    assert(m.width == 8 && m.height == 6 && m.format == "gif")
    assert(Multimodal.decode(gif).format == "gif")
    // decodeFrame dispatch + extractFeatures routing
    assert(Multimodal.decodeFrame(gif).get.rgb.toSeq == px.rgb.toSeq)
    import spark.implicits._
    val got = Multimodal.extractFeatures(Seq(
        Multimodal.MediaRecord(1L, gif)).toDS()).collect()
    assert(got.head.features.toSeq == f.toSeq,
      "GIF routes to the real featurizer")
    // oversized logical screen rejected BEFORE ImageIO runs
    val huge = gif.clone()
    huge(6) = 0xff.toByte; huge(7) = 0xff.toByte // w = 65535
    huge(8) = 0xff.toByte; huge(9) = 0x7f.toByte // h = 32767
    assert(Multimodal.gifDecode(huge).isEmpty,
      "raster cap must reject before decode")
    // the cap also binds the FRAME dims (what ImageIO actually
    // allocates): tiny 1x1 logical screen, 65535x65535 image
    // descriptor, structurally well-formed to the trailer
    val sneaky = Array[Byte](
      'G', 'I', 'F', '8', '9', 'a',
      1, 0, 1, 0, 0, 0, 0,                       // LSD 1x1, no GCT
      0x2c, 0, 0, 0, 0,                          // image descriptor
      0xff.toByte, 0xff.toByte, 0xff.toByte, 0xff.toByte, // 65535^2
      0,                                         // no LCT
      2, 1, 0, 0,                                // LZW min + 1-byte sub
      0x3b)                                      // trailer
    assert(Multimodal.gifMeta(sneaky).nonEmpty,
      "fixture must be structurally valid (the sniff accepts it)")
    assert(Multimodal.gifDecode(sneaky).isEmpty,
      "frame-dims cap must reject before ImageIO allocates")
    // printable-ASCII text carrying the magic must NOT sniff: the
    // block walk is the load-bearing check (this is what keeps the
    // documents-as-media oracles stub-exact on an ASCII corpus)
    assert(Multimodal.gifMeta(
      "GIF89a this is a document about the gif format.".getBytes)
      .isEmpty, "magic alone must not sniff as GIF")
    assert(Multimodal.decode(
      "GIF89a this is a document about the gif format.".getBytes)
      .format != "gif")
    // non-GIF bytes: None
    assert(Multimodal.gifDecode("GIF8 but not really".getBytes).isEmpty)
    assert(Multimodal.gifMeta("plain text".getBytes).isEmpty)
    // resize leg: box fit + lossless PNG transcode, like jpegResize
    val resized = Multimodal.gifResize(gif, 4, 4).get
    val rimg = Multimodal.pngDecode(resized).get
    assert(rimg.width == 4 && rimg.height == 3,
      s"8x6 into 4x4 box must yield 4x3, got ${rimg.width}x${rimg.height}")
    assert(Multimodal.gifResize("text".getBytes, 2, 2).isEmpty)
  }

  test("frameDecodePipeline (the m_frame_decode path) routes JPEG " +
      "payloads to real raster stats and codec-less ones to the stub, " +
      "distributed") {
    import spark.implicits._
    val jpg = jpegBytes(16, 12, (_, _) => (200 << 16) | (90 << 8) | 30)
    val text = "plain payload".getBytes("UTF-8")
    val ds = Seq(Multimodal.MediaRecord(1L, jpg),
      Multimodal.MediaRecord(2L, text)).toDS()
    // sampleBytes ≥ payload so sample 0 is the whole blob — the MJPEG
    // layout (one complete JPEG per sample)
    val got = Multimodal.frameDecodePipeline(ds, maxSamples = 1,
        sampleBytes = math.max(jpg.length, text.length))
      .collect().map(f => (f.doc_id, f.sample_idx) -> f.features.toSeq)
      .toMap
    assert(got((1L, 0)) == Multimodal.jpegFeatures(jpg).get.toSeq,
      "JPEG sample must take the real decode branch")
    assert(got((2L, 0)) == Multimodal.featureStub(text).toSeq,
      "codec-less sample must take the labeled stub")
  }

  test("jpegResize downscales through the shared box fit and emits a " +
      "standards-valid PNG transcode") {
    val jpg = jpegBytes(16, 12, (x, y) => (x * 10) << 16 | (y * 20) << 8)
    val out = Multimodal.jpegResize(jpg, 8, 8).get
    val dec = Multimodal.pngDecode(out).get
    // scale = min(8/16, 8/12, 1) = 0.5 → 8×6
    assert(dec.width == 8 && dec.height == 6)
    // the JDK codec agrees the transcode is well-formed
    assert(imageioRgb(out)._3.toSeq == dec.rgb.toSeq)
    assert(Multimodal.jpegResize("text".getBytes, 8, 8).isEmpty)
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

  // PCM WAV encoder (test-side fixture builder; the main-source
  // concern is decode, so the encoder lives here)
  private def wavBytes(rate: Int, channelSamples: Seq[Array[Double]],
      bits: Int = 16, dataSizeOverride: Option[Int] = None): Array[Byte] = {
    def le16(v: Int) = Array[Byte](v.toByte, (v >> 8).toByte)
    def le32(v: Int) = Array[Byte](v.toByte, (v >> 8).toByte,
      (v >> 16).toByte, (v >> 24).toByte)
    val channels = channelSamples.length
    val frames = channelSamples.head.length
    val bps = bits / 8
    val dataLen = frames * channels * bps
    val out = new java.io.ByteArrayOutputStream()
    out.write("RIFF".getBytes("US-ASCII")); out.write(le32(36 + dataLen))
    out.write("WAVE".getBytes("US-ASCII"))
    out.write("fmt ".getBytes("US-ASCII")); out.write(le32(16))
    out.write(le16(1)); out.write(le16(channels)); out.write(le32(rate))
    out.write(le32(rate * channels * bps)); out.write(le16(channels * bps))
    out.write(le16(bits))
    out.write("data".getBytes("US-ASCII"))
    out.write(le32(dataSizeOverride.getOrElse(dataLen)))
    for (f <- 0 until frames; c <- 0 until channels) {
      val s = channelSamples(c)(f)
      if (bits == 16) out.write(le16(math.round(s * 32767).toInt & 0xffff))
      else out.write((math.round(s * 127).toInt + 128) & 0xff)
    }
    out.toByteArray
  }

  test("wavDecode recovers exact 16-bit PCM samples and mixes stereo " +
      "to mono") {
    val mono = Array(0.0, 0.5, -0.5, 1.0, -1.0, 0.25)
    val w = Multimodal.wavDecode(wavBytes(8000, Seq(mono))).get
    assert(w.sampleRate == 8000 && w.channels == 1)
    // sample-exact round-trip within 16-bit quantization
    assert(w.samples.length == mono.length)
    mono.zip(w.samples).foreach { case (e, g) =>
      assert(math.abs(e - g) < 1.0 / 32767, s"$e vs $g") }
    // stereo: R = -L mixes to (quantized) silence
    val st = Multimodal.wavDecode(
      wavBytes(8000, Seq(mono, mono.map(-_)))).get
    assert(st.channels == 2)
    assert(st.samples.forall(s => math.abs(s) < 1.0 / 32767))
    // 8-bit unsigned decode: same shape, coarser quantization
    val w8 = Multimodal.wavDecode(wavBytes(8000, Seq(mono), bits = 8)).get
    mono.zip(w8.samples).foreach { case (e, g) =>
      assert(math.abs(e - g) <= 1.0 / 127 + 1e-9, s"$e vs $g") }
  }

  test("wavDecode rejects non-PCM, clamps truncated data, ignores " +
      "trailing chunks") {
    val mono = Array.fill(16)(0.5)
    val ok = wavBytes(8000, Seq(mono))
    // format code 3 (IEEE float) → None, never a wrong answer
    val nonPcm = ok.clone(); nonPcm(20) = 3
    assert(Multimodal.wavDecode(nonPcm).isEmpty)
    // data size claiming more bytes than present → decode what exists
    val shortData = wavBytes(8000, Seq(mono),
      dataSizeOverride = Some(16 * 2 + 1000))
    assert(Multimodal.wavDecode(shortData).get.samples.length == 16)
    // truncated mid-data: same clamping
    val cut = ok.take(ok.length - 6)
    assert(Multimodal.wavDecode(cut).get.samples.length == 13)
    // garbage → None
    assert(Multimodal.wavDecode("not audio at all".getBytes).isEmpty)
  }

  test("wavFeatures computes exact RMS / peak / zero-crossing stats " +
      "on a known sine, and extractFeatures routes wav for real") {
    val rate = 8000; val freq = 100; val n = 8000
    val amp = 0.8
    val sine = Array.tabulate(n)(i =>
      amp * math.sin(2 * math.Pi * freq * i / rate))
    val bytes = wavBytes(rate, Seq(sine))
    val f = Multimodal.wavFeatures(bytes).get
    assert(f.length == Multimodal.FeatureMults.length)
    // ground truth computed independently from the quantized samples
    val q = sine.map(s => math.round(s * 32767).toShort / 32768.0)
    val rms = math.sqrt(q.map(s => s * s).sum / n)
    assert(math.abs(f(0) - q.sum / n) < 1e-6)          // mean ~0
    assert(math.abs(f(1) - rms) < 1e-6)                // RMS = amp/√2
    assert(math.abs(f(1) - amp / math.sqrt(2)) < 1e-3)
    assert(math.abs(f(2) - q.map(math.abs).max) < 1e-6) // peak = amp
    // a 100 Hz sine crosses zero 2·f times per second
    assert(math.abs(f(3) - 2.0 * freq * (n - 1) / rate / (n - 1)) < 1e-3)
    assert(math.abs(f.drop(4).sum - 1.0) < 1e-6)       // histogram sums to 1
    // end-to-end routing: wav gets sample stats, text gets the stub
    val text = "just a document".getBytes("UTF-8")
    val recs = Seq(Multimodal.MediaRecord(1L, bytes),
      Multimodal.MediaRecord(2L, text)).toDS()
    val got = Multimodal.extractFeatures(recs).collect()
      .map(r => r.doc_id -> r.features).toMap
    assert(got(1L).toSeq == f.toSeq)
    assert(got(2L).toSeq == Multimodal.featureStub(text).toSeq)
  }

  test("resize dims fit the box, never upscale, floor at 1") {
    val df = Seq((640, 480), (320, 240), (100, 50), (1, 2000))
      .toDF("width", "height")
    val (w2, h2) = Multimodal.resizeDims(col("width"), col("height"),
      320, 240)
    val got = df.select(w2.as("w"), h2.as("h")).as[(Int, Int)].collect()
    assert(got.toSeq == Seq((320, 240), (320, 240), (100, 50), (1, 240)))
  }

  // --- MP4 / ISO-BMFF fixtures (hand-assembled per ISO 14496-12) ----

  private def mbe32(v: Int) = Array[Byte]((v >> 24).toByte,
    (v >> 16).toByte, (v >> 8).toByte, v.toByte)

  private def mbox(typ: String, payload: Array[Byte]*): Array[Byte] = {
    val body = payload.flatten.toArray
    mbe32(8 + body.length) ++
      typ.getBytes(java.nio.charset.StandardCharsets.US_ASCII) ++ body
  }

  /** mvhd v0: 100-byte payload, timescale/duration at +12/+16. */
  private def mvhd(timescale: Int, duration: Int): Array[Byte] =
    mbox("mvhd", mbe32(0), mbe32(0), mbe32(0), mbe32(timescale),
      mbe32(duration), mbe32(0x00010000), mbe32(0x01000000),
      new Array[Byte](8), new Array[Byte](36), new Array[Byte](24),
      mbe32(2))

  /** tkhd v0: 84-byte payload, 16.16 width/height at +76/+80. */
  private def tkhd(w: Int, h: Int): Array[Byte] =
    mbox("tkhd", mbe32(0), mbe32(0), mbe32(0), mbe32(1), mbe32(0),
      mbe32(0), new Array[Byte](8), new Array[Byte](8),
      new Array[Byte](36), mbe32(w << 16), mbe32(h << 16))

  /** Five samples (sizes 3,4,5,6,7; byte fill 0xA1..0xA5) laid out
    * as chunks [s1 s2][s3 s4][s5] via stsc runs (1,2),(3,1). */
  private def mp4Fixture(): (Array[Byte], Seq[Array[Byte]]) = {
    val samples = (1 to 5).map(i =>
      Array.fill[Byte](i + 2)((0xa0 + i).toByte))
    val ftyp = mbox("ftyp",
      "isom".getBytes(java.nio.charset.StandardCharsets.US_ASCII),
      mbe32(0x200),
      "isomiso2".getBytes(java.nio.charset.StandardCharsets.US_ASCII))
    val mdatPayloadAt = ftyp.length + 8
    val chunkOffs = Seq(mdatPayloadAt,
      mdatPayloadAt + 3 + 4, mdatPayloadAt + 3 + 4 + 5 + 6)
    val mdat = mbox("mdat", samples.flatten.toArray)
    val stsz = mbox("stsz", mbe32(0), mbe32(0), mbe32(5),
      samples.map(s => mbe32(s.length)).flatten.toArray)
    val stsc = mbox("stsc", mbe32(0), mbe32(2),
      mbe32(1), mbe32(2), mbe32(1), mbe32(3), mbe32(1), mbe32(1))
    val stco = mbox("stco", mbe32(0), mbe32(3),
      chunkOffs.map(mbe32).flatten.toArray)
    val stbl = mbox("stbl", stsz, stsc, stco)
    val trak = mbox("trak", tkhd(640, 360),
      mbox("mdia", mbox("minf", stbl)))
    val moov = mbox("moov", mvhd(1000, 5000), trak)
    (ftyp ++ mdat ++ moov, samples)
  }

  test("mp4Info parses ftyp brand, mvhd timescale/duration, tkhd " +
      "dims; decode() reports the video dimensions") {
    val (mp4, _) = mp4Fixture()
    val info = Multimodal.mp4Info(mp4).get
    assert(info.majorBrand == "isom")
    assert(info.timescale == 1000L && info.duration == 5000L)
    assert(info.trakCount == 1)
    assert(info.width == 640 && info.height == 360)
    val meta = Multimodal.decode(mp4)
    assert(meta.format == "mp4" && meta.width == 640 &&
      meta.height == 360 && meta.n_bytes == mp4.length)
  }

  test("mp4Samples demuxes exact encoded sample ranges from the " +
      "stsz x stsc x stco tables") {
    val (mp4, samples) = mp4Fixture()
    val got = Multimodal.mp4Samples(mp4, maxSamples = 10).get
    assert(got.length == 5)
    assert(got.zip(samples).forall { case (a, b) => a.sameElements(b) })
    // maxSamples truncates; order is sample order
    val first3 = Multimodal.mp4Samples(mp4, maxSamples = 3).get
    assert(first3.length == 3 &&
      first3.zip(samples.take(3)).forall { case (a, b) =>
        a.sameElements(b) })
    // a per-sample byte cap rejects rather than over-allocates
    assert(Multimodal.mp4Samples(mp4, 10, maxBytesPerSample = 4).isEmpty)
  }

  test("mp4Wrap builds a container mp4Samples round-trips exactly; " +
      "the distributed round-trip recovers consecutive slices") {
    val payload = (0 until 700).map(i => ('a' + i % 26).toByte).toArray
    val slices = payload.grouped(256).toSeq // 256, 256, 188
    val wrapped = Multimodal.mp4Wrap(slices)
    assert(Multimodal.mp4Info(wrapped).exists(_.majorBrand == "isom"))
    val back = Multimodal.mp4Samples(wrapped, 10).get
    assert(back.length == 3 &&
      back.zip(slices).forall { case (a, b) => a.sameElements(b) })
    // distributed: every doc's demuxed frames == consecutive slices
    val ds = spark.createDataset(Seq(
      Multimodal.MediaRecord(1L, payload),
      Multimodal.MediaRecord(2L, "short".getBytes("UTF-8")),
      Multimodal.MediaRecord(3L, Array.empty[Byte])))
    val got = Multimodal.mp4RoundTrip(ds, maxSamples = 4,
        sampleBytes = 256).collect()
      .map(f => (f.doc_id, f.sample_idx, new String(f.frame, "UTF-8")))
      .sortBy(t => (t._1, t._2))
    assert(got.map(t => (t._1, t._2, t._3.length)).toSeq ==
      Seq((1L, 0, 256), (1L, 1, 256), (1L, 2, 188), (2L, 0, 5)))
    assert(got(3)._3 == "short")
  }

  test("mp4: audio-only (no tkhd dims) repurposes width=timescale, " +
      "height=trak count; ASCII and truncated bytes never parse") {
    val audio = mbox("ftyp",
      "M4A ".getBytes(java.nio.charset.StandardCharsets.US_ASCII),
      mbe32(0)) ++
      mbox("moov", mvhd(44100, 441000), mbox("trak", tkhd(0, 0)))
    val meta = Multimodal.decode(audio)
    assert(meta.format == "mp4" && meta.width == 44100 &&
      meta.height == 1)
    // printable-ASCII bytes read as a >=0x20202020 box size → reject
    val text = "this text mentions ftyp but is not a container"
      .getBytes("UTF-8")
    assert(Multimodal.mp4Info(text).isEmpty)
    assert(Multimodal.decode(text) == Multimodal.decodeStub(text))
    val (mp4, _) = mp4Fixture()
    assert(Multimodal.mp4Info(mp4.take(40)).isEmpty) // moov cut off
    assert(Multimodal.mp4Samples(mp4.take(40), 5).isEmpty)
  }

  test("phashDupPairs equals an independent plain-Scala reference: " +
      "band-collision candidates, exact Hamming, threshold filter") {
    // independent reference implementation of the fingerprint
    def bands(text: String): Array[Long] = {
      val len = text.length
      val bl = math.max(len / 64, 1)
      val hs = (0 until 64).map { i =>
        val start = i * bl
        val block =
          if (start >= len) ""
          else text.substring(start, math.min(start + bl, len))
        block.foldLeft(0L)((a, c) => (a * 31 + c.toLong) % 2147483647L)
      }
      val mean = hs.sum / 64
      (0 until 4).map { b =>
        (0 until 16).map { j =>
          if (hs(b * 16 + j) > mean) 1L << j else 0L
        }.sum
      }.toArray
    }
    val base = ("x" * 128) + ("y" * 128) + ("z" * 128) + ("w" * 128)
    val edited = base.substring(0, 256) + "EDITEDXX" + base.substring(264)
    val varied = (0 until 512).map(i => ('a' + (i * 7) % 26).toChar)
      .mkString
    val variedEdit = "QQQQQQQQ" * 3 + varied.substring(24)
    val fixture = Seq((1L, base), (2L, edited), (3L, base),
      (4L, varied), (5L, variedEdit))

    val expected = (for {
      (ia, ta) <- fixture; (ib, tb) <- fixture if ia < ib
      fa = bands(ta); fb = bands(tb)
      if fa.indices.exists(b => fa(b) == fb(b)) // band collision
      ham = fa.indices.map(b =>
        java.lang.Long.bitCount(fa(b) ^ fb(b)).toLong).sum
      if ham <= 6
    } yield (ia, ib) -> ham).toMap

    val out = Multimodal.phashDupPairs(
      fixture.toDF("doc_id", "text"), maxHamming = 6).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    assert(out == expected, s"got $out\nexpected $expected")
    // sanity on the expectation itself: the exact copy is a Hamming-0
    // pair, and the two unrelated families never cross-pair
    assert(expected.get((1L, 3L)).contains(0L))
    assert(!expected.keys.exists { case (a, b) =>
      Set(1L, 2L, 3L)(a) && Set(4L, 5L)(b) })
  }

  test("phashDupPairs releases its persisted fingerprint frame — the " +
      "SQL cache is empty after the call returns") {
    spark.sharedState.cacheManager.clearCache()
    val rddsBefore = spark.sparkContext.getPersistentRDDs.size
    val out = Multimodal.phashDupPairs(
      graft.Tables.documents(spark, sf0001), maxHamming = 6)
    out.count() // materialization already happened (localCheckpoint)
    assert(spark.sharedState.cacheManager.isEmpty,
      "phashDupPairs left a cached frame behind")
    // localCheckpoint pins RDD blocks in executor storage until the
    // ContextCleaner GCs the RDD reference — the SQL cacheManager
    // check above cannot see them. The only persistent RDDs the call
    // may add are the OUTPUT's own checkpoint blocks (pair-count-
    // sized, still referenced via `out`); a corpus-sized fingerprint
    // frame surviving here would show up as extra entries.
    val rddsAfter = spark.sparkContext.getPersistentRDDs.size
    assert(rddsAfter - rddsBefore <= 1,
      s"phashDupPairs pinned ${rddsAfter - rddsBefore} persistent RDDs" +
        " — expected only the checkpointed output")
  }
}
