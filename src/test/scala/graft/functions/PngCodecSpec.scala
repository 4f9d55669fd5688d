package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class PngCodecSpec extends SparkSpec {

  private def closedFormSums(seed: Long, w: Int, h: Int): (Long, Long, Long) = (
    (for (x <- 0 until w; y <- 0 until h)
      yield java.lang.Math.floorMod(seed + 11 * x + 13 * y, 256L)).sum,
    (for (x <- 0 until w; y <- 0 until h)
      yield java.lang.Math.floorMod(seed + 5 * x + 7 * y, 256L)).sum,
    (for (x <- 0 until w; y <- 0 until h)
      yield java.lang.Math.floorMod(seed + 2 * x + 3 * y, 256L)).sum)

  test("pngEncode emits a well-formed PNG; pngStats decodes it back exactly") {
    // height 7 > 5 so the filter cycle (row % 5) exercises ALL five
    // reconstruction paths: None, Sub, Up, Average, Paeth.
    val b = PngCodec.pngEncode(seed = 9L, width = 6, height = 7)
    // signature a real viewer relies on
    (b(0) & 0xff) shouldBe 0x89
    new String(b.slice(1, 4), "US-ASCII") shouldBe "PNG"
    val st = PngCodec.pngStats(b)
    st should not be null
    st.getInt(0) shouldBe 6
    st.getInt(1) shouldBe 7
    val (r, g, bl) = closedFormSums(9L, 6, 7)
    st.getLong(2) shouldBe r
    st.getLong(3) shouldBe g
    st.getLong(4) shouldBe bl
  }

  test("encoded PNGs decode identically under the JDK's independent ImageIO codec") {
    // Spec-conformance proof that doesn't trust our own decoder: the JVM's
    // built-in PNG reader must reconstruct the exact same pixels.
    for (seed <- Seq(0L, 7L, 123L); (w, h) <- Seq((4, 4), (9, 6), (5, 11))) {
      val png = PngCodec.pngEncode(seed, w, h)
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(png))
      img should not be null
      img.getWidth shouldBe w
      img.getHeight shouldBe h
      for (x <- 0 until w; y <- 0 until h) {
        val rgb = img.getRGB(x, y)
        ((rgb >> 16) & 0xff) shouldBe java.lang.Math.floorMod(seed + 11 * x + 13 * y, 256L).toInt
        ((rgb >> 8) & 0xff) shouldBe java.lang.Math.floorMod(seed + 5 * x + 7 * y, 256L).toInt
        (rgb & 0xff) shouldBe java.lang.Math.floorMod(seed + 2 * x + 3 * y, 256L).toInt
      }
    }
  }

  test("pngStats decodes PNGs produced by the independent ImageIO encoder") {
    // Interop the other way: a foreign encoder (its own filter choices,
    // its own IDAT chunking) must parse through our full decode path.
    val w = 8; val h = 5; val seed = 42L
    val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (x <- 0 until w; y <- 0 until h) {
      val r = java.lang.Math.floorMod(seed + 11 * x + 13 * y, 256L).toInt
      val g = java.lang.Math.floorMod(seed + 5 * x + 7 * y, 256L).toInt
      val bl = java.lang.Math.floorMod(seed + 2 * x + 3 * y, 256L).toInt
      img.setRGB(x, y, (r << 16) | (g << 8) | bl)
    }
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out) shouldBe true
    val st = PngCodec.pngStats(out.toByteArray)
    st should not be null
    st.getInt(0) shouldBe w
    st.getInt(1) shouldBe h
    val (r, g, bl) = closedFormSums(seed, w, h)
    st.getLong(2) shouldBe r
    st.getLong(3) shouldBe g
    st.getLong(4) shouldBe bl
  }

  test("pngStats decodes 8-bit GRAYSCALE PNGs (color type 0) from the independent encoder") {
    // real corpora carry grayscale PNGs; ImageIO writes TYPE_BYTE_GRAY as
    // color type 0, exercising the 1-byte-per-pixel filter distance.
    val w = 7; val h = 5
    val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    var expected = 0L
    for (x <- 0 until w; y <- 0 until h) {
      val v = java.lang.Math.floorMod(31L * x + 17L * y + 3, 256L).toInt
      img.getRaster.setSample(x, y, 0, v)
      expected += v
    }
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out) shouldBe true
    val st = PngCodec.pngStats(out.toByteArray)
    st should not be null
    st.getInt(0) shouldBe w
    st.getInt(1) shouldBe h
    // grayscale expands to R=G=B
    st.getLong(2) shouldBe expected
    st.getLong(3) shouldBe expected
    st.getLong(4) shouldBe expected
  }

  test("pngStats rejects malformed payloads instead of misreading them") {
    PngCodec.pngStats(null) shouldBe null
    PngCodec.pngStats(Array[Byte](1, 2, 3)) shouldBe null
    PngCodec.pngStats("definitely not a portable network graphic".getBytes) shouldBe null
    val good = PngCodec.pngEncode(1L, 6, 6)
    PngCodec.pngStats(good.take(40)) shouldBe null          // truncated mid-IHDR
    PngCodec.pngStats(good.dropRight(12)) shouldBe null     // missing IEND
    val flipBit = good.clone()
    flipBit(40) = (flipBit(40) ^ 0x01).toByte               // corrupt IDAT body
    PngCodec.pngStats(flipBit) shouldBe null                // caught by CRC32
    val badColor = good.clone()
    badColor(25) = 6                                        // RGBA color type
    PngCodec.pngStats(badColor) shouldBe null               // (also breaks CRC)
    // surplus pixel rows inside a valid zlib stream: re-deflate a stream
    // one scanline too long and reseal the chunk CRCs
    val tooTall = PngCodec.pngEncode(1L, 6, 7)
    val spliced = spliceIdat(good, extractInflated(tooTall))
    PngCodec.pngStats(spliced) shouldBe null
  }

  test("pngStats skips ancillary chunks (tEXt) but still verifies their CRC") {
    val good = PngCodec.pngEncode(5L, 4, 6)
    val ref = PngCodec.pngStats(good)
    // splice a tEXt chunk between IHDR and IDAT
    val text = "Comment\u0000generated by graft".getBytes("ISO-8859-1")
    val out = new java.io.ByteArrayOutputStream()
    val ihdrEnd = 8 + 12 + 13
    out.write(good, 0, ihdrEnd)
    out.write(Array((text.length >>> 24).toByte, (text.length >>> 16).toByte,
      (text.length >>> 8).toByte, text.length.toByte))
    out.write("tEXt".getBytes("US-ASCII"))
    out.write(text)
    val crc = new java.util.zip.CRC32()
    crc.update("tEXt".getBytes("US-ASCII")); crc.update(text)
    val c = crc.getValue.toInt
    out.write(Array((c >>> 24).toByte, (c >>> 16).toByte, (c >>> 8).toByte, c.toByte))
    out.write(good, ihdrEnd, good.length - ihdrEnd)
    val withText = out.toByteArray
    val st = PngCodec.pngStats(withText)
    st should not be null
    st shouldBe ref
    // ...and a corrupted ancillary chunk is still malformed, not ignored
    val bad = withText.clone()
    bad(ihdrEnd + 8 + 2) = (bad(ihdrEnd + 8 + 2) ^ 0x01).toByte
    PngCodec.pngStats(bad) shouldBe null
  }

  test("pngResize samples the floor-division source pixel and emits a real PNG") {
    val seed = 11L; val sw = 9; val sh = 6; val dw = 4; val dh = 3
    val resized = PngCodec.pngResize(PngCodec.pngEncode(seed, sw, sh), dw, dh)
    resized should not be null
    // our decoder agrees with the closed form...
    val st = PngCodec.pngStats(resized)
    st.getInt(0) shouldBe dw
    st.getInt(1) shouldBe dh
    def sums(cx: Int, cy: Int) = (for (x <- 0 until dw; y <- 0 until dh)
      yield java.lang.Math.floorMod(
        seed + cx * (x * sw / dw) + cy * (y * sh / dh), 256L)).sum
    st.getLong(2) shouldBe sums(11, 13)
    st.getLong(3) shouldBe sums(5, 7)
    st.getLong(4) shouldBe sums(2, 3)
    // ...and the re-encoded file is a real PNG an independent codec opens
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(resized))
    img.getWidth shouldBe dw
    img.getHeight shouldBe dh
    (img.getRGB(1, 2) & 0xff) shouldBe
      java.lang.Math.floorMod(seed + 2 * (1 * sw / dw) + 3 * (2 * sh / dh), 256L).toInt
    // upscaling and malformed input refuse
    PngCodec.pngResize(PngCodec.pngEncode(seed, 4, 4), 5, 2) shouldBe null
    PngCodec.pngResize("nope".getBytes, 2, 2) shouldBe null
  }

  /** Inflate every IDAT byte of a valid encoder output. */
  private def extractInflated(png: Array[Byte]): Array[Byte] = {
    var pos = 8
    val idat = new java.io.ByteArrayOutputStream()
    while (pos + 12 <= png.length) {
      val len = ((png(pos) & 0xff) << 24) | ((png(pos + 1) & 0xff) << 16) |
        ((png(pos + 2) & 0xff) << 8) | (png(pos + 3) & 0xff)
      if (new String(png, pos + 4, 4, "US-ASCII") == "IDAT")
        idat.write(png, pos + 8, len)
      pos += 12 + len
    }
    val inf = new java.util.zip.Inflater()
    inf.setInput(idat.toByteArray)
    val buf = new Array[Byte](1 << 20)
    val n = inf.inflate(buf)
    inf.end()
    buf.take(n)
  }

  /** Rebuild `base` with its IDAT replaced by deflate(raw), CRC resealed. */
  private def spliceIdat(base: Array[Byte], raw: Array[Byte]): Array[Byte] = {
    val defl = new java.util.zip.Deflater()
    defl.setInput(raw); defl.finish()
    val zb = new Array[Byte](raw.length + 64)
    val zn = defl.deflate(zb); defl.end()
    val out = new java.io.ByteArrayOutputStream()
    var pos = 8
    out.write(base, 0, 8)
    while (pos + 12 <= base.length) {
      val len = ((base(pos) & 0xff) << 24) | ((base(pos + 1) & 0xff) << 16) |
        ((base(pos + 2) & 0xff) << 8) | (base(pos + 3) & 0xff)
      val typ = new String(base, pos + 4, 4, "US-ASCII")
      if (typ == "IDAT") {
        val data = zb.take(zn)
        val lenB = Array(
          (data.length >>> 24).toByte, (data.length >>> 16).toByte,
          (data.length >>> 8).toByte, data.length.toByte)
        out.write(lenB)
        out.write("IDAT".getBytes("US-ASCII"))
        out.write(data)
        val crc = new java.util.zip.CRC32()
        crc.update("IDAT".getBytes("US-ASCII")); crc.update(data)
        val c = crc.getValue.toInt
        out.write(Array((c >>> 24).toByte, (c >>> 16).toByte, (c >>> 8).toByte, c.toByte))
      } else out.write(base, pos, 12 + len)
      pos += 12 + len
    }
    out.toByteArray
  }

  test("q112 path end-to-end: encode → decode as Columns matches the closed form") {
    val df = spark.range(0, 30).toDF("doc_id")
    val decoded = graft.ops.Multimodal.pngAssets(df, "doc_id")
      .select(col("asset_id"), graft.ops.Multimodal.decodePng(col("payload")).as("st"))
      .select(col("asset_id"), col("st.width"), col("st.height"),
        col("st.sum_r"), col("st.sum_g"), col("st.sum_b"))
      .collect()
    decoded.length shouldBe 30
    decoded.foreach { row =>
      val id = row.getLong(0)
      val w = 4 + (id % 7).toInt; val h = 4 + (id % 5).toInt
      row.getInt(1) shouldBe w
      row.getInt(2) shouldBe h
      val (r, g, b) = closedFormSums(id, w, h)
      row.getLong(3) shouldBe r
      row.getLong(4) shouldBe g
      row.getLong(5) shouldBe b
    }
  }

  test("pngPixels matches the closed form AND bmpPixels' layout bit-for-bit") {
    // The cross-format dedup contract (q178): the same (seed, w, h)
    // encoded as PNG and as BMP must decode to IDENTICAL pixel arrays —
    // same row order, same channel interleave.
    for (seed <- Seq(0L, 9L, 255L, 1000L); (w, h) <- Seq((5, 4), (6, 7))) {
      val p = PngCodec.pngPixels(PngCodec.pngEncode(seed, w, h))
      val m = MediaCodec.bmpPixels(MediaCodec.bmpEncode(seed, w, h))
      p should not be null
      p.getInt(0) shouldBe w
      p.getInt(1) shouldBe h
      val pPix = p.getArray(2).toIntArray()
      pPix shouldBe m.getArray(2).toIntArray()
      // closed form: pixel (x, y) channel c at (y·w + x)·3 + c
      for (y <- 0 until h; x <- 0 until w) {
        val o = (y * w + x) * 3
        pPix(o) shouldBe java.lang.Math.floorMod(seed + 11 * x + 13 * y, 256L).toInt
        pPix(o + 1) shouldBe java.lang.Math.floorMod(seed + 5 * x + 7 * y, 256L).toInt
        pPix(o + 2) shouldBe java.lang.Math.floorMod(seed + 2 * x + 3 * y, 256L).toInt
      }
    }
    PngCodec.pngPixels("notapng".getBytes) shouldBe null
  }
}
