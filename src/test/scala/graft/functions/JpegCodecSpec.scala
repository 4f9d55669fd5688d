package graft.functions

import graft.SparkSpec

class JpegCodecSpec extends SparkSpec {

  private def srcPx(seed: Long, x: Int, y: Int): Int =
    math.min(255, java.lang.Math.floorMod(seed, 97L).toInt + 2 * x + 3 * y)

  private def imageIoRead(b: Array[Byte]): java.awt.image.BufferedImage =
    javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(b))

  private def imageIoJpeg(bi: java.awt.image.BufferedImage): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(bi, "jpg", bos) shouldBe true
    bos.toByteArray
  }

  test("round trip: decoded pixels stay within 2 LSB of the smooth source pattern") {
    for (seed <- Seq(0L, 1L, 42L, 999L, 123456789L); (w, h) <- Seq((4, 4), (8, 8), (9, 7), (16, 12))) {
      val b = JpegCodec.jpegEncode(seed, w, h)
      b should not be null
      (b(0) & 0xff) shouldBe 0xff
      (b(1) & 0xff) shouldBe 0xd8 // SOI any reader looks for
      val dec = JpegCodec.decodeRgb(b)
      dec should not be null
      dec.width shouldBe w
      dec.height shouldBe h
      for (y <- 0 until h; x <- 0 until w) {
        val got = dec.raw((y * w + x) * 3) & 0xff
        math.abs(got - srcPx(seed, x, y)) should be <= 2
        // grayscale: all three channels replicated
        dec.raw((y * w + x) * 3 + 1) shouldBe dec.raw((y * w + x) * 3)
        dec.raw((y * w + x) * 3 + 2) shouldBe dec.raw((y * w + x) * 3)
      }
    }
  }

  test("encoded JPEGs decode identically under the JDK's independent ImageIO codec") {
    // Spec-conformance proof that doesn't trust our own decoder — and,
    // because both decoders implement the same deterministic baseline
    // pipeline (Huffman is exact; only the IDCT rounding could differ),
    // agreement is within 1 LSB.
    for (seed <- Seq(0L, 7L, 123L); (w, h) <- Seq((4, 4), (9, 6), (16, 11))) {
      val b = JpegCodec.jpegEncode(seed, w, h)
      val ref = imageIoRead(b)
      ref should not be null
      ref.getWidth shouldBe w
      ref.getHeight shouldBe h
      val dec = JpegCodec.decodeRgb(b)
      dec should not be null
      for (y <- 0 until h; x <- 0 until w) {
        val got = dec.raw((y * w + x) * 3) & 0xff
        math.abs(got - ref.getRaster.getSample(x, y, 0)) should be <= 1
      }
    }
  }

  test("ImageIO-written grayscale JPEGs decode to ImageIO's own pixels within 1 LSB") {
    val rnd = new java.util.Random(7)
    for (_ <- 0 until 8) {
      val w = 5 + rnd.nextInt(20); val h = 5 + rnd.nextInt(20)
      val bi = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
      for (y <- 0 until h; x <- 0 until w)
        bi.getRaster.setSample(x, y, 0, rnd.nextInt(256))
      val jb = imageIoJpeg(bi)
      val dec = JpegCodec.decodeRgb(jb)
      dec should not be null
      val ref = imageIoRead(jb)
      dec.width shouldBe ref.getWidth
      dec.height shouldBe ref.getHeight
      for (y <- 0 until h; x <- 0 until w)
        math.abs((dec.raw((y * w + x) * 3) & 0xff) -
          ref.getRaster.getSample(x, y, 0)) should be <= 1
    }
  }

  test("ImageIO-written COLOR JPEGs (4:2:0 subsampled) decode within upsampler tolerance") {
    // The JDK writer subsamples chroma 2x2; its reader upsamples by
    // triangle interpolation while this decoder replicates (nearest).
    // On smooth gradients the two upsamplers differ by at most the
    // per-pixel chroma step, so agreement within a few LSB proves the
    // whole 3-component path (interleaved MCUs, sampling factors,
    // dequant, IDCT, YCbCr→RGB) without re-implementing triangle
    // interpolation.
    for (t <- 0 until 5) {
      val w = 8 + t * 3; val h = 6 + t * 2
      val bi = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
      for (y <- 0 until h; x <- 0 until w)
        bi.setRGB(x, y, new java.awt.Color(30 + 4 * x, 40 + 3 * y, 50 + 2 * x + 2 * y).getRGB)
      val jb = imageIoJpeg(bi)
      val dec = JpegCodec.decodeRgb(jb)
      dec should not be null
      val ref = imageIoRead(jb)
      dec.width shouldBe w
      dec.height shouldBe h
      for (y <- 0 until h; x <- 0 until w; c <- 0 until 3) {
        val rgb = ref.getRGB(x, y)
        val refC = c match {
          case 0 => (rgb >> 16) & 0xff
          case 1 => (rgb >> 8) & 0xff
          case 2 => rgb & 0xff
        }
        math.abs((dec.raw((y * w + x) * 3 + c) & 0xff) - refC) should be <= 12
      }
    }
  }

  test("restart markers: DRI/RSTn files decode through the reset path, and ImageIO agrees") {
    // 16x12 at interval 1 → an RST between every pair of the 4 MCUs; the
    // decoder must realign to the byte boundary, check the RST sequence
    // number, and reset the DC predictor — and the JDK's reader validates
    // our EMISSION of the same protocol independently.
    for ((w, h, ri) <- Seq((16, 12, 1), (24, 16, 2), (16, 16, 5))) {
      val b = JpegCodec.jpegEncode(77L, w, h, restartInterval = ri)
      b should not be null
      val dec = JpegCodec.decodeRgb(b)
      dec should not be null
      dec.width shouldBe w
      dec.height shouldBe h
      for (y <- 0 until h; x <- 0 until w)
        math.abs((dec.raw((y * w + x) * 3) & 0xff) - srcPx(77L, x, y)) should be <= 2
      val ref = imageIoRead(b)
      ref should not be null
      for (y <- 0 until h; x <- 0 until w)
        math.abs((dec.raw((y * w + x) * 3) & 0xff) -
          ref.getRaster.getSample(x, y, 0)) should be <= 1
    }
    // A WRONG restart sequence number must be rejected, not glossed over:
    // corrupt the first RST marker's index (0xD0 → 0xD5).
    val b = JpegCodec.jpegEncode(77L, 16, 12, restartInterval = 1)
    val at = (0 until b.length - 1).find(i =>
      (b(i) & 0xff) == 0xff && (b(i + 1) & 0xff) == 0xd0).get
    val m = b.clone(); m(at + 1) = 0xd5.toByte
    JpegCodec.jpegStats(m) shouldBe null
  }

  test("jpegStats returns dims + channel sums; sums match the pixel sum within tolerance") {
    val seed = 31L; val w = 9; val h = 7
    val st = JpegCodec.jpegStats(JpegCodec.jpegEncode(seed, w, h))
    st should not be null
    st.getInt(0) shouldBe w
    st.getInt(1) shouldBe h
    val exact = (for (y <- 0 until h; x <- 0 until w) yield srcPx(seed, x, y).toLong).sum
    math.abs(st.getLong(2) - exact) should be <= 2L * w * h
    st.getLong(3) shouldBe st.getLong(2) // grayscale replication
    st.getLong(4) shouldBe st.getLong(2)
  }

  test("unsupported and malformed inputs return null, never throw") {
    val good = JpegCodec.jpegEncode(5L, 8, 8)
    JpegCodec.jpegStats(null) shouldBe null
    JpegCodec.jpegStats(Array.emptyByteArray) shouldBe null
    JpegCodec.jpegStats("not a jpeg at all".getBytes) shouldBe null
    JpegCodec.jpegEncode(1L, 0, 5) shouldBe null
    JpegCodec.jpegEncode(1L, 5, JpegCodec.MaxDim + 1) shouldBe null
    // progressive: flip the SOF0 marker byte to SOF2
    val prog = good.clone()
    val sofAt = prog.indices.find(i =>
      (prog(i) & 0xff) == 0xff && (prog(i + 1) & 0xff) == 0xc0).get
    prog(sofAt + 1) = 0xc2.toByte
    JpegCodec.jpegStats(prog) shouldBe null
    // truncations at every prefix length must reject cleanly
    for (n <- 0 until good.length)
      JpegCodec.jpegStats(java.util.Arrays.copyOf(good, n)) shouldBe null
    // trailing junk after EOI is rejected (strict, like the PNG walker)
    JpegCodec.jpegStats(good :+ 0x00.toByte) shouldBe null
  }

  test("fuzz: arbitrary and mutated bytes are total (null or value, no throw)") {
    val rnd = new java.util.Random(42)
    for (_ <- 0 until 300) {
      val junk = new Array[Byte](rnd.nextInt(200))
      rnd.nextBytes(junk)
      noException should be thrownBy JpegCodec.jpegStats(junk)
    }
    val good = JpegCodec.jpegEncode(77L, 10, 9)
    for (_ <- 0 until 500) {
      val mut = good.clone()
      val flips = 1 + rnd.nextInt(3)
      for (_ <- 0 until flips)
        mut(rnd.nextInt(mut.length)) = rnd.nextInt(256).toByte
      noException should be thrownBy JpegCodec.jpegStats(mut)
    }
  }
}
