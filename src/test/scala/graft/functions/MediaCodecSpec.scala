package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

class MediaCodecSpec extends SparkSpec {

  test("bmpEncode emits a well-formed BMP; bmpStats parses it back exactly") {
    val b = MediaCodec.bmpEncode(seed = 7L, width = 5, height = 3)
    // header facts a real viewer relies on
    b(0).toChar shouldBe 'B'; b(1).toChar shouldBe 'M'
    // width 5 → 15 pixel bytes/row, padded to 16; file = 54 + 3*16
    b.length shouldBe 54 + 3 * 16
    val st = MediaCodec.bmpStats(b)
    st.getInt(0) shouldBe 5
    st.getInt(1) shouldBe 3
    // closed form: sum over x<5,y<3 of (7 + 11x + 13y) % 256  (all < 256)
    val expR = (for (x <- 0 until 5; y <- 0 until 3) yield (7 + 11 * x + 13 * y) % 256).sum
    val expG = (for (x <- 0 until 5; y <- 0 until 3) yield (7 + 5 * x + 7 * y) % 256).sum
    val expB = (for (x <- 0 until 5; y <- 0 until 3) yield (7 + 2 * x + 3 * y) % 256).sum
    st.getLong(2) shouldBe expR.toLong
    st.getLong(3) shouldBe expG.toLong
    st.getLong(4) shouldBe expB.toLong
  }

  test("bmpStats handles top-down orientation (negative height)") {
    val b = MediaCodec.bmpEncode(3L, 4, 2)
    val sums = MediaCodec.bmpStats(b)
    // flip to top-down: height := -2, row order reversed
    val flipped = b.clone()
    val h = -2
    flipped(22) = h.toByte; flipped(23) = (h >> 8).toByte
    flipped(24) = (h >> 16).toByte; flipped(25) = (h >> 24).toByte
    val rowSize = ((4 * 3 + 3) / 4) * 4
    Array.copy(b, 54, flipped, 54 + rowSize, rowSize)
    Array.copy(b, 54 + rowSize, flipped, 54, rowSize)
    val st = MediaCodec.bmpStats(flipped)
    st.getInt(1) shouldBe 2 // reported as positive
    // channel sums are orientation-invariant
    st.getLong(2) shouldBe sums.getLong(2)
    st.getLong(4) shouldBe sums.getLong(4)
  }

  test("bmpStats rejects malformed payloads instead of misreading them") {
    MediaCodec.bmpStats(null) shouldBe null
    MediaCodec.bmpStats(Array[Byte](1, 2, 3)) shouldBe null
    MediaCodec.bmpStats("not a bitmap at all, just text".getBytes) shouldBe null
    val good = MediaCodec.bmpEncode(1L, 4, 4)
    MediaCodec.bmpStats(good.take(53)) shouldBe null       // truncated header
    MediaCodec.bmpStats(good.take(60)) shouldBe null       // truncated pixels
    val badBpp = good.clone(); badBpp(28) = 8               // 8-bit palette
    MediaCodec.bmpStats(badBpp) shouldBe null
    val badComp = good.clone(); badComp(30) = 1             // BI_RLE8
    MediaCodec.bmpStats(badComp) shouldBe null
    // height = Int.MinValue: math.abs stays negative — must reject, not
    // return a garbage row with height -2147483648
    val minH = good.clone()
    minH(22) = 0; minH(23) = 0; minH(24) = 0; minH(25) = 0x80.toByte
    MediaCodec.bmpStats(minH) shouldBe null
    MediaCodec.bmpResize(minH, 2, 2) shouldBe null
  }

  test("wavEncode emits well-formed RIFF/WAVE; wavStats walks it back") {
    val n = 100
    val b = MediaCodec.wavEncode(seed = 11L, nSamples = n, sampleRate = 16000)
    b.length shouldBe 44 + 2 * n
    new String(b.slice(0, 4)) shouldBe "RIFF"
    new String(b.slice(8, 12)) shouldBe "WAVE"
    val st = MediaCodec.wavStats(b)
    st.getInt(0) shouldBe 16000
    st.getLong(1) shouldBe n.toLong
    val samples = (0 until n).map(i => ((11L + 17L * i) % 65536L).toInt - 32768)
    st.getLong(2) shouldBe samples.map(v => math.abs(v).toLong).sum
    st.getInt(3) shouldBe samples.map(math.abs).max
  }

  test("wavStats walks extra chunks (word-aligned) before data") {
    val base = MediaCodec.wavEncode(5L, 10, 8000)
    // splice an odd-size LIST chunk (size 5 → padded to 6) between fmt and data
    val extra = Array[Byte]('L', 'I', 'S', 'T', 5, 0, 0, 0, 1, 2, 3, 4, 5, 0)
    val spliced = new Array[Byte](base.length + extra.length)
    Array.copy(base, 0, spliced, 0, 36)           // RIFF hdr + fmt chunk
    Array.copy(extra, 0, spliced, 36, extra.length)
    Array.copy(base, 36, spliced, 36 + extra.length, base.length - 36)
    val riffSize = spliced.length - 8
    spliced(4) = riffSize.toByte; spliced(5) = (riffSize >> 8).toByte
    spliced(6) = (riffSize >> 16).toByte; spliced(7) = (riffSize >> 24).toByte
    val st = MediaCodec.wavStats(spliced)
    st should not be null
    st.getLong(1) shouldBe 10L
    st.getLong(2) shouldBe MediaCodec.wavStats(base).getLong(2)
  }

  test("wavStats rejects malformed/unsupported payloads") {
    MediaCodec.wavStats(null) shouldBe null
    MediaCodec.wavStats("RIFFbutnotawave-----------------------------".getBytes) shouldBe null
    val good = MediaCodec.wavEncode(1L, 8, 8000)
    MediaCodec.wavStats(good.take(40)) shouldBe null       // truncated
    val stereo = good.clone(); stereo(22) = 2               // channels = 2
    MediaCodec.wavStats(stereo) shouldBe null
    val eightBit = good.clone(); eightBit(34) = 8           // bits = 8
    MediaCodec.wavStats(eightBit) shouldBe null
  }

  test("mulaw: compress/expand round trip within segment quantization error") {
    // canonical anchors: +0 is 0xFF, and expand is the exact inverse table
    MediaCodec.mulawCompress(0) shouldBe 0xFF
    MediaCodec.mulawExpand(0xFF) shouldBe 0
    // exhaustive 16-bit sweep: truncation error is bounded by the segment
    // step (v/16 with bias), and the sign always survives
    var s = -32768
    while (s <= 32767) {
      val mag = math.min(32635, math.abs(s))
      val want = if (s < 0) -mag else mag
      val d = MediaCodec.mulawExpand(MediaCodec.mulawCompress(s))
      assert(math.abs(d - want) <= (mag + 132) / 16,
        s"round trip $s -> $d drifted past the segment step")
      s += 1
    }
  }

  test("mulawExpand matches the JDK's independent javax.sound ULAW decoder on all 256 codes") {
    import javax.sound.sampled.{AudioFormat, AudioInputStream, AudioSystem}
    val codes = Array.tabulate[Byte](256)(_.toByte)
    val ulaw = new AudioFormat(AudioFormat.Encoding.ULAW, 8000f, 8, 1, 1, 8000f, false)
    val pcmFmt = new AudioFormat(AudioFormat.Encoding.PCM_SIGNED, 8000f, 16, 1, 2, 8000f, false)
    val pcm = AudioSystem.getAudioInputStream(pcmFmt,
      new AudioInputStream(new java.io.ByteArrayInputStream(codes), ulaw, 256))
    val out = pcm.readAllBytes()
    out.length shouldBe 512
    for (i <- 0 until 256) {
      val v = ((out(2 * i + 1) << 8) | (out(2 * i) & 0xff)).toShort.toInt
      assert(v == MediaCodec.mulawExpand(i),
        s"code $i: JDK decodes $v, mulawExpand gives ${MediaCodec.mulawExpand(i)}")
    }
  }

  test("wavEncodeUlaw emits a fact-chunked format-7 WAVE; wavStats decodes through expand") {
    val b = MediaCodec.wavEncodeUlaw(seed = 11L, nSamples = 9, sampleRate = 8000)
    // format code 7, mono, 8-bit, 18-byte fmt body, fact chunk present
    (b(20) & 0xff) shouldBe 7
    (b(34) & 0xff) shouldBe 8
    new String(b.slice(38, 42)) shouldBe "fact"
    b.length % 2 shouldBe 0 // odd data chunk word-aligned
    val st = MediaCodec.wavStats(b)
    st should not be null
    st.getInt(0) shouldBe 8000
    st.getLong(1) shouldBe 9L
    val dec = (0 until 9).map { i =>
      MediaCodec.mulawExpand(
        MediaCodec.mulawCompress(((11L + 17L * i) % 65536L).toInt - 32768))
    }
    st.getLong(2) shouldBe dec.map(v => math.abs(v).toLong).sum
    st.getInt(3) shouldBe dec.map(math.abs).max
    // the JDK opens the file as real audio and decodes the same PCM
    import javax.sound.sampled.{AudioFormat, AudioSystem}
    val ais = AudioSystem.getAudioInputStream(new java.io.ByteArrayInputStream(b))
    val pcmFmt = new AudioFormat(AudioFormat.Encoding.PCM_SIGNED, 8000f, 16, 1, 2, 8000f, false)
    val jdk = AudioSystem.getAudioInputStream(pcmFmt, ais).readAllBytes()
    val jdkSamples = (0 until 9).map(i => ((jdk(2 * i + 1) << 8) | (jdk(2 * i) & 0xff)).toShort.toInt)
    jdkSamples shouldBe dec
  }

  test("alaw: compress/expand round trip within segment quantization error") {
    // A-law has no true zero: 0 encodes to +8 (half the segment-0 step)
    MediaCodec.alawExpand(MediaCodec.alawCompress(0)) shouldBe 8
    var s = -32768
    while (s <= 32767) {
      val d = MediaCodec.alawExpand(MediaCodec.alawCompress(s))
      // segment step is 16·2^e ≤ (|s|+264)/16; mid-rise offset adds step/2
      val bound = math.max(16, (math.abs(s) + 264) / 16)
      assert(math.abs(d - s) <= bound,
        s"round trip $s -> $d drifted past the segment step")
      assert(s >= -16 || (d < 0) == (s < 0), s"sign flipped: $s -> $d")
      s += 1
    }
  }

  test("alawExpand matches the JDK's independent javax.sound ALAW decoder on all 256 codes") {
    import javax.sound.sampled.{AudioFormat, AudioInputStream, AudioSystem}
    val codes = Array.tabulate[Byte](256)(_.toByte)
    val alaw = new AudioFormat(AudioFormat.Encoding.ALAW, 8000f, 8, 1, 1, 8000f, false)
    val pcmFmt = new AudioFormat(AudioFormat.Encoding.PCM_SIGNED, 8000f, 16, 1, 2, 8000f, false)
    val pcm = AudioSystem.getAudioInputStream(pcmFmt,
      new AudioInputStream(new java.io.ByteArrayInputStream(codes), alaw, 256))
    val out = pcm.readAllBytes()
    out.length shouldBe 512
    for (i <- 0 until 256) {
      val v = ((out(2 * i + 1) << 8) | (out(2 * i) & 0xff)).toShort.toInt
      assert(v == MediaCodec.alawExpand(i),
        s"code $i: JDK decodes $v, alawExpand gives ${MediaCodec.alawExpand(i)}")
    }
  }

  test("wavEncodeAlaw emits a format-6 WAVE; wavStats decodes through the A-law expander") {
    val b = MediaCodec.wavEncodeAlaw(seed = 23L, nSamples = 10, sampleRate = 16000)
    (b(20) & 0xff) shouldBe 6
    val st = MediaCodec.wavStats(b)
    st should not be null
    st.getInt(0) shouldBe 16000
    st.getLong(1) shouldBe 10L
    val dec = (0 until 10).map { i =>
      MediaCodec.alawExpand(
        MediaCodec.alawCompress(((23L + 17L * i) % 65536L).toInt - 32768))
    }
    st.getLong(2) shouldBe dec.map(v => math.abs(v).toLong).sum
    st.getInt(3) shouldBe dec.map(math.abs).max
  }

  /** Test-local replay of the IMA recurrence with its OWN copies of the
    * spec tables — pins the production tables: an edit to either literal
    * in MediaCodec diverges from this one and fails. */
  private def imaReplay(seed: Long, n: Int): Seq[Int] = {
    val step = Array(7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25,
      28, 31, 34, 37, 41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118,
      130, 143, 157, 173, 190, 209, 230, 253, 279, 307, 337, 371, 408,
      449, 494, 544, 598, 658, 724, 796, 876, 963, 1060, 1166, 1282,
      1411, 1552, 1707, 1878, 2066, 2272, 2499, 2749, 3024, 3327, 3660,
      4026, 4428, 4871, 5358, 5894, 6484, 7132, 7845, 8630, 9493, 10442,
      11487, 12635, 13899, 15289, 16818, 18500, 20350, 22385, 24623,
      27086, 29794, 32767)
    val adj = Array(-1, -1, -1, -1, 2, 4, 6, 8)
    var pred = 0; var idx = 0
    (0 until n).map { i =>
      val s = (((seed + 17L * i) % 65536L).toInt - 32768)
      if (i % 65 == 0) { pred = s; s }
      else {
        val st = step(idx)
        var d = s - pred; var code = 0
        if (d < 0) { code = 8; d = -d }
        if (d >= st) { code |= 4; d -= st }
        if (d >= (st >> 1)) { code |= 2; d -= st >> 1 }
        if (d >= (st >> 2)) code |= 1
        var dq = st >> 3
        if ((code & 4) != 0) dq += st
        if ((code & 2) != 0) dq += st >> 1
        if ((code & 1) != 0) dq += st >> 2
        pred = math.max(-32768, math.min(32767, if ((code & 8) != 0) pred - dq else pred + dq))
        idx = math.max(0, math.min(88, idx + adj(code & 7)))
        pred
      }
    }
  }

  test("wavEncodeIma emits block-aligned format-0x11 WAVE; wavStats replays the state machine") {
    for (n <- Seq(64, 65, 66, 130, 163)) { // 1-3 blocks, ragged and exact
      val b = MediaCodec.wavEncodeIma(seed = 31L, nSamples = n, sampleRate = 8000)
      (b(20) & 0xff) shouldBe 0x11
      new String(b.slice(40, 44)) shouldBe "fact"
      val nBlocks = (n + 64) / 65
      b.length shouldBe 60 + nBlocks * 36
      val st = MediaCodec.wavStats(b)
      withClue(s"n=$n: ") {
        st should not be null
        st.getLong(1) shouldBe n.toLong
        val dec = imaReplay(31L, n)
        st.getLong(2) shouldBe dec.map(v => math.abs(v).toLong).sum
        st.getInt(3) shouldBe dec.map(math.abs).max
      }
    }
  }

  test("IMA decode tracks a smooth signal closely (adaptive step converges)") {
    // The corpus formula advances 17 units/sample after the raw header
    // sample — slow relative to 16-bit range, so after the step table
    // adapts the reconstruction must stay within a small bound of the
    // true signal for in-block samples. A broken index adaptation or
    // nibble order blows this up by orders of magnitude.
    val n = 65
    val dec = imaReplay(3L, n)
    val err = (1 until n).map(i => math.abs(dec(i) - (((3L + 17L * i) % 65536L).toInt - 32768)))
    // skip the first few adaptation samples; the steady-state must track
    all(err.drop(8)) should be <= 64
  }

  test("wavStats rejects malformed IMA payloads") {
    val good = MediaCodec.wavEncodeIma(7L, 100, 8000)
    MediaCodec.wavStats(good.take(70)) shouldBe null         // truncated data
    val badRes = good.clone(); badRes(63) = 1                // reserved byte
    MediaCodec.wavStats(badRes) shouldBe null
    val badIdx = good.clone(); badIdx(62) = 90.toByte        // index > 88
    MediaCodec.wavStats(badIdx) shouldBe null
    val badFact = good.clone(); badFact(48) = 0; badFact(49) = 0
    MediaCodec.wavStats(badFact) shouldBe null               // fact = 0
    val badSpb = good.clone(); badSpb(38) = 17               // spb mismatch
    MediaCodec.wavStats(badSpb) shouldBe null
  }

  test("wavStats accepts a spec-legal WAVE whose fact chunk FOLLOWS data") {
    // wavEncodeIma lays out fmt(12..39) fact(40..51) data(52..); RIFF
    // allows any chunk order after fmt, so rebuild the same file with
    // the fact chunk moved after data and require an identical decode
    val good = MediaCodec.wavEncodeIma(7L, 100, 8000)
    new String(good.slice(40, 44)) shouldBe "fact"
    val reordered = good.take(40) ++ good.drop(52) ++ good.slice(40, 52)
    reordered.length shouldBe good.length
    val a = MediaCodec.wavStats(good)
    val b = MediaCodec.wavStats(reordered)
    b should not be null
    (0 until 4).foreach { i =>
      b.get(i, null).toString shouldBe a.get(i, null).toString
    }
  }

  test("aviEncode nulls when the total file size overflows Int, not a negative alloc") {
    // 4096 x 4096 x 43 frames passes every per-field bound but the movi
    // payload is ~2.2 GB — must hit the null-on-invalid contract
    MediaCodec.aviEncode(1L, 4096, 4096, 43) shouldBe null
    // boundary sanity: a modest clip still encodes
    MediaCodec.aviEncode(1L, 8, 8, 2) should not be null
  }

  test("mjpegEncode emits a real MJPG AVI; mjpegStats runs every frame through the JPEG decoder") {
    val b = MediaCodec.mjpegEncode(seed = 11L, width = 7, height = 5, nFrames = 3)
    b should not be null
    new String(b.slice(8, 12)) shouldBe "AVI "
    val d = MediaCodec.mjpegStats(b)
    d should not be null
    d.getInt(0) shouldBe 7
    d.getInt(1) shouldBe 5
    d.getInt(2) shouldBe 3
    val frames = d.getArray(3)
    frames.numElements shouldBe 3
    // composition check: each container frame must decode to exactly what
    // the standalone JPEG codec produces for the same (seed, dims)
    for (f <- 0 until 3) {
      val expect = JpegCodec.jpegStats(JpegCodec.jpegEncode(11L + 1000003L * f, 7, 5))
      val fr = frames.getStruct(f, 3)
      fr.getLong(0) shouldBe expect.getLong(2)
      fr.getLong(1) shouldBe expect.getLong(3)
      fr.getLong(2) shouldBe expect.getLong(4)
    }
    // independent decoder: extract the first '00dc' chunk and let the
    // JDK's ImageIO JPEG reader decode it — the frame is a complete JFIF
    val tag = "00dc".getBytes
    val at = b.indexOfSlice(tag)
    at should be > 0
    val len = (b(at + 4) & 0xff) | ((b(at + 5) & 0xff) << 8) |
      ((b(at + 6) & 0xff) << 16) | ((b(at + 7) & 0xff) << 24)
    val img = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(b.slice(at + 8, at + 8 + len)))
    img.getWidth shouldBe 7
    img.getHeight shouldBe 5
  }

  test("mjpegStats rejects non-MJPEG containers and truncations") {
    val mjpg = MediaCodec.mjpegEncode(11L, 7, 5, 3)
    val dib = MediaCodec.aviEncode(11L, 7, 5, 3)
    MediaCodec.mjpegStats(dib) shouldBe null   // DIB stream, not MJPG
    MediaCodec.aviStats(mjpg) shouldBe null    // and vice versa
    // truncate into the movi payload (cutting only the idx1 tail is
    // legitimately decodable — frames are all present)
    MediaCodec.mjpegStats(mjpg.take(mjpg.length / 2)) shouldBe null
    MediaCodec.mjpegStats(Array.empty[Byte]) shouldBe null
    // a corrupted entropy byte inside a frame must null, not misdecode:
    // flip a byte in the middle of the first frame's scan data
    val tag = "00dc".getBytes
    val at = mjpg.indexOfSlice(tag)
    val bad = mjpg.clone()
    bad(at + 40) = (bad(at + 40) ^ 0x55).toByte
    // either null (decode failure) or a decode whose dims still match —
    // totality is what matters; a wrong-dims success is the bug
    val r = MediaCodec.mjpegStats(bad)
    if (r != null) { r.getInt(0) shouldBe 7; r.getInt(1) shouldBe 5 }
  }

  test("bmpPixels returns row-major top-down RGB and undoes the bottom-up flip") {
    val b = MediaCodec.bmpEncode(seed = 7L, width = 4, height = 3)
    val d = MediaCodec.bmpPixels(b)
    d.getInt(0) shouldBe 4
    d.getInt(1) shouldBe 3
    val pix = d.getArray(2)
    pix.numElements shouldBe 4 * 3 * 3
    for (y <- 0 until 3; x <- 0 until 4) {
      val o = (y * 4 + x) * 3
      pix.getInt(o) shouldBe (7 + 11 * x + 13 * y) % 256     // R
      pix.getInt(o + 1) shouldBe (7 + 5 * x + 7 * y) % 256   // G
      pix.getInt(o + 2) shouldBe (7 + 2 * x + 3 * y) % 256   // B
    }
    // top-down variant must decode to the SAME array (orientation is
    // normalized away)
    val flipped = b.clone()
    val h = -3
    flipped(22) = h.toByte; flipped(23) = (h >> 8).toByte
    flipped(24) = (h >> 16).toByte; flipped(25) = (h >> 24).toByte
    val rowSize = ((4 * 3 + 3) / 4) * 4
    for (r <- 0 until 3)
      Array.copy(b, 54 + r * rowSize, flipped, 54 + (2 - r) * rowSize, rowSize)
    val d2 = MediaCodec.bmpPixels(flipped)
    (0 until pix.numElements).foreach { i =>
      d2.getArray(2).getInt(i) shouldBe pix.getInt(i)
    }
    MediaCodec.bmpPixels("BMjunk".getBytes) shouldBe null
  }

  test("aviEncode emits a real RIFF/AVI; aviStats decodes every frame exactly") {
    val b = MediaCodec.aviEncode(seed = 9L, width = 5, height = 4, nFrames = 3)
    new String(b.slice(0, 4)) shouldBe "RIFF"
    new String(b.slice(8, 12)) shouldBe "AVI "
    val st = MediaCodec.aviStats(b)
    st should not be null
    st.getInt(0) shouldBe 5
    st.getInt(1) shouldBe 4
    st.getInt(2) shouldBe 3
    val frames = st.getArray(3)
    frames.numElements shouldBe 3
    for (f <- 0 until 3) {
      def ch(cx: Int, cy: Int) =
        (for (x <- 0 until 5; y <- 0 until 4) yield
          java.lang.Math.floorMod(9L + 1000003L * f + cx * x + cy * y, 256L)).sum
      val fr = frames.getStruct(f, 3)
      fr.getLong(0) shouldBe ch(11, 13)
      fr.getLong(1) shouldBe ch(5, 7)
      fr.getLong(2) shouldBe ch(2, 3)
    }
  }

  test("aviStats rejects malformed containers") {
    MediaCodec.aviStats(null) shouldBe null
    MediaCodec.aviStats("RIFFxxxxWAVE".getBytes) shouldBe null // not AVI
    val good = MediaCodec.aviEncode(3L, 4, 4, 2)
    MediaCodec.aviStats(good.take(good.length / 2)) shouldBe null // truncated
    val badBpp = good.clone()
    // strf bpp field: find 'strf' and corrupt its biBitCount
    val i = (0 until good.length - 4).find(o =>
      good(o) == 's' && good(o + 1) == 't' && good(o + 2) == 'r' && good(o + 3) == 'f').get
    badBpp(i + 8 + 14) = 8
    MediaCodec.aviStats(badBpp) shouldBe null
    val badFrame = good.clone()
    // corrupt the first frame chunk's declared size
    val m = (0 until good.length - 4).find(o =>
      good(o) == '0' && good(o + 1) == '0' && good(o + 2) == 'd' && good(o + 3) == 'b').get
    badFrame(m + 4) = 1; badFrame(m + 5) = 0
    MediaCodec.aviStats(badFrame) shouldBe null
  }

  test("wavSamples returns the decoded PCM array for every supported coding") {
    val n = 20
    val pcm = MediaCodec.wavSamples(MediaCodec.wavEncode(5L, n, 8000))
    pcm.numElements shouldBe n
    (0 until n).foreach { i =>
      pcm.getInt(i) shouldBe ((5L + 17L * i) % 65536L).toInt - 32768
    }
    val ul = MediaCodec.wavSamples(MediaCodec.wavEncodeUlaw(5L, n, 8000))
    (0 until n).foreach { i =>
      ul.getInt(i) shouldBe MediaCodec.mulawExpand(
        MediaCodec.mulawCompress(((5L + 17L * i) % 65536L).toInt - 32768))
    }
    val ima = MediaCodec.wavSamples(MediaCodec.wavEncodeIma(5L, 70, 8000))
    val rep = imaReplay(5L, 70)
    (0 until 70).foreach { i => ima.getInt(i) shouldBe rep(i) }
    MediaCodec.wavSamples("RIFFjunk".getBytes) shouldBe null
  }

  test("bmpResize samples nearest-neighbor pixels and re-encodes a valid BMP") {
    val src = MediaCodec.bmpEncode(seed = 9L, width = 8, height = 6)
    val out = MediaCodec.bmpResize(src, 3, 2)
    out should not be null
    // the output is itself a decodable BMP
    val st = MediaCodec.bmpStats(out)
    st.getInt(0) shouldBe 3
    st.getInt(1) shouldBe 2
    // nearest-neighbor closed form: dst (x,y) ← src (x*8/3, y*6/2)
    def ch(cx: Int, cy: Int) =
      (for (x <- 0 until 3; y <- 0 until 2) yield
        (9 + cx * (x * 8 / 3) + cy * (y * 6 / 2)) % 256).sum.toLong
    st.getLong(2) shouldBe ch(11, 13)
    st.getLong(3) shouldBe ch(5, 7)
    st.getLong(4) shouldBe ch(2, 3)
    // upscaling and malformed input refuse, not garble
    MediaCodec.bmpResize(src, 9, 2) shouldBe null
    MediaCodec.bmpResize("junk".getBytes, 2, 2) shouldBe null
  }

  test("wavDownsample keeps every k-th sample and re-encodes a valid WAV") {
    val src = MediaCodec.wavEncode(seed = 3L, nSamples = 11, sampleRate = 12000)
    val out = MediaCodec.wavDownsample(src, 3)
    val st = MediaCodec.wavStats(out)
    st should not be null
    st.getInt(0) shouldBe 4000   // 12000 / 3
    st.getLong(1) shouldBe 4L    // ceil(11/3): samples 0,3,6,9
    val kept = Seq(0, 3, 6, 9).map(i => ((3L + 17L * i) % 65536L).toInt - 32768)
    st.getLong(2) shouldBe kept.map(v => math.abs(v).toLong).sum
    st.getInt(3) shouldBe kept.map(math.abs).max
    MediaCodec.wavDownsample(src, 0) shouldBe null
    MediaCodec.wavDownsample("RIFFjunk".getBytes, 2) shouldBe null
  }

  test("expressions run inside the SQL surface with codegen (no fallback)") {
    val out = spark.sql(
      """SELECT graft_bmp_stats(graft_bmp_encode(CAST(id AS BIGINT),
        |         CAST(4 + id % 5 AS INT), CAST(4 + id % 3 AS INT))) AS img,
        |       graft_wav_stats(graft_wav_encode(CAST(id AS BIGINT),
        |         CAST(64 + id % 100 AS INT), CAST(8000 AS INT))) AS aud
        |FROM range(200)""".stripMargin)
    val rows = out.collect()
    rows.length shouldBe 200
    all(rows.map(_.getAs[Row]("img").getInt(0))) should be >= 4
    all(rows.map(_.getAs[Row]("aud").getLong(1))) should be >= 64L
    // garbage payloads decode to NULL, not garbage stats
    spark.sql("SELECT graft_bmp_stats(CAST('junk' AS BINARY)) AS s")
      .collect()(0).isNullAt(0) shouldBe true
  }
}
