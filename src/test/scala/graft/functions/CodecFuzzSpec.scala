package graft.functions

import org.scalacheck.{Gen, Prop, Test => SCTest}
import graft.SparkSpec

/** Adversarial-input fuzz for every pure-JVM codec decoder: the functions
  * are registered SQL expressions over arbitrary BINARY columns, so the
  * contract is TOTAL — for ANY byte payload they must return promptly
  * (null or a row), never throw and never hang. The self-review that
  * preceded this spec found two violations by inspection (an FDICT
  * infinite loop and an Int-overflow OOB in the PNG chunk walk); this
  * pins the whole class down with generated inputs.
  */
class CodecFuzzSpec extends SparkSpec {

  private val params = SCTest.Parameters.default.withMinSuccessfulTests(200)

  private def totalOn(gen: Gen[Array[Byte]], decoders: (String, Array[Byte] => Any)*): Unit = {
    val prop = Prop.forAll(gen) { payload =>
      decoders.forall { case (_, fn) =>
        fn(payload) // null and non-null both fine; throwing fails the prop
        true
      }
    }
    val res = SCTest.check(params, prop)
    assert(res.passed, res.status.toString)
  }

  private val allDecoders: Seq[(String, Array[Byte] => Any)] = Seq(
    ("pngStats", PngCodec.pngStats _),
    ("pngResize", (b: Array[Byte]) => PngCodec.pngResize(b, 2, 2)),
    ("bmpStats", MediaCodec.bmpStats _),
    ("bmpResize", (b: Array[Byte]) => MediaCodec.bmpResize(b, 2, 2)),
    ("wavStats", MediaCodec.wavStats _),
    ("wavDownsample", (b: Array[Byte]) => MediaCodec.wavDownsample(b, 2)),
    ("jpegStats", JpegCodec.jpegStats _),
    ("aviStats", MediaCodec.aviStats _),
    ("mjpegStats", MediaCodec.mjpegStats _),
    ("wavSamples", MediaCodec.wavSamples _),
    ("bmpPixels", MediaCodec.bmpPixels _),
    ("pngPixels", PngCodec.pngPixels _))

  test("fuzz: decoders are total on arbitrary byte blobs") {
    totalOn(Gen.choose(0, 512).flatMap(n =>
      Gen.containerOfN[Array, Byte](n, Gen.choose(Byte.MinValue, Byte.MaxValue))),
      allDecoders: _*)
  }

  test("fuzz: decoders are total on single-byte mutations of VALID files") {
    // Mutated real files exercise the deep paths (past signature checks)
    // that pure random blobs almost never reach.
    val basePng = PngCodec.pngEncode(3L, 6, 7)
    val baseBmp = MediaCodec.bmpEncode(3L, 6, 7)
    val baseWav = MediaCodec.wavEncode(3L, 100, 8000)
    val baseUlaw = MediaCodec.wavEncodeUlaw(3L, 100, 8000)
    val baseAlaw = MediaCodec.wavEncodeAlaw(3L, 100, 8000)
    val baseIma = MediaCodec.wavEncodeIma(3L, 100, 8000)
    val baseAvi = MediaCodec.aviEncode(3L, 5, 4, 3)
    val baseMjpg = MediaCodec.mjpegEncode(3L, 5, 4, 3)
    val baseJpg = JpegCodec.jpegEncode(3L, 6, 7)
    val gen = for {
      base <- Gen.oneOf(basePng, baseBmp, baseWav, baseUlaw, baseAlaw, baseIma, baseAvi, baseMjpg, baseJpg)
      idx <- Gen.choose(0, base.length - 1)
      b <- Gen.choose(Byte.MinValue, Byte.MaxValue)
    } yield { val m = base.clone(); m(idx) = b; m }
    totalOn(gen, allDecoders: _*)
  }

  test("fuzz: decoders are total on truncations and pads of VALID files") {
    val basePng = PngCodec.pngEncode(9L, 5, 6)
    val baseBmp = MediaCodec.bmpEncode(9L, 5, 6)
    val baseWav = MediaCodec.wavEncode(9L, 64, 8000)
    val baseUlaw = MediaCodec.wavEncodeUlaw(9L, 64, 8000)
    val baseAlaw = MediaCodec.wavEncodeAlaw(9L, 64, 8000)
    val baseIma = MediaCodec.wavEncodeIma(9L, 64, 8000)
    val baseAvi = MediaCodec.aviEncode(9L, 4, 5, 2)
    val baseMjpg = MediaCodec.mjpegEncode(9L, 4, 5, 2)
    val baseJpg = JpegCodec.jpegEncode(9L, 5, 6)
    val gen = for {
      base <- Gen.oneOf(basePng, baseBmp, baseWav, baseUlaw, baseAlaw, baseIma, baseAvi, baseMjpg, baseJpg)
      cut <- Gen.choose(0, base.length)
      pad <- Gen.choose(0, 16)
    } yield base.take(cut) ++ Array.fill[Byte](pad)(0x41)
    totalOn(gen, allDecoders: _*)
  }

  test("fuzz: a corrupted-length PNG chunk cannot drive the walker out of bounds") {
    // Directed variant of the Int-overflow finding: splice hostile BE32
    // lengths (incl. values near Int.MaxValue) into a valid file's chunk
    // headers; every one must yield null, not an exception.
    val base = PngCodec.pngEncode(7L, 6, 6)
    val gen = for {
      off <- Gen.oneOf(8, 8 + 12 + 13) // IHDR and IDAT length fields
      v <- Gen.oneOf(0x7fffffff, 0x7ffffff0, 0x40000000, -1, 0x00ffffff)
    } yield {
      val m = base.clone()
      m(off) = (v >>> 24).toByte; m(off + 1) = (v >>> 16).toByte
      m(off + 2) = (v >>> 8).toByte; m(off + 3) = v.toByte
      m
    }
    val prop = Prop.forAll(gen) { payload => PngCodec.pngStats(payload) == null }
    val res = SCTest.check(params, prop)
    assert(res.passed, res.status.toString)
  }
}
