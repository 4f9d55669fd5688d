package graft.ops

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.SparkSpec

class MultimodalSpec extends SparkSpec {

  private val docs = df("doc_id BIGINT, text STRING", Seq(
    Row(0L, "image payload"), Row(1L, "audio payload"), Row(2L, "video payload")))

  private lazy val assets = Multimodal.syntheticAssets(docs, "doc_id", "text")

  test("asset schema: binary payload + typed metadata") {
    assets.schema("payload").dataType.typeName shouldBe "binary"
    val r = assets.orderBy("asset_id").collect()
    r.map(_.getString(1)) shouldBe Array("image", "audio", "video")
    r(0).getStruct(3).getInt(0) shouldBe "image payload".length
  }

  test("decode stub is deterministic and length-correct") {
    val twice = Seq(
      Multimodal.extract(assets).select("asset_id", "decoded.checksum").collect().toSeq,
      Multimodal.extract(assets).select("asset_id", "decoded.checksum").collect().toSeq)
    twice(0) shouldBe twice(1)
  }

  test("feature stub: fixed dims, [0,1) floats, deterministic") {
    val f = Multimodal.extract(assets, dims = 8)
      .select("features").collect().map(_.getSeq[Float](0))
    f.foreach { v =>
      v.length shouldBe 8
      v.foreach(x => assert(x >= 0.0f && x < 1.0f))
    }
  }

  test("resize stage: payload sliced to the cap, provenance recorded") {
    val out = Multimodal.extract(assets, thumbMaxBytes = 5)
      .select("asset_id", "resized.thumb", "resized.orig_bytes",
        "resized.thumb_bytes", "resized.was_resized")
      .orderBy("asset_id").collect()
    out.foreach { r =>
      r.getAs[Array[Byte]](1).length shouldBe math.min(r.getInt(2), 5)
      r.getInt(3) shouldBe math.min(r.getInt(2), 5)
      r.getBoolean(4) shouldBe (r.getInt(2) > 5)
    }
    // the thumb is a PREFIX of the payload, not a re-encode (stub contract)
    new String(out(0).getAs[Array[Byte]](1), "UTF-8") shouldBe "image"
  }

  test("frame sampling: one row per 5s frame for video, single null row otherwise") {
    val out = Multimodal.extract(assets, frameEveryMs = 5000)
    val video = out.filter(col("media_type") === "video")
    val durationMs = 2 % 1000 * 40 + 1000 // asset 2's synthesized duration
    video.count() shouldBe (durationMs + 4999) / 5000
    out.filter(col("media_type") === "image").count() shouldBe 1
    out.filter(col("media_type") === "image").select("frame_ms")
      .collect()(0).isNullAt(0) shouldBe true
  }
}
