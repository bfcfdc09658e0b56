package graft.multimodal

import graft.SparkSpec

class MultimodalSpec extends SparkSpec {

  private lazy val assets = Multimodal.assetsFromDocuments(spark, sf("sf0.001"))

  test("asset table: kinds cycle, metadata typed, payload non-empty") {
    val rows = assets.collect()
    assert(rows.nonEmpty)
    assert(rows.forall(a => a.bytes.nonEmpty && a.meta.width >= 16))
    assert(rows.map(_.meta.kind).toSet == Set("image", "audio", "video"))
    assert(rows.filter(_.meta.kind == "audio").forall(_.meta.sampleRateHz == 16000))
  }

  test("extractFeatures: byte features match a driver-side recompute") {
    val feats = Multimodal.extractFeatures(assets).collect().map(f => f.asset_id -> f).toMap
    val codec = new Multimodal.FakeCodec
    assets.collect().take(20).foreach { a =>
      val f = feats(a.asset_id)
      assert(f.n_bytes == a.bytes.length)
      assert(f.head_byte == (a.bytes(0) & 0xff))
      assert(f.byte_hash == codec.byteHash(a.bytes))
      assert(f.n_frames == codec.frameCount(a.bytes))
    }
  }

  test("sampleFrames: strides cover the payload exactly, video only") {
    val frames = Multimodal.sampleFrames(assets, stride = 64).collect()
    assert(frames.nonEmpty)
    val byAsset = frames.groupBy(_.getLong(0))
    val lens = assets.collect().map(a => a.asset_id -> a.bytes.length).toMap
    byAsset.foreach { case (id, fs) =>
      assert(id % 3 == 2) // only video assets
      val total = fs.map(_.getAs[Array[Byte]]("frame_bytes").length).sum
      assert(total == lens(id))
      assert(fs.map(_.getInt(1)).sorted.toSeq == (0 until fs.length).toSeq)
    }
  }
}
