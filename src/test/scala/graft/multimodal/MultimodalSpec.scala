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

  test("codecs: BMP round trip survives row padding and bottom-up order") {
    // w=5 → rowBytes 16 (non-trivial padding); asymmetric pixel pattern
    val w = 5; val h = 3
    val px = Array.tabulate(3 * w * h)(j => (j * 17 % 256).toByte)
    val (dw, dh, dpx) = Codecs.decodeBmp(Codecs.encodeBmp(w, h, px))
    assert((dw, dh) == (w, h))
    assert(dpx.toSeq == px.toSeq)
    intercept[IllegalArgumentException](Codecs.decodeBmp("nope".getBytes))
  }

  test("codecs: PPM round trip, header comments, concatenated frames") {
    val w = 4; val h = 2
    val px = Array.tabulate(3 * w * h)(j => (j * 7 % 256).toByte)
    val one = Codecs.decodePpm(Codecs.encodePpm(w, h, px))
    assert((one.width, one.height) == (w, h) && one.pixels.toSeq == px.toSeq)
    // a header with comment lines (spec-legal) parses identically
    val commented = ("P6\n# a comment\n4 2\n# another\n255\n").getBytes("US-ASCII") ++ px
    assert(Codecs.decodePpm(commented).pixels.toSeq == px.toSeq)
    // concatenated frames split at REAL parsed boundaries
    val f2 = Array.tabulate(3 * w * h)(j => (j * 11 % 256).toByte)
    val frames = Codecs.decodePpmFrames(
      Codecs.encodePpm(w, h, px) ++ Codecs.encodePpm(w, h, f2))
    assert(frames.length == 2 && frames(1).pixels.toSeq == f2.toSeq)
    intercept[IllegalArgumentException](Codecs.decodePpm("P5\n1 1\n255\n ".getBytes))
  }

  test("codecs: WAV round trip; chunk walk skips unknown chunks") {
    val samples = Array.tabulate(33)(k => (k * 999 - 16000).toShort)
    val wav = Codecs.encodeWav(22050, samples)
    val (rate, got) = Codecs.decodeWav(wav)
    assert(rate == 22050 && got.toSeq == samples.toSeq)
    // splice an unknown LIST chunk between fmt and data — a real RIFF
    // reader must skip it by size, not assume fixed offsets
    val listChunk = "LIST".getBytes ++ Array[Byte](4, 0, 0, 0) ++ "INFO".getBytes
    val spliced = wav.take(36) ++ listChunk ++ wav.drop(36)
    // patch the RIFF size field (+12)
    val riffSize = (wav.length - 8) + listChunk.length
    spliced(4) = riffSize.toByte; spliced(5) = (riffSize >> 8).toByte
    spliced(6) = (riffSize >> 16).toByte; spliced(7) = (riffSize >> 24).toByte
    val (rate2, got2) = Codecs.decodeWav(spliced)
    assert(rate2 == 22050 && got2.toSeq == samples.toSeq)
    intercept[IllegalArgumentException](Codecs.decodeWav("RIFFxxxxAVI ".getBytes))
  }

  test("codecs: round trips hold at degenerate sizes (padding edges, empty audio)") {
    // BMP row padding varies with w%4 — exercise every residue incl. w=1
    for (w <- 1 to 9; h <- Seq(1, 2, 3)) {
      val px = Array.tabulate(3 * w * h)(j => ((j * 31 + w * 7 + h) % 256).toByte)
      val (dw, dh, dpx) = Codecs.decodeBmp(Codecs.encodeBmp(w, h, px))
      assert((dw, dh) == (w, h) && dpx.toSeq == px.toSeq, s"BMP $w x $h")
      val p = Codecs.decodePpm(Codecs.encodePpm(w, h, px))
      assert((p.width, p.height) == (w, h) && p.pixels.toSeq == px.toSeq, s"PPM $w x $h")
    }
    // zero-sample WAV still round-trips (empty data chunk is legal)
    val (rate, got) = Codecs.decodeWav(Codecs.encodeWav(44100, Array.empty[Short]))
    assert(rate == 44100 && got.isEmpty)
    // extreme sample values survive the 16-bit LE round trip
    val ext = Array[Short](Short.MinValue, -1, 0, 1, Short.MaxValue)
    assert(Codecs.decodeWav(Codecs.encodeWav(8000, ext))._2.toSeq == ext.toSeq)
  }

  test("synthAssets: real containers decode to the generative formulas") {
    val some = Multimodal.synthAssets(spark, sf("sf0.001")).collect().take(30)
    assert(some.map(_.meta.kind).toSet == Set("image", "audio", "video"))
    some.foreach { a =>
      a.meta.kind match {
        case "image" =>
          val (w, h, px) = Codecs.decodeBmp(a.bytes)
          assert((w, h) == (Multimodal.imgW(a.asset_id), Multimodal.imgH(a.asset_id)))
          px.zipWithIndex.foreach { case (b, j) =>
            assert((b & 0xff) == ((a.asset_id * 7 + j) % 256).toInt)
          }
        case "audio" =>
          val (rate, s) = Codecs.decodeWav(a.bytes)
          assert(rate == Multimodal.wavRate(a.asset_id))
          assert(s.length == Multimodal.wavN(a.asset_id))
        case _ =>
          val frames = Codecs.decodePpmFrames(a.bytes)
          assert(frames.length == Multimodal.nFrames(a.asset_id))
      }
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
