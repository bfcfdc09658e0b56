package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Multimodal column plumbing (builder brief): image/audio/video as
  * opaque `binary` columns with typed metadata, plus decode /
  * feature-extract / frame-sample operators.
  *
  * Decode is REAL for the uncompressed containers a pure JVM can parse
  * with no codec library — BMP/PPM images, PPM frame streams, PCM WAV —
  * via [[Codecs]] (m6/m7/m19 are oracle-checked end-to-end against the
  * decoded pixel/sample values). [[FakeCodec]] remains the documented
  * fallback for formats that genuinely need a native library (JPEG,
  * H.264, MP3 — absent from this container). Everything Spark-side is
  * real and tested: the asset schema, the binary column flow,
  * partition-iterator batch processing via `mapPartitions` (the Scala
  * analogue of `mapInPandas` batches — one decoder instance per
  * partition, NOT per record, fixing the reference's per-record
  * heavyweight-object anti-pattern at TwitterStreaming.scala:79), and
  * per-asset feature rows.
  *
  * Scale notes: binary payloads never pass through a shuffle here —
  * features are extracted scan-side and only the (id, small-feature)
  * rows move. Metadata is a nested struct column so Parquet keeps it
  * columnar and prunable.
  */
object Multimodal {
  case class AssetMeta(kind: String, width: Int, height: Int, sampleRateHz: Int)
  case class Asset(asset_id: Long, meta: AssetMeta, bytes: Array[Byte])
  case class AssetFeatures(asset_id: Long, kind: String, n_bytes: Long,
                           head_byte: Int, byte_hash: Long, n_frames: Int)

  /** The stub decoder: where a real deployment would link an image/audio
    * library, we derive deterministic pseudo-features from the raw bytes.
    * One instance per partition (cheap here, but the pattern is the
    * point: model/codec init amortized across the partition iterator). */
  final class FakeCodec {
    /** LCG byte-fold — stands in for "decode and hash pixels". */
    def byteHash(bytes: Array[Byte]): Long = {
      var acc = 0L
      var i = 0
      while (i < bytes.length) {
        acc = (acc * 31L + (bytes(i) & 0xff)) % 2147483647L
        i += 1
      }
      acc
    }
    /** Stand-in for frame sampling: one "frame" per 64-byte stride. */
    def frameCount(bytes: Array[Byte], stride: Int = 64): Int =
      (bytes.length + stride - 1) / stride
  }

  /** Derive an asset table from `documents` (text bytes as payload —
    * deterministic, schema-faithful): kind cycles image/audio/video,
    * metadata derived from sizes. */
  def assetsFromDocuments(spark: SparkSession, dir: String): Dataset[Asset] = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("text"), col("n_chars"))
      .as[(Long, String, Long)]
      .map { case (id, text, nChars) =>
        val kind = (id % 3) match {
          case 0 => "image"; case 1 => "audio"; case _ => "video"
        }
        Asset(id, AssetMeta(kind, (16 + nChars % 64).toInt, (16 + nChars % 48).toInt,
          if (kind == "audio") 16000 else 0), text.getBytes("UTF-8"))
      }
  }

  /** Feature extraction over partition iterators: decoder constructed
    * once per partition, binary payload consumed scan-side. */
  def extractFeatures(assets: Dataset[Asset]): Dataset[AssetFeatures] = {
    import assets.sparkSession.implicits._
    assets.mapPartitions { it =>
      val codec = new FakeCodec // once per partition, not per record
      it.map { a =>
        AssetFeatures(a.asset_id, a.meta.kind, a.bytes.length.toLong,
          if (a.bytes.nonEmpty) a.bytes(0) & 0xff else -1,
          codec.byteHash(a.bytes), codec.frameCount(a.bytes))
      }
    }
  }

  /** Resize stub: a real deployment would decode + resample pixels; the
    * deterministic stand-in keeps every `stride`-th payload byte and
    * halves the metadata dimensions. Returns assets (smaller payload,
    * updated meta) so it COMPOSES with [[extractFeatures]] /
    * [[sampleFrames]] — the pipeline shape (binary in → binary out →
    * features scan-side, nothing wide ever shuffles) is the real part. */
  def resize(assets: Dataset[Asset], stride: Int = 4): Dataset[Asset] = {
    import assets.sparkSession.implicits._
    assets.mapPartitions { it =>
      it.map { a =>
        val out = Array.tabulate((a.bytes.length + stride - 1) / stride)(i => a.bytes(i * stride))
        a.copy(
          meta = a.meta.copy(width = (a.meta.width + 1) / 2, height = (a.meta.height + 1) / 2),
          bytes = out)
      }
    }
  }

  /** Frame sampling for video assets: every `stride`-th byte window
    * becomes a "frame" row (id, frame_no, frame_bytes) — the explode
    * shape a real video pipeline produces. */
  def sampleFrames(assets: Dataset[Asset], stride: Int = 64): DataFrame = {
    import assets.sparkSession.implicits._
    assets.filter(_.meta.kind == "video")
      .flatMap { a =>
        a.bytes.grouped(stride).zipWithIndex.map { case (frame, i) =>
          (a.asset_id, i, frame)
        }
      }
      .toDF("asset_id", "frame_no", "frame_bytes")
  }

  /** Registered query: full binary pipeline (build assets → mapPartitions
    * feature extraction), oracle-checked — the payload is UTF-8 text so
    * DuckDB can recompute every feature with string/byte functions. */
  def mFeatures(spark: SparkSession, dir: String): DataFrame =
    extractFeatures(assetsFromDocuments(spark, dir)).toDF().orderBy("asset_id")

  // Byte-exact oracle: the fold runs over the UTF-8 BYTES of the payload
  // (hex(encode(text)) parsed two nibbles per byte), matching the Spark
  // side for any content — per-character ascii() would diverge from the
  // byte fold on the first multibyte character.
  def mFeaturesSql: String =
    """WITH b AS (
      |  SELECT doc_id, hex(encode(text)) AS h, octet_length(encode(text)) AS nb
      |  FROM documents
      |)
      |SELECT doc_id AS asset_id,
      |  CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
      |  nb AS n_bytes,
      |  CAST(CASE WHEN nb = 0 THEN -1
      |    ELSE 16 * (strpos('0123456789ABCDEF', substr(h, 1, 1)) - 1)
      |       + (strpos('0123456789ABCDEF', substr(h, 2, 1)) - 1) END AS INT) AS head_byte,
      |  list_reduce(list_prepend(CAST(0 AS BIGINT),
      |      list_transform(range(1, nb + 1), i ->
      |        CAST(16 * (strpos('0123456789ABCDEF', substr(h, 2*i - 1, 1)) - 1)
      |           + (strpos('0123456789ABCDEF', substr(h, 2*i, 1)) - 1) AS BIGINT))),
      |    (acc, x) -> (acc * 31 + x) % 2147483647) AS byte_hash,
      |  CAST((nb + 63) // 64 AS INT) AS n_frames
      |FROM b ORDER BY asset_id""".stripMargin

  // --------------------------------------- real-codec synthetic assets

  // deterministic synthetic-media dimensions, shared by the asset
  // builder, the decoders' spec, and (re-derived arithmetically) the
  // DuckDB oracles
  def imgW(id: Long): Int = 8 + (id % 8).toInt
  def imgH(id: Long): Int = 6 + (id % 6).toInt
  def nFrames(id: Long): Int = 2 + ((id / 3) % 3).toInt
  def wavN(id: Long): Int = 64 + (id % 64).toInt
  def wavRate(id: Long): Int = 8000 + (id % 4).toInt * 4000

  /** Deterministic synthetic media with REAL containers (VERDICT r7 #3 —
    * replaces the byte-hash stand-in for m6/m7): image → 24-bpp BMP,
    * audio → PCM16 WAV, video → concatenated P6 PPM frames, built by
    * [[Codecs]]' encoders executor-side. Pixel/sample VALUES are a
    * closed-form function of (id, position) — pixel j of image id is
    * (id·7 + j) mod 256, sample k of audio id is (id·13 + k·7) mod 2001
    * − 1000 — so the oracle recomputes every decoded feature
    * arithmetically, which makes the driver gate a byte-exact test of
    * the encode→decode round trip (header layout, BMP row padding and
    * bottom-up order, RIFF chunk walk). */
  def synthAssets(spark: SparkSession, dir: String): Dataset[Asset] = {
    import spark.implicits._
    Tables.documents(spark, dir).select(col("doc_id")).as[Long].map { id =>
      (id % 3) match {
        case 0 =>
          val w = imgW(id); val h = imgH(id)
          val px = Array.tabulate(3 * w * h)(j => ((id * 7 + j) % 256).toByte)
          Asset(id, AssetMeta("image", w, h, 0), Codecs.encodeBmp(w, h, px))
        case 1 =>
          val n = wavN(id); val rate = wavRate(id)
          val samples =
            Array.tabulate(n)(k => ((id * 13 + k.toLong * 7) % 2001 - 1000).toShort)
          Asset(id, AssetMeta("audio", 0, 0, rate), Codecs.encodeWav(rate, samples))
        case _ =>
          val w = imgW(id); val h = imgH(id)
          val frames = (0 until nFrames(id)).map { f =>
            Codecs.encodePpm(w, h,
              Array.tabulate(3 * w * h)(j => ((id * 7 + f * 31 + j) % 256).toByte))
          }
          Asset(id, AssetMeta("video", w, h, 0), frames.reduce(_ ++ _))
      }
    }
  }

  /** m6: REAL image resize — decode the BMP, 2×2 box-filter downsample
    * (floor average per channel over full blocks), per-channel pixel
    * sums of the result. All-integer output, so the oracle compare is
    * exact with no decimal discipline needed. Decode runs scan-side in
    * `mapPartitions`; only (id, 8 small ints) reach the shuffle. */
  def mResizeFeatures(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    synthAssets(spark, dir).filter(_.meta.kind == "image")
      .map { a =>
        val (w, h, px) = Codecs.decodeBmp(a.bytes)
        val ow = w / 2; val oh = h / 2
        var sr = 0L; var sg = 0L; var sb = 0L
        var y = 0
        while (y < oh) {
          var x = 0
          while (x < ow) {
            var c = 0
            while (c < 3) {
              val v = ((px(((2 * y) * w + 2 * x) * 3 + c) & 0xff)
                + (px(((2 * y) * w + 2 * x + 1) * 3 + c) & 0xff)
                + (px(((2 * y + 1) * w + 2 * x) * 3 + c) & 0xff)
                + (px(((2 * y + 1) * w + 2 * x + 1) * 3 + c) & 0xff)) / 4
              if (c == 0) sr += v else if (c == 1) sg += v else sb += v
              c += 1
            }
            x += 1
          }
          y += 1
        }
        (a.asset_id, w, h, ow, oh, ow.toLong * oh, sr, sg, sb)
      }
      .toDF("asset_id", "w", "h", "out_w", "out_h", "n_px", "sum_r", "sum_g", "sum_b")
      .orderBy("asset_id")
  }

  /** Oracle: re-derives the decoded pixel values from the generative
    * formula — agreement proves the BMP round trip (padding, bottom-up
    * rows, BGR order) byte-exact. */
  def mResizeFeaturesSql: String =
    """WITH imgs AS (
      |  SELECT doc_id AS id, 8 + doc_id % 8 AS w, 6 + doc_id % 6 AS h
      |  FROM documents WHERE doc_id % 3 = 0
      |), grid AS (
      |  SELECT id, w, h, w // 2 AS ow, h // 2 AS oh, v.y AS y, u.x AS x
      |  FROM imgs, UNNEST(range(h // 2)) AS v(y), UNNEST(range(w // 2)) AS u(x)
      |), px AS (
      |  SELECT id, w, h, ow, oh, c.c AS c,
      |    ((id*7 + ((2*y)*w + 2*x)*3 + c.c) % 256
      |     + (id*7 + ((2*y)*w + 2*x + 1)*3 + c.c) % 256
      |     + (id*7 + ((2*y + 1)*w + 2*x)*3 + c.c) % 256
      |     + (id*7 + ((2*y + 1)*w + 2*x + 1)*3 + c.c) % 256) // 4 AS v
      |  FROM grid, UNNEST(range(3)) AS c(c)
      |)
      |SELECT id AS asset_id, CAST(w AS INT) AS w, CAST(h AS INT) AS h,
      |  CAST(ow AS INT) AS out_w, CAST(oh AS INT) AS out_h,
      |  CAST(ow * oh AS BIGINT) AS n_px,
      |  CAST(SUM(CASE WHEN c = 0 THEN v ELSE 0 END) AS BIGINT) AS sum_r,
      |  CAST(SUM(CASE WHEN c = 1 THEN v ELSE 0 END) AS BIGINT) AS sum_g,
      |  CAST(SUM(CASE WHEN c = 2 THEN v ELSE 0 END) AS BIGINT) AS sum_b
      |FROM px GROUP BY id, w, h, ow, oh ORDER BY asset_id""".stripMargin

  /** m7: REAL frame sampling — walk the concatenated P6 frames in the
    * video payload (each boundary found by parsing the next header, not
    * by stride arithmetic), one row per frame with its decoded pixel
    * sum. */
  def mFrameStats(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    synthAssets(spark, dir).filter(_.meta.kind == "video")
      .flatMap { a =>
        Codecs.decodePpmFrames(a.bytes).zipWithIndex.map { case (f, i) =>
          var s = 0L
          var j = 0
          while (j < f.pixels.length) { s += (f.pixels(j) & 0xff); j += 1 }
          (a.asset_id, i, f.width, f.height, s)
        }
      }
      .toDF("asset_id", "frame_no", "w", "h", "sum_px")
      .orderBy("asset_id", "frame_no")
  }

  def mFrameStatsSql: String =
    """WITH vids AS (
      |  SELECT doc_id AS id, 8 + doc_id % 8 AS w, 6 + doc_id % 6 AS h,
      |         2 + (doc_id // 3) % 3 AS nf
      |  FROM documents WHERE doc_id % 3 = 2
      |), frames AS (
      |  SELECT id, w, h, f.f AS f FROM vids, UNNEST(range(nf)) AS f(f)
      |), px AS (
      |  SELECT id, f, w, h, (id*7 + f*31 + j.j) % 256 AS v
      |  FROM frames, UNNEST(range(3*w*h)) AS j(j)
      |)
      |SELECT id AS asset_id, CAST(f AS INT) AS frame_no,
      |  CAST(w AS INT) AS w, CAST(h AS INT) AS h,
      |  CAST(SUM(v) AS BIGINT) AS sum_px
      |FROM px GROUP BY id, f, w, h ORDER BY asset_id, frame_no""".stripMargin

  /** m19: REAL audio decode — RIFF chunk walk to the PCM16 samples,
    * amplitude sum + energy (sum of squares) per asset, all-integer. */
  def mWavStats(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    synthAssets(spark, dir).filter(_.meta.kind == "audio")
      .map { a =>
        val (rate, samples) = Codecs.decodeWav(a.bytes)
        var sum = 0L; var sq = 0L
        var k = 0
        while (k < samples.length) {
          sum += samples(k); sq += samples(k).toLong * samples(k); k += 1
        }
        (a.asset_id, rate, samples.length.toLong, sum, sq)
      }
      .toDF("asset_id", "sample_rate", "n_samples", "sum_amp", "sum_sq")
      .orderBy("asset_id")
  }

  def mWavStatsSql: String =
    """WITH auds AS (
      |  SELECT doc_id AS id, 64 + doc_id % 64 AS n,
      |         8000 + (doc_id % 4) * 4000 AS rate
      |  FROM documents WHERE doc_id % 3 = 1
      |), sm AS (
      |  SELECT id, rate, n, (id*13 + k.k*7) % 2001 - 1000 AS s
      |  FROM auds, UNNEST(range(n)) AS k(k)
      |)
      |SELECT id AS asset_id, CAST(rate AS INT) AS sample_rate,
      |  CAST(n AS BIGINT) AS n_samples,
      |  CAST(SUM(s) AS BIGINT) AS sum_amp,
      |  CAST(SUM(s*s) AS BIGINT) AS sum_sq
      |FROM sm GROUP BY id, rate, n ORDER BY asset_id""".stripMargin

  /** m20: decode-failure audit — proves the codec contract's
    * per-record catchability END-TO-END: every 17th asset's payload is
    * truncated to half its bytes, decode wraps in `Try`, and the query
    * reports ok/bad counts per kind — malformed media become countable
    * rows, never task poison. The oracle re-derives which truncations
    * are detectable in closed form, including the honest edge case of a
    * length-delimited container: a video whose (even) frame count makes
    * half-truncation land EXACTLY on a frame boundary parses as a
    * valid shorter video, so it counts ok. */
  def mDecodeAudit(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    synthAssets(spark, dir)
      .map { a =>
        val bytes =
          if (a.asset_id % 17 == 0) a.bytes.take(a.bytes.length / 2) else a.bytes
        val ok = scala.util.Try {
          a.meta.kind match {
            case "image" => Codecs.decodeBmp(bytes)
            case "audio" => Codecs.decodeWav(bytes)
            case _ => Codecs.decodePpmFrames(bytes)
          }
        }.isSuccess
        (a.meta.kind, ok)
      }
      .toDF("kind", "ok")
      .groupBy("kind")
      .agg(count(lit(1)).as("n_assets"),
        sum(col("ok").cast("long")).as("n_ok"),
        sum((!col("ok")).cast("long")).as("n_bad"))
      .orderBy("kind")
  }

  def mDecodeAuditSql: String =
    """WITH a AS (
      |  SELECT doc_id AS id,
      |    CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
      |    doc_id % 17 = 0 AS trunc,
      |    2 + (doc_id // 3) % 3 AS nf
      |  FROM documents
      |), f AS (
      |  SELECT kind,
      |    CASE WHEN NOT trunc THEN 1
      |         WHEN kind = 'video' AND nf % 2 = 0 THEN 1  -- exact frame boundary
      |         ELSE 0 END AS ok
      |  FROM a
      |)
      |SELECT kind, count(*) AS n_assets,
      |  CAST(SUM(ok) AS BIGINT) AS n_ok,
      |  CAST(SUM(1 - ok) AS BIGINT) AS n_bad
      |FROM f GROUP BY kind ORDER BY kind""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "m2_multimodal_features" -> mFeatures _,
    "m6_resize_features" -> mResizeFeatures _,
    "m7_frame_sample" -> mFrameStats _,
    "m19_wav_stats" -> mWavStats _,
    "m20_decode_audit" -> mDecodeAudit _,
  )

  def oracles: Map[String, String] = Map(
    "m2_multimodal_features" -> mFeaturesSql,
    "m6_resize_features" -> mResizeFeaturesSql,
    "m7_frame_sample" -> mFrameStatsSql,
    "m19_wav_stats" -> mWavStatsSql,
    "m20_decode_audit" -> mDecodeAuditSql,
  )
}
