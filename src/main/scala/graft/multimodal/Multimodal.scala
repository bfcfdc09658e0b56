package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Multimodal column plumbing (builder brief): image/audio/video as
  * opaque `binary` columns with typed metadata, plus decode /
  * feature-extract / frame-sample operators.
  *
  * The container has no image/audio codecs, so the DECODE step is a
  * deterministic fake (documented stub — see [[FakeCodec]]); everything
  * Spark-side is real and tested: the asset schema, the binary column
  * flow, partition-iterator batch processing via `mapPartitions` (the
  * Scala analogue of `mapInPandas` batches — one decoder instance per
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

  /** Registered query: resize → feature-extract composition; DuckDB
    * recomputes the every-4th-byte payload from hex(encode(text)). */
  def mResizeFeatures(spark: SparkSession, dir: String): DataFrame =
    extractFeatures(resize(assetsFromDocuments(spark, dir))).toDF().orderBy("asset_id")

  def mResizeFeaturesSql: String =
    """WITH b AS (
      |  SELECT doc_id, hex(encode(text)) AS h, octet_length(encode(text)) AS nb
      |  FROM documents
      |), r AS (SELECT doc_id, h, nb, (nb + 3) // 4 AS nout FROM b)
      |SELECT doc_id AS asset_id,
      |  CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
      |  CAST(nout AS BIGINT) AS n_bytes,
      |  CAST(CASE WHEN nout = 0 THEN -1
      |    ELSE 16 * (strpos('0123456789ABCDEF', substr(h, 1, 1)) - 1)
      |       + (strpos('0123456789ABCDEF', substr(h, 2, 1)) - 1) END AS INT) AS head_byte,
      |  list_reduce(list_prepend(CAST(0 AS BIGINT),
      |      list_transform(range(nout), j ->
      |        CAST(16 * (strpos('0123456789ABCDEF', substr(h, 8*j + 1, 1)) - 1)
      |           + (strpos('0123456789ABCDEF', substr(h, 8*j + 2, 1)) - 1) AS BIGINT))),
      |    (acc, x) -> (acc * 31 + x) % 2147483647) AS byte_hash,
      |  CAST((nout + 63) // 64 AS INT) AS n_frames
      |FROM r ORDER BY asset_id""".stripMargin

  /** Registered query: per-frame rows for video assets (explode shape);
    * the oracle rebuilds frame boundaries arithmetically. */
  def mFrames(spark: SparkSession, dir: String): DataFrame = {
    val frames = sampleFrames(assetsFromDocuments(spark, dir))
    frames.select(col("asset_id"), col("frame_no"),
        length(col("frame_bytes")).as("n_bytes"))
      .orderBy("asset_id", "frame_no")
  }

  def mFramesSql: String =
    """WITH b AS (
      |  SELECT doc_id, octet_length(encode(text)) AS nb FROM documents
      |  WHERE doc_id % 3 = 2
      |)
      |SELECT doc_id AS asset_id, CAST(u.i AS INT) AS frame_no,
      |  CAST(LEAST(64, nb - u.i * 64) AS INT) AS n_bytes
      |FROM b, UNNEST(range((nb + 63) // 64)) AS u(i)
      |ORDER BY asset_id, frame_no""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "m2_multimodal_features" -> mFeatures _,
    "m6_resize_features" -> mResizeFeatures _,
    "m7_frame_sample" -> mFrames _,
  )

  def oracles: Map[String, String] = Map(
    "m2_multimodal_features" -> mFeaturesSql,
    "m6_resize_features" -> mResizeFeaturesSql,
    "m7_frame_sample" -> mFramesSql,
  )
}
