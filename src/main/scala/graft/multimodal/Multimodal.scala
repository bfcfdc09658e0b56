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

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "m2_multimodal_features" -> mFeatures _,
  )

  def oracles: Map[String, String] = Map(
    "m2_multimodal_features" -> mFeaturesSql,
  )
}
