package graft.similarity

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.sources.Tables

/** Similarity search over embedding columns (builder brief: ANN over
  * `Array[Float]` — brute-force cosine top-k as the baseline, an
  * LSH-bucketed variant as the scale path).
  *
  * Everything is expressed as explode + broadcast-join + hash-aggregate:
  *  - vectors are exploded to (vec_id, dim, x) once; dot products and
  *    norms are decimal-quantized partial-aggregated sums (exact,
  *    order-independent → cross-engine deterministic);
  *  - the query side is always broadcast (a handful of rows);
  *  - ANN buckets come from random-hyperplane signs, L tables × P planes.
  *    Hyperplane weights are an integer LCG — w = ((1103515245·idx +
  *    12345) mod 2²¹)/2²¹ − ½, idx = (table·P + plane)·64 + dim — exact
  *    dyadic doubles, so Spark and DuckDB compute bit-identical signs
  *    (rand() would not be reproducible across engines).
  *
  * Scale shape: brute force is one shuffle (groupBy vec_id) over
  * #vectors × #dims rows and is the correct baseline ≤ ~10M vectors;
  * the LSH path turns the candidate set from O(n) to O(bucket) via an
  * equi-join on (table, bucket) — the same banding trick as
  * [[graft.dedup.Dedup]], which is what survives a 100× scale-up.
  */
object Similarity {
  private val Dec = DecimalType(32, 16)
  private val Dims = 64

  /** Exploded view: (vec_id, d, x) with x cast to double. */
  def exploded(emb: DataFrame): DataFrame =
    emb.select(col("vec_id"), posexplode(col("embedding")).as(Seq("d", "xf")))
      .select(col("vec_id"), col("d"), col("xf").cast("double").as("x"))

  /** Per-vector squared norm (decimal-exact sum). */
  def norms(emb: DataFrame): DataFrame =
    exploded(emb).groupBy("vec_id")
      .agg(sum((col("x") * col("x")).cast(Dec)).cast("double").as("norm2"))

  /** Brute-force cosine top-k for one query vector: broadcast the query's
    * 64 (dim, qx) rows, join on dim, one hash aggregate per candidate. */
  def knnBrute(emb: DataFrame, queryId: Long, k: Int = 10): DataFrame = {
    val ex = exploded(emb)
    val q = ex.filter(col("vec_id") === queryId)
      .select(col("d"), col("x").as("qx"))
    val n = norms(emb)
    val qn = n.filter(col("vec_id") === queryId).select(col("norm2").as("qnorm2"))
    ex.filter(col("vec_id") =!= queryId)
      .join(broadcast(q), "d")
      .groupBy("vec_id")
      .agg(sum((col("x") * col("qx")).cast(Dec)).cast("double").as("dot"))
      .join(n, "vec_id")
      .crossJoin(broadcast(qn))
      .select(col("vec_id"),
        round(col("dot") / (sqrt(col("norm2")) * sqrt(col("qnorm2"))), 6).as("cos"))
      .orderBy(desc("cos"), asc("vec_id"))
      .limit(k)
  }

  def knnBruteSql(queryId: Long, k: Int = 10): String =
    s"""WITH ex AS (
       |  SELECT vec_id, u.d, CAST(embedding[u.d + 1] AS DOUBLE) AS x
       |  FROM embeddings, UNNEST(range($Dims)) AS u(d)
       |), norms AS (
       |  SELECT vec_id, CAST(SUM(CAST(x * x AS DECIMAL(32,16))) AS DOUBLE) AS norm2
       |  FROM ex GROUP BY vec_id
       |), q AS (SELECT d, x AS qx FROM ex WHERE vec_id = $queryId),
       |qn AS (SELECT norm2 AS qnorm2 FROM norms WHERE vec_id = $queryId),
       |dots AS (
       |  SELECT ex.vec_id, CAST(SUM(CAST(ex.x * q.qx AS DECIMAL(32,16))) AS DOUBLE) AS dot
       |  FROM ex JOIN q USING (d) WHERE ex.vec_id != $queryId GROUP BY ex.vec_id
       |)
       |SELECT d.vec_id, round(d.dot / (sqrt(n.norm2) * sqrt(qn.qnorm2)), 6) AS cos
       |FROM dots d JOIN norms n USING (vec_id) CROSS JOIN qn
       |ORDER BY cos DESC, vec_id ASC LIMIT $k""".stripMargin

  // ----------------------------------------------------------------- LSH

  /** Hyperplane weight table: (t, p, d, w), L×P×Dims rows, broadcast. */
  def planes(spark: SparkSession, l: Int, p: Int): DataFrame =
    spark.range(l.toLong * p * Dims).select(
      (col("id") / (p * Dims)).cast("long").as("t"),
      ((col("id") / Dims).cast("long") % p).as("p"),
      (col("id") % Dims).as("d"),
      (((col("id") * 1103515245L + 12345L) % 2097152L).cast("double") / 2097152.0 - 0.5)
        .as("w"))

  /** (vec_id, t, bucket): sign-bit buckets per LSH table. */
  def buckets(emb: DataFrame, l: Int = 4, p: Int = 6): DataFrame = {
    val proj = exploded(emb).join(broadcast(planes(emb.sparkSession, l, p)), "d")
      .groupBy("vec_id", "t", "p")
      .agg(sum((col("x") * col("w")).cast(Dec)).as("proj"))
    // 2^p as exact double→long (shiftleft() lacks a Column-shift overload)
    proj.groupBy("vec_id", "t")
      .agg(sum(when(col("proj") >= 0, pow(lit(2.0), col("p").cast("double")).cast("long"))
        .otherwise(lit(0L))).as("bucket"))
  }

  private def bucketsSql(l: Int, p: Int): String =
    s"""ex AS (
       |  SELECT vec_id, u.d, CAST(embedding[u.d + 1] AS DOUBLE) AS x
       |  FROM embeddings, UNNEST(range($Dims)) AS u(d)
       |), planes AS (
       |  SELECT i // ${p * Dims} AS t, (i // $Dims) % $p AS p, i % $Dims AS d,
       |         CAST((i * 1103515245 + 12345) % 2097152 AS DOUBLE) / 2097152.0 - 0.5 AS w
       |  FROM UNNEST(range(${l.toLong * p * Dims})) AS r(i)
       |), proj AS (
       |  SELECT vec_id, t, p, SUM(CAST(x * w AS DECIMAL(32,16))) AS proj
       |  FROM ex JOIN planes USING (d) GROUP BY vec_id, t, p
       |), buckets AS (
       |  SELECT vec_id, t,
       |         SUM(CASE WHEN proj >= 0 THEN CAST(1 AS BIGINT) << CAST(p AS INT) ELSE 0 END) AS bucket
       |  FROM proj GROUP BY vec_id, t
       |)""".stripMargin

  /** ANN top-k: candidates share a (table, bucket) with the query in any
    * of the L tables; exact cosine re-rank on candidates only. */
  def annLsh(emb: DataFrame, queryId: Long, k: Int = 10,
             l: Int = 4, p: Int = 6): DataFrame = {
    val b = buckets(emb, l, p)
    val qb = b.filter(col("vec_id") === queryId)
      .select(col("t").as("qt"), col("bucket").as("qbucket"))
    val cands = b.join(broadcast(qb), col("t") === col("qt") && col("bucket") === col("qbucket"))
      .filter(col("vec_id") =!= queryId)
      .select("vec_id").distinct()
    val ex = exploded(emb)
    val q = ex.filter(col("vec_id") === queryId).select(col("d"), col("x").as("qx"))
    val n = norms(emb)
    val qn = n.filter(col("vec_id") === queryId).select(col("norm2").as("qnorm2"))
    ex.join(broadcast(cands), "vec_id") // candidate pruning BEFORE the dot products
      .join(broadcast(q), "d")
      .groupBy("vec_id")
      .agg(sum((col("x") * col("qx")).cast(Dec)).cast("double").as("dot"))
      .join(n, "vec_id")
      .crossJoin(broadcast(qn))
      .select(col("vec_id"),
        round(col("dot") / (sqrt(col("norm2")) * sqrt(col("qnorm2"))), 6).as("cos"))
      .orderBy(desc("cos"), asc("vec_id"))
      .limit(k)
  }

  def annLshSql(queryId: Long, k: Int = 10, l: Int = 4, p: Int = 6): String =
    s"""WITH ${bucketsSql(l, p)},
       |qb AS (SELECT t, bucket FROM buckets WHERE vec_id = $queryId),
       |cands AS (
       |  SELECT DISTINCT b.vec_id
       |  FROM buckets b JOIN qb ON b.t = qb.t AND b.bucket = qb.bucket
       |  WHERE b.vec_id != $queryId
       |), norms AS (
       |  SELECT vec_id, CAST(SUM(CAST(x * x AS DECIMAL(32,16))) AS DOUBLE) AS norm2
       |  FROM ex GROUP BY vec_id
       |), q AS (SELECT d, x AS qx FROM ex WHERE vec_id = $queryId),
       |qn AS (SELECT norm2 AS qnorm2 FROM norms WHERE vec_id = $queryId),
       |dots AS (
       |  SELECT ex.vec_id, CAST(SUM(CAST(ex.x * q.qx AS DECIMAL(32,16))) AS DOUBLE) AS dot
       |  FROM ex JOIN cands USING (vec_id) JOIN q USING (d) GROUP BY ex.vec_id
       |)
       |SELECT d.vec_id, round(d.dot / (sqrt(n.norm2) * sqrt(qn.qnorm2)), 6) AS cos
       |FROM dots d JOIN norms n USING (vec_id) CROSS JOIN qn
       |ORDER BY cos DESC, vec_id ASC LIMIT $k""".stripMargin

  /** Embedding near-dup pairs: bucket-mates in LSH table 0, exact cosine,
    * global top-k — the embedding-cosine near-dedup path. */
  def nearDupPairs(emb: DataFrame, topK: Int = 10, p: Int = 6): DataFrame = {
    val b = buckets(emb, l = 1, p = p).select("vec_id", "bucket")
    val pairs = b.as("a").join(b.as("b"),
        col("a.bucket") === col("b.bucket") && col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("va"), col("b.vec_id").as("vb"))
    val ex = exploded(emb)
    val n = norms(emb)
    pairs.join(ex.select(col("vec_id").as("va"), col("d"), col("x").as("xa")), Seq("va"))
      .join(ex.select(col("vec_id").as("vb"), col("d"), col("x").as("xb")), Seq("vb", "d"))
      .groupBy("va", "vb")
      .agg(sum((col("xa") * col("xb")).cast(Dec)).cast("double").as("dot"))
      .join(n.select(col("vec_id").as("va"), col("norm2").as("na")), "va")
      .join(n.select(col("vec_id").as("vb"), col("norm2").as("nb")), "vb")
      .select(col("va"), col("vb"),
        round(col("dot") / (sqrt(col("na")) * sqrt(col("nb"))), 6).as("cos"))
      .orderBy(desc("cos"), asc("va"), asc("vb"))
      .limit(topK)
  }

  def nearDupPairsSql(topK: Int = 10, p: Int = 6): String =
    s"""WITH ${bucketsSql(1, p)},
       |pairs AS (
       |  SELECT a.vec_id AS va, b.vec_id AS vb
       |  FROM buckets a JOIN buckets b
       |    ON a.bucket = b.bucket AND a.vec_id < b.vec_id
       |), norms AS (
       |  SELECT vec_id, CAST(SUM(CAST(x * x AS DECIMAL(32,16))) AS DOUBLE) AS norm2
       |  FROM ex GROUP BY vec_id
       |), dots AS (
       |  SELECT p.va, p.vb,
       |         CAST(SUM(CAST(ea.x * eb.x AS DECIMAL(32,16))) AS DOUBLE) AS dot
       |  FROM pairs p
       |  JOIN ex ea ON ea.vec_id = p.va
       |  JOIN ex eb ON eb.vec_id = p.vb AND eb.d = ea.d
       |  GROUP BY p.va, p.vb
       |)
       |SELECT d.va, d.vb, round(d.dot / (sqrt(na.norm2) * sqrt(nb.norm2)), 6) AS cos
       |FROM dots d JOIN norms na ON d.va = na.vec_id JOIN norms nb ON d.vb = nb.vec_id
       |ORDER BY cos DESC, va ASC, vb ASC LIMIT $topK""".stripMargin

  // ------------------------------------------------------------ registry

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "s1_knn_brute" -> ((s: SparkSession, dir: String) =>
      knnBrute(Tables.embeddings(s, dir), queryId = 0L)),
    "s2_ann_lsh" -> ((s: SparkSession, dir: String) =>
      annLsh(Tables.embeddings(s, dir), queryId = 0L)),
    "s3_near_dup_pairs" -> ((s: SparkSession, dir: String) =>
      nearDupPairs(Tables.embeddings(s, dir))),
  )

  def oracles: Map[String, String] = Map(
    "s1_knn_brute" -> knnBruteSql(0L),
    "s2_ann_lsh" -> annLshSql(0L),
    "s3_near_dup_pairs" -> nearDupPairsSql(),
  )
}
