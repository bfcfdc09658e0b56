package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.functions.KmvDistinctAggregator
import graft.sources.Tables

/** Distinct-count sketching (engine extension): constant-space
  * approximate distinct counts with an exact-count calibration column.
  *
  * At 100 TB an exact distinct count shuffles every distinct key; a KMV
  * sketch shuffles k longs per group per partition and merges
  * associatively — the same role HyperLogLog plays in
  * approx_count_distinct, but built from the engine's cross-engine md5
  * hash so the DuckDB oracle can recompute the identical estimate from
  * the k-th order statistic (approx_count_distinct's HLL has no DuckDB
  * twin, which is why it cannot be oracled and this operator exists).
  */
object Sketch {
  private val Out6 = DecimalType(18, 6)
  private val K = 64

  /** 32-bit md5-derived hash: the first 8 hex digits of md5(key) as a
    * BIGINT — the [[graft.text.TextStats.hashBucket]] pattern widened
    * from 8 to 32 bits. Uniform over [0, 2³²), identical in both
    * engines (md5 is the only shared hash primitive). */
  def hash32(key: Column): Column = {
    val hex = md5(key.cast("string").cast("binary"))
    (1 to 8).map { pos =>
      (instr(lit("0123456789abcdef"), substring(hex, pos, 1)) - 1).cast("long") *
        lit(1L << ((8 - pos) * 4))
    }.reduce(_ + _)
  }

  /** DuckDB twin of [[hash32]] over a key expression. */
  def hash32SqlExpr(key: String): String =
    (1 to 8).map { pos =>
      s"(strpos('0123456789abcdef', substr(md5(CAST($key AS VARCHAR)), $pos, 1)) - 1) * ${1L << ((8 - pos) * 4)}"
    }.mkString("(", " + ", ")")

  /** q37: KMV distinct-user estimate per event type NEXT TO the exact
    * count — the estimator-vs-truth calibration surface (the d10
    * pattern). The estimate flows through the bounded
    * [[KmvDistinctAggregator]] (map-side partials, O(k) state); the
    * exact count is the thing the sketch replaces at scale and is kept
    * here so the query itself exhibits the error being accepted. */
  def kmvDistinct(events: DataFrame, k: Int = K): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    val est = events.select(col("event_type"), hash32(col("user_id")).as("hv"))
      .as[(String, Long)]
      .groupByKey(_._1)
      .agg(new KmvDistinctAggregator(k).toColumn.name("est"))
      .toDF("event_type", "est")
    val exact = events.groupBy("event_type")
      .agg(count_distinct(col("user_id")).cast("long").as("n_exact"))
    est.join(exact, "event_type")
      .select(col("event_type"), col("n_exact"),
        round(col("est"), 6).cast(Out6).as("kmv_est"))
      .orderBy("event_type")
  }

  /** Oracle for [[kmvDistinct]]: the k-th smallest distinct hash per
    * group via window order statistic; below k distinct hashes the
    * estimate is the distinct-hash count itself (both branches mirror
    * [[KmvDistinctAggregator.finish]] exactly). */
  def kmvDistinctSql(k: Int = K): String =
    s"""WITH h AS (
       |  SELECT DISTINCT event_type, ${hash32SqlExpr("user_id")} AS hv
       |  FROM events
       |), ranked AS (
       |  SELECT event_type, hv,
       |    row_number() OVER (PARTITION BY event_type ORDER BY hv) AS rk,
       |    count(*) OVER (PARTITION BY event_type) AS n_h
       |  FROM h
       |), est AS (
       |  SELECT event_type,
       |    CASE WHEN n_h < $k THEN CAST(n_h AS DOUBLE)
       |         ELSE ${k - 1} * 4294967296.0 / hv END AS est
       |  FROM ranked WHERE rk = least(n_h, $k)
       |), exact AS (
       |  SELECT event_type, COUNT(DISTINCT user_id) AS n_exact
       |  FROM events GROUP BY event_type
       |)
       |SELECT e.event_type, e.n_exact,
       |  CAST(round(s.est, 6) AS DECIMAL(18,6)) AS kmv_est
       |FROM exact e JOIN est s USING (event_type) ORDER BY event_type""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q37_kmv_distinct" -> ((s: SparkSession, dir: String) =>
      kmvDistinct(Tables.events(s, dir))),
  )

  def oracles: Map[String, String] = Map(
    "q37_kmv_distinct" -> kmvDistinctSql(),
  )
}
