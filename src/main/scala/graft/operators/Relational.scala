package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.sources.Tables

/** Core relational operators over the TPC-H-ish tables, exercising the
  * reference's scan/project/filter/agg/join/sort surface (SURVEY.md §2.1-2.5)
  * at scale.
  *
  * Determinism convention for oracle parity (shared by the whole engine):
  * big floating-point sums are quantized per-row to DECIMAL before the
  * aggregate (order-independent exact sum), then the final value is cast
  * back to double. Per-row double arithmetic (products, divisions) is
  * IEEE-deterministic and needs no special handling.
  */
object Relational {
  private val D204 = DecimalType(20, 4)
  private val D308 = DecimalType(30, 8)

  /** Pricing-summary aggregate (TPC-H Q1 shape): grouped sums/avgs/counts.
    * Exercises SURVEY §2.4 A1/A5/A6 (grouped count/sum) as partial+final
    * hash aggregates — the Catalyst equivalent of the reference's
    * reduceByKey map-side combine (ref MovieSearchEngine.scala:128-151). */
  def q1Agg(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        sum(col("l_quantity").cast(D204)).cast("double").as("sum_qty"),
        sum(col("l_extendedprice").cast(D204)).cast("double").as("sum_base_price"),
        sum((col("l_extendedprice") * (lit(1) - col("l_discount"))).cast(D308)).cast("double").as("sum_disc_price"),
        (sum(col("l_quantity").cast(D204)).cast("double") / count(lit(1))).as("avg_qty"),
        count(lit(1)).as("n_rows"))
      .orderBy("l_returnflag", "l_linestatus")

  def q1AggSql: String =
    """SELECT l_returnflag, l_linestatus,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(20,4))) AS DOUBLE) AS sum_qty,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(20,4))) AS DOUBLE) AS sum_base_price,
      |  CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(30,8))) AS DOUBLE) AS sum_disc_price,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(20,4))) AS DOUBLE) / COUNT(*) AS avg_qty,
      |  COUNT(*) AS n_rows
      |FROM lineitem
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin

  /** Filtered scalar aggregate (TPC-H Q6 shape): the filter + projection
    * must push into the parquet scan (SURVEY §2.2 P5/P9; verified via
    * explain in the bench pass). */
  def q6Filter(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .filter(col("l_discount") >= 0.05 && col("l_discount") <= 0.07 && col("l_quantity") < 24)
      .agg(sum((col("l_extendedprice") * col("l_discount")).cast(D308)).cast("double").as("revenue"),
        count(lit(1)).as("n_rows"))

  def q6FilterSql: String =
    """SELECT
      |  CAST(SUM(CAST(l_extendedprice * l_discount AS DECIMAL(30,8))) AS DOUBLE) AS revenue,
      |  COUNT(*) AS n_rows
      |FROM lineitem
      |WHERE l_discount >= 0.05 AND l_discount <= 0.07 AND l_quantity < 24""".stripMargin
}
