package graft.sources

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Bucketed co-located join (the 100 TB shuffle-avoidance path the
  * builder brief calls for): both sides written bucketed by the join
  * key → the sort-merge join reads bucket-aligned files and needs NO
  * Exchange on either side. */
class BucketingSpec extends SparkSpec {

  test("join of tables bucketed on the key plans without a shuffle") {
    val dir = sf("sf0.001")
    // default warehouse (./spark-warehouse, gitignored); clear any
    // leftover unregistered locations from earlier aborted runs too
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_customer")
    val wh = new java.io.File(spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:"))
    Seq("b_orders", "b_customer").foreach { t =>
      val d = new java.io.File(wh, t)
      if (d.exists()) { d.listFiles().foreach(_.delete()); d.delete() }
    }
    Tables.orders(spark, dir)
      .write.bucketBy(4, "o_custkey").sortBy("o_custkey")
      .mode("overwrite").saveAsTable("b_orders")
    Tables.customer(spark, dir)
      .write.bucketBy(4, "c_custkey").sortBy("c_custkey")
      .mode("overwrite").saveAsTable("b_customer")

    // MERGE hint: at this tiny SF Spark would auto-broadcast, which
    // bypasses bucketing entirely; production sizes pick SMJ on their own
    val joined = spark.table("b_orders").hint("merge")
      .join(spark.table("b_customer"),
        col("o_custkey") === col("c_custkey"))
      .groupBy("c_nationkey").agg(count(lit(1)).as("n"))

    // correctness vs the plain (shuffled) join
    val plain = Tables.orders(spark, dir)
      .join(Tables.customer(spark, dir), col("o_custkey") === col("c_custkey"))
      .groupBy("c_nationkey").agg(count(lit(1)).as("n"))
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getAs[Number](0).longValue, r.getLong(1))).sortBy(_._1).toSeq
    assert(rows(joined) == rows(plain))

    // plan: the join itself must have no Exchange below it (the only
    // shuffle allowed is the groupBy ABOVE the join). Inspect only the
    // final AQE plan — the "Initial Plan" section AQE appends re-prints
    // the same operators.
    val plan = joined.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    val joinIdx = plan.indexOf("SortMergeJoin")
    assert(joinIdx >= 0, s"expected SortMergeJoin in:\n$plan")
    assert(plan.substring(joinIdx).contains("Bucketed: true"), s"expected bucketed scans:\n$plan")
    assert(!plan.substring(joinIdx).contains("Exchange"),
      s"bucketed join should not shuffle either side:\n$plan")
  }
}
