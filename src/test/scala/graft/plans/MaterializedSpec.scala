package graft.plans

import org.apache.spark.sql.functions._

import graft.SparkSpec

class MaterializedSpec extends SparkSpec {
  import spark.implicits._

  test("builds once per key, serves every subsequent consumer from the memo") {
    Materialized.clear()
    var builds = 0
    def frame = {
      builds += 1
      Seq(1, 2, 3).toDF("v").withColumn("x", col("v") * 2)
    }
    val a = Materialized(spark, "mat_spec_k1")(frame)
    val b = Materialized(spark, "mat_spec_k1")(frame)
    assert(builds == 1, s"shared key rebuilt: $builds builds")
    assert(a.collect().map(_.getInt(1)).sorted.sameElements(Array(2, 4, 6)))
    assert(b.collect().map(_.getInt(1)).sorted.sameElements(Array(2, 4, 6)))
    val c = Materialized(spark, "mat_spec_k2")(frame)
    assert(builds == 2, "distinct key did not build")
    assert(c.count() == 3)
    Materialized.clear()
    Materialized(spark, "mat_spec_k1")(frame)
    assert(builds == 3, "clear() did not evict")
  }

  test("memoized frame is materialized (checkpointed), not a live plan") {
    Materialized.clear()
    val m = Materialized(spark, "mat_spec_cp")(Seq((1L, "a")).toDF("k", "s"))
    // a checkpointed frame has no logical lineage back to the local
    // relation — its plan is a scan of pinned partitions
    assert(m.queryExecution.optimizedPlan.toString.contains("LogicalRDD"),
      m.queryExecution.optimizedPlan.toString)
  }
}
