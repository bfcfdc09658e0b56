package graft.graph

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.plans.Lineage

/** Round-17 SHJ build-side guard (VERDICT r16 item 9): the loop joins
  * hint shuffle_hash because the build side is a small state frame, but
  * a hinted SHJ whose build partition does not fit execution memory
  * OOMs where sort-merge would spill. [[Graph.shj]] applies the hint
  * only while the measured per-partition build estimate stays within
  * the advisory partition size. */
class ShjGuardSpec extends SparkSpec {

  private def joinPlan(build: org.apache.spark.sql.DataFrame,
                       np: Int): String = {
    import spark.implicits._
    val stream = Seq((1L, 10L), (2L, 20L), (3L, 30L)).toDF("k", "v").coalesce(1)
    stream.join(Graph.shj(build, np), Seq("k"))
      .queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
  }

  test("fitting measured build side keeps the shuffle_hash hint") {
    import spark.implicits._
    val build = Lineage.checkpoint(
      Seq((1L, "a"), (2L, "b")).toDF("k", "w").coalesce(1), eager = true)
    assert(joinPlan(build, 1).contains("ShuffledHashJoin"))
  }

  test("oversized measured build side falls back to the planner's default") {
    import spark.implicits._
    val build = Lineage.checkpoint(
      Seq((1L, "a"), (2L, "b")).toDF("k", "w").coalesce(1), eager = true)
    val key = "spark.sql.adaptive.advisoryPartitionSizeInBytes"
    val old = spark.conf.get(key, "64m")
    try {
      // 1-byte advisory: ANY measured build frame exceeds the
      // per-partition bound, so the hint must be withheld
      spark.conf.set(key, "1b")
      val plan = joinPlan(build, 1)
      assert(!plan.contains("ShuffledHashJoin"), plan)
    } finally spark.conf.set(key, old)
  }

  test("unmeasurable build side (mid-plan join product) keeps the status quo hint") {
    import spark.implicits._
    val a = Lineage.checkpoint(
      Seq((1L, 5L), (2L, 6L)).toDF("k", "x").coalesce(1), eager = true)
    val b = Lineage.checkpoint(
      Seq((1L, 7L)).toDF("k", "y").coalesce(1), eager = true)
    val subplan = a.join(b, Seq("k")) // join product: not measurable
    val key = "spark.sql.adaptive.advisoryPartitionSizeInBytes"
    val old = spark.conf.get(key, "64m")
    try {
      spark.conf.set(key, "1b") // even with an absurd bound…
      val plan = joinPlan(subplan, 1)
      assert(plan.contains("ShuffledHashJoin"), plan) // …the hint stays
    } finally spark.conf.set(key, old)
  }
}
