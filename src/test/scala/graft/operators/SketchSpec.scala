package graft.operators

import graft.SparkSpec
import graft.functions.KmvDistinctAggregator
import graft.sources.Tables

class SketchSpec extends SparkSpec {
  import spark.implicits._

  test("kmvDistinct: estimate tracks the exact count on real events") {
    val rows = Sketch.kmvDistinct(Tables.events(spark, sf("sf0.001"))).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val exact = r.getLong(1).toDouble
      val est = r.getDecimal(2).doubleValue
      // k=64 → relative standard error ~1/√k ≈ 12.5%; 3σ bound
      assert(math.abs(est - exact) / exact < 0.4,
        s"${r.getString(0)}: est=$est exact=$exact")
    }
  }

  test("KmvDistinctAggregator: partition-schedule independent") {
    // the estimate is a pure function of the distinct hash set, so any
    // partitioning (and so any partial-aggregation merge order) must
    // produce the identical double
    val vals = (1L to 500L).map(i => ("g", math.floorMod(i * 2654435761L, 4294967296L)))
    def estimate(parts: Int): Double =
      vals.toDS().repartition(parts)
        .groupByKey(_._1)
        .agg(new KmvDistinctAggregator(64).toColumn.name("est"))
        .collect().head._2
    assert(estimate(1) == estimate(8))
  }

  test("KmvDistinctAggregator: exact below k, estimator above") {
    val small = (1L to 30L).map(i => ("g", i * 1000L))
    val below = small.toDS().groupByKey(_._1)
      .agg(new KmvDistinctAggregator(64).toColumn.name("est"))
      .collect().head._2
    assert(below == 30.0) // fewer than k distinct values → exact count
    // duplicates must not perturb the sketch (distinct semantics)
    val dup = (small ++ small).toDS().groupByKey(_._1)
      .agg(new KmvDistinctAggregator(64).toColumn.name("est"))
      .collect().head._2
    assert(dup == 30.0)
  }

  test("hash32 matches its SQL twin's digit arithmetic") {
    // 32-bit range and determinism across rows
    val hs = Seq(1L, 2L, 42L, 999999L).toDF("k")
      .select(Sketch.hash32(org.apache.spark.sql.functions.col("k")).as("h"))
      .collect().map(_.getLong(0))
    hs.foreach(h => assert(h >= 0L && h < 4294967296L))
    assert(hs.distinct.length == hs.length)
  }
}
