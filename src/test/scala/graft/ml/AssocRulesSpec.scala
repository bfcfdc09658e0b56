package graft.ml

import graft.SparkSpec

/** Hand-computed fixture checks of the m27 association-rule metrics,
  * plus the plan property its 100 TB posture rests on (one exchange of
  * the basket frame reused for both self-join sides). */
class AssocRulesSpec extends SparkSpec {

  test("assocRules: hand-computed support/confidence/lift; directed asymmetry") {
    import spark.implicits._
    // 4 orders; {1,2} co-occur 3×; item 1 in 4 baskets, item 2 in 3;
    // item 3 appears once alongside 1 (pruned by minCount=2)
    val baskets = Seq(
      (10L, 1L), (10L, 2L),
      (20L, 1L), (20L, 2L),
      (30L, 1L), (30L, 2L),
      (40L, 1L), (40L, 3L)).toDF("ok", "item")
    val rows = AssocRules.assocRules(baskets, minCount = 2, topK = 10).collect()
    assert(rows.length == 2, s"exactly the 1↔2 pair survives: ${rows.mkString(";")}")
    val byDir = rows.map(r => (r.getLong(0), r.getLong(1)) ->
      (r.getLong(2), r.getDecimal(3).doubleValue, r.getDecimal(4).doubleValue,
        r.getDecimal(5).doubleValue)).toMap
    // 1→2: n_ab=3, support 3/4, confidence 3/4, lift 3·4/(4·3)=1
    assert(byDir((1L, 2L)) == ((3L, 0.75, 0.75, 1.0)), s"${byDir((1L, 2L))}")
    // 2→1: confidence 3/3 = 1 — the DIRECTED metric differs, lift symmetric
    assert(byDir((2L, 1L)) == ((3L, 0.75, 1.0, 1.0)), s"${byDir((2L, 1L))}")
  }

  test("assocRules: minCount prunes before metrics; duplicate lines don't inflate") {
    import spark.implicits._
    // order 10 lists item 2 twice (two lineitems, same part) — the
    // distinct() basket build must count the pair once
    val baskets = Seq(
      (10L, 1L), (10L, 2L), (10L, 2L),
      (20L, 1L), (20L, 2L)).toDF("ok", "item")
    val strict = AssocRules.assocRules(baskets, minCount = 3, topK = 10).collect()
    assert(strict.isEmpty, "n_ab=2 must not survive minCount=3")
    val loose = AssocRules.assocRules(baskets, minCount = 2, topK = 10).collect()
    assert(loose.map(_.getLong(2)).forall(_ == 2L),
      s"duplicate lineitem inflated the pair count: ${loose.mkString(";")}")
  }

  test("assocRulesBySupport: threshold is ceil(minSupport * N), derived in-plan") {
    import spark.implicits._
    // N = 4 orders, pair {1,2} co-occurs 3× (support 0.75)
    val baskets = Seq(
      (10L, 1L), (10L, 2L),
      (20L, 1L), (20L, 2L),
      (30L, 1L), (30L, 2L),
      (40L, 1L), (40L, 3L)).toDF("ok", "item")
    // minSupport 0.6 → minCount ceil(2.4) = 3 → the pair survives
    assert(AssocRules.assocRulesBySupport(baskets, 0.6, 10).count() == 2)
    // minSupport 0.8 → minCount ceil(3.2) = 4 → pruned
    assert(AssocRules.assocRulesBySupport(baskets, 0.8, 10).count() == 0)
  }

  test("m27 plan: at-scale regime reuses one basket exchange; hint broadcasts survive") {
    // at sf0.001 stats let the optimizer broadcast the self-join side;
    // the 100 TB shape (both sides too big to ship) is what needs the
    // audit — force it by disabling size-based broadcasts. The support
    // joins are EXPLICIT broadcast() hints, which must survive the
    // threshold being off.
    val key = "spark.sql.autoBroadcastJoinThreshold"
    val prev = spark.conf.get(key)
    try {
      spark.conf.set(key, "-1")
      val df = AssocRules.m27AssocRules(spark, sf("sf0.001"))
      df.collect() // AQE dedups identical exchanges at runtime — read the final plan
      // adaptive toString prints Final AND Initial sections — audit the final only
      val p = df.queryExecution.executedPlan.toString.split("== Initial Plan ==").head
      assert(p.contains("ReusedExchange") || p.contains("ReusedQueryStage") ||
        "ShuffleQueryStage (\\d+)".r.findAllMatchIn(p).map(_.group(1)).toSeq
          .groupBy(identity).exists(_._2.size > 1),
        "basket self-join must reuse one shuffle of the basket frame:\n" + p.take(1200))
      assert("BroadcastHashJoin".r.findAllIn(p).size >= 2,
        "item-support hint broadcasts lost under threshold=-1:\n" + p.take(1200))
      assert(p.contains("TakeOrderedAndProject"), "top-k must not global-sort")
      val nested = "BroadcastNestedLoopJoin".r.findAllIn(p).size
      assert(nested <= 2,
        s"only the two 1-row n_orders cross joins (prune + metrics) may nest ($nested)")
    } finally spark.conf.set(key, prev)
  }
}
