package graft.graph

import graft.SparkSpec

/** g22 strongly-connected-components correctness on hand-built digraphs
  * plus structural invariants on the real bench graph. */
class SccSpec extends SparkSpec {

  private def scc(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    import spark.implicits._
    Graph.stronglyConnectedComponents(edges.toDF("src", "dst"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("scc: two cycles bridged by a one-way path stay separate components") {
    // 1→2→3→1 (cycle A), 4→5→4 (cycle B), bridge 3→4 (one-way: NOT merged)
    val got = scc(Seq((1L, 2L), (2L, 3L), (3L, 1L), (4L, 5L), (5L, 4L), (3L, 4L)))
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 4L, 5L -> 4L), got.toString)
  }

  test("scc: a pure DAG chain is all singletons (trim path)") {
    val got = scc(Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L)))
    assert(got == Map(1L -> 1L, 2L -> 2L, 3L -> 3L, 4L -> 4L, 5L -> 5L), got.toString)
  }

  test("scc: empty edge frame returns an empty (id, scc) frame, not NPE") {
    // ADVICE r11: vertex count 0 skips the outer loop entirely; the
    // result must still be a well-formed empty frame
    val got = scc(Seq.empty)
    assert(got.isEmpty, got.toString)
  }

  test("scc: f≠b nodes resolve across outer rounds (cycle feeding a cycle)") {
    // 0→1→0 feeds 5→6→5 via 1→5; increasing-id layout makes the second
    // cycle's members see f = 0 but b = 5 in round one — the residual
    // iteration must still land them on scc 5
    val got = scc(Seq((0L, 1L), (1L, 0L), (1L, 5L), (5L, 6L), (6L, 5L)))
    assert(got == Map(0L -> 0L, 1L -> 0L, 5L -> 5L, 6L -> 5L), got.toString)
  }

  private def levels(edges: Seq[(Long, Long)]): Map[Long, (Long, Long)] = {
    import spark.implicits._
    val e = edges.toDF("src", "dst")
    Graph.condensationLevels(e, Graph.stronglyConnectedComponents(e))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
  }

  test("condensation: cycles collapse, bridge makes one stratum step") {
    // cycle {1,2,3} → cycle {4,5}: condensation is 1 → 4
    val got = levels(Seq((1L, 2L), (2L, 3L), (3L, 1L), (4L, 5L), (5L, 4L), (3L, 4L)))
    assert(got == Map(
      1L -> (1L, 0L), 2L -> (1L, 0L), 3L -> (1L, 0L),
      4L -> (4L, 1L), 5L -> (4L, 1L)), got.toString)
  }

  test("condensation: level is LONGEST path from a source (diamond with a long leg)") {
    // 1→2→4 (len 2) vs 1→3→5→4 (len 3): node 4 must sit at level 3
    val got = levels(Seq((1L, 2L), (2L, 4L), (1L, 3L), (3L, 5L), (5L, 4L)))
    assert(got == Map(
      1L -> (1L, 0L), 2L -> (2L, 1L), 3L -> (3L, 1L),
      5L -> (5L, 2L), 4L -> (4L, 3L)), got.toString)
  }

  test("condensation: stratification invariants hold on real data") {
    val edges = Graph.cachedEdges(spark, sf("sf0.001"))
    val scc = Graph.stronglyConnectedComponents(edges)
    val lv = Graph.condensationLevels(edges, scc)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val sccOf = lv.map(t => t._1 -> t._2).toMap
    val lvlOf = lv.map(t => t._2 -> t._3).toMap
    assert(lv.map(_._1).toSet ==
      scc.collect().map(_.getLong(0)).toSet, "vertex universe preserved")
    val cond = edges.collect()
      .map(r => (sccOf(r.getLong(0)), sccOf(r.getLong(1))))
      .filter(p => p._1 != p._2).distinct
    // every condensed edge goes strictly DOWN the strata
    assert(cond.forall { case (s, t) => lvlOf(t) >= lvlOf(s) + 1 })
    // tightness: each level-L>0 node has an in-edge from exactly L-1
    val inBy = cond.groupBy(_._2)
    assert(lvlOf.forall { case (n, l) =>
      l == 0L || inBy(n).exists { case (s, _) => lvlOf(s) == l - 1 } })
    // sources are exactly the nodes with no incoming condensed edge
    assert(lvlOf.forall { case (n, l) => (l == 0L) == !inBy.contains(n) })
  }

  test("scc: undirected merge of SCC labels refines g3's components on real data") {
    val edges = Graph.cachedEdges(spark, sf("sf0.001"))
    val s = Graph.stronglyConnectedComponents(edges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val c = Graph.connectedComponents(edges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(s.keySet == c.keySet, "same vertex universe")
    // refinement: two nodes in one SCC are necessarily in one CC
    val byScc = s.groupBy(_._2).values
    assert(byScc.forall(g => g.keys.map(c).toSet.size == 1),
      "an SCC crossed an undirected-component boundary")
    // and SCC count is >= CC count (mutual reachability is stricter)
    assert(s.values.toSet.size >= c.values.toSet.size)
    // every label is the component's min member id (the g3 convention)
    assert(byScc.forall { g => g.values.head == g.keys.min })
  }
}
