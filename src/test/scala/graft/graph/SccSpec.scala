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

  test("scc: f≠b nodes resolve across outer rounds (cycle feeding a cycle)") {
    // 0→1→0 feeds 5→6→5 via 1→5; increasing-id layout makes the second
    // cycle's members see f = 0 but b = 5 in round one — the residual
    // iteration must still land them on scc 5
    val got = scc(Seq((0L, 1L), (1L, 0L), (1L, 5L), (5L, 6L), (6L, 5L)))
    assert(got == Map(0L -> 0L, 1L -> 0L, 5L -> 5L, 6L -> 5L), got.toString)
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
