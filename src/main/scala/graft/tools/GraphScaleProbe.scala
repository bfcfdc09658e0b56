package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.graph.Graph
import graft.plans.Lineage.CheckpointOps

/** Measured scale probe for the GRAPH family (VERDICT r12 item 4: the
  * one family ScaleProbe never replicated at skew) — fabricates a
  * deterministic hubbed graph and times g4/g8/g10/g14 on it, plus the
  * wedge-count audit for the triangle orientation (r12's one `weak`):
  *
  *   sbt "runMain graft.tools.GraphScaleProbe <nVertices> <avgDeg> <hubDeg> [--with-old]"
  *
  * Graph construction (all deterministic integer arithmetic, no RNG):
  *  - background: nVertices·avgDeg directed edges (src, dst) from two
  *    fixed multiplicative hashes of the edge index — near-uniform
  *    degree ≈ 2·avgDeg per vertex;
  *  - hub: vertex 0 gains `hubDeg` distinct out-neighbors 1..hubDeg —
  *    the single power-law hub that makes id-canonical wedge
  *    generation quadratic (deg²/4 wedge rows at the hub) while the
  *    degree-ordered orientation stays hub-bounded.
  *
  * Reported per run (one JSON line each, greppable "[gprobe]"):
  *  - wedge rows under id-canonical orientation (what the pre-r13
  *    triangleCounts would shuffle), computed ANALYTICALLY as
  *    Σ_v lo(v)·hi(v) over canonical neighbor splits;
  *  - wedge rows under (degree, id) orientation, Σ_v C(outdeg(v), 2);
  *  - wall seconds for triangleCounts (new), clusteringCoeff,
  *    labelPropagation(3), hits(4);
  *  - with --with-old: wall seconds for the pre-r13 id-canonical
  *    triangle plan, inlined here verbatim for the before/after row.
  */
object GraphScaleProbe {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3,
      "usage: GraphScaleProbe <nVertices> <avgDeg> <hubDeg> [--with-old]")
    val n = args(0).toLong
    val avgDeg = args(1).toInt
    val hubDeg = args(2).toLong
    val withOld = args.contains("--with-old")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // xxhash64 (not a linear congruence — a·id mod n collapses to n
    // distinct pairs for any row count) gives near-uniform independent
    // endpoints; the hub sits at id n/2 with neighbors split EVENLY
    // across lower and higher ids — the worst case for id-canonical
    // orientation (lo·hi ≈ deg²/4 wedges at the hub), whereas a hub at
    // id 0 would accidentally be its best case (lo = 0)
    val background = spark.range(n * avgDeg)
      .select(pmod(xxhash64(col("id"), lit(1)), lit(n)).as("src"),
        pmod(xxhash64(col("id"), lit(2)), lit(n)).as("dst"))
      .filter(col("src") =!= col("dst"))
    val hubId = n / 2
    val hub = spark.range(hubDeg + 1L)
      .select(lit(hubId).as("src"),
        (col("id") + lit(hubId - hubDeg / 2)).as("dst"))
      .filter(col("dst") =!= hubId && col("dst") >= 0 && col("dst") < n)
    val edges = background.union(hub).loopCheckpoint(true)
    val m = edges.count()
    println(s"""[gprobe] {"graph":{"n":$n,"avg_deg":$avgDeg,"hub_deg":$hubDeg,"edge_rows":$m}}""")

    // canonical simple graph + the two orientations' wedge masses
    val canon = edges
      .select(least(col("src"), col("dst")).as("a"),
        greatest(col("src"), col("dst")).as("b"))
      .filter(col("a") =!= col("b")).distinct().loopCheckpoint(true)
    val mc = canon.count()
    // id-canonical: wedges at middle vertex v = (#nbrs < v)·(#nbrs > v)
    val splits = canon.select(col("b").as("v"), lit(1L).as("lo"), lit(0L).as("hi"))
      .union(canon.select(col("a").as("v"), lit(0L).as("lo"), lit(1L).as("hi")))
      .groupBy("v").agg(sum("lo").as("lo"), sum("hi").as("hi"))
    val idWedges = splits.agg(sum(col("lo") * col("hi"))).head().getLong(0)
    // degree-ordered: wedges at min corner v = C(outdeg(v), 2)
    val deg = canon.select(col("a").as("id")).union(canon.select(col("b").as("id")))
      .groupBy("id").agg(count(lit(1)).as("deg"))
    val oriented = canon
      .join(deg.select(col("id").as("a"), col("deg").as("da")), "a")
      .join(deg.select(col("id").as("b"), col("deg").as("db")), "b")
      .select(when(col("da") < col("db") ||
          (col("da") === col("db") && col("a") < col("b")), col("a"))
        .otherwise(col("b")).as("s"))
    val degWedges = oriented.groupBy("s").agg(count(lit(1)).as("od"))
      .agg(sum(col("od") * (col("od") - 1))).head().getLong(0) / 2
    println(s"""[gprobe] {"canon_edges":$mc,"wedges_id_canonical":$idWedges,"wedges_degree_ordered":$degWedges,"ratio":${if (degWedges > 0) idWedges / degWedges else -1}}""")

    def time(name: String)(body: => Unit): Unit = {
      val t0 = System.nanoTime()
      body
      println(f"""[gprobe] {"op":"$name","wall_sec":${(System.nanoTime() - t0) / 1e9}%.2f}""")
    }
    def drain(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    time("g4_triangleCounts")(drain(Graph.triangleCounts(edges)))
    if (withOld) time("g4_old_id_canonical") {
      // pre-r13 plan, inlined verbatim for the before/after row
      val e1 = canon.select(col("a"), col("b"))
      val e2 = canon.select(col("a").as("b"), col("b").as("c"))
      val e3 = canon.select(col("a").as("ta"), col("b").as("tc"))
      val tris = e1.join(e2, "b")
        .join(e3, col("a") === col("ta") && col("c") === col("tc"))
        .select("a", "b", "c")
      val corners = tris.select(explode(array(col("a"), col("b"), col("c"))).as("id"))
      drain(Graph.vertices(edges)
        .join(corners.groupBy("id").agg(count(lit(1)).as("n_tri")), Seq("id"), "left_outer")
        .select(col("id"), coalesce(col("n_tri"), lit(0L)).as("n_tri")))
    }
    time("g10_clusteringCoeff") {
      drain(Graph.clusteringCoeff(edges, Graph.triangleCounts(edges)))
    }
    time("g8_labelPropagation")(drain(Graph.labelPropagation(edges, rounds = 3)))
    time("g14_hits")(drain(Graph.hits(edges, iterations = 4)))
    time("g2_pageRank")(drain(Graph.pageRank(edges, iterations = 3)))
    time("g3_connectedComponents")(drain(Graph.connectedComponents(edges)))
    time("g25_kTruss_k5")(drain(Graph.kTruss(edges, k = 5)))
    // r13 additions: weighted SSSP (frontier Bellman-Ford waves) and
    // pivot betweenness — the hub is deliberately a landmark AND a
    // pivot, so the forward frontier fans across its full neighborhood
    time("g26_weightedSssp") {
      drain(Graph.weightedSssp(Graph.weightedEdges(edges),
        landmarks = Seq(1L, 2L, 3L, 4L, hubId)))
    }
    time("g27_betweenness") {
      drain(Graph.betweenness(edges, pivots = Seq(1L, 2L, 3L, 4L, hubId)))
    }
    spark.stop()
  }
}
