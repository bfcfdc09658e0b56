package graft.graph

// dev probe (round 15): sizes the k-truss incremental-peel design —
// triangle-set cardinality vs edge count at the g25 projection decides
// whether maintaining the triangle set across peel rounds beats
// re-enumerating it. MEASURED ANSWER: NO at bench scale — at sf0.1 the
// mod-500 projection holds 87,273 edges / 7.09M triangles and the
// 5-truss retains EVERY edge (round 1 peels nothing, so there is no
// second enumeration to save), while the triangle SET is 81× the edge
// set (maintaining it across rounds would checkpoint 7M rows per peel
// round — more IO than the 5.8 s output-bound enumeration it replaces).
// Incremental support maintenance only pays when triangles/edges is
// small and peel rounds are many, the opposite of this graph. See
// SCALE.md round-15.
object TrussProbe {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]").config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import org.apache.spark.sql.functions._
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val e = Graph.canonEdges(Graph.edgesFromOrders(spark, dir, m = Graph.TrussProjMod))
      .localCheckpoint(true)
    println("edges=" + e.count())
    var t0 = System.nanoTime()
    val tris = Graph.orientedTriangles(e).localCheckpoint(true)
    println("tris=" + tris.count() + " enumSec=" + (System.nanoTime() - t0) / 1e9)
    t0 = System.nanoTime()
    val full = Graph.kTruss(Graph.edgesFromOrders(spark, dir, m = Graph.TrussProjMod), k = 5)
    println("kTruss rows=" + full.count() + " fullSec=" + (System.nanoTime() - t0) / 1e9)
    spark.stop()
  }
}
