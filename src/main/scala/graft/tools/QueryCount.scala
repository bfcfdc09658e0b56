package graft.tools

/** Dev-only inventory check: prints the registered-query count and any
  * name present in `queries` but missing from `oracleSql` (or vice
  * versa) — the drift the driver gate would otherwise catch a round
  * late. No SparkSession needed (the maps are values). */
object QueryCount {
  def main(args: Array[String]): Unit = {
    // keys-only consumer: no query has run, so cache-resolved oracle
    // renders (s20/s26 family) need the documented escape hatch (scoped)
    val q = graft.SparkEntry.queries.keySet
    val o = graft.similarity.Similarity
      .withUnseededOracleRender(graft.SparkEntry.oracleSql.keySet)
    println(s"queries=${q.size} oracles=${o.size}")
    (q -- o).toSeq.sorted.foreach(n => println(s"MISSING ORACLE: $n"))
    (o -- q).toSeq.sorted.foreach(n => println(s"ORPHAN ORACLE: $n"))
  }
}
