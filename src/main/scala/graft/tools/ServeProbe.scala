package graft.tools

import org.apache.spark.sql.SparkSession

import graft.similarity.Similarity

/** Serve-only scale probe for the s19 two-stage ANN stack (SCALE.md
  * "s19 serve-only probe"; VERDICT r9 #6): separates the one-time index
  * build (IVF fit + assignment persist + PQ fit — amortized over every
  * query on a corpus version) from the per-query serving cost, which is
  * the number the 100 TB claim rides on — the serve path reads the
  * centroid-pruned candidate ids and PQ codes, and touches raw floats
  * for exactly `shortlist` rows per query.
  *
  *   sbt "runMain graft.tools.ServeProbe <sfDir> [nQueries]"
  *
  * Prints one JSON line: warm (build) seconds, then per-query serve
  * times (each query a distinct vec_id, so no plan/result caching can
  * flatter the number) with their median and total. Run against an
  * sf dir and its graft.tools.ScaleProbe 10x replica on the same host
  * to measure how the serve path scales with corpus size.
  */
object ServeProbe {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: ServeProbe <sfDir> [nQueries]")
    val dir = args(0)
    val nQueries = if (args.length > 1) args(1).toInt else 16
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def secs(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    // one-time: fits + corpus-sized assignment persist + memo warm
    val warm = secs(Similarity.warmTwoStageIndex(spark, dir))
    // steady state: distinct query ids, serve path only
    val times = (0 until nQueries).map { i =>
      val qid = i.toLong * 7L // spread over the id space
      secs(Similarity.annTwoStageServeOnly(spark, dir, qid).collect())
    }
    val sorted = times.sorted
    val median = sorted(sorted.length / 2)
    println(s"""{"metric":"s19_serve_only","sf_dir":"$dir","warm_sec":${f6(warm)},""" +
      s""""n_queries":$nQueries,"serve_median_sec":${f6(median)},""" +
      s""""serve_total_sec":${f6(times.sum)},""" +
      s""""serve_each":[${times.map(f6).mkString(",")}]}""")
    spark.stop()
  }

  private def f6(d: Double): String = f"$d%.3f"
}
