package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Same-JVM A/B probe separating the round-12 skew-gate cost from host
  * regime in d24's readings (round-12 adjudication instrument, kept for
  * re-runs): times the full entityResolution pipeline with (D) the
  * round-11 plain blocked self-join pair source and (E) the current
  * size-gated [[graft.dedup.Dedup.blockedCandidatePairs]] source, three
  * reps each. Round-12 measurement: D 8.2 s vs E 8.5 s steady-state at
  * sf0.1 — the decomposition is ≤ 0.3 s on the gate corpus (all blocks
  * under the cap), so an anchor-to-anchor d24 swing that reproduces in
  * BOTH forms is not the round-12 plan change. (The 30× probe later
  * found the plan-SHARED term both arms contained — CC's triple
  * evaluation of the raw match pipeline; see [[D24StageProbe]] and
  * SCALE.md's round-12 probe section.) */
object D24AbProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val customer = spark.read.parquet(s"$dir/customer.parquet")
    def time(tag: String)(f: => Long): Unit =
      (1 to 3).foreach { i =>
        val t0 = System.nanoTime()
        val n = f
        println(f"$tag rep$i: ${(System.nanoTime() - t0) / 1e9}%.2f s  n=$n")
      }
    def finish(pairs: DataFrame): Long = {
      val ents = graft.graph.Graph.connectedComponents(pairs)
        .select(col("id").as("c_custkey"), col("component").as("entity"))
      customer.join(ents, Seq("c_custkey"), "left")
        .select(col("c_custkey"), col("c_name"), col("c_acctbal"),
          coalesce(col("entity"), col("c_custkey")).as("entity"))
        .groupBy("entity")
        .agg(count(lit(1)).as("n_records"),
          min_by(col("c_name"), col("c_custkey")).as("canonical_name"),
          sum(col("c_acctbal").cast(org.apache.spark.sql.types.DecimalType(20, 4)))
            .cast("double").as("total_acctbal"))
        .count()
    }
    val lev2 = (a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =>
      a =!= b && levenshtein(a, b, 2) =!= -1
    val c = customer.select(col("c_custkey"), col("c_name"),
        substring(col("c_name"), 1, 16).as("blk"))
      .localCheckpoint(true)
    time("D full d24, plain pairs") {
      finish(c.as("a").join(c.as("b"),
          col("a.blk") === col("b.blk") && col("a.c_custkey") < col("b.c_custkey"))
        .filter(lev2(col("a.c_name"), col("b.c_name")))
        .select(col("a.c_custkey").as("src"), col("b.c_custkey").as("dst")))
    }
    time("E full d24, current (blockedCandidatePairs)") {
      finish(graft.dedup.Dedup.blockedCandidatePairs(c)
        .filter(lev2(col("a_name"), col("b_name")))
        .select(col("a_key").as("src"), col("b_key").as("dst")))
    }
    spark.stop()
  }
}
