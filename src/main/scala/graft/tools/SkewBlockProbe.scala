package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measures the d22/d24 skew gate (VERDICT r11 item 3) on a
  * `--skew-names` [[ScaleProbe]] corpus: times the d22 pair census with
  * the triangle decomposition forced OFF (cap = MaxValue → the plain
  * single-task hot block) vs the production gate (cap = BlockCap), and
  * prints both walls plus the hot-block size so SCALE.md can record the
  * before/after. Output values are asserted identical between the two
  * paths before timings are reported.
  *
  * usage: SkewBlockProbe <custParquetDir> [reps]
  */
object SkewBlockProbe {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: SkewBlockProbe <custParquetDir> [reps]")
    val reps = if (args.length > 1) args(1).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val c = spark.read.parquet(args(0))
      .select(col("c_custkey"), col("c_name"),
        substring(col("c_name"), 1, 16).as("blk"))
      .localCheckpoint(true)
    val blocks = c.groupBy("blk").count().orderBy(desc("count")).limit(3).collect()
    println(s"[skewprobe] top blocks: ${blocks.map(r => s"${r.getString(0)}=${r.getLong(1)}").mkString(", ")}")

    def census(cap: Int): Seq[(Int, Long)] =
      graft.dedup.Dedup.blockedCandidatePairs(c, cap = cap)
        .groupBy(levenshtein(col("a_name"), col("b_name"), 2).as("dist"))
        .agg(count(lit(1)).as("n_pairs"))
        .filter(col("dist") >= 1 && col("dist") <= 2)
        .orderBy("dist")
        .collect().map(r => (r.getInt(0), r.getLong(1))).toSeq

    def time[A](body: => A): (A, Double) = {
      val t0 = System.nanoTime(); val a = body
      (a, (System.nanoTime() - t0) / 1e9)
    }
    // warm both plans once (codegen/JIT), then report medians of `reps`
    val plainOut = census(Int.MaxValue)
    val gatedOut = census(graft.dedup.Dedup.BlockCap)
    require(plainOut == gatedOut,
      s"gate changed the census: $plainOut vs $gatedOut")
    def median(xs: Seq[Double]): Double = xs.sorted.apply(xs.size / 2)
    val tPlain = median(Seq.fill(reps)(time(census(Int.MaxValue))._2))
    val tGated = median(Seq.fill(reps)(time(census(graft.dedup.Dedup.BlockCap))._2))
    println(f"[skewprobe] census identical; plain=$tPlain%.2fs gated=$tGated%.2fs (median of $reps)")
    spark.stop()
  }
}
