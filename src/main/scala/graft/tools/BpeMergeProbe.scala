package graft.tools

import org.apache.spark.sql.SparkSession

/** Measured probe for x30 BPE training at REALISTIC merge counts
  * (VERDICT r13 item 5): the registered query trains 10 merges — a
  * demo-scale vocab — while a real tokenizer trains 10⁴-10⁵. Each
  * merge round is one driver-coordinated pass over the Heaps-bounded
  * vocab, so the open question is whether the per-round driver latency
  * (job scheduling + the 1-row emptiness probe) or the vocab-sized
  * work dominates as rounds grow.
  *
  *   sbt "runMain graft.tools.BpeMergeProbe <sfDir> <rounds> [rounds2 ...]"
  *
  * Emits one JSON line per requested round count: total wall seconds,
  * merges actually performed (early-exhaustion-aware), and
  * seconds-per-merge — the number that decides whether batched merge
  * selection (top-B non-interacting merges per round) is needed. */
object BpeMergeProbe {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: BpeMergeProbe <sfDir> <rounds> [rounds2 ...]")
    val dir = args(0)
    val roundCounts = args.drop(1).map(_.toInt).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = graft.sources.Tables.documents(spark, dir).localCheckpoint(true)
    for (r <- roundCounts) {
      val t0 = System.nanoTime()
      val merges = graft.text.TextStats.bpeMerges(docs, rounds = r)
      val done = merges.count()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"""{"probe":"x30_bpe_train","rounds":$r,"merges_done":$done,"sec":$sec%.2f,"sec_per_merge":${sec / math.max(1, done)}%.3f,"sf":"$dir"}""")
    }
    spark.stop()
  }
}
