package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Measured probe for x30/x32 BPE training at REALISTIC merge counts
  * (VERDICT r13 item 5 + r14 item 4): the registered query trains 10
  * merges — a demo-scale vocab — while a real tokenizer trains
  * 10⁴-10⁵. Each sequential merge round is one driver-coordinated pass
  * over the Heaps-bounded vocab, so the open question is whether the
  * per-round driver latency (job scheduling + the 1-row emptiness
  * probe) or the vocab-sized work dominates as rounds grow — and, once
  * driver latency is established as the floor, how much of it the
  * BATCHED symbol-disjoint trainer buys back per merge.
  *
  *   sbt "runMain graft.tools.BpeMergeProbe <sfDir|fab:N> <rounds> [rounds2 ...]"
  *   SPARK_GRAFT_BPE_BATCH=B   # optional: probe bpeMergesBatched with
  *                             # batchSize=B, candCap=4B; <rounds> are
  *                             # then BATCH counts, not merge counts
  *
  * `fab:N` fabricates an N-word Zipf vocabulary instead of reading a
  * corpus: the registered corpora cap out at a 31-word vocab that
  * EXHAUSTS after 89 merges (SCALE.md round-14), so realistic merge
  * counts are unreachable on real test data by construction. Words are
  * 2-6 syllables drawn deterministically from a 25-syllable inventory
  * (shared substructure → meaningful high-count pairs deep into
  * training), frequency ~ N/rank (Zipf). The fabrication feeds
  * bpeMergesFromWordCounts directly — the corpus-sized tokenize+count
  * stage is a separately-measured one-pass aggregation, and
  * materializing a giant synthetic corpus only to re-count it would
  * measure the fabrication, not the trainer.
  *
  * Emits one JSON line per requested round count: total wall seconds,
  * merges actually performed (early-exhaustion-aware), and
  * seconds-per-merge — the number that decides whether batched merge
  * selection is pulling its weight. */
object BpeMergeProbe {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: BpeMergeProbe <sfDir|fab:N> <rounds> [rounds2 ...]")
    val src = args(0)
    val roundCounts = args.drop(1).map(_.toInt).toSeq
    val batchSize = sys.env.get("SPARK_GRAFT_BPE_BATCH").flatMap(_.toIntOption)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val wc: DataFrame = (if (src.startsWith("fab:"))
      fabVocab(spark, src.stripPrefix("fab:").toLong)
    else {
      import org.apache.spark.sql.functions._
      graft.sources.Tables.documents(spark, src)
        .select(explode(graft.text.Tokenize.rawTokens(col("text"))).as("word"))
        .groupBy("word").agg(count(lit(1)).as("freq"))
    }).localCheckpoint(true)
    System.err.println(s"[probe] vocab words=${wc.count()}")
    for (r <- roundCounts) {
      val t0 = System.nanoTime()
      val (probe, done) = batchSize match {
        case Some(b) =>
          val rules = graft.text.TextStats.bpeMergesBatchedFromWordCounts(
            wc, batches = r, batchSize = b, candCap = 4 * b)
          ("x32_bpe_batch", rules.count())
        case None =>
          ("x30_bpe_train",
            graft.text.TextStats.bpeMergesFromWordCounts(wc, rounds = r).count())
      }
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"""{"probe":"$probe","rounds":$r,"batch_size":${batchSize.getOrElse(0)},"merges_done":$done,"sec":$sec%.2f,"sec_per_merge":${sec / math.max(1, done)}%.3f,"sf":"$src"}""")
    }
    spark.stop()
  }

  /** Deterministic N-word Zipf vocabulary (see object doc). */
  private def fabVocab(spark: SparkSession, n: Long): DataFrame = {
    val sylls = Seq("ba", "be", "bi", "bo", "bu", "ka", "ke", "ki", "ko",
      "ku", "ma", "me", "mi", "mo", "mu", "ra", "re", "ri", "ro", "ru",
      "sa", "se", "si", "so", "ta")
    require(sylls.size == 25)
    val arr = sylls.map(s => s"'$s'").mkString("array(", ",", ")")
    spark.range(n).toDF("id").selectExpr(
      s"""array_join(transform(sequence(0, 1 + cast(id % 5 as int)),
         |  k -> element_at($arr, cast((id div cast(pow(25, k) as bigint)) % 25 as int) + 1)), '') as word""".stripMargin,
      s"greatest(1L, $n div (id + 1)) as freq")
      .groupBy("word").agg(org.apache.spark.sql.functions.sum("freq").as("freq"))
  }
}
