package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      // some SF dirs store events.ts as TIMESTAMP(NANOS); see Tables.events
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // untimed warmup of EVERY query on the tiny SF: absorbs one-time
    // JIT/whole-stage-codegen cost (several seconds for the plans with
    // custom kernels) so timed numbers reflect steady state, not who ran
    // first. The subplan memo keys on the sf-dir, so the timed pass below
    // still pays its own shared builds at full scale — only compilation
    // is absorbed, never work.
    // dev-only subset filter (comma-separated query names), mirroring
    // Verify's — the driver never sets it, so the gate benches everything
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(',').map(_.trim).toSet)
    def selected(name: String) = only.forall(_.contains(name))
    val warmDir = sys.env.getOrElse("SPARK_GRAFT_WARMUP_DIR", "/root/testdata/sf0.001")
    if (warmDir != sfDir && new java.io.File(warmDir).isDirectory) {
      SparkEntry.queries.filter(kv => selected(kv._1)).foreach { case (_, fn) =>
        try fn(spark, warmDir).write.format("noop").mode("overwrite").save()
        catch { case _: Throwable => () }
      }
      // Drop ALL warmup-phase state before timing: the warm-dir memo
      // entries (keyed by sf-dir) are never reused at the target SF, but
      // their eagerly-checkpointed blocks would sit in the BlockManager
      // under the whole timed pass — measured cost: the mid-pass queries
      // (the CV grid especially) degraded several× under that resident
      // state. The timed pass still pays every shared build at the
      // target SF; it just starts from a clean block store.
      graft.plans.Materialized.clear()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
    }
    // SPARK_GRAFT_REPS=k (dev-only; driver never sets it → k=1, timing
    // unchanged): run each query k times and report the per-query MEDIAN.
    // Host noise on this sandbox moves single readings by several seconds
    // (NOTES.md) — medians make the per-query detail trustworthy without
    // touching the driver-facing line's semantics.
    val reps = sys.env.get("SPARK_GRAFT_REPS").flatMap(_.toIntOption)
      .filter(_ >= 1).getOrElse(1)
    val results = SparkEntry.queries.filter(kv => selected(kv._1)).map { case (name, fn) =>
      val times = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        // noop sink: materializes every output column (a bare count() would
        // let Catalyst prune unreferenced expressions and undercount work)
        val ok =
          try { fn(spark, sfDir).write.format("noop").mode("overwrite").save(); true }
          catch { case e: Throwable =>
            System.err.println(s"[bench] $name FAILED: ${e.getMessage}"); false
          }
        val sec = (System.nanoTime() - t0) / 1e9
        // failed queries report negative elapsed so they can never be
        // mistaken for a fast pass in bench totals
        if (ok) sec else -sec
      }
      val median = times.map(math.abs).sorted.apply(reps / 2)
      name -> (if (times.exists(_ < 0)) -median else median)
    }
    val failed = results.count(_._2 < 0)
    val total = results.values.map(math.abs).sum
    def fmt(v: Double) = f"$v%.3f"
    // FULL per-query detail to stderr (and a file) for BASELINE.md
    // bookkeeping — NOT the driver-facing line.
    val qsFull = results.map { case (k, v) => "\"" + k + "\":" + fmt(v) }
      .mkString("{", ",", "}")
    val fullJson =
      s"""{"metric":"total","value":${fmt(total)},"unit":"sec","reps":$reps,"queries":$qsFull,"failed":$failed,"sf":"$sfDir"}"""
    System.err.println(fullJson)
    try java.nio.file.Files.writeString(
      java.nio.file.Paths.get("/tmp/graft_bench_full.json"), fullJson + "\n")
    catch { case _: Throwable => () }
    // Driver-facing line LAST on stdout, and compact: the driver keeps
    // only a ~1 KiB tail of the output, so a 168-entry queries map gets
    // its head truncated and fails to parse (BENCH_r4/r5 "parsed: null").
    // The spec asks for HEADLINE queries — one representative per family.
    val headline = Seq("q1_agg", "q3_join_agg", "q10_window", "t2_tfidf_multi",
      "d2_minhash_sig", "d3_lsh_near_dups", "s1_knn_brute", "s2_ann_lsh",
      "g2_pagerank", "st3_sessions", "x2_lang_id", "m1_confusion")
    val qs = headline.flatMap(k => results.get(k).map(v => "\"" + k + "\":" + fmt(v)))
      .mkString("{", ",", "}")
    spark.stop() // stop BEFORE printing so no shutdown logs trail the JSON
    println(s"""{"metric":"total","value":${fmt(total)},"unit":"sec","queries":$qs,"failed":$failed,"sf":"$sfDir","n_queries":${results.size}}""")
    System.out.flush()
  }
}
