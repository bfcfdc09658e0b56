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
    val results = SparkEntry.queries.filter(kv => selected(kv._1)).map { case (name, fn) =>
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
      name -> (if (ok) sec else -sec)
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val failed = results.count(_._2 < 0)
    val total = results.values.map(math.abs).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"failed":$failed,"sf":"$sfDir"}""")
    spark.stop()
  }
}
