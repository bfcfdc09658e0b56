package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.streaming.EventStream

/** Measured scale probe for the STREAMING family (VERDICT r13 item 4):
  * st1-st11 were spec'd for correctness and kill/restart recovery but
  * never probed at volume the way the d/g/s/x families are — in
  * particular the stateful operators' state bounds (sessionization
  * state per active user, stream-stream join buffers, dedup id set)
  * had never been MEASURED above sf0.1.
  *
  *   sbt "runMain graft.tools.StreamScaleProbe <srcSfDir> <factor> [chunks]"
  *
  * Fabrication: the ScaleProbe events rule — replica i offsets
  * (event_id, user_id) by i·(max+1), timestamps untouched — so the
  * probe grows USERS at constant per-user history (the growth mode an
  * event stream actually has), keeping per-key state constant while
  * key cardinality scales F×. Every event_id % 10 == 0 row is
  * duplicated (the st7 at-least-once contract) so the dedup probe has
  * real re-deliveries to suppress.
  *
  * Drive: the fabricated stream is written as `chunks` parquet files in
  * EVENT-TIME order and replayed through the file source with
  * maxFilesPerTrigger=1 — one micro-batch per chunk, so watermarks
  * advance across the run and state EVICTION (the 100 TB claim under
  * test) actually executes; an all-in-one-batch replay would never
  * evict anything and the state numbers would be meaningless.
  *
  * Measures, per probe: batch-twin wall seconds, streaming wall
  * seconds (processAllAvailable over all chunks), and the PEAK state
  * rows / state memory from the progress feed — the boundedness
  * evidence SCALE.md records. Emits one JSON line per reading.
  */
object StreamScaleProbe {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: StreamScaleProbe <srcSfDir> <factor> [chunks]")
    val src = args(0)
    val f = args(1).toInt
    val chunks = if (args.length > 2) args(2).toInt else 24
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    // SPARK_GRAFT_SHUFFLE=n decouples state-store count from compute
    // (VERDICT r14 item 5): a stateful streaming query creates one
    // state store per shuffle partition and COMMITS each of them every
    // micro-batch — at 32 partitions × 24 chunks × 4 join stores the
    // commit count, not the event volume, is the suspected wall floor
    // (st6 read ~2 min for 110k events). Varying this knob at fixed
    // local[32] isolates batches × stores × commit-latency from data.
    // default = the right-sized store count the round-15 sweep landed on
    // (EventStream.defaultStateStores), NOT core count: the probe now
    // practices the sizing rule it taught; pass SPARK_GRAFT_SHUFFLE=32
    // to reproduce the old stores-=-cores readings
    val shuffle = sys.env.getOrElse("SPARK_GRAFT_SHUFFLE",
      graft.streaming.EventStream.defaultStateStores.toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", shuffle)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // ---- fabricate the F× event stream (ScaleProbe events rule + dups)
    val ev0 = graft.sources.Tables.events(spark, src)
    val maxEvent = ev0.agg(max("event_id")).head().getLong(0) + 1
    val maxUser = ev0.agg(max("user_id")).head().getLong(0) + 1
    val reps = spark.range(f).toDF("rep")
    val scaled = ev0.crossJoin(reps)
      .select((col("event_id") + col("rep") * maxEvent).as("event_id"),
        (col("user_id") + col("rep") * maxUser).as("user_id"),
        col("ts"), col("event_type"))
    val withDups = scaled.union(scaled.filter(col("event_id") % 10 === 0))
      .localCheckpoint(true)
    val n = withDups.count()
    System.err.println(s"[probe] factor=$f events=$n (incl. re-deliveries)")

    val dir = s"/tmp/graft_stream_probe_${f}x"
    val streamDir = s"$dir/stream"
    def rmRf(x: java.io.File): Unit = {
      if (x.isDirectory) Option(x.listFiles()).foreach(_.foreach(rmRf))
      x.delete(); ()
    }
    rmRf(new java.io.File(dir))
    // event-time-ordered chunk files, written sequentially so the file
    // source's modification-time ordering replays them in stream order.
    // Chunks come from RANGE partitioning on (ts, event_id), not a
    // partitionBy-less ntile window — the global window sorts the whole
    // F×-scaled set in ONE task, an OOM/latency hazard at exactly the
    // factors this probe exists to test (ADVICE r14). Range partitions
    // are ordered, so spark_partition_id IS the event-time chunk index;
    // boundary sampling makes sizes approximate, which the replay
    // doesn't care about.
    val chunked = withDups
      .repartitionByRange(chunks, col("ts"), col("event_id"))
      .withColumn("chunk", spark_partition_id() + 1).localCheckpoint(true)
    new java.io.File(streamDir).mkdirs()
    for (i <- 1 to chunks) {
      chunked.filter(col("chunk") === i).drop("chunk")
        .coalesce(1).write.mode("append").parquet(streamDir)
      Thread.sleep(5) // distinct mtimes → deterministic replay order
    }
    val batchDf = spark.read.parquet(streamDir).localCheckpoint(true)

    def line(probe: String, mode: String, sec: Double,
             stateRows: Long = -1, stateMb: Double = -1): Unit =
      println(f"""{"probe":"$probe","mode":"$mode","factor":$f,"sec":$sec%.3f,"state_rows_peak":$stateRows,"state_mb_peak":$stateMb%.1f,"events":$n,"shuffle":$shuffle,"chunks":$chunks}""")

    def timed[T](body: => T): (T, Double) = {
      val t0 = System.nanoTime()
      val r = body
      (r, (System.nanoTime() - t0) / 1e9)
    }

    // ---- batch twins (st3 sessions, st6 attribution, st7 dedup, st10 outer)
    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    val (_, bSess) = timed(noop(EventStream.sessionize(batchDf, 1800)))
    line("st3_sessions", "batch", bSess)
    val (_, bAttr) = timed(noop(EventStream.attribution(batchDf)))
    line("st6_attribution", "batch", bAttr)
    val (_, bDedup) = timed(noop(
      batchDf.dropDuplicates("event_id")
        .groupBy("event_type")
        .agg(count(lit(1)).as("n_events"),
          count_distinct(col("user_id")).as("n_users"))))
    line("st7_stream_dedup", "batch", bDedup)
    val (_, bOuter) = timed(noop(EventStream.attributionOuter(batchDf)))
    line("st10_attribution_outer", "batch", bOuter)

    // ---- streaming forms over the chunked replay
    val schema = batchDf.schema
    def source(): DataFrame = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(streamDir)

    def runStream(probe: String)(build: DataFrame => DataFrame): Unit = {
      val ckpt = s"$dir/ckpt_$probe"
      val q = build(source()).writeStream
        .format("noop")
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.ProcessingTime(0))
        .start()
      val (_, sec) = timed { q.processAllAvailable(); q.stop() }
      val progress = q.recentProgress
      val rows = progress.flatMap(_.stateOperators.map(_.numRowsTotal))
        .foldLeft(0L)(math.max)
      val mem = progress
        .map(_.stateOperators.map(_.memoryUsedBytes).sum)
        .foldLeft(0L)(math.max) / 1e6
      line(probe, "stream", sec, rows, mem)
    }

    runStream("st3_sessions") { s =>
      import spark.implicits._
      EventStream.sessionizeStreamFlush(
        s.select(col("user_id"), col("ts")).withWatermark("ts", "1 second")
          .as[(Long, java.sql.Timestamp)], 1800).toDF()
    }
    runStream("st6_attribution") { s =>
      EventStream.attributionStream(
        s.filter(col("event_type") === "view")
          .select(col("user_id").as("view_user"), col("ts").as("view_ts")),
        s.filter(col("event_type") === "click")
          .select(col("user_id").as("click_user"), col("ts").as("click_ts")))
    }
    // append-mode sink → no post-dedup aggregate (a non-windowed agg
    // can't emit in append); the probe target is the dedup id-set state
    runStream("st7_stream_dedup")(s => EventStream.dedupStream(s))
    runStream("st10_attribution_outer") { s =>
      EventStream.attributionOuterStream(
        s.filter(col("event_type") === "view")
          .select(col("user_id").as("view_user"), col("ts").as("view_ts")),
        s.filter(col("event_type") === "click")
          .select(col("user_id").as("click_user"), col("ts").as("click_ts")))
    }

    spark.stop()
  }
}
