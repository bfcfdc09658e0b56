package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.SparkSpec

/** Streaming tests: MemoryStream → processAllAvailable → assert sink
  * (deterministic, no sleeps — SURVEY.md §5.5). */
class EventStreamSpec extends SparkSpec {
  import spark.implicits._

  private def ts(hour: Int): Timestamp = Timestamp.valueOf(f"2024-01-01 $hour%02d:00:00")

  test("streaming tumbling counts equal the batch twin (complete mode)") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Timestamp, Double)]
    val data = Seq((ts(0), 1.0), (ts(0), 7.0), (ts(1), 20.0), (ts(1), 2.0))
    in.addData(data: _*)
    val sdf = in.toDF().toDF("ts", "value")
    val q = EventStream.tumblingCounts(sdf)
      .writeStream.format("memory").queryName("tumble_test")
      .outputMode("complete").start()
    try q.processAllAvailable() finally q.stop()
    val streamed = spark.table("tumble_test")
      .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2))).toSet
    val batch = EventStream.tumblingCounts(data.toDF("ts", "value"))
      .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2))).toSet
    assert(streamed == batch)
    assert(batch == Set((ts(0), "NEG", 1L), (ts(0), "NEUTRAL", 1L),
      (ts(1), "POS", 1L), (ts(1), "NEG", 1L)))
  }

  test("st11 streaming histogram equals the batch twin; quantile read-off hand-checked") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Timestamp, Double)]
    // hour 0: cents 100..1000 (10 values) → p50 is the bucket of 500,
    // p90 the bucket of 900; hour 1: a single value
    val data = (1 to 10).map(i => (ts(0), i * 1.0)) :+ ((ts(1), 42.0))
    in.addData(data: _*)
    val q = EventStream.hourlyQuantileHist(in.toDF().toDF("ts", "value"))
      .writeStream.format("memory").queryName("hq_hist")
      .outputMode("complete").start()
    try q.processAllAvailable() finally q.stop()
    val streamedHist = spark.table("hq_hist")
    val batchHist = EventStream.hourlyQuantileHist(data.toDF("ts", "value"))
    assert(streamedHist.collect().map(_.toSeq).toSet ==
      batchHist.collect().map(_.toSeq).toSet, "streamed histogram diverged")
    // the shared read-off over the STREAMED state matches the batch query
    val got = EventStream.quantilesFromHist(streamedHist)
      .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2), r.getLong(3)))
    val batch = EventStream.quantilesFromHist(batchHist)
      .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq == batch.toSeq)
    val h0 = got.filter(_._1 == ts(0)).map(t => t._2 -> t._3).toMap
    // m=5: cents ≤ 2^6 region keeps exact small buckets; 500 → e=8,
    // sh=3 → lb=496; 900 → e=9, sh=4 → lb=896
    assert(h0 == Map("0.50" -> 496L, "0.90" -> 896L), h0.toString)
    // 4200 cents: e=12, sh=7 → lb = (4200 >> 7) << 7 = 4096
    val h1 = got.filter(_._1 == ts(1)).map(t => t._2 -> t._3).toMap
    assert(h1 == Map("0.50" -> 4096L, "0.90" -> 4096L), h1.toString)
  }

  test("qualityGateStream: per-rule tally equals the batch funnel across batches") {
    implicit val sqlCtx = spark.sqlContext
    // real sf0.001 documents split across two micro-batches — the
    // stateless labeling must not care where the batch boundary falls
    val docs = graft.sources.Tables.documents(spark, sf("sf0.001"))
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    val (b1, b2) = docs.splitAt(docs.length / 2)
    val in = MemoryStream[(Long, String)]
    val sdf = in.toDF().toDF("doc_id", "text")
    val q = EventStream.qualityGateStream(sdf)
      .writeStream.format("memory").queryName("quality_gate_test")
      .outputMode("complete").start()
    try {
      in.addData(b1: _*); q.processAllAvailable()
      in.addData(b2: _*); q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.table("quality_gate_test")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    val batch = graft.text.TextStats.filterFunnel(
      graft.sources.Tables.documents(spark, sf("sf0.001")))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(streamed == batch, s"stream $streamed vs batch $batch")
    assert(streamed.map(_._2).sum == docs.length.toLong)
  }

  test("stream-static enrichment join matches the batch twin, drops unmatched") {
    implicit val sqlCtx = spark.sqlContext
    val customer = Seq((1L, "AUTO"), (2L, "BIKE")).toDF("c_custkey", "c_mktsegment")
    val data = Seq((1L, 2.0), (2L, 3.0), (1L, 4.0), (5L, 9.0)) // 5 has no dim row
    val in = MemoryStream[(Long, Double)]
    in.addData(data: _*)
    val q = EventStream.enrichStream(in.toDF().toDF("user_id", "value"), customer)
      .writeStream.format("memory").queryName("enrich_test")
      .outputMode("append").start()
    try q.processAllAvailable() finally q.stop()
    val streamed = spark.table("enrich_test")
      .select("user_id", "value", "segment")
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getString(2))).toSet
    val batch = EventStream.enrichStream(data.toDF("user_id", "value"), customer)
      .select("user_id", "value", "segment")
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getString(2))).toSet
    assert(streamed == batch)
    assert(batch == Set((1L, 2.0, "AUTO"), (1L, 4.0, "AUTO"), (2L, 3.0, "BIKE")))
  }

  test("foreachBatch parquet sink: no driver collect, rows land in files") {
    implicit val sqlCtx = spark.sqlContext
    val out = java.nio.file.Files.createTempDirectory("graft_sink").toString
    val in = MemoryStream[(Timestamp, Double)]
    in.addData((ts(0), 1.0), (ts(1), 9.0), (ts(2), 30.0))
    val q = EventStream.foreachBatchSink(
      EventStream.withSentiment(in.toDF().toDF("ts", "value")),
      out, Trigger.ProcessingTime(0))
    try q.processAllAvailable() finally q.stop()
    val got = spark.read.parquet(out).select("sentiment")
      .collect().map(_.getString(0)).sorted
    assert(got.toSeq == Seq("NEG", "NEUTRAL", "POS"))
  }

  test("transitionsStream: multi-batch split yields the batch twin's multiset") {
    implicit val sqlCtx = spark.sqlContext
    val us = (h: Int) => ts(h).getTime * 1000L
    val in = MemoryStream[(Long, Long, Long, String)] // (user, us, event_id, type)
    val q = EventStream.transitionsStream(in.toDS())
      .writeStream.format("memory").queryName("trans_test")
      .outputMode("append").start()
    try {
      // user 1: view→click in batch 1; the click→purchase edge SPANS the
      // batch boundary — only the persisted last-event state can emit it
      in.addData((1L, us(0), 1L, "view"), (1L, us(1), 2L, "click"),
        (2L, us(0), 3L, "view"))
      q.processAllAvailable()
      in.addData((1L, us(2), 4L, "purchase"), (2L, us(3), 5L, "view"))
      q.processAllAvailable()
      val got = spark.table("trans_test").as[EventStream.TransOut].collect()
        .map(t => (t.user_id, t.from_type, t.to_type)).sorted
      assert(got.toSeq == Seq(
        (1L, "click", "purchase"), (1L, "view", "click"), (2L, "view", "view")))
      // simultaneous events order by event_id — same rule as the batch window
      in.addData((3L, us(5), 7L, "b"), (3L, us(5), 6L, "a"))
      q.processAllAvailable()
      val u3 = spark.table("trans_test").as[EventStream.TransOut].collect()
        .filter(_.user_id == 3L).map(t => (t.from_type, t.to_type))
      assert(u3.toSeq == Seq(("a", "b")))
    } finally q.stop()
  }

  test("forwardFillStream carries purchase values across batch boundaries") {
    implicit val sqlCtx = spark.sqlContext
    val us = (h: Int) => ts(h).getTime * 1000L
    val in = MemoryStream[(Long, Long, Long, String, Double)] // (user, us, eid, type, value)
    val dropped = spark.sparkContext.longAccumulator("graft_fill_dropped")
    val q = EventStream.forwardFillStream(in.toDS(), Some(dropped))
      .writeStream.format("memory").queryName("fill_test")
      .outputMode("append").start()
    try {
      in.addData((1L, us(0), 1L, "view", 5.0), (1L, us(1), 2L, "purchase", 7.5),
        (2L, us(0), 3L, "view", 1.0))
      q.processAllAvailable()
      // batch 2: user 1's fill value must come from persisted state
      in.addData((1L, us(2), 4L, "click", 9.9), (2L, us(3), 5L, "purchase", 3.25),
        (2L, us(4), 6L, "view", 0.0))
      q.processAllAvailable()
      val got = spark.table("fill_test").as[EventStream.FillOut].collect()
        .map(f => (f.user_id, f.event_id, f.filled)).sorted
      assert(got.toSeq == Seq(
        (1L, 1L, -1.0), // before any purchase → sentinel
        (1L, 2L, 7.5), (1L, 4L, 7.5), // carried across the batch boundary
        (2L, 3L, -1.0), (2L, 5L, 3.25), (2L, 6L, 3.25)))
      // matches the batch twin's semantics replayed driver-side
      val batchTwin = got.toSeq.map(_._3)
      assert(batchTwin == Seq(-1.0, 7.5, 7.5, -1.0, 3.25, 3.25))
      // a LATE row (event time before user 1's last emitted us(2)) is
      // dropped, not mis-filled from newer state (ADVICE r7)
      in.addData((1L, us(1) + 1L, 7L, "view", 4.0))
      q.processAllAvailable()
      val after = spark.table("fill_test").as[EventStream.FillOut].collect()
      assert(!after.exists(_.event_id == 7L), "late row must be dropped")
      assert(after.length == got.length)
      // the drop is visible, not silent: the counter saw exactly the
      // late row (VERDICT r9 #4)
      assert(dropped.value == 1L, s"dropped counter = ${dropped.value}, want 1")
    } finally q.stop()
  }

  test("forwardFillStream: killed and restarted from checkpoint — fill state survives") {
    // recovery parity for the LAST stateful sink family without a
    // kill/restart twin (VERDICT r12 item 7; mergeSink and trendingSink
    // already have theirs): the flatMapGroupsWithState fill state must
    // come back from the checkpoint, so a post-restart row fills from a
    // PRE-KILL purchase — state the restarted JVM never observed as data.
    implicit val sqlCtx = spark.sqlContext
    val us = (h: Int) => ts(h).getTime * 1000L
    val root = java.nio.file.Files.createTempDirectory("graft_fill_ckpt").toString
    val out = root + "/out"
    val ckpt = root + "/checkpoint"
    val in = MemoryStream[(Long, Long, Long, String, Double)]
    def start() = EventStream.forwardFillStream(in.toDS())
      .writeStream.format("parquet").option("path", out)
      .option("checkpointLocation", ckpt).outputMode("append").start()
    val q1 = start()
    try {
      in.addData((1L, us(0), 1L, "view", 5.0), (1L, us(1), 2L, "purchase", 7.5))
      q1.processAllAvailable()
    } finally q1.stop() // killed with user 1's fill value only in state
    // arrives while the query is down; must fill from RECOVERED state
    in.addData((1L, us(2), 3L, "click", 9.9), (2L, us(2), 4L, "view", 1.0))
    val q2 = start()
    try { q2.processAllAvailable() } finally q2.stop()
    val got = spark.read.parquet(out).as[EventStream.FillOut].collect()
      .map(f => (f.user_id, f.event_id, f.filled)).sorted.toSeq
    assert(got == Seq(
      (1L, 1L, -1.0),          // pre-kill: before any purchase
      (1L, 2L, 7.5),           // pre-kill: the purchase itself
      (1L, 3L, 7.5),           // POST-RESTART: filled from recovered state
      (2L, 4L, -1.0)),         // post-restart new user: sentinel, no bleed
      s"recovered fill stream wrong: $got")
    // exactly-once across the restart: no event id appears twice
    val ids = got.map(_._2)
    assert(ids.distinct.length == ids.length, s"duplicate emissions: $ids")
  }

  test("fillFunnel: late-data loss is a queryable dropped_late row (VERDICT r10 task 6)") {
    implicit val sqlCtx = spark.sqlContext
    val us = (h: Int) => ts(h).getTime * 1000L
    val in = MemoryStream[(Long, Long, Long, String, Double)]
    val dropped = spark.sparkContext.longAccumulator("graft_fill_funnel_dropped")
    val audited = EventStream.forwardFillAudited(in.toDS(), Some(dropped))
    val q = EventStream.fillFunnel(audited)
      .writeStream.format("memory").queryName("fill_funnel_test")
      .outputMode("complete").start()
    try {
      in.addData((1L, us(0), 1L, "view", 5.0), (1L, us(2), 2L, "purchase", 7.5))
      q.processAllAvailable()
      // two late rows for user 1 (before the last emitted us(2)), one
      // in-order row — the funnel must tally them as dropped_late
      in.addData((1L, us(1), 3L, "view", 4.0), (1L, us(1) + 1, 4L, "view", 2.0),
        (1L, us(3), 5L, "click", 1.0))
      q.processAllAvailable()
      val funnel = spark.table("fill_funnel_test")
        .collect().map(r => (r.getString(0), r.getLong(1))).toMap
      assert(funnel == Map("filled" -> 3L, "dropped_late" -> 2L), s"funnel $funnel")
      // the exact queryable ledger agrees with the monitoring counter
      assert(dropped.value == funnel("dropped_late"))
    } finally q.stop()
  }

  test("forwardFillAudited: filled slice IS forwardFillStream; dropped rows keep raw values") {
    implicit val sqlCtx = spark.sqlContext
    val us = (h: Int) => ts(h).getTime * 1000L
    val in = MemoryStream[(Long, Long, Long, String, Double)]
    val q = EventStream.forwardFillAudited(in.toDS())
      .writeStream.format("memory").queryName("fill_audit_test")
      .outputMode("append").start()
    try {
      in.addData((1L, us(2), 1L, "purchase", 7.5))
      q.processAllAvailable()
      in.addData((1L, us(0), 2L, "view", 4.25), (1L, us(3), 3L, "view", 0.0))
      q.processAllAvailable()
      val got = spark.table("fill_audit_test").as[EventStream.FillAudit].collect()
        .map(a => (a.event_id, a.filled, a.fate)).sortBy(_._1)
      assert(got.toSeq == Seq(
        (1L, 7.5, "filled"),
        (2L, 4.25, "dropped_late"), // its OWN raw value — never a fill
        (3L, 7.5, "filled")))
    } finally q.stop()
  }

  test("hllWindowsStream: register state merges across batches, matches batch twin") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val in = MemoryStream[(String, Long)] // (day, user_id)
    val q = EventStream.hllWindowsStream(in.toDS())
      .writeStream.format("memory").queryName("hll_stream_test")
      .outputMode("update").start()
    val data = Seq(
      ("2024-01-01", 1L), ("2024-01-01", 2L), ("2024-01-02", 5L), // batch 1
      ("2024-01-01", 2L), ("2024-01-01", 3L), ("2024-01-02", 6L)) // batch 2 (dup user 2)
    try {
      in.addData(data.take(3))
      q.processAllAvailable()
      in.addData(data.drop(3))
      q.processAllAvailable()
      // pick each day's LATEST estimate by the state-update counter —
      // memory-sink row order is not a contract (ADVICE r7)
      val streamed = spark.table("hll_stream_test").as[EventStream.HllOut]
        .collect().groupBy(_.day).map { case (d, xs) => d -> xs.maxBy(_.ver) }
      // batch twin over the same multiset
      val ev = data.toDF("d", "user_id")
        .select(to_timestamp(col("d")).as("ts"), col("user_id"))
      val batch = graft.operators.Sketch.hllWindows(ev).collect()
        .map(r => r.getDate(0).toString ->
          (r.getLong(2), r.getDecimal(3).doubleValue)).toMap
      assert(streamed.keySet == batch.keySet)
      streamed.foreach { case (day, out) =>
        val (nEmpty, est) = batch(day)
        assert(out.n_empty == nEmpty, s"$day register tables diverge")
        assert(out.hll_est == est, s"$day estimate ${out.hll_est} != batch $est")
      }
    } finally q.stop()
  }

  test("sessionizeStream closes sessions at gap breaks, matches batch") {
    implicit val sqlCtx = spark.sqlContext
    val us = (h: Int) => ts(h).getTime * 1000L
    val in = MemoryStream[(Long, Long)] // (user_id, ts_us)
    val q = EventStream.sessionizeStream(in.toDS(), gapSec = 8 * 3600)
      .writeStream.format("memory").queryName("sess_test")
      .outputMode("append").start()
    try {
      in.addData((1L, us(0)), (1L, us(1)))
      q.processAllAvailable()
      assert(spark.table("sess_test").count() == 0) // session still open
      in.addData((1L, us(20)), (1L, us(21)))        // > 8h gap → closes s1
      q.processAllAvailable()
      val s1 = spark.table("sess_test").as[EventStream.SessionOut].collect()
      assert(s1.toSeq == Seq(EventStream.SessionOut(1L, 1L, 2L, ts(0), ts(1))))
      in.addData((1L, us(48)))                      // closes s2
      q.processAllAvailable()
      val all = spark.table("sess_test").as[EventStream.SessionOut].collect()
      assert(all.map(_.session_id).sorted.toSeq == Seq(1L, 2L))
      assert(all.find(_.session_id == 2L).get.n_events == 2L)
    } finally q.stop()

    // batch twin on the same data agrees on closed-session boundaries
    val batch = EventStream.sessionize(
      Seq((1L, ts(0), 1L), (2L, ts(1), 1L), (3L, ts(20), 1L), (4L, ts(21), 1L), (5L, ts(48), 1L))
        .toDF("event_id", "ts", "user_id"), gapSec = 8 * 3600)
      .orderBy("session_id").collect()
      .map(r => (r.getLong(1), r.getLong(2)))
    assert(batch.toSeq == Seq((1L, 2L), (2L, 2L), (3L, 1L)))
  }

  test("sessionizeStreamFlush emits open sessions when the watermark passes the gap") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Long, Timestamp)] // (user_id, ts); _2 is event time
    val q = EventStream.sessionizeStreamFlush(
      in.toDS().withWatermark("_2", "0 seconds"), gapSec = 8 * 3600)
      .writeStream.format("memory").queryName("flush_test")
      .outputMode("append").start()
    try {
      in.addData((1L, ts(0)), (1L, ts(1)))
      q.processAllAvailable()                 // watermark → h1; deadline h9
      assert(spark.table("flush_test").count() == 0)
      in.addData((2L, ts(20)))
      q.processAllAvailable()                 // watermark → h20 (> h9)
      in.addData((2L, ts(21)))
      q.processAllAvailable()                 // next batch fires user 1 timeout
      val flushed = spark.table("flush_test").as[EventStream.SessionOut].collect()
      assert(flushed.toSeq == Seq(EventStream.SessionOut(1L, 1L, 2L, ts(0), ts(1))))
      // post-flush straggler: new session, does NOT reuse emitted session_id 1
      in.addData((1L, ts(22)))
      q.processAllAvailable()
      in.addData((1L, ts(40)))                // > 8h after h22 → closes idx 2
      q.processAllAvailable()
      val sess = spark.table("flush_test").as[EventStream.SessionOut].collect()
        .filter(_.user_id == 1L).sortBy(_.session_id)
      assert(sess.map(_.session_id).toSeq == Seq(1L, 2L))
      assert(sess(1) == EventStream.SessionOut(1L, 2L, 1L, ts(22), ts(22)))
    } finally q.stop()
  }

  test("sessionizeStreamFlush keeps micro precision at the gap boundary") {
    implicit val sqlCtx = spark.sqlContext
    def us(base: Int, micros: Int): Timestamp = {
      val t = Timestamp.valueOf(f"2024-01-01 $base%02d:00:00")
      t.setNanos(micros * 1000); t
    }
    val in = MemoryStream[(Long, Timestamp)]
    // second event exactly gap + 1µs after the first: must START A NEW
    // session (ms truncation would see exactly gap and merge them)
    val q = EventStream.sessionizeStreamFlush(
      in.toDS().withWatermark("_2", "0 seconds"), gapSec = 8 * 3600)
      .writeStream.format("memory").queryName("flush_us_test")
      .outputMode("append").start()
    try {
      in.addData((1L, us(0, 0)), (1L, us(8, 1)))
      q.processAllAvailable()
      val sess = spark.table("flush_us_test").as[EventStream.SessionOut].collect()
      assert(sess.length == 1, s"gap+1us did not close the first session: ${sess.toSeq}")
      assert(sess.head.n_events == 1L && sess.head.s_start == us(0, 0))
    } finally q.stop()
  }

  test("scoredSink: fitted model applied per micro-batch, no driver collect") {
    implicit val sqlCtx = spark.sqlContext
    // tiny separable model: lang from text
    val train = Seq((0L, "aaa bbb ccc", "en"), (1L, "xxx yyy zzz", "de"),
      (2L, "aaa bbb", "en"), (3L, "yyy zzz", "de")).toDF("doc_id", "text", "lang")
    val model = graft.ml.Classify.pipeline(numFeatures = 64, maxIter = 10).fit(train)
    val out = java.nio.file.Files.createTempDirectory("graft_scored").toString
    val in = MemoryStream[(Long, String, String)]
    in.addData((10L, "aaa ccc", "en"), (11L, "xxx zzz", "de"))
    val q = EventStream.scoredSink(
      in.toDF().toDF("doc_id", "text", "lang"), model, out,
      org.apache.spark.sql.streaming.Trigger.ProcessingTime(0))
    try q.processAllAvailable() finally q.stop()
    val scored = spark.read.parquet(out).select("doc_id", "prediction").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(scored.keySet == Set(10L, 11L))
    assert(scored(10L) != scored(11L)) // separable vocab -> distinct classes
  }

  test("hourlyUsersStream: closed windows match the batch twin") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Timestamp, Long)] // (ts, user_id)
    val q = EventStream.hourlyUsersStream(in.toDF().toDF("ts", "user_id"))
      .writeStream.format("memory").queryName("dau_test")
      .outputMode("append").start()
    try {
      // h0: users 1,1,2 (dup within window); h1: user 1
      in.addData((ts(0), 1L), (ts(0), 1L), (ts(0), 2L), (ts(1), 1L))
      q.processAllAvailable()
      in.addData((ts(5), 9L)) // advances watermark past h0/h1 windows
      q.processAllAvailable()
      in.addData((ts(6), 9L)) // one more batch so closed windows emit
      q.processAllAvailable()
      val streamed = spark.table("dau_test")
        .collect().map(r => (r.getTimestamp(0), r.getLong(1))).toMap
      assert(streamed.get(ts(0)).contains(2L), s"h0 window: $streamed")
      assert(streamed.get(ts(1)).contains(1L), s"h1 window: $streamed")
      // batch twin agrees on the same closed windows
      val batch = EventStream.hourlyUsers(
        Seq((ts(0), 1L), (ts(0), 1L), (ts(0), 2L), (ts(1), 1L)).toDF("ts", "user_id"))
        .collect().map(r => (r.getTimestamp(0), r.getLong(1))).toMap
      assert(batch == Map(ts(0) -> 2L, ts(1) -> 1L))
    } finally q.stop()
  }

  test("attributionStream: stream-stream interval join matches the batch twin") {
    implicit val sqlCtx = spark.sqlContext
    val vIn = MemoryStream[(Long, Timestamp)] // (user, view_ts)
    val cIn = MemoryStream[(Long, Timestamp)] // (user, click_ts)
    val q = EventStream.attributionStream(
      vIn.toDF().toDF("view_user", "view_ts"),
      cIn.toDF().toDF("click_user", "click_ts"))
      .select(col("view_user"), col("view_ts"), col("click_ts"))
      .writeStream.format("memory").queryName("attr_test")
      .outputMode("append").start()
    try {
      val m = (h: Int, min: Int) => Timestamp.valueOf(f"2024-01-01 $h%02d:$min%02d:00")
      // user 1: view 00:00 -> clicks 00:30 (in horizon) and 02:00 (out);
      // user 2: click 00:10 with no view
      vIn.addData((1L, m(0, 0)))
      cIn.addData((1L, m(0, 30)), (1L, m(2, 0)), (2L, m(0, 10)))
      q.processAllAvailable()
      val got = spark.table("attr_test").collect()
        .map(r => (r.getLong(0), r.getTimestamp(1), r.getTimestamp(2)))
      assert(got.toSeq == Seq((1L, m(0, 0), m(0, 30))), got.mkString(","))
      // batch twin on the equivalent events frame agrees
      val events = Seq(
        (1L, m(0, 0), "view"), (1L, m(0, 30), "click"),
        (1L, m(2, 0), "click"), (2L, m(0, 10), "click"))
        .toDF("user_id", "ts", "event_type")
      val batch = EventStream.attribution(events).collect()
        .map(r => (r.getLong(0), r.getLong(1)))
      assert(batch.toSeq == Seq((1L, 1L)))
    } finally q.stop()
  }

  test("attributionOuterStream: unmatched views emit with null clicks after watermark") {
    implicit val sqlCtx = spark.sqlContext
    val vIn = MemoryStream[(Long, Timestamp)]
    val cIn = MemoryStream[(Long, Timestamp)]
    val q = EventStream.attributionOuterStream(
      vIn.toDF().toDF("view_user", "view_ts"),
      cIn.toDF().toDF("click_user", "click_ts"))
      .select(col("view_user"), col("view_ts"), col("click_ts"))
      .writeStream.format("memory").queryName("attr_outer_test")
      .outputMode("append").start()
    try {
      val m = (h: Int, min: Int) => Timestamp.valueOf(f"2024-01-01 $h%02d:$min%02d:00")
      // user 1: view 00:00 with click 00:30 (matched);
      // user 2: view 00:05 with no click ever (must emit as orphan)
      vIn.addData((1L, m(0, 0)), (2L, m(0, 5)))
      cIn.addData((1L, m(0, 30)))
      q.processAllAvailable()
      // push BOTH watermarks far past view_ts + horizon so the held
      // orphan view flushes, then one more batch to emit it
      vIn.addData((9L, m(12, 0)))
      cIn.addData((9L, m(12, 0)))
      q.processAllAvailable()
      vIn.addData((9L, m(13, 0)))
      cIn.addData((9L, m(13, 0)))
      q.processAllAvailable()
      val got = spark.table("attr_outer_test").collect()
        .map(r => (r.getLong(0), r.getTimestamp(1), Option(r.getTimestamp(2))))
        .toSet
      assert(got.contains((1L, m(0, 0), Some(m(0, 30)))), got.mkString(","))
      assert(got.contains((2L, m(0, 5), None)), s"orphan view not emitted: $got")
      // batch twin agrees: user 1 converted, user 2 abandoned
      val events = Seq(
        (1L, 100L, m(0, 0), "view"), (2L, 101L, m(0, 5), "view"),
        (1L, 102L, m(0, 30), "click"))
        .toDF("user_id", "event_id", "ts", "event_type")
      val batch = EventStream.attributionOuter(events).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      assert(batch.toSeq == Seq((1L, 1L, 1L, 0L), (2L, 1L, 0L, 1L)))
    } finally q.stop()
  }

  test("streaming exact dedup within watermark drops late duplicates") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Timestamp, Long)]
    val q = EventStream.dedupStream(in.toDF().toDF("ts", "event_id"), "2 hours")
      .writeStream.format("memory").queryName("dedup_test")
      .outputMode("append").start()
    try {
      in.addData((ts(0), 1L), (ts(0), 1L), (ts(1), 2L)) // dup in-batch
      q.processAllAvailable()
      in.addData((ts(1), 2L), (ts(2), 3L))              // dup across batches
      q.processAllAvailable()
    } finally q.stop()
    val ids = spark.table("dedup_test").collect().map(_.getLong(1)).sorted
    assert(ids.toSeq == Seq(1L, 2L, 3L))
  }

  test("dailyRollupStream + mergeSink: store equals batch twin; replay upserts") {
    implicit val sqlCtx = spark.sqlContext
    def day(d: Int, hour: Int): Timestamp =
      Timestamp.valueOf(f"2024-01-0$d%d $hour%02d:00:00")
    val store = java.nio.file.Files.createTempDirectory("graft_rollup").toString + "/store"
    val in = MemoryStream[(Timestamp, String, Double)]
    val closed = Seq( // day 1 and 2 events — closed once watermark passes
      (day(1, 1), "view", 1.5), (day(1, 2), "view", 2.5), (day(1, 3), "click", 4.0),
      (day(2, 1), "view", 8.0))
    val q = EventStream.mergeSink(
      EventStream.dailyRollupStream(in.toDF().toDF("ts", "event_type", "value")),
      store)
    try {
      in.addData(closed: _*)
      q.processAllAvailable()
      in.addData((day(4, 1), "view", 0.5)) // advances watermark past days 1-2
      q.processAllAvailable()
      in.addData((day(5, 1), "view", 0.5)) // one more batch so closed days emit
      q.processAllAvailable()
    } finally q.stop()
    def read() = spark.read.parquet(store)
      .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2),
        r.getDouble(3))).toSet
    val batch = EventStream.dailyRollup(closed.toDF("ts", "event_type", "value"))
      .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2),
        r.getDouble(3))).toSet
    val got = read()
    assert(batch.subsetOf(got), s"closed-day partials missing:\ngot $got\nwant ⊇ $batch")
    // replaying a partial for an existing key UPSERTS — no duplicate rows
    import spark.implicits._
    val replay = Seq((day(1, 0), "view", 99L, 123.0))
      .toDF("day", "event_type", "n", "sum_value")
    EventStream.upsertStore(replay, store)
    EventStream.upsertStore(replay, store) // idempotent: second run no-ops
    val after = read()
    assert(after.size == got.size, "replayed partial appended instead of upserting")
    assert(after.contains((day(1, 0), "view", 99L, 123.0)), "replay did not overwrite")
  }

  test("mergeSink: killed mid-stream, restarted from checkpoint — store equals batch twin") {
    implicit val sqlCtx = spark.sqlContext
    def day(d: Int, hour: Int): Timestamp =
      Timestamp.valueOf(f"2024-01-0$d%d $hour%02d:00:00")
    val root = java.nio.file.Files.createTempDirectory("graft_ckpt").toString
    val store = root + "/store"
    val ckpt = root + "/checkpoint"
    val in = MemoryStream[(Timestamp, String, Double)]
    val phase1 = Seq((day(1, 1), "view", 1.5), (day(1, 2), "click", 2.0))
    val phase2 = Seq((day(2, 3), "view", 4.0))
    def start() = EventStream.mergeSink(
      EventStream.dailyRollupStream(in.toDF().toDF("ts", "event_type", "value")),
      store, checkpoint = Some(ckpt))
    // phase 1, then KILL while day 1 is still open in the state store
    // (append mode has emitted nothing yet — genuinely mid-stream)
    val q1 = start()
    try { in.addData(phase1: _*); q1.processAllAvailable() } finally q1.stop()
    // data arrives while the query is down; restart resumes from the
    // checkpoint's committed offsets + aggregate state
    in.addData(phase2: _*)
    val q2 = start()
    try {
      q2.processAllAvailable()
      in.addData((day(4, 1), "view", 0.5)) // advances watermark past days 1-2
      q2.processAllAvailable()
      in.addData((day(5, 1), "view", 0.5)) // one more batch so closed days emit
      q2.processAllAvailable()
    } finally q2.stop()
    val rows = spark.read.parquet(store)
      .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2),
        r.getDouble(3)))
    val batch = EventStream.dailyRollup((phase1 ++ phase2).toDF("ts", "event_type", "value"))
      .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2),
        r.getDouble(3))).toSet
    assert(batch.subsetOf(rows.toSet),
      s"recovered store missing closed-day partials:\ngot ${rows.toSet}\nwant ⊇ $batch")
    // no key appears twice: recovery replays landed as upserts, never appends
    val keys = rows.map(r => (r._1, r._2))
    assert(keys.distinct.length == keys.length, s"duplicate keys after recovery: $keys")
  }

  test("trendingStream + trendingSink: closed hours ranked top-k in the store") {
    implicit val sqlCtx = spark.sqlContext
    def at(hour: Int, min: Int): Timestamp =
      Timestamp.valueOf(f"2024-01-01 $hour%02d:$min%02d:00")
    val store = java.nio.file.Files.createTempDirectory("graft_trend").toString + "/store"
    val in = MemoryStream[(Timestamp, String)]
    // hour 1: view×3, click×2, error×1, signup×1 → top-3 = view, click, (error|signup by name)
    val h1 = Seq.fill(3)((at(1, 5), "view")) ++ Seq.fill(2)((at(1, 10), "click")) ++
      Seq((at(1, 15), "error"), (at(1, 20), "signup"))
    val q = EventStream.trendingSink(
      EventStream.trendingStream(in.toDF().toDF("ts", "event_type")), store)
    try {
      in.addData(h1: _*)
      q.processAllAvailable()
      in.addData((at(6, 0), "view")) // advances watermark past hour 1
      q.processAllAvailable()
      in.addData((at(7, 0), "view")) // one more batch so the closed hour emits
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.read.parquet(store)
      .filter(org.apache.spark.sql.functions.col("hour") === at(1, 0))
      .select("event_type", "n", "rk")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._3)
    assert(got.toSeq == Seq(("view", 3L, 1L), ("click", 2L, 2L), ("error", 1L, 3L)),
      got.mkString(","))
  }

  test("trendingSink: restart from checkpoint — closed hour ranked once, no dup keys") {
    implicit val sqlCtx = spark.sqlContext
    def at(hour: Int, min: Int): Timestamp =
      Timestamp.valueOf(f"2024-01-01 $hour%02d:$min%02d:00")
    val root = java.nio.file.Files.createTempDirectory("graft_trend_ckpt").toString
    val store = root + "/store"
    val ckpt = root + "/checkpoint"
    val in = MemoryStream[(Timestamp, String)]
    def start() = EventStream.trendingSink(
      EventStream.trendingStream(in.toDF().toDF("ts", "event_type")), store,
      checkpoint = Some(ckpt))
    // hour 1 data arrives, then the query dies with the hour still open
    val q1 = start()
    try {
      in.addData((at(1, 5), "view"), (at(1, 6), "view"), (at(1, 10), "click"))
      q1.processAllAvailable()
    } finally q1.stop()
    // restart: watermark-advancing data closes hour 1 from recovered state
    val q2 = start()
    try {
      in.addData((at(6, 0), "view"))
      q2.processAllAvailable()
      in.addData((at(7, 0), "view"))
      q2.processAllAvailable()
    } finally q2.stop()
    val h1 = spark.read.parquet(store)
      .filter(org.apache.spark.sql.functions.col("hour") === at(1, 0))
      .collect().map(r => (r.getAs[String]("event_type"), r.getAs[Long]("n"),
        r.getAs[Long]("rk"))).sortBy(_._3)
    assert(h1.toSeq == Seq(("view", 2L, 1L), ("click", 1L, 2L)),
      s"recovered trending store wrong: ${h1.mkString(",")}")
  }

  test("sessionWithStores: per-query state-store sizing with batch parity and base-session isolation") {
    val s2 = EventStream.sessionWithStores(spark, stores = 2)
    implicit val sqlCtx = s2.sqlContext
    val vIn = MemoryStream[(Long, Timestamp)]
    val cIn = MemoryStream[(Long, Timestamp)]
    val q = EventStream.attributionStream(
      vIn.toDF().toDF("view_user", "view_ts"),
      cIn.toDF().toDF("click_user", "click_ts"))
      .select(col("view_user"), col("view_ts"), col("click_ts"))
      .writeStream.format("memory").queryName("attr_sized")
      .outputMode("append").start()
    try {
      val m = (h: Int, min: Int) => Timestamp.valueOf(f"2024-01-01 $h%02d:$min%02d:00")
      vIn.addData((1L, m(0, 0)))
      cIn.addData((1L, m(0, 30)), (2L, m(0, 10)))
      q.processAllAvailable()
      // batch-twin parity is preserved under the re-sized store count
      val got = s2.table("attr_sized").collect()
        .map(r => (r.getLong(0), r.getTimestamp(1), r.getTimestamp(2)))
      assert(got.toSeq == Seq((1L, m(0, 0), m(0, 30))), got.mkString(","))
      // the stateful operator really ran at 2 state stores, not the
      // session default — numShufflePartitions IS the store count
      val parts = q.lastProgress.stateOperators.map(_.numShufflePartitions)
      assert(parts.nonEmpty && parts.forall(_ == 2L), parts.mkString(","))
      // and the BASE session's conf is untouched (per-query isolation,
      // the q79 no-set/restore hygiene)
      assert(spark.conf.get("spark.sql.shuffle.partitions") == "4")
    } finally q.stop()
  }

  test("dedupDelivery restores exactly-once counts from at-least-once feed") {
    val events = graft.sources.Tables.events(spark, sf("sf0.001"))
    val got = EventStream.dedupDelivery(events).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    // dedup on event_id must cancel the deterministic re-delivery exactly
    val want = events.groupBy("event_type")
      .agg(count(lit(1)).as("n_events"), count_distinct(col("user_id")).as("n_users"))
      .orderBy("event_type").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq == want.toSeq && got.nonEmpty)
  }
}
