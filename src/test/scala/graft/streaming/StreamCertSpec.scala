package graft.streaming

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.CertSpec
import graft.sources.Tables

/** Registry certification for the streaming batch-twin (st-family)
  * queries not already literally cited by EventStreamSpec — see
  * [[graft.CertSpec]]. Every cross-check recomputes the window/session
  * semantics from the raw events with an independent Spark plan (or
  * plain Scala for the sessionizers). */
class StreamCertSpec extends CertSpec {
  import spark.implicits._

  private lazy val ev = Tables.events(spark, fx)

  private def sentiment(v: Column): Column =
    when(v < 5, "NEG").when(v < 15, "NEUTRAL").otherwise("POS")

  test("st1_tumbling_counts: hourly sentiment counts equal the raw recompute") {
    val got = rows("st1_tumbling_counts")
      .map(x => (x.get(0).toString, x.getAs[String]("sentiment")) -> x.getAs[Long]("n")).toMap
    val want = ev.groupBy(date_trunc("hour", col("ts")).as("w"),
        sentiment(col("value")).as("s"))
      .count().collect()
      .map(x => (x.get(0).toString, x.getString(1)) -> x.getLong(2)).toMap
    assert(got == want)
  }

  test("st2_sliding_counts: 24h windows sliding 12h double-count every event") {
    val r = rows("st2_sliding_counts")
    assert(r.map(_.getAs[Long]("n")).sum == 2 * ev.count(),
      "each event falls in exactly two sliding windows")
    // window starts align to the 12h slide grid
    assert(r.forall { x =>
      val t = x.get(0).toString
      t.contains("00:00:00") || t.contains("12:00:00")
    })
  }

  private def sessionize(gapStrict: Boolean): Map[(Long, Long), (Long, Long, Long)] = {
    // plain-Scala sessionizer: 8h gap; strict ">" (st3) or ">=" (st4)
    val events = ev.select(col("user_id"), unix_micros(col("ts")), col("event_id"))
      .as[(Long, Long, Long)].collect().toVector
    val out = scala.collection.mutable.Map.empty[(Long, Long), (Long, Long, Long)]
    for ((u, g) <- events.groupBy(_._1)) {
      var sid = 0L
      var prev = Long.MinValue
      for ((_, us, _) <- g.sortBy(x => (x._2, x._3))) {
        val gap = us - prev
        val isNew = prev == Long.MinValue ||
          (if (gapStrict) gap > 28800000000L else gap >= 28800000000L)
        if (isNew) { sid += 1; out((u, sid)) = (0L, us, us) }
        val (n, s, _) = out((u, sid))
        out((u, sid)) = (n + 1, s, us)
        prev = us
      }
    }
    out.toMap
  }

  test("st3_sessions: 8h-gap sessions equal a plain-Scala sessionizer") {
    val want = sessionize(gapStrict = true)
    val r = rows("st3_sessions")
    assert(r.size == want.size)
    r.foreach { x =>
      val k = (x.getAs[Long]("user_id"), x.getAs[Long]("session_id"))
      val (n, s, e) = want(k)
      assert(x.getAs[Long]("n_events") == n, s"$k n")
      assert(x.get(x.fieldIndex("s_start")).toString.nonEmpty)
      val gotS = micros(x, "s_start"); val gotE = micros(x, "s_end")
      assert(gotS == s && gotE == e, s"$k bounds")
    }
  }

  test("st4_session_window: native session_window agrees with the recompute") {
    val want = sessionize(gapStrict = false)
      .map { case ((u, _), (n, s, e)) => (u, s, e) -> n }
    val r = rows("st4_session_window")
    assert(r.size == want.size)
    r.foreach { x =>
      val k = (x.getAs[Long]("user_id"), micros(x, "s_start"), micros(x, "s_end"))
      assert(want.get(k).contains(x.getAs[Long]("n_events")), s"$k")
    }
  }

  private def micros(x: org.apache.spark.sql.Row, c: String): Long = {
    x.get(x.fieldIndex(c)) match {
      case t: java.sql.Timestamp => t.getTime * 1000 + (t.getNanos / 1000) % 1000
      case t: java.time.Instant => t.getEpochSecond * 1000000L + t.getNano / 1000
      case t: java.time.LocalDateTime =>
        val i = t.toInstant(java.time.ZoneOffset.UTC)
        i.getEpochSecond * 1000000L + i.getNano / 1000
      case other => fail(s"unexpected timestamp repr $other (${other.getClass})")
    }
  }

  test("st5_hourly_users: hourly distinct users equal the raw recompute") {
    val got = rows("st5_hourly_users")
      .map(x => x.get(0).toString -> x.getAs[Long]("n_users")).toMap
    val want = ev.groupBy(date_trunc("hour", col("ts")).as("w"))
      .agg(countDistinct("user_id")).collect()
      .map(x => x.get(0).toString -> x.getLong(1)).toMap
    assert(got == want)
  }

  test("st6_attribution: view->click pairs within the 1h window recompute") {
    val v = ev.filter(col("event_type") === "view")
      .select(col("user_id"), unix_micros(col("ts"))).as[(Long, Long)].collect()
    val c = ev.filter(col("event_type") === "click")
      .select(col("user_id"), unix_micros(col("ts"))).as[(Long, Long)].collect()
    val byUserC = c.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val want = v.groupBy(_._1).flatMap { case (u, vs) =>
      val n = vs.map(_._2).map(vu =>
        byUserC.getOrElse(u, Array.empty[Long])
          .count(cu => cu >= vu && cu <= vu + 3600000000L).toLong).sum
      if (n > 0) Some(u -> n) else None
    }
    val got = rows("st6_attribution")
      .map(x => x.getAs[Long]("user_id") -> x.getAs[Long]("n_attributed")).toMap
    assert(got == want)
  }

  test("st10_attribution_outer: orphan views complement attributed views per user") {
    val r = rows("st10_attribution_outer")
    val viewUsers = ev.filter(col("event_type") === "view")
      .groupBy("user_id").count().as[(Long, Long)].collect().toMap
    assert(r.map(_.getAs[Long]("user_id")).toSet == viewUsers.keySet,
      "exactly the users with at least one view")
    r.foreach { x =>
      val u = x.getAs[Long]("user_id")
      assert(x.getAs[Long]("n_views") == viewUsers(u), s"user $u views")
      assert(x.getAs[Long]("n_attributed") + x.getAs[Long]("n_orphan_views") ==
        x.getAs[Long]("n_views"), s"user $u partition")
    }
  }

  test("st7_stream_dedup: duplicate delivery collapses back to the original stream") {
    val got = rows("st7_stream_dedup")
      .map(x => x.getAs[String]("event_type") ->
        (x.getAs[Long]("n_events"), x.getAs[Long]("n_users"))).toMap
    val want = ev.groupBy("event_type")
      .agg(count(lit(1)).as("n"), countDistinct("user_id").as("u"))
      .collect().map(x => x.getString(0) -> (x.getLong(1), x.getLong(2))).toMap
    assert(got == want, "dedup must restore exactly the raw per-type counts")
  }

  test("st8_daily_rollup: per-day-and-type counts and sums equal the raw recompute") {
    val got = rows("st8_daily_rollup")
      .map(x => (x.get(0).toString, x.getAs[String]("event_type")) ->
        (x.getAs[Long]("n"), x.getAs[Double]("sum_value"))).toMap
    val want = ev.groupBy(date_trunc("day", col("ts")).as("d"), col("event_type"))
      .agg(count(lit(1)),
        sum(col("value").cast(DecimalType(20, 4))).cast("double"))
      .collect()
      .map(x => (x.get(0).toString, x.getString(1)) -> (x.getLong(2), x.getDouble(3))).toMap
    assert(got == want)
  }
}
