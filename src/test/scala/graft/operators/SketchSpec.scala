package graft.operators

import graft.SparkSpec
import graft.functions.KmvDistinctAggregator
import graft.sources.Tables

class SketchSpec extends SparkSpec {
  import spark.implicits._

  test("kmvDistinct: estimate tracks the exact count on real events") {
    val rows = Sketch.kmvDistinct(Tables.events(spark, sf("sf0.001"))).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val exact = r.getLong(1).toDouble
      val est = r.getDecimal(2).doubleValue
      // k=64 → relative standard error ~1/√k ≈ 12.5%; 3σ bound
      assert(math.abs(est - exact) / exact < 0.4,
        s"${r.getString(0)}: est=$est exact=$exact")
    }
  }

  test("heavyHitters: exact set on a skewed corpus, independent of partitioning") {
    // 60×"hot", 30×"warm", 1 each of 20 rare words; N=110
    // k=4 → threshold N/4=27.5 → exactly {hot, warm}
    val docs = (
      Seq.fill(60)("hot") ++ Seq.fill(30)("warm") ++
        (1 to 20).map(i => s"rare$i")
      ).zipWithIndex.map { case (wrd, i) => (i.toLong, wrd) }
    Seq(1, 7).foreach { parts =>
      val df = docs.toDF("doc_id", "text").repartition(parts)
      val got = Sketch.heavyHitters(df, k = 4).collect()
        .map(r => (r.getString(0), r.getLong(1)))
      // capacity 2k+1 = 9 < 22 distinct words → MG eviction really runs
      assert(got.toSeq == Seq(("hot", 60L), ("warm", 30L)), s"parts=$parts")
    }
  }

  test("MisraGriesAggregator: merge keeps the frequency guarantee under eviction") {
    import graft.functions.MisraGriesAggregator
    val agg = new MisraGriesAggregator(3)
    // stream A: x-heavy with noise; stream B: y-heavy with other noise
    val a = "x x x a b c x x a".split(" ").foldLeft(agg.zero)(agg.reduce)
    val b = "y y d e y f y d y".split(" ").foldLeft(agg.zero)(agg.reduce)
    assert(a._1.size <= 3 && b._1.size <= 3) // bounded state
    val (m, n) = agg.merge(a, b)
    assert(n == 18) // exact N carried through merges
    // x (5/18) and y (5/18) both exceed N/(c+1) = 18/4 → guaranteed kept
    assert(m.contains("x") && m.contains("y"))
    assert(m.size <= 3)
  }

  test("KmvDistinctAggregator: partition-schedule independent") {
    // the estimate is a pure function of the distinct hash set, so any
    // partitioning (and so any partial-aggregation merge order) must
    // produce the identical double
    val vals = (1L to 500L).map(i => ("g", math.floorMod(i * 2654435761L, 4294967296L)))
    def estimate(parts: Int): Double =
      vals.toDS().repartition(parts)
        .groupByKey(_._1)
        .agg(new KmvDistinctAggregator(64).toColumn.name("est"))
        .collect().head._2
    assert(estimate(1) == estimate(8))
  }

  test("KmvDistinctAggregator: exact below k, estimator above") {
    val small = (1L to 30L).map(i => ("g", i * 1000L))
    val below = small.toDS().groupByKey(_._1)
      .agg(new KmvDistinctAggregator(64).toColumn.name("est"))
      .collect().head._2
    assert(below == 30.0) // fewer than k distinct values → exact count
    // duplicates must not perturb the sketch (distinct semantics)
    val dup = (small ++ small).toDS().groupByKey(_._1)
      .agg(new KmvDistinctAggregator(64).toColumn.name("est"))
      .collect().head._2
    assert(dup == 30.0)
  }

  test("hllDistinct: estimate within the m=256 error envelope on real keys") {
    val li = graft.sources.Tables.lineitem(spark, sf("sf0.001"))
    val r = Sketch.hllDistinct(li).collect().head
    val (exact, est, relErr) =
      (r.getLong(0), r.getDecimal(2).doubleValue, r.getDecimal(3).doubleValue)
    assert(exact > 1000L) // sanity: real cardinality, not the tiny regime
    // standard error for m=256 is 1.04/√256 = 6.5%; allow 4σ
    assert(math.abs(relErr) < 0.26, s"HLL off by ${relErr * 100}%: $est vs $exact")
    assert(math.abs(est / exact - 1.0 - relErr) < 1e-5) // rel_err consistent
  }

  test("hllDistinct: register table is partition-schedule independent") {
    val li = graft.sources.Tables.lineitem(spark, sf("sf0.001"))
    val a = Sketch.hllDistinct(li).collect().head
    val b = Sketch.hllDistinct(li.repartition(7)).collect().head
    assert(a.getDecimal(2) == b.getDecimal(2), "estimate depends on partitioning")
    assert(a.getLong(1) == b.getLong(1))
  }

  test("hllWindows: per-day exact counts true, estimates in envelope, partition-independent") {
    val ev = graft.sources.Tables.events(spark, sf("sf0.001"))
    val rows = Sketch.hllWindows(ev).collect()
      .map(r => (r.getDate(0).toString, r.getLong(1), r.getDecimal(3).doubleValue,
        r.getDecimal(4).doubleValue))
    assert(rows.nonEmpty)
    // per-day exact counts match an independent count_distinct
    val exact = ev.select(org.apache.spark.sql.functions.to_date(
        org.apache.spark.sql.functions.col("ts")).as("day"), org.apache.spark.sql.functions.col("user_id"))
      .distinct().groupBy("day").count().collect()
      .map(r => r.getDate(0).toString -> r.getLong(1)).toMap
    rows.foreach { case (day, nExact, est, relErr) =>
      assert(exact(day) == nExact, s"$day exact mismatch")
      // small-n regime runs linear counting: generous 4-sigma envelope
      assert(math.abs(relErr) < 0.26, s"$day HLL off by ${relErr * 100}%")
      assert(math.abs(est / nExact - 1.0 - relErr) < 1e-5)
    }
    // register tables are partition-schedule independent
    val a = Sketch.hllWindows(ev).collect().map(_.toString).sorted
    val b = Sketch.hllWindows(ev.repartition(7)).collect().map(_.toString).sorted
    assert(a.sameElements(b))
  }

  test("cmsFreq: one-sided error, estimates equal a driver-side sketch recount") {
    val docs = graft.sources.Tables.documents(spark, sf("sf0.001"))
    val got = Sketch.cmsFreq(docs).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.length == 10)
    got.foreach { case (word, exact, est, over) =>
      assert(est >= exact, s"$word under-counted: $est < $exact")
      assert(over == est - exact)
    }
    // full driver-side recount of the d=4 × w=256 sketch
    def h32(s: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
      hex.take(8).foldLeft(0L)((acc, c) => acc * 16 + Character.digit(c, 16))
    }
    val toks = docs.select(org.apache.spark.sql.functions.explode(
        graft.text.Tokenize.rawTokens(org.apache.spark.sql.functions.col("text"))))
      .collect().map(_.getString(0))
    val counters = scala.collection.mutable.Map[(Int, Long), Long]()
    toks.foreach { word =>
      (0 until 4).foreach { i =>
        val key = (i, h32(s"$i:$word") % 256)
        counters(key) = counters.getOrElse(key, 0L) + 1
      }
    }
    got.foreach { case (word, _, est, _) =>
      val expect = (0 until 4).map(i => counters((i, h32(s"$i:$word") % 256))).min
      assert(est == expect, s"$word: engine $est vs recount $expect")
    }
  }

  test("hash32 matches its SQL twin's digit arithmetic") {
    // 32-bit range and determinism across rows
    val hs = Seq(1L, 2L, 42L, 999999L).toDF("k")
      .select(Sketch.hash32(org.apache.spark.sql.functions.col("k")).as("h"))
      .collect().map(_.getLong(0))
    hs.foreach(h => assert(h >= 0L && h < 4294967296L))
    assert(hs.distinct.length == hs.length)
  }

  test("kmvSetOps: estimates track exact jaccard on the real corpus") {
    val docs = graft.sources.Tables.documents(spark, sf("sf0.001"))
    val rows = Sketch.kmvSetOps(docs).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (sa, sb) = (r.getString(0), r.getString(1))
      assert(sa < sb, s"pair not canonical: $sa/$sb")
      val exact = r.getDecimal(3).doubleValue
      val est = r.getDecimal(4).doubleValue
      // KMV coincidence estimator: both in [0,1], small-corpus sketches
      // (vocab may be under k) must be near-exact; always within the
      // k=64 estimator's coarse band otherwise
      assert(est >= 0.0 && est <= 1.0)
      assert(math.abs(est - exact) < 0.35, s"$sa/$sb: est $est vs exact $exact")
      assert(r.getDecimal(5).doubleValue > 0.0) // union estimate positive
    }
  }

  test("kmvSetOps: identical vocabularies give jaccard_est 1") {
    val docs = Seq(
      ("a", 1L, "the quick brown fox jumps"),
      ("b", 2L, "the quick brown fox jumps")).toDF("source", "doc_id", "text")
    val r = Sketch.kmvSetOps(docs).collect()
    assert(r.length == 1)
    assert(r.head.getDecimal(3).doubleValue == 1.0) // exact
    assert(r.head.getDecimal(4).doubleValue == 1.0) // estimator
  }

  test("hdrQuantiles: estimates within the 2^-m relative-error bound of exact quantiles") {
    val orders = Tables.orders(spark, sf("sf0.001"))
    val got = Sketch.hdrQuantiles(orders)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val cents = orders.select(
      org.apache.spark.sql.functions.round(
        org.apache.spark.sql.functions.col("o_totalprice") * 100, 0).cast("long"))
      .as[Long].collect().sorted
    assert(got.values.head._2 == cents.length)
    for ((q, (est, _)) <- got) {
      val exact = cents(math.ceil(q.toDouble * cents.length).toInt - 1)
      // lower-bound estimate: est ≤ exact, and exact < est + bucket width,
      // where width/est < 2^-m (m = 5) once e > m
      assert(est <= exact, s"q=$q est=$est exact=$exact")
      assert(exact - est <= math.max(est / 32, 1), s"q=$q est=$est exact=$exact")
    }
  }

  test("hdrQuantiles: small values (e <= m) are exact; medians land on buckets") {
    // all cents ≤ 2^5: every bucket is a single value, quantiles exact
    val small = Seq(0.01, 0.02, 0.03, 0.04, 0.05, 0.06, 0.07, 0.08, 0.09, 0.10)
      .toDF("o_totalprice")
    val got = Sketch.hdrQuantiles(small)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == Map("0.50" -> 5L, "0.90" -> 9L, "0.99" -> 10L), got.toString)
  }

  test("hdrQuantiles: histogram is mergeable — split halves reproduce the whole") {
    val orders = Tables.orders(spark, sf("sf0.001"))
    import org.apache.spark.sql.functions.col
    val whole = Sketch.hdrQuantiles(orders).collect().map(_.toSeq).toSeq
    // the same rows in two arbitrary pieces, recombined: bucket counts add,
    // so the sketch over the union is identical however the data is split
    val a = orders.filter(col("o_orderkey") % 2 === 0)
    val b = orders.filter(col("o_orderkey") % 2 =!= 0)
    val merged = Sketch.hdrQuantiles(a.unionAll(b)).collect().map(_.toSeq).toSeq
    assert(whole == merged)
  }
}
