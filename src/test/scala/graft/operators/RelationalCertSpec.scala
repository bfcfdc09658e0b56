package graft.operators

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.CertSpec
import graft.sources.Tables

/** Registry certification for the relational (q-family) queries that
  * are not already literally cited by an operator spec — see
  * [[graft.CertSpec]] for the contract. Cross-checks recompute the
  * pinned property from the raw parquet tables with independent (and
  * usually simpler) Spark plans. */
class RelationalCertSpec extends CertSpec {
  import spark.implicits._

  private lazy val li = Tables.lineitem(spark, fx)
  private lazy val ord = Tables.orders(spark, fx)
  private lazy val cust = Tables.customer(spark, fx)
  private lazy val supp = Tables.supplier(spark, fx)
  private lazy val prt = Tables.part(spark, fx)
  private lazy val ev = Tables.events(spark, fx)
  private lazy val docs = Tables.documents(spark, fx)

  private def d204(c: String) = col(c).cast(DecimalType(20, 4))

  test("q5_full_outer: count side covers every group; hi side is a subset") {
    val r = rows("q5_full_outer")
    assert(r.forall(!_.isNullAt(2)), "n_all must never be NULL (left side is total)")
    val groups = ev.select("user_id", "event_type").distinct().count()
    assert(r.size.toLong == groups)
    assert(r.map(_.getAs[Long]("n_all")).sum == ev.count())
  }

  test("q7_count_distinct: distincts bounded by row counts, rows conserve") {
    val r = rows("q7_count_distinct")
    assert(r.forall(x => x.getAs[Long]("n_orders") <= x.getAs[Long]("n_rows")
      && x.getAs[Long]("n_supps") <= x.getAs[Long]("n_rows")))
    assert(r.map(_.getAs[Long]("n_rows")).sum == li.count())
  }

  test("q8_collect_set: priorities are sorted distinct CSV; orders conserve") {
    val r = rows("q8_collect_set")
    assert(r.map(_.getAs[Long]("n_orders")).sum == ord.count())
    assert(r.forall { x =>
      val ps = x.getAs[String]("priorities").split(',').toSeq
      ps == ps.sorted && ps.distinct == ps
    })
  }

  test("q9_explode: descending top-20 word counts; head equals raw recompute") {
    val r = rows("q9_explode")
    val ns = r.map(_.getAs[Long]("n"))
    assert(ns == ns.sortBy(-_), "must be ordered by n desc")
    val top = prt.select(explode(split(col("p_name"), " ")).as("w"))
      .groupBy("w").count().orderBy(desc("count"), asc("w")).limit(1)
      .collect()(0)
    assert(r.head.getAs[String]("word") == top.getString(0)
      && r.head.getAs[Long]("n") == top.getLong(1))
  }

  test("q11_anti_join: exactly the customers with no orders") {
    val got = rows("q11_anti_join").map(_.getAs[Long]("c_custkey")).toSet
    val want = cust.select(col("c_custkey")).except(
      ord.select(col("o_custkey").as("c_custkey"))).as[Long].collect().toSet
    assert(got == want)
  }

  test("q12_semi_join: exactly the suppliers with a qty>=45 lineitem") {
    val got = rows("q12_semi_join").map(_.getAs[Long]("s_suppkey")).toSet
    val want = li.filter(col("l_quantity") >= 45).select(col("l_suppkey"))
      .intersect(supp.select(col("s_suppkey").as("l_suppkey")))
      .as[Long].collect().toSet
    assert(got == want && got.nonEmpty)
  }

  test("q13_union: distinct union of customer and supplier nation keys, ascending") {
    val got = rows("q13_union").map(_.getAs[Int]("nationkey"))
    val want = (cust.select(col("c_nationkey")).as[Int].collect().toSet ++
      supp.select(col("s_nationkey")).as[Int].collect().toSet).toVector.sorted
    assert(got == want)
  }

  test("q14_case_when: buckets partition all events") {
    val r = rows("q14_case_when")
    assert(r.map(_.getAs[Long]("n")).sum == ev.count())
    assert(r.map(_.getAs[String]("bucket")).toSet.subsetOf(Set("low", "mid", "high")))
  }

  test("q15_scalar_funcs: consonants are vowel-free; trim preserves length") {
    val r = rows("q15_scalar_funcs")
    assert(r.nonEmpty)
    assert(r.forall(x => !x.getAs[String]("consonants").exists("aeiou".contains(_))))
    assert(r.forall(x => x.getAs[String]("trimmed").length == x.getAs[Int]("name_len")))
    assert(r.forall(_.getAs[Int]("n_words") >= 1))
  }

  test("q16_datetime: month domain and order conservation") {
    val r = rows("q16_datetime")
    assert(r.forall(x => (1 to 12).contains(x.getAs[Int]("mo"))))
    assert(r.map(_.getAs[Long]("n_orders")).sum == ord.count())
  }

  test("q17_json: extracted-k extrema bracket the sum; events conserve") {
    val r = rows("q17_json")
    assert(r.map(_.getAs[Long]("n")).sum == ev.count())
    assert(r.forall { x =>
      val (n, s) = (x.getAs[Long]("n"), x.getAs[Long]("sum_k"))
      val (lo, hi) = (x.getAs[Long]("min_k"), x.getAs[Long]("max_k"))
      lo <= hi && s >= n * lo && s <= n * hi
    })
  }

  test("q18_set_ops: EXCEPT and INTERSECT legs match raw set algebra") {
    val r = rows("q18_set_ops")
    val c = cust.select(col("c_nationkey")).as[Int].collect().toSet
    val s = supp.select(col("s_nationkey")).as[Int].collect().toSet
    val got = r.groupBy(_.getAs[String]("which"))
      .view.mapValues(_.map(_.getAs[Int]("nationkey")).toSet).toMap
    assert(got.getOrElse("customers_only", Set.empty[Int]) == (c -- s))
    assert(got.getOrElse("both", Set.empty[Int]) == (c & s))
  }

  test("q19_rollup: leaf rows aggregate to subtotal and grand-total rows") {
    val r = rows("q19_rollup")
    def qty(x: Row) = x.getAs[Double]("sum_qty")
    val grand = r.filter(x => x.isNullAt(0) && x.isNullAt(1))
    val flagSubs = r.filter(x => !x.isNullAt(0) && x.isNullAt(1))
    val leaves = r.filter(x => !x.isNullAt(0) && !x.isNullAt(1))
    assert(grand.size == 1)
    assert(math.abs(leaves.map(qty).sum - qty(grand.head)) < 1e-6)
    assert(math.abs(flagSubs.map(qty).sum - qty(grand.head)) < 1e-6)
    assert(grand.head.getAs[Long]("n_rows") == li.count())
  }

  test("q20_csv_roundtrip: the CSV round trip preserves the nation table") {
    val got = rows("q20_csv_roundtrip")
      .map(x => (x.getAs[Long]("n_nationkey"), x.getAs[String]("n_name"))).toSet
    val want = Tables.nation(spark, fx)
      .select(col("n_nationkey").cast("long"), col("n_name"))
      .as[(Long, String)].collect().toSet
    assert(got == want && got.size == 25)
  }

  test("q21_pivot: pivoted columns sum back to per-flag totals") {
    val r = rows("q21_pivot")
    val want = li.groupBy("l_returnflag")
      .agg(sum(d204("l_quantity")).cast("double").as("q"))
      .collect().map(x => x.getString(0) -> x.getDouble(1)).toMap
    assert(r.nonEmpty)
    r.foreach { x =>
      val f = Option(x.getAs[Double]("qty_f")).getOrElse(0.0)
      val o = Option(x.getAs[Double]("qty_o")).getOrElse(0.0)
      assert(math.abs(f + o - want(x.getAs[String]("l_returnflag"))) < 1e-6)
    }
  }

  test("q22_percentiles: quantiles are monotone per event type") {
    val r = rows("q22_percentiles")
    assert(r.nonEmpty)
    assert(r.forall(x => x.getAs[Double]("p50") <= x.getAs[Double]("p90")
      && x.getAs[Double]("p90") <= x.getAs[Double]("p99")))
  }

  test("q23_profile: profile row matches raw profile recompute") {
    val r = rows("q23_profile").head
    assert(r.getAs[Long]("n_rows") == li.count())
    assert(r.getAs[Long]("distinct_partkey") ==
      li.select("l_partkey").distinct().count())
    assert(r.getAs[Long]("null_returnflag") == 0)
    assert(r.getAs[Double]("min_qty") <= r.getAs[Double]("max_qty"))
  }

  test("q24_asof_join: one output row per click; click values match the raw event") {
    val r = rows("q24_asof_join")
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("event_id"), round(col("value"), 6).as("v"))
      .as[(Long, Double)].collect().toMap
    assert(r.size == clicks.size)
    assert(r.forall(x => clicks(x.getAs[Long]("event_id")) == x.getAs[Double]("click_value")))
  }

  test("q25_range_join: quantity bands partition every lineitem row") {
    val r = rows("q25_range_join")
    assert(r.map(_.getAs[Long]("n")).sum == li.count())
    assert(r.map(_.getAs[String]("band")).toSet.subsetOf(Set("low", "mid", "high")))
  }

  test("q26_salted_join: salted join equals the plain join aggregate") {
    val got = rows("q26_salted_join")
      .map(x => (x.getAs[String]("o_orderpriority"), x.getAs[Long]("n"), x.getAs[Double]("sum_qty")))
    val want = li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n"), sum(d204("l_quantity")).cast("double").as("s"))
      .orderBy("o_orderpriority")
      .as[(String, Long, Double)].collect().toVector
    assert(got == want)
  }

  test("q27_upsert: keyed merge — updated keys re-priced, others preserved") {
    val r = rows("q27_upsert")
    assert(r.size.toLong == ord.count())
    val keys = r.map(_.getAs[Long]("o_orderkey"))
    assert(keys.distinct.size == keys.size, "merge output must be key-unique")
    val base = ord.select(col("o_orderkey"), col("o_totalprice"))
      .as[(Long, Double)].collect().toMap
    val got = r.map(x => x.getAs[Long]("o_orderkey") -> x.getAs[Double]("o_totalprice")).toMap
    base.foreach { case (k, p) =>
      val want = if (p > 400000) BigDecimal(p * 1.1) else BigDecimal(p)
      assert(math.abs(got(k) - want.setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9)
    }
  }

  test("q28_cube: gid groups each conserve the global row count") {
    val r = rows("q28_cube")
    val byGid = r.groupBy(_.getAs[Long]("gid"))
    assert(byGid.keySet == Set(0L, 1L, 2L, 3L))
    for ((_, g) <- byGid)
      assert(g.map(_.getAs[Long]("n_rows")).sum == li.count())
  }

  test("q30_zorder: z-values interleave the key bits exactly") {
    val r = rows("q30_zorder")
    assert(r.nonEmpty)
    def interleave(x: Long, y: Long): Long =
      (0 until 20).map(i => (((x >> i) & 1L) << (2 * i)) | (((y >> i) & 1L) << (2 * i + 1))).sum
    assert(r.forall(x => x.getAs[Long]("zval") ==
      interleave(x.getAs[Long]("l_orderkey"), x.getAs[Long]("l_partkey"))))
    val zs = r.map(_.getAs[Long]("zval"))
    assert(zs == zs.sorted, "output must be z-ordered")
  }

  test("q31_bloom_join: bloom-pruned join equals the plain filtered join") {
    val got = rows("q31_bloom_join")
      .map(x => (x.getAs[String]("p_brand"), x.getAs[Long]("n_lines"), x.getAs[Double]("sum_qty")))
    val want = li.join(prt.filter(col("p_size") === 1), col("l_partkey") === col("p_partkey"))
      .groupBy("p_brand")
      .agg(count(lit(1)).as("n"), sum(d204("l_quantity")).cast("double").as("s"))
      .orderBy("p_brand").as[(String, Long, Double)].collect().toVector
    assert(got == want && got.nonEmpty)
  }

  test("q32_group_topk: per-language top-3 by chars, rank-dense and ordered") {
    val r = rows("q32_group_topk")
    val byLang = r.groupBy(_.getAs[String]("lang"))
    for ((lang, g) <- byLang) {
      assert(g.map(_.getAs[Int]("rk")) == (1 to g.size).toVector, lang)
      val chars = g.map(_.getAs[Long]("n_chars"))
      assert(chars == chars.sortBy(-_), lang)
      val maxChars = docs.filter(col("lang") === lang)
        .agg(org.apache.spark.sql.functions.max(col("n_chars").cast("long")))
        .collect()(0).getLong(0)
      assert(chars.head == maxChars, lang)
    }
  }

  test("q34_dpp_join: partition-pruned join equals the plain filtered join") {
    val got = rows("q34_dpp_join")
      .map(x => (x.getAs[String]("p_brand"), x.getAs[Long]("n_lines"), x.getAs[Double]("sum_qty")))
    val want = li.join(prt.filter(col("p_partkey") < 50), col("l_partkey") === col("p_partkey"))
      .groupBy("p_brand")
      .agg(count(lit(1)).as("n"), sum(d204("l_quantity")).cast("double").as("s"))
      .orderBy("p_brand").as[(String, Long, Double)].collect().toVector
    assert(got == want && got.nonEmpty)
  }

  test("q35_grouping_sets: exactly the two single-key subtotal sets, each conserving") {
    val r = rows("q35_grouping_sets")
    assert(r.forall(x => x.isNullAt(0) ^ x.isNullAt(1)),
      "each row must be exactly one of the two single-key sets")
    val flagRows = r.filter(!_.isNullAt(0))
    val statRows = r.filter(!_.isNullAt(1))
    assert(flagRows.map(_.getAs[Long]("n_rows")).sum == li.count())
    assert(statRows.map(_.getAs[Long]("n_rows")).sum == li.count())
  }

  test("q36_scd2: dense versions, interval chaining, exactly one open row per key") {
    val r = rows("q36_scd2")
    assert(r.size.toLong == ord.count())
    for ((k, g0) <- r.groupBy(_.getAs[Long]("o_custkey"))) {
      val g = g0.sortBy(_.getAs[Long]("version_n"))
      assert(g.map(_.getAs[Long]("version_n")) == (1L to g.size).toVector, s"cust $k")
      assert(g.count(_.getAs[Boolean]("is_current")) == 1, s"cust $k")
      assert(g.last.isNullAt(g.last.fieldIndex("valid_to")), s"cust $k")
      g.sliding(2).filter(_.size == 2).foreach { w =>
        val (a, b) = (w(0), w(1))
        assert(a.get(a.fieldIndex("valid_to")) == b.get(b.fieldIndex("valid_from")),
          s"cust $k chain break")
      }
    }
  }

  test("q37_kmv_distinct: exact distincts match raw; KMV estimate is in range") {
    val r = rows("q37_kmv_distinct")
    val want = ev.groupBy("event_type").agg(countDistinct("user_id").as("n"))
      .collect().map(x => x.getString(0) -> x.getLong(1)).toMap
    r.foreach { x =>
      val exact = x.getAs[Long]("n_exact")
      assert(exact == want(x.getAs[String]("event_type")))
      val est = micro(x, "kmv_est") / 1e6
      assert(est > 0.5 * exact && est < 2.0 * exact,
        s"${x.getAs[String]("event_type")}: est $est vs exact $exact")
    }
  }

  test("q42_topk_agg: per-type rank window is dense and value-ordered") {
    val r = rows("q42_topk_agg")
    for ((t, g0) <- r.groupBy(_.getAs[String]("event_type"))) {
      val g = g0.sortBy(_.getAs[Long]("rk"))
      assert(g.map(_.getAs[Long]("rk")) == (1L to g.size).toVector, t)
      val vs = g.map(_.getAs[Double]("sum_value"))
      assert(vs == vs.sortBy(-_), t)
    }
  }

  test("q43_snapshot_diff: change labels partition and carry the right NULL sides") {
    val r = rows("q43_snapshot_diff")
    assert(r.nonEmpty)
    r.foreach { x =>
      x.getAs[String]("change") match {
        case "added"   => assert(x.isNullAt(2) && !x.isNullAt(3))
        case "removed" => assert(!x.isNullAt(2) && x.isNullAt(3))
        case "changed" => assert(!x.isNullAt(2) && !x.isNullAt(3)
          && x.getAs[String]("old_status") != x.getAs[String]("new_status"))
        case other => fail(s"unexpected change label $other")
      }
    }
  }

  test("q44_json_roundtrip: JSON round trip preserves per-language doc stats") {
    val got = rows("q44_json_roundtrip")
      .map(x => (x.getAs[String]("lang"), x.getAs[Long]("n_docs"), x.getAs[Long]("n_chars")))
    val want = docs.groupBy("lang")
      .agg(count(lit(1)).as("n"), sum(col("n_chars").cast("long")).as("c"))
      .orderBy("lang").as[(String, Long, Long)].collect().toVector
    assert(got == want)
  }

  test("q45_orc_roundtrip: ORC round trip preserves the lineitem aggregate") {
    val got = rows("q45_orc_roundtrip")
      .map(x => (x.getAs[String]("l_linestatus"), x.getAs[Long]("n"), x.getAs[Double]("sum_qty")))
    val want = li.groupBy("l_linestatus")
      .agg(count(lit(1)).as("n"), sum(d204("l_quantity")).cast("double").as("s"))
      .orderBy("l_linestatus").as[(String, Long, Double)].collect().toVector
    assert(got == want)
  }

  test("q46_unpivot: long-form metrics match the wide recompute") {
    val r = rows("q46_unpivot")
    assert(r.map(_.getAs[String]("metric")).toSet ==
      Set("sum_qty", "sum_price", "sum_disc"))
    val wantQty = li.groupBy("l_returnflag")
      .agg(sum(d204("l_quantity")).cast("double"))
      .collect().map(x => x.getString(0) -> x.getDouble(1)).toMap
    r.filter(_.getAs[String]("metric") == "sum_qty").foreach { x =>
      assert(x.getAs[Double]("value") == wantQty(x.getAs[String]("l_returnflag")))
    }
  }

  test("q47_compaction_plan: offsets telescope and bins follow the 20k target") {
    val r = rows("q47_compaction_plan")
    var run = 0L
    r.foreach { x =>
      assert(x.getAs[Long]("start_offset") == run)
      assert(x.getAs[Long]("bin") == run / 20000)
      run += x.getAs[Long]("n_rows")
    }
    assert(run == ev.count())
  }

  test("q50_event_gaps: per-user gap sums telescope to last-minus-first timestamp") {
    val r = rows("q50_event_gaps")
    val want = ev.groupBy("user_id").agg(
        (unix_micros(max(col("ts"))) - unix_micros(min(col("ts")))).as("span"),
        count(lit(1)).as("n"))
      .collect().map(x => x.getLong(0) -> (x.getLong(1), x.getLong(2))).toMap
    assert(r.nonEmpty)
    r.foreach { x =>
      val (span, n) = want(x.getAs[Long]("user_id"))
      assert(x.getAs[Long]("sum_gap_us") == span)
      assert(x.getAs[Long]("n_events") == n)
      assert(x.getAs[Long]("max_gap_us") <= span)
    }
  }

  test("q53_hist_quantiles: bin quantiles are monotone with exact bounds") {
    val r = rows("q53_hist_quantiles")
    assert(r.map(micro(_, "q")) == Vector(500000L, 900000L, 990000L))
    val bins = r.map(_.getAs[Long]("bin"))
    assert(bins == bins.sorted)
    r.foreach { x =>
      assert(x.getAs[Double]("lo_bound") == x.getAs[Long]("bin") * 31.25)
      assert(x.getAs[Double]("hi_bound") == (x.getAs[Long]("bin") + 1) * 31.25)
    }
  }

  test("q54_missing_days: exactly the calendar gaps of the synthetically-holed day set") {
    val r = rows("q54_missing_days")
    // same synthetic hole as the query under test: day-of-month % 7 == 3
    // days are dropped, so they MUST come back as calendar gaps
    val present = ev.select(to_date(col("ts")).as("d")).distinct()
      .filter(dayofmonth(col("d")) % 7 =!= 3)
      .as[java.sql.Date].collect().map(_.toLocalDate).toSet
    val lo = present.min((a: java.time.LocalDate, b: java.time.LocalDate) => a.compareTo(b))
    val hi = present.max((a: java.time.LocalDate, b: java.time.LocalDate) => a.compareTo(b))
    val want = Iterator.iterate(lo)(_.plusDays(1)).takeWhile(!_.isAfter(hi))
      .filterNot(present.contains).filter(_.isAfter(lo)).toVector
    assert(r.map(_.getAs[java.sql.Date]("day").toLocalDate) == want)
    assert(r.forall(x => java.time.temporal.ChronoUnit.DAYS.between(
      lo, x.getAs[java.sql.Date]("day").toLocalDate) ==
      x.getAs[Long]("days_since_range_start")))
  }

  test("q55_trending: per-hour top-3 is rank-dense and count-ordered") {
    val r = rows("q55_trending")
    for ((h, g0) <- r.groupBy(_.get(0))) {
      val g = g0.sortBy(_.getAs[Long]("rk"))
      assert(g.map(_.getAs[Long]("rk")) == (1L to g.size).toVector, s"$h")
      val ns = g.map(_.getAs[Long]("n"))
      assert(ns == ns.sortBy(-_), s"$h")
      assert(g.size <= 3)
    }
  }

  test("q56_ab_lift: variant split conserves users; rates recompute from counts") {
    val r = rows("q56_ab_lift").head
    val users = ev.select("user_id").distinct().count()
    assert(r.getAs[Long]("n_a") + r.getAs[Long]("n_b") == users)
    def rate(conv: Long, n: Long): Long =
      BigDecimal(conv.toDouble / n).setScale(6, BigDecimal.RoundingMode.HALF_UP)
        .*(BigDecimal(1000000)).toLong
    assert(micro(r, "rate_a") == rate(r.getAs[Long]("conv_a"), r.getAs[Long]("n_a")))
    assert(micro(r, "rate_b") == rate(r.getAs[Long]("conv_b"), r.getAs[Long]("n_b")))
  }

  test("q57_volume_drift: drawdown is running-max minus cumulative deviation") {
    val r = rows("q57_volume_drift")
    assert(r.map(_.getAs[Long]("n")).sum == ev.count())
    var runMax = Long.MinValue
    r.foreach { x =>
      val c = micro(x, "cum_dev")
      runMax = math.max(runMax, c)
      assert(micro(x, "drawdown") == runMax - c)
    }
    // telescoping: the final cumulative deviation is bounded by the
    // 6-dp rounding of the mean times the number of days
    assert(math.abs(micro(r.last, "cum_dev")) <= r.size.toLong)
  }

  test("q58_fuzzy_join: every dirtied key resolves; exact self-match flagged correct") {
    val r = rows("q58_fuzzy_join")
    val want = cust.filter(col("c_custkey") % 10 === 0).count()
    assert(r.size.toLong == want)
    assert(r.forall(_.getAs[Long]("dist") >= 0))
    r.foreach { x =>
      if (micro(x, "correct") == 1000000L)
        assert(x.getAs[Long]("matched_key") == x.getAs[Long]("src_key"))
    }
  }

  test("q59_markov_transitions: row-stochastic transitions; count conservation") {
    val r = rows("q59_markov_transitions")
    val users = ev.select("user_id").distinct().count()
    assert(r.map(_.getAs[Long]("n")).sum == ev.count() - users,
      "each user contributes (events-1) transitions")
    for ((f, g) <- r.groupBy(_.getAs[String]("from_type")))
      assert(math.abs(g.map(micro(_, "p")).sum - 1000000L) <= g.size.toLong, f)
  }

  test("q61_bucketed_join: bucketed join equals the plain-join top-15") {
    val got = rows("q61_bucketed_join")
      .map(x => (x.getAs[Long]("o_custkey"), x.getAs[Long]("n_items"), x.getAs[Double]("sum_qty")))
    val want = ord.join(li, col("o_orderkey") === col("l_orderkey"))
      .groupBy("o_custkey")
      .agg(count(lit(1)).as("n"), sum(d204("l_quantity")).cast("double").as("s"))
      .orderBy(desc("s"), asc("o_custkey")).limit(15)
      .as[(Long, Long, Double)].collect().toVector
    assert(got == want)
  }

  test("q62_scd2_compress: segments chain, alternate states, and cover each user") {
    val r = rows("q62_scd2_compress")
    assert(r.nonEmpty)
    for ((u, g0) <- r.groupBy(_.getAs[Long]("user_id"))) {
      val g = g0.sortBy(_.getAs[Long]("seg_idx"))
      assert(g.map(_.getAs[Long]("seg_idx")) == (1L to g.size).toVector, s"user $u")
      assert(g.last.isNullAt(g.last.fieldIndex("valid_to_us")), s"user $u")
      g.sliding(2).filter(_.size == 2).foreach { w =>
        val (a, b) = (w(0), w(1))
        assert(a.getAs[Long]("valid_to_us") == b.getAs[Long]("valid_from_us"), s"user $u")
        assert(a.getAs[String]("state") != b.getAs[String]("state"),
          s"user $u: adjacent segments must change state")
      }
    }
  }

  test("q63_mad_outliers: outliers bounded; non-null values conserve") {
    val r = rows("q63_mad_outliers")
    assert(r.map(_.getAs[Long]("n")).sum == ev.filter(col("value").isNotNull).count())
    assert(r.forall(x => x.getAs[Double]("mad") >= 0
      && x.getAs[Long]("n_outliers") <= x.getAs[Long]("n")))
  }

  test("q66_kmv_setops: canonical source pairs with bounded Jaccard estimates") {
    val r = rows("q66_kmv_setops")
    val srcs = docs.select("source").distinct().count()
    assert(r.size.toLong == srcs * (srcs - 1) / 2)
    assert(r.forall(x => x.getAs[String]("sa") < x.getAs[String]("sb")))
    assert(r.forall(x => micro(x, "jaccard") >= 0 && micro(x, "jaccard") <= 1000000))
    assert(r.forall(x => micro(x, "jaccard_est") >= 0 && micro(x, "jaccard_est") <= 1000000))
    assert(r.forall(x => micro(x, "union_est") >= x.getAs[Long]("n_inter") * 1000000L))
  }

  test("q67_ntile: deciles balanced within one; cume_dist closes at 1 per priority") {
    val r = rows("q67_ntile")
    assert(r.size.toLong == ord.count())
    for ((p, g) <- r.groupBy(_.getAs[String]("o_orderpriority"))) {
      val sizes = g.groupBy(_.getAs[Int]("decile")).view.mapValues(_.size).values.toSeq
      assert(sizes.max - sizes.min <= 1, s"$p: ntile must balance within 1")
      assert(g.map(micro(_, "cume")).max == 1000000L, p)
      assert(g.forall(x => micro(x, "pct_rank") >= 0 && micro(x, "pct_rank") <= 1000000), p)
    }
  }

  test("q69_hll_windows: exact distincts match raw; HLL error stays bounded") {
    val r = rows("q69_hll_windows")
    val want = ev.groupBy(to_date(col("ts")).as("d"))
      .agg(countDistinct("user_id").as("n"))
      .collect().map(x => x.getDate(0).toString -> x.getLong(1)).toMap
    assert(r.nonEmpty)
    r.foreach { x =>
      assert(x.getAs[Long]("n_exact") == want(x.getAs[java.sql.Date]("day").toString))
      assert(micro(x, "rel_err") <= 250000L, "HLL relative error above 25%")
    }
  }

  test("q72_dq_audit: the clean TPC-H fixture has zero violations on every check") {
    val r = rows("q72_dq_audit")
    assert(r.size == 7)
    assert(r.forall(_.getAs[Long]("n_violations") == 0L),
      r.filter(_.getAs[Long]("n_violations") != 0L).mkString(","))
  }

  test("q78_bad_records: corrupt rows quarantined; total row conservation") {
    val r = rows("q78_bad_records")
    val corrupt = ev.filter(col("event_id") % 37 === 0).count()
    assert(r.filter(_.getAs[String]("kind") == "_corrupt")
      .map(_.getAs[Long]("n_rows")).sum == corrupt)
    assert(r.map(_.getAs[Long]("n_rows")).sum == ev.count())
  }

  test("q79_dynamic_overwrite: per-day counts match raw outside the overwritten partition") {
    val r = rows("q79_dynamic_overwrite")
    val raw = ev.groupBy(to_date(col("ts")).as("d")).count()
      .collect().map(x => x.getDate(0).toString -> x.getLong(1)).toMap
    assert(r.size == raw.size, "every day must survive the dynamic overwrite")
    val minDay = raw.keys.min
    r.foreach { x =>
      val d = x.getAs[java.sql.Date]("day").toString
      if (d != minDay) assert(x.getAs[Long]("n_rows") == raw(d), d)
      else assert(x.getAs[Long]("n_rows") <= raw(d), d)
    }
  }

  // ---- q96-q99: synthetic-partsupp TPC-H shapes. The cross-check is a
  // PURE-SCALA rebuild of the partsupp rule (fixture dims are tiny), so
  // the engine's explode/window/anti-join plans are checked against
  // straight-line loops that share no Spark code with them.

  private lazy val nSupp: Long =
    supp.agg(max("s_suppkey")).collect()(0).getLong(0) + 1
  /** (s_suppkey, cost_cents, availqty) per the synthPartsupp rule. */
  private def psOf(p: Long): Seq[(Long, Long, Long)] =
    (0 until 4).map { j =>
      val s = (p * 31 + 13 * j + 7) % nSupp
      (s, (p * 31 + s * 17) % 90000 + 10000, (p * 7 + s * 3) % 9999 + 1)
    }
  private lazy val suppNation: Map[Long, Int] = supp
    .collect().map(x => x.getAs[Long]("s_suppkey") -> x.getAs[Int]("s_nationkey")).toMap
  private lazy val nationRegion: Map[Int, String] = {
    val rn = Tables.region(spark, fx).collect()
      .map(x => x.getAs[Int]("r_regionkey") -> x.getAs[String]("r_name")).toMap
    Tables.nation(spark, fx).collect()
      .map(x => x.getAs[Int]("n_nationkey") -> rn(x.getAs[Int]("n_regionkey"))).toMap
  }
  private def supplierRegion(s: Long): String = nationRegion(suppNation(s))

  test("q96_min_cost_supplier: each winner is the true per-part EUROPE min (pure-Scala recompute)") {
    val r = rows("q96_min_cost_supplier")
    assert(r.nonEmpty)
    val bal = r.map(_.getAs[Double]("s_acctbal"))
    assert(bal == bal.sortBy(-_), "ordered by s_acctbal desc")
    val winners = r.map(x => x.getAs[Long]("p_partkey") ->
      math.round(x.getAs[Double]("supplycost") * 100)).toMap
    for ((p, cents) <- winners) {
      val euCosts = psOf(p).collect {
        case (s, c, _) if supplierRegion(s) == "EUROPE" => c
      }
      assert(euCosts.nonEmpty && euCosts.min == cents,
        s"part $p: engine min $cents vs recompute ${euCosts.minOption}")
    }
  }

  test("q97_important_stock: qualifying set and values match the pure-Scala recompute") {
    val r = rows("q97_important_stock")
    assert(r.nonEmpty)
    val partKeys = prt.select("p_partkey").collect().map(_.getLong(0))
    val v: Map[Long, BigInt] = partKeys.map { p =>
      p -> psOf(p).collect {
        case (s, c, q) if supplierRegion(s) == "ASIA" => BigInt(c) * q
      }.sum
    }.toMap.filter(_._2 > 0)
    val total = v.values.sum
    val n = v.size
    val want = v.filter { case (_, vc) => 5 * vc * n > 6 * total }
    assert(r.size == want.size, s"engine ${r.size} vs recompute ${want.size}")
    r.foreach { x =>
      val p = x.getAs[Long]("p_partkey")
      assert(want.contains(p), s"part $p not in recomputed set")
      assert(math.abs(x.getAs[Double]("value") - want(p).toDouble / 100) < 1e-6)
    }
  }

  test("q92_pricing_summary: full Q1 aggregates match an independent recompute") {
    val r = rows("q92_pricing_summary")
    assert(r.nonEmpty)
    val cut = li.filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
    // exact BigDecimal recompute per group for the three sums + count;
    // averages must equal sum/count of the same exact sums
    val raw = cut.select("l_returnflag", "l_linestatus", "l_quantity",
        "l_extendedprice", "l_discount", "l_tax").collect()
      .groupBy(x => (x.getString(0), x.getString(1)))
    r.foreach { x =>
      val key = (x.getAs[String]("l_returnflag"), x.getAs[String]("l_linestatus"))
      val g = raw(key)
      val n = g.length.toLong
      assert(x.getAs[Long]("count_order") == n, key.toString)
      def bd(v: Double, scale: Int) = BigDecimal(v).setScale(scale, BigDecimal.RoundingMode.HALF_UP)
      val sumQty = g.map(y => bd(y.getDouble(2), 4)).sum
      assert(math.abs(x.getAs[Double]("sum_qty") - sumQty.toDouble) < 1e-6)
      val sumCharge = g.map(y => bd(y.getDouble(3) * (1 - y.getDouble(4)) * (1 + y.getDouble(5)), 8)).sum
      assert(math.abs(x.getAs[Double]("sum_charge") - sumCharge.toDouble) < 1e-4, key.toString)
      assert(math.abs(x.getAs[Double]("avg_qty") - sumQty.toDouble / n) < 1e-9)
    }
    // the filtered row universe is conserved across groups
    assert(r.map(_.getAs[Long]("count_order")).sum == cut.count())
  }

  test("q93_revenue_change: full Q6 scalar matches the unfiltered-q6 recompute on the year slice") {
    val r = rows("q93_revenue_change")
    assert(r.size == 1)
    val slice = li.filter(
      col("l_shipdate") >= lit("1995-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1996-01-01").cast("timestamp") &&
        col("l_discount") >= 0.05 && col("l_discount") <= 0.07 &&
        col("l_quantity") < 24)
      .select("l_extendedprice", "l_discount").collect()
    assert(r.head.getAs[Long]("n_rows") == slice.length.toLong)
    val want = slice.map(y => BigDecimal(y.getDouble(0) * y.getDouble(1))
      .setScale(8, BigDecimal.RoundingMode.HALF_UP)).sum
    assert(math.abs(r.head.getAs[Double]("revenue") - want.toDouble) < 1e-4)
  }

  test("q98_supplier_cnt: distinct counts match the pure-Scala recompute; excluded suppliers absent") {
    val r = rows("q98_supplier_cnt")
    assert(r.nonEmpty)
    val ok: Set[Long] = supp.filter(col("s_acctbal") >= 100)
      .select("s_suppkey").collect().map(_.getLong(0)).toSet
    val sizes = Set(1, 4, 9, 16, 25, 36, 49)
    val want = prt.collect()
      .filter(x => x.getAs[String]("p_brand") != "Brand#9" &&
        x.getAs[String]("p_type") != "PROMO" &&
        sizes(x.getAs[Int]("p_size")))
      .flatMap { x =>
        psOf(x.getAs[Long]("p_partkey")).map(_._1).filter(ok).map(s =>
          (x.getAs[String]("p_brand"), x.getAs[String]("p_type"),
            x.getAs[Int]("p_size")) -> s)
      }.groupBy(_._1).view.mapValues(_.map(_._2).distinct.length.toLong).toMap
    assert(r.size == want.size)
    r.foreach { x =>
      val key = (x.getAs[String]("p_brand"), x.getAs[String]("p_type"),
        x.getAs[Int]("p_size"))
      assert(x.getAs[Long]("supplier_cnt") == want(key), key.toString)
    }
    val cnts = r.map(_.getAs[Long]("supplier_cnt"))
    assert(cnts == cnts.sortBy(-_), "ordered by supplier_cnt desc")
  }

  test("q99_promotion_suppliers: qualifying suppliers match the pure-Scala excess-stock recompute") {
    val r = rows("q99_promotion_suppliers")
    val shipped: Map[(Long, Long), BigDecimal] = li
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1997-01-01").cast("timestamp"))
      .select("l_partkey", "l_suppkey", "l_quantity").collect()
      .groupBy(x => (x.getLong(0), x.getLong(1)))
      .view.mapValues(_.map(x => BigDecimal(x.getDouble(2))).sum).toMap
    val smallParts = prt.filter(col("p_name").startsWith("small"))
      .select("p_partkey").collect().map(_.getLong(0))
    val wantSupp = smallParts.flatMap { p =>
      psOf(p).collect {
        case (s, _, q) if shipped.get((p, s)).exists(2 * BigDecimal(q) > _) => s
      }
    }.distinct.filter(s => supplierRegion(s) == "ASIA").toSet
    val names = supp.collect()
      .map(x => x.getAs[Long]("s_suppkey") -> x.getAs[String]("s_name")).toMap
    assert(r.map(_.getAs[String]("s_name")).toSet == wantSupp.map(names),
      s"engine ${r.map(_.getAs[String]("s_name"))} vs ${wantSupp.map(names)}")
    val ns = r.map(_.getAs[String]("s_name"))
    assert(ns == ns.sorted, "ordered by s_name")
  }

  test("q100_grouped_ols: slope/intercept/r2 match a pure-Scala moment recompute; r2 consistent with q40") {
    val r = rows("q100_grouped_ols")
    assert(r.nonEmpty)
    val raw = li.select("l_returnflag", "l_quantity", "l_extendedprice").collect()
      .groupBy(_.getString(0))
    r.foreach { row =>
      val g = raw(row.getAs[String]("l_returnflag"))
      val n = g.size.toDouble
      val xs = g.map(_.getDouble(1)); val ys = g.map(_.getDouble(2))
      // BigDecimal sums mirror the engine's exact decimal aggregates
      def bd(v: Double, s: Int) = BigDecimal(v).setScale(s, BigDecimal.RoundingMode.HALF_UP)
      val sx = xs.map(bd(_, 4)).sum.toDouble
      val sy = ys.map(bd(_, 4)).sum.toDouble
      val sxy = xs.zip(ys).map { case (a, b) => bd(a * b, 8) }.sum.toDouble
      val sxx = xs.map(a => bd(a * a, 8)).sum.toDouble
      val syy = ys.map(b => bd(b * b, 8)).sum.toDouble
      val cov = n * sxy - sx * sy
      val vx = n * sxx - sx * sx
      val vy = n * syy - sy * sy
      val slope = cov / vx
      assert(row.getAs[Long]("n") == g.size.toLong)
      assert(math.abs(micro(row, "slope") - math.round(slope * 1e6)) <= 1)
      assert(math.abs(micro(row, "intercept") -
        math.round((sy - slope * sx) / n * 1e6)) <= 1)
      assert(math.abs(micro(row, "r2") - math.round(cov * cov / (vx * vy) * 1e6)) <= 1)
      assert(micro(row, "r2") >= 0 && micro(row, "r2") <= 1000000)
    }
    // cross-query consistency: r2 = corr² against q40 on the same groups
    val corr = rows("q40_grouped_corr")
      .map(x => x.getAs[String]("l_returnflag") -> micro(x, "corr") / 1e6).toMap
    r.foreach { row =>
      val c = corr(row.getAs[String]("l_returnflag"))
      assert(math.abs(micro(row, "r2") / 1e6 - c * c) < 2e-6,
        s"${row.getAs[String]("l_returnflag")}: r2 vs corr²")
    }
  }

  test("q95_k_anonymity: group sizes match raw and the k=10 flag is exact") {
    val r = rows("q95_k_anonymity")
    val raw = cust.groupBy("c_nationkey", "c_mktsegment").count()
      .collect().map(x => (x.getInt(0), x.getString(1)) -> x.getLong(2)).toMap
    assert(r.size == raw.size)
    r.foreach { x =>
      val n = raw((x.getAs[Int]("nationkey"), x.getAs[String]("segment")))
      assert(x.getAs[Long]("n") == n)
      assert(x.getAs[Long]("violates_k") == (if (n < 10) 1L else 0L))
    }
  }
}
