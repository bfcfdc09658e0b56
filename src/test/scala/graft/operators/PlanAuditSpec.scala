package graft.operators

import graft.{SparkEntry, SparkSpec}

/** Plan-shape audits: lock in the physical-plan properties the engine's
  * 100 TB posture depends on (SCALE.md), so a regression that silently
  * drops a pushdown, a broadcast, or a TakeOrdered rewrite fails CI —
  * not just a bench run someone has to eyeball.
  *
  * Checks run against the Spark-planned (pre-AQE-execution) physical
  * plan; AQE can only improve on what's asserted here (it never
  * un-broadcasts a planned broadcast or un-pushes a scan filter).
  */
class PlanAuditSpec extends SparkSpec {

  private def plan(name: String): String = {
    // suites share one SparkSession per JVM; another suite's .cache()
    // of the same scan would substitute an InMemoryRelation into this
    // plan and hide the PushedFilters being audited — clear first so
    // the audits are suite-order-independent
    spark.catalog.clearCache()
    SparkEntry.queries(name)(spark, sf("sf0.001")).queryExecution.executedPlan.toString
  }

  test("q6_filter: predicates and projection push into the parquet scan") {
    val p = plan("q6_filter")
    assert(p.contains("PushedFilters: [IsNotNull"), "no filters pushed to scan")
    assert(p.contains("GreaterThanOrEqual(l_discount"), "discount lower bound not pushed")
    // the PushedFilters list truncates in toString — assert the quantity
    // bound on the scan's DataFilters instead
    assert("""\(l_quantity#\d+ < 24""".r.findFirstIn(p).isDefined,
      "quantity bound not in scan data filters")
    // column pruning: the scan must read only the 3 referenced columns
    val readSchema = p.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(!readSchema.contains("l_orderkey") && !readSchema.contains("l_shipdate"),
      s"scan reads unreferenced columns: $readSchema")
  }

  test("q1_agg: scan pruned to the 5 referenced columns, partial+final agg") {
    val p = plan("q1_agg")
    val readSchema = p.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(readSchema.contains("l_returnflag") && readSchema.contains("l_quantity"))
    assert(!readSchema.contains("l_shipdate") && !readSchema.contains("l_comment"),
      s"scan reads unreferenced columns: $readSchema")
    // map-side combine: partial and final HashAggregate stages
    assert("HashAggregate".r.findAllIn(p).size >= 2, "no partial aggregation")
  }

  test("q92_pricing_summary: cutoff pushed, scan pruned to the 6 referenced columns") {
    val p = plan("q92_pricing_summary")
    assert(p.contains("LessThanOrEqual(l_shipdate"),
      "shipdate cutoff not pushed to the scan:\n" + p.take(800))
    val readSchema = p.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(readSchema.contains("l_tax") && readSchema.contains("l_discount"))
    assert(!readSchema.contains("l_orderkey") && !readSchema.contains("l_partkey"),
      s"scan reads unreferenced columns: $readSchema")
    assert("HashAggregate".r.findAllIn(p).size >= 2, "no partial aggregation")
  }

  test("q93_revenue_change: all three predicates pushed, 2-column read schema") {
    val p = plan("q93_revenue_change")
    // the PushedFilters list truncates in toString — assert on the scan's
    // data-filter expressions instead (the q6 audit's technique)
    assert("""l_shipdate#\d+ >= 1995-01-01""".r.findFirstIn(p).isDefined,
      "year lower bound not in scan data filters:\n" + p.take(800))
    assert("""l_shipdate#\d+ < 1996-01-01""".r.findFirstIn(p).isDefined,
      "year upper bound not in scan data filters")
    assert("""l_discount#\d+ >= 0.05""".r.findFirstIn(p).isDefined,
      "discount band not in scan data filters")
    assert(p.contains("PushedFilters: [IsNotNull"), "no filters pushed to the scan")
    val readSchema = p.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    // only the two aggregated columns plus the three filter columns may
    // be read; the wide remainder of lineitem must be pruned
    assert(!readSchema.contains("l_orderkey") && !readSchema.contains("l_returnflag"),
      s"scan reads unreferenced columns: $readSchema")
  }

  test("q2_topk: orderBy+limit plans as TakeOrderedAndProject, not a global sort") {
    val p = plan("q2_topk")
    assert(p.contains("TakeOrderedAndProject"), p.take(500))
  }

  test("q4_broadcast_join: dimension side is broadcast, filtered before exchange") {
    val p = plan("q4_broadcast_join")
    assert(p.contains("BroadcastHashJoin"), p.take(500))
    assert(p.contains("BroadcastExchange"))
    // the p_size filter must sit below the broadcast exchange (build side
    // shrinks before shipping) — i.e. pushed into the part scan
    assert(p.contains("LessThanOrEqual(p_size,10)"), "dim filter not pushed to scan")
  }

  test("q3_join_agg: explicit broadcast hint on the nation dim is honored") {
    val p = plan("q3_join_agg")
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 1, p.take(500))
  }

  test("s1_knn_brute: single-row query side broadcast; no cartesian shuffle") {
    val p = plan("s1_knn_brute")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"), p.take(500))
    assert(!p.contains("CartesianProduct"), "query row not broadcast — cartesian shuffle")
    assert(p.contains("TakeOrderedAndProject"), "top-k not TakeOrdered")
  }

  test("x8_pii_scrub: pure scan expressions — no shuffle except the final sort") {
    val p = plan("x8_pii_scrub")
    // the redaction itself must not aggregate or join; the only exchange
    // allowed is the rangepartitioning for the deterministic orderBy
    assert(!p.contains("HashAggregate"), "pii scrub introduced an aggregate")
    assert(!p.contains("Join"), "pii scrub introduced a join")
    val exchanges = "Exchange".r.findAllIn(p).size
    assert(exchanges <= 1, s"expected at most the sort exchange, got $exchanges:\n${p.take(500)}")
  }

  test("x7_repetition: doc-keyed aggregates carry map-side partial combine") {
    val p = plan("x7_repetition")
    assert("HashAggregate".r.findAllIn(p).size >= 2, "no partial aggregation")
    assert(!p.contains("CartesianProduct"))
  }

  test("m8_w2v_knn: query row broadcast, top-k as TakeOrdered") {
    val df = graft.ml.Embed.w2vKnn(
      graft.ml.Embed.word2vecPersist(spark, sf("sf0.001"), tag = "m8audit"), 0L)
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"), p.take(500))
    assert(!p.contains("CartesianProduct"), "query row not broadcast")
    assert(p.contains("TakeOrderedAndProject"), "top-k not TakeOrdered")
  }

  test("q29_partition_prune: lang filter prunes partitions, not rows") {
    val p = plan("q29_partition_prune")
    assert(p.contains("PartitionFilters"), "no partition filters on the scan")
    assert("""PartitionFilters: \[[^\]]*lang""".r.findFirstIn(p).isDefined,
      "lang filter not applied at partition level:\n" + p.take(800))
    // the partition column must NOT appear as a row-level data filter
    assert(!"""PushedFilters: \[[^\]]*lang""".r.findFirstIn(p).isDefined,
      "lang leaked into row-level pushed filters")
  }

  test("x9_stratified_sample: per-stratum thresholds join as broadcast") {
    // the threshold frame is |strata| rows — a shuffle join here would
    // shuffle the full corpus against a handful of rows
    val p = plan("x9_stratified_sample")
    assert(p.contains("BroadcastHashJoin"), p.take(800))
    assert(!p.contains("SortMergeJoin"), "threshold join fell back to SMJ")
  }

  test("d9_decontaminate: eval overlap is a semi-join, no cartesian shape") {
    val p = plan("d9_decontaminate")
    assert(p.contains("LeftSemi"), "train-vocab membership not a semi-join:\n" + p.take(800))
    assert(!p.contains("CartesianProduct"), "decontamination must never cross-join")
  }

  test("s7_ann_batch: query batch broadcast, window partitioned by qid") {
    val p = plan("s7_ann_batch")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"),
      "query batch not broadcast")
    assert(!p.contains("CartesianProduct"), "corpus×queries planned as cartesian shuffle")
    // per-query top-k: the window must partition by qid (no global sort
    // of all scored rows)
    assert("""windowspecdefinition\(qid""".r.findFirstIn(p.toLowerCase).isDefined ||
      p.contains("PartitionBy: [qid"), s"window not partitioned by qid:\n${p.take(600)}")
  }

  test("x13_bpe_merges: both aggregates carry map-side partial combine") {
    val p = plan("x13_bpe_merges")
    // vocab build and pair count are partial+final hash aggregates —
    // only (word, count) / (pair, partial-sum) rows reach each shuffle
    assert("HashAggregate".r.findAllIn(p).size >= 4,
      "expected partial+final aggregate pairs for vocab and pair counts")
    assert(p.contains("TakeOrderedAndProject"), "top-k not TakeOrdered")
  }

  test("q33_incremental_rollup: two-level aggregation, no raw rescan at merge") {
    val p = plan("q33_incremental_rollup")
    // exactly one parquet scan: the monthly merge reads the daily
    // aggregate, never the raw events again
    assert("Scan parquet".r.findAllIn(p).size == 1,
      "monthly merge rescans raw events")
    assert("HashAggregate".r.findAllIn(p).size >= 4,
      "expected daily and monthly partial+final aggregates")
  }

  test("q38_heavy_hitters: candidate set and total broadcast; no cartesian") {
    val p = plan("q38_heavy_hitters")
    // pass 2's candidate join must be a broadcast (candidates ≤ c rows)
    assert(p.contains("BroadcastHashJoin"), p.take(500))
    assert(!p.contains("CartesianProduct"),
      "1-row total not broadcast — cartesian shuffle")
  }

  test("st9_enriched_segments: dim side broadcast, rollup partial-aggregated") {
    val p = plan("st9_enriched_segments")
    assert(p.contains("BroadcastHashJoin"), "customer dim not broadcast")
    assert("HashAggregate".r.findAllIn(p).size >= 2, "no map-side combine")
  }

  test("s9_centroid_assign: centroids broadcast; argmin is a per-vector window") {
    val p = plan("s9_centroid_assign")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"),
      "centroid frame not broadcast")
    assert(!p.contains("CartesianProduct"), "centroid join became a cartesian shuffle")
    assert(p.contains("Window"), "argmin lost its rank window")
  }

  test("q39_rolling_window: frame is partitioned by user — no global sort before it") {
    val p = plan("q39_rolling_window")
    assert(p.contains("Window"), p.take(500))
    // the window's required ordering sorts WITHIN user partitions
    // (hashpartitioning on user_id), never a range partition of all rows
    val windowSection = p.substring(p.indexOf("Window"))
    assert(windowSection.contains("hashpartitioning(user_id"),
      "rolling window not hash-partitioned by user")
  }

  test("q41_correlated_subquery: scalar subqueries decorrelate to joins") {
    val p = plan("q41_correlated_subquery")
    assert(!p.contains("CartesianProduct"), "subquery not decorrelated")
    // both correlated aggregates become plain aggregate+join
    assert("HashAggregate".r.findAllIn(p).size >= 2, p.take(500))
  }

  test("q48_interval_merge: both windows hash-partition by supplier") {
    val p = plan("q48_interval_merge")
    assert(p.contains("Window"), p.take(500))
    // every Window operator must partition by supp — no global-order
    // window anywhere in the island computation
    val sections = p.split("Window").drop(1)
    assert(sections.nonEmpty)
    assert(p.contains("hashpartitioning(supp"),
      "island windows not hash-partitioned by supplier")
    // the only range partition allowed is the final orderBy(supp) — the
    // interval columns themselves must never drive a global sort
    assert("""rangepartitioning\((s|e)#""".r.findFirstIn(p).isEmpty,
      "global sort on interval columns leaked into windows")
  }

  test("q49_histogram: one partial-combined aggregate; window sees only bins") {
    val p = plan("q49_histogram")
    // map-side combine on the scan aggregate
    assert("HashAggregate".r.findAllIn(p).size >= 2, p.take(500))
    // the total is broadcast, not recomputed per row
    assert(p.contains("BroadcastExchange") || p.contains("BroadcastNestedLoopJoin"),
      "histogram total not broadcast")
    val readSchema = p.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(!readSchema.contains("props") && !readSchema.contains("event_type"),
      s"scan reads unreferenced columns: $readSchema")
  }

  test("g10_clustering_coeff: coefficient join is |V|-sized — no corpus rescan") {
    val p = plan("g10_clustering_coeff")
    // triangle frame arrives memoized (scan of an in-memory checkpoint),
    // so the only parquet scan feeding this plan is the edge memo — the
    // orders table itself must not be re-read
    assert(!p.contains("Relation [o_orderkey") && !p.contains("orders.parquet"),
      "clustering coeff re-scans the orders table")
  }

  test("q51_funnel: stage joins are equi-joins; summary frames broadcast") {
    val p = plan("q51_funnel")
    assert(!p.contains("CartesianProduct"), "funnel stage became a cartesian")
    // the three 1-row stage counts combine via broadcast, and every
    // stage join is a hash/merge equi-join on user_id
    assert(p.contains("BroadcastExchange"), p.take(500))
    assert("HashAggregate".r.findAllIn(p).size >= 4, "stage aggregates missing")
  }

  test("q52_retention: cohort join keyed on user_id, no cartesian") {
    val p = plan("q52_retention")
    assert(!p.contains("CartesianProduct"))
    assert(p.contains("user_id"), p.take(300))
    // the (user, day) distinct and the cohort min-day both partial-aggregate
    assert("HashAggregate".r.findAllIn(p).size >= 2, p.take(500))
  }

  test("d14_incremental_ingest: corpus side joins as hashes, text never shuffles") {
    val p = plan("d14_incremental_ingest")
    // every Exchange must carry only hash/id columns — the text column
    // dies at the scan projections
    val exchanges = p.linesIterator.filter(_.contains("Exchange hashpartitioning")).toList
    assert(exchanges.nonEmpty)
    exchanges.foreach(e => assert(!e.contains("text#"), s"text shuffled: $e"))
  }

  test("q60_event_paths: both leads share ONE window sort; top-k is TakeOrdered") {
    val p = plan("q60_event_paths")
    // the two lead() columns use the same window spec → a single Window
    // node over a single per-user sort (two would double the sort cost)
    assert("RunningWindowFunction|Window".r.findAllIn(p).size >= 1)
    assert("""Sort \[user_id""".r.findAllIn(p).size <= 1,
      "per-user sort duplicated across window nodes")
    assert(p.contains("TakeOrderedAndProject"), p.take(500))
  }

  test("s13_hard_negatives: query batch broadcast; label filter, no cartesian shuffle") {
    val p = plan("s13_hard_negatives")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"),
      p.take(500))
    assert(!p.contains("CartesianProduct"), "corpus×query became a shuffle cartesian")
    // the label-inequality predicate rides the join (filters before any
    // window/shuffle), so same-label rows never reach the rank window
    assert(p.contains("NOT (label"), "label filter missing from the join stage")
  }

  test("g12_covisitation: cap window below the join; registry serves the memo") {
    // cold-path builders (the registered query reads the Materialized
    // checkpoint, which severs lineage — audit the pieces instead)
    val events = graft.sources.Tables.events(spark, sf("sf0.001"))
    val kept = graft.graph.Graph.covisitKeptFrom(events, cap = 16)
    val kp = kept.queryExecution.executedPlan.toString
    assert(kp.contains("Window") && kp.contains("row_number"),
      "per-user cap window missing")
    assert("""rk#\d+ <= 16""".r.findFirstIn(kp).isDefined, "cap filter missing")
    val pairs = graft.graph.Graph.covisitPairsFrom(kept.localCheckpoint(true))
    val pp = pairs.queryExecution.executedPlan.toString
    assert(!pp.contains("CartesianProduct"), "pair join degenerated to cartesian")
    assert(pp.linesIterator.count(_.contains("Scan ExistingRDD")) >= 2,
      "pair join does not consume the capped checkpoint")
    // the registered query itself is the memoized frame + TakeOrdered
    val p = plan("g12_covisitation")
    assert(p.contains("TakeOrderedAndProject"), "top-k fell back to a global sort")
  }

  test("x19_rag_chunks: chunk generation is shuffle-free below the output sort") {
    val p = plan("x19_rag_chunks")
    // tokenize → explode → slice/md5 are per-row projections; the ONLY
    // exchange allowed is the final presentation orderBy
    val exchanges = p.linesIterator.filter(_.contains("Exchange")).toList
    assert(exchanges.forall(_.contains("rangepartitioning")),
      s"unexpected shuffle in chunker: $exchanges")
    assert(p.contains("Generate explode"), p.take(500))
  }

  test("q1_agg: scan→partial-agg pipeline runs inside whole-stage codegen") {
    // codegen stages exist only in the AQE FINAL plan — execute first
    val df = SparkEntry.queries("q1_agg")(spark, sf("sf0.001"))
    df.collect()
    val p = df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    // formatted explain marks codegen'd operators with `[codegen id : N]`
    assert(p.contains("codegen id"), p.take(800))
    // both the scan-side partial and the final aggregate must be codegen'd
    assert("""\* HashAggregate""".r.findAllIn(p).size >= 2, p.take(800))
  }

  test("t4_bm25: query-term set broadcast; top-k is TakeOrdered, no global sort") {
    val p = plan("t4_bm25")
    assert(p.contains("BroadcastHashJoin"), "query terms not broadcast")
    assert(p.contains("TakeOrderedAndProject"), "top-k planned as a global sort")
  }

  test("t5_phrase_search: pruned postings join as broadcast, agg partial-combines") {
    // the two-term isin prune runs inside the localCheckpoint build (it
    // IS the point: only those postings are materialized), so the final
    // plan's join inputs are the tiny checkpointed frames — which must
    // therefore plan as a broadcast hash join with a partial-combined
    // count, never a shuffle join over position rows
    val p = plan("t5_phrase_search")
    assert(p.contains("BroadcastHashJoin"), "phrase join not broadcast:\n" + p.take(600))
    assert(p.contains("partial_count"), "hit count lacks map-side combine")
    assert(!p.contains("CartesianProduct"))
  }

  test("d17_prefix_join: verify joins keyed on doc ids — no cartesian anywhere") {
    // the prefix ranking window runs inside the localCheckpoint build;
    // the visible plan is candidate-distinct + two verify joins, which
    // must all be equi-joins
    val df = graft.dedup.Dedup.prefixFilterPairs(
      graft.dedup.Dedup.shingleBase(spark, sf("sf0.001")))
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct"), "candidate join degenerated to cartesian")
    assert(p.contains("HashJoin") || p.contains("SortMergeJoin"),
      "verify joins missing:\n" + p.take(600))
  }

  test("g14_hits: per-round normalizer is a broadcast, not a shuffle or cartesian") {
    // audit one un-checkpointed half-step: the raw-sum frame crossJoined
    // with its broadcast 1-row total (what hits() builds every round)
    import org.apache.spark.sql.functions._
    val e = graft.graph.Graph.cachedEdges(spark, sf("sf0.001"))
    val hub = graft.graph.Graph.vertices(e).select(col("id"), lit(1.0).as("hub"))
    val araw = e.join(hub, e("src") === hub("id"))
      .groupBy("dst").agg(sum("hub").as("araw"))
    val p = araw.crossJoin(broadcast(araw.agg(sum("araw").as("s"))))
      .queryExecution.executedPlan.toString
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"),
      "normalizer not broadcast:\n" + p.take(600))
    assert(!p.contains("CartesianProduct"), "normalizer crossJoin planned as cartesian")
  }

  test("x21_cdc_chunks: chunk-id window partitions by doc_id — no global sort") {
    val p = plan("x21_cdc_chunks")
    assert("""windowspecdefinition\(doc_id""".r.findFirstIn(p).isDefined,
      "running-sum window not doc-partitioned:\n" + p.take(800))
  }

  test("q64_hll_distinct: ONE corpus scan — regs and exact count share the distinct") {
    val p = plan("q64_hll_distinct")
    assert("Scan parquet|FileScan".r.findAllIn(p).size == 1,
      "q64 rescans lineitem (exact count must derive from the same distinct):\n" +
        p.take(800))
    // the md5 runs through the single-digest kernel, not the 8-reference
    // hex-digit Column formulation
    assert(p.contains("graft_md5_hash32") || p.toLowerCase.contains("md5hash32"),
      "hash not via the Md5Hash32 kernel:\n" + p.take(800))
  }

  test("q65_cms_freq: sketch+probe phases never rescan the corpus") {
    // wordCounts is an eager localCheckpoint: everything downstream —
    // counters, top-k, probes — must read the vocab-sized checkpoint,
    // not documents.parquet (sketch hashing is O(vocab), not O(corpus))
    val p = plan("q65_cms_freq")
    assert(!("Scan parquet|FileScan".r.findFirstIn(p).isDefined),
      "q65 downstream phase rescans the corpus:\n" + p.take(800))
  }

  test("s2_ann_lsh: bucketing runs through the generated-weights kernel — no literal planes") {
    val p = plan("s2_ann_lsh")
    assert(p.toLowerCase.contains("lshbucketsexact"),
      "LSH buckets not via LshBucketsExact:\n" + p.take(800))
    // the old formulation inlined l·p 64-double literal arrays (~1500
    // nodes, ~4 s one-time codegen); the kernel plan must stay compact
    assert(!p.contains("0.25,"), "literal plane arrays back in the plan")
  }

  test("s17_filtered_ann: label predicate pushes into the parquet scan") {
    val p = plan("s17_filtered_ann")
    // pre-filtering is the operator's whole point: the scan must carry
    // the label pushdown so candidates shrink before any vector math
    assert(p.contains("EqualTo(label,3)"), "label filter not pushed to scan:\n" + p.take(800))
    assert(p.contains("TakeOrderedAndProject"), "top-k not TakeOrdered")
    assert(!p.contains("CartesianProduct"), "query row not broadcast")
  }

  test("g17_adamic_adar: candidate exclusion is a broadcast anti-join, top-k TakeOrdered") {
    val p = plan("g17_adamic_adar")
    assert(p.contains("LeftAnti"), "existing-edge exclusion not an anti-join:\n" + p.take(500))
    assert(p.contains("TakeOrderedAndProject"), "top-k not TakeOrdered")
  }

  test("q68_forward_fill: one user-keyed exchange feeds the running window") {
    val p = plan("q68_forward_fill")
    // window partitioned by user_id: exactly one hash exchange for the
    // fill + one range exchange for the deterministic output order
    val hashEx = "hashpartitioning\\(user_id".r.findAllIn(p).size
    assert(hashEx >= 1, "fill window not hash-partitioned by user_id:\n" + p.take(500))
    assert("Exchange".r.findAllIn(p).size <= 2,
      "extra shuffles beyond the window + output sort:\n" + p.take(800))
  }

  test("d20_threshold_curve: threshold side broadcasts — no pair-list shuffle join") {
    val p = plan("d20_threshold_curve")
    assert(p.contains("BroadcastNestedLoopJoin"),
      "threshold grid not a broadcast nested-loop:\n" + p.take(500))
  }

  test("q70_regional_revenue: dims broadcast, region/segment filters below the exchanges") {
    val p = plan("q70_regional_revenue")
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 2,
      "nation/region dims not broadcast:\n" + p.take(800))
    // region filter pushes into the region scan, pruning before broadcast
    assert(p.contains("EqualTo(r_name,ASIA)"), "region filter not pushed to scan")
  }

  test("q71_shipping_priority: segment filter pushed, top-10 is TakeOrdered") {
    val p = plan("q71_shipping_priority")
    assert(p.contains("EqualTo(c_mktsegment,BUILDING)"),
      "segment filter not pushed to the customer scan:\n" + p.take(800))
    assert(p.contains("TakeOrderedAndProject"), "top-10 not TakeOrdered")
  }

  test("q73_big_orders: qualifying keys broadcast into a semi-join below the detail joins") {
    val p = plan("q73_big_orders")
    assert(p.contains("BroadcastHashJoin") && p.contains("LeftSemi"),
      "qualifying-key set not a broadcast semi-join:\n" + p.take(800))
    assert(p.contains("TakeOrderedAndProject"), "top-100 not TakeOrdered")
  }

  test("d21_near_dup_ingest: candidate join consumes the PERSISTED band index") {
    val p = plan("d21_near_dup_ingest")
    // the between-runs artifact story is real only if the plan scans the
    // read-back parquet, not the in-session frame it was derived from
    assert(p.contains("d21_bands"), "band index not read back from the artifact store")
    assert(p.contains("d21_sets"), "verify artifact not read back from the artifact store")
  }

  test("d22_fuzzy_match: levenshtein appears ONCE — census filter stays behind the barrier") {
    val p = plan("d22_fuzzy_match")
    // without the checkpoint barrier the optimizer pushes the distance
    // filter into the join condition → 3 evals per candidate row
    // (measured 11.1 vs 2.9 s at sf0.1); the final plan is the filter
    // over the checkpointed census, no levenshtein anywhere
    assert(!p.contains("levenshtein"),
      "distance filter escaped the aggregate barrier back into the join:\n" + p.take(800))
    assert(p.contains("ExistingRDD"), "census not served from the checkpoint barrier")
  }

  test("q74_returned_revenue: returnflag pushed to the lineitem scan, top-20 TakeOrdered") {
    val p = plan("q74_returned_revenue")
    assert(p.contains("EqualTo(l_returnflag,R)"),
      "returnflag filter not pushed to scan:\n" + p.take(800))
    assert(p.contains("TakeOrderedAndProject"), "top-20 not TakeOrdered")
    assert(p.contains("BroadcastHashJoin"), "nation dim not broadcast")
  }

  test("q75_volume_shipping: ship-date RANGE pushed to scan, nation dims broadcast") {
    val p = plan("q75_volume_shipping")
    // the range form pushes into parquet; a year() wrapper would not
    assert(p.contains("GreaterThanOrEqual(l_shipdate"),
      "ship-date lower bound not pushed to the lineitem scan:\n" + p.take(800))
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 2,
      "nation dims not broadcast on both the supplier and customer side")
    assert(!p.contains("CartesianProduct"), "cartesian in the pair filter")
  }

  test("q77_market_share: both fact-reducing filters pushed, snowflake dims broadcast") {
    val p = plan("q77_market_share")
    assert(p.contains("EqualTo(p_type,STANDARD)"),
      "part-type filter not pushed to the part scan:\n" + p.take(800))
    assert(p.contains("GreaterThanOrEqual(o_orderdate"),
      "order-date range not pushed to the orders scan")
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 2,
      "nation/region snowflake not broadcast on both sides")
    assert(!p.contains("CartesianProduct"))
  }

  test("s19_ann_twostage: no cartesian anywhere; shortlist and LUT broadcast") {
    val p = plan("s19_ann_twostage")
    assert(!p.contains("CartesianProduct"),
      "cartesian in the two-stage pipeline:\n" + p.take(800))
    // the ADC lookup table and the shortlist both ride broadcast joins —
    // corpus-side rows never shuffle for the scoring or the re-rank
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 2,
      "LUT/shortlist joins not broadcast")
    assert(p.contains("TakeOrderedAndProject"), "top-k not TakeOrdered")
  }

  test("q80_priority_class: ship-date range pushed, orders pruned to 2 columns") {
    val p = plan("q80_priority_class")
    assert(p.contains("GreaterThanOrEqual(l_shipdate"),
      "ship window not pushed to the lineitem scan:\n" + p.take(800))
    val ordersSchema = p.linesIterator
      .filter(_.contains("ReadSchema")).find(_.contains("o_orderpriority")).getOrElse("")
    assert(ordersSchema.nonEmpty && !ordersSchema.contains("o_totalprice"),
      s"orders scan reads unreferenced columns: $ordersSchema")
  }

  test("q81_custdist: priority filter pushed below the outer join, join stays LEFT OUTER") {
    val p = plan("q81_custdist")
    assert(p.contains("EqualTo(o_orderpriority,1-URGENT)") ||
      p.contains("Not(EqualTo(o_orderpriority,1-URGENT))"),
      "priority filter not pushed to the orders scan:\n" + p.take(800))
    assert(p.contains("LeftOuter"),
      "outer join lost — zero-order customers would drop")
  }

  test("q82_small_qty_revenue: brand part set and per-part thresholds broadcast") {
    val p = plan("q82_small_qty_revenue")
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 1,
      "threshold join not broadcast:\n" + p.take(800))
    // the brand-pruned lineitem slice is served from the checkpoint
    // barrier (it feeds the threshold aggregate AND the probe); the
    // brand pushdown happened in the checkpoint-producing job
    assert(p.contains("ExistingRDD"), "probe not served from the checkpoint barrier")
    assert(!p.contains("CartesianProduct"))
  }

  test("q83_sole_late_supplier: supplier dim broadcast, top-10 TakeOrdered, no cartesian") {
    val p = plan("q83_sole_late_supplier")
    assert(p.contains("TakeOrderedAndProject"), "top-10 not TakeOrdered:\n" + p.take(800))
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 1, "supplier dim not broadcast")
    assert(!p.contains("CartesianProduct"))
  }

  test("q84_idle_rich_customers: date-pruned anti join, threshold broadcast") {
    val p = plan("q84_idle_rich_customers")
    assert(p.contains("LeftAnti"), "inactivity test not an anti join:\n" + p.take(800))
    assert(p.contains("GreaterThanOrEqual(o_orderdate"),
      "recency filter not pushed to the orders scan")
    assert(!p.contains("CartesianProduct") || p.contains("BroadcastNestedLoopJoin"),
      "threshold scalar not broadcast")
  }

  test("q85_top_supplier: one lineitem scan (checkpoint barrier), max + dim broadcast") {
    val p = plan("q85_top_supplier")
    // the revenue view feeds the max aggregate AND the equality filter
    // from ONE localCheckpoint — a second lineitem FileScan would mean
    // the window is being paid twice
    assert(p.contains("ExistingRDD"), "revenue view not served from the checkpoint barrier")
    assert(!p.contains("lineitem.parquet"), "lineitem rescanned past the checkpoint:\n" + p.take(800))
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 2,
      "max scalar / supplier dim not broadcast:\n" + p.take(800))
    assert(!p.contains("CartesianProduct"))
    val suppSchema = p.linesIterator
      .filter(_.contains("ReadSchema")).find(_.contains("s_name")).getOrElse("")
    assert(suppSchema.nonEmpty && !suppSchema.contains("s_acctbal"),
      s"supplier scan reads unreferenced columns: $suppSchema")
  }

  test("q86_disjunctive_revenue: side-local disjunctions extracted to both scans") {
    val p = plan("q86_disjunctive_revenue")
    // Catalyst's DNF extraction must split the single mixed OR-of-ANDs
    // predicate: quantity branches down to the lineitem scan...
    assert(p.contains("Or(Or(And(GreaterThanOrEqual(l_quantity"),
      "quantity OR-chain not pushed to the lineitem scan:\n" + p.take(1200))
    // ...and brand/size branches into the broadcast build side
    assert(p.contains("Or(Or(And(EqualTo(p_brand"),
      "brand/size OR-chain not pushed to the part scan:\n" + p.take(1200))
    assert(p.contains("BroadcastHashJoin"), "part side not broadcast")
    assert(!p.contains("CartesianProduct"))
  }

  test("t11_rm3_search: weighted pass broadcast-joined, top-k TakeOrdered, no cartesian") {
    val p = plan("t11_rm3_search")
    // the second-pass postings probe, cf, weights and stats frames all
    // ride broadcasts — corpus rows never shuffle for the scoring
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 3,
      "second-pass joins not broadcast:\n" + p.take(800))
    assert(p.contains("TakeOrderedAndProject"), "final top-k not TakeOrdered")
    assert(!p.contains("CartesianProduct"))
  }

  test("q87_nation_profit: name filter pushed to part scan, three dims broadcast") {
    val p = plan("q87_nation_profit")
    // the LIKE filter must shrink the part build BELOW the exchange
    assert(p.contains("StringContains(p_name,bolt)") || p.contains("Contains(p_name"),
      "name filter not pushed to the part scan:\n" + p.take(1000))
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 3,
      "part/supplier/nation dims not all broadcast")
    assert(!p.contains("CartesianProduct"))
  }

  test("q88_user_ewma: both windows and the aggregate share ONE user_id exchange") {
    val p = plan("q88_user_ewma")
    // the count window, row_number window, and groupBy all key on
    // user_id — Catalyst must reuse a single hash exchange (the final
    // orderBy's rangepartitioning is the only other shuffle)
    assert("Exchange hashpartitioning".r.findAllIn(p).size == 1,
      "expected exactly one hash exchange:\n" + p.take(1200))
    assert("Exchange".r.findAllIn(p).size <= 2, "unexpected extra shuffle")
    assert(!p.contains("CartesianProduct"))
  }

  test("q89_big_qty_orders: qualifying orders broadcast into both joins, top-k TakeOrdered") {
    val p = plan("q89_big_qty_orders")
    // the filtered per-order roll-up (metadata-sized) must be the build
    // side against orders, and the joined selection the build side
    // against customer — never the reverse
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 2,
      "aggregate-then-broadcast shape lost:\n" + p.take(1000))
    assert(p.contains("TakeOrderedAndProject"), "final top-k not TakeOrdered")
    assert(!p.contains("CartesianProduct"))
  }

  test("q90_returned_ranking: flag and date filters pushed to the scans") {
    val p = plan("q90_returned_ranking")
    assert(p.contains("EqualTo(l_returnflag,R)"),
      "returnflag not pushed to the lineitem scan:\n" + p.take(1000))
    assert(p.contains("GreaterThanOrEqual(o_orderdate"),
      "quarter lower bound not pushed to the orders scan:\n" + p.take(1000))
    assert(p.contains("TakeOrderedAndProject"), "final top-k not TakeOrdered")
    assert(!p.contains("CartesianProduct"))
  }

  test("q91_priority_check: EXISTS plans as one LeftSemi hash join, dates pushed") {
    val p = plan("q91_priority_check")
    assert(p.contains("LeftSemi"), "EXISTS did not decorrelate to a semi join:\n" + p.take(1000))
    assert(!p.contains("Distinct") && !p.contains("CartesianProduct"),
      "semi join must not need a post-join distinct")
    // both scans keep their date prefilters (orders: the quarter window;
    // lineitem: ships after the window opens)
    assert(p.contains("GreaterThanOrEqual(o_orderdate"),
      "quarter lower bound not pushed to the orders scan:\n" + p.take(1000))
    assert(p.contains("GreaterThan(l_shipdate"),
      "ship-date prefilter not pushed to the lineitem scan:\n" + p.take(1000))
  }

  test("q96_min_cost_supplier: part filter pushed below the explode, dims broadcast, one TakeOrdered") {
    val p = plan("q96_min_cost_supplier")
    // the part predicate must prune the scan BEFORE the partsupp explode
    assert(p.contains("EqualTo(p_type,STANDARD)"),
      "part type filter not pushed to scan:\n" + p.take(1000))
    assert(p.contains("LessThanOrEqual(p_size,15)"),
      "part size filter not pushed to scan:\n" + p.take(1000))
    assert(p.contains("Generate explode"), "partsupp fan-out must be an explode")
    assert(p.contains("BroadcastHashJoin"), "supplier dim must broadcast")
    assert(p.contains("TakeOrderedAndProject"), "final top-k not TakeOrdered")
    assert(!p.contains("CartesianProduct"))
  }

  test("q97_important_stock: decimal value sums, scalar totals broadcast, no cartesian") {
    val p = plan("q97_important_stock")
    // the global (total, n_parts) scalar must ride a broadcast, never a
    // shuffle join or cartesian
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"),
      "1-row totals frame must broadcast:\n" + p.take(1000))
    assert(!p.contains("CartesianProduct"))
    // exact value arithmetic: the aggregate sums DECIMAL(38,0), not longs
    assert(p.contains("38,0"), "value sum must be DECIMAL(38,0):\n" + p.take(1000))
  }

  test("q98_supplier_cnt: qualifying-supplier semi join broadcast before the aggregate") {
    val p = plan("q98_supplier_cnt")
    // SEMI against qualifying suppliers, not anti against complaints
    // (ADVICE r12): both twins must count only suppkeys present in the
    // supplier dim, so the exclusion predicate is inverted and the join
    // flipped — same rows on contiguous keys, robust on sparse ones
    assert(p.contains("LeftSemi"), "qualifying filter must be a semi join:\n" + p.take(1000))
    assert(p.contains("BroadcastHashJoin"), "semi join build side must broadcast")
    assert(p.contains("GreaterThanOrEqual(s_acctbal,100"),
      "qualifying predicate not pushed to the supplier scan:\n" + p.take(1000))
    assert(!p.contains("CartesianProduct"))
  }

  test("q99_promotion_suppliers: date range and name prefix pushed; qualifying set broadcast") {
    val p = plan("q99_promotion_suppliers")
    assert(p.contains("GreaterThanOrEqual(l_shipdate"),
      "year lower bound not pushed to the lineitem scan:\n" + p.take(1000))
    assert(p.contains("LessThan(l_shipdate"),
      "year upper bound not pushed to the lineitem scan:\n" + p.take(1000))
    assert(p.contains("StringStartsWith(p_name,small)"),
      "name prefix not pushed to the part scan:\n" + p.take(1000))
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 2,
      "qualifying suppliers and region dims must broadcast:\n" + p.take(1000))
    assert(!p.contains("CartesianProduct"))
  }

  test("m29_decile_lift: ntile ranks only the narrow score frame; corpus text never sorted") {
    val p = plan("m29_decile_lift")
    // the global window must sort a 3-column (doc_id, p, y) projection —
    // the document text column must not appear above the feature scan
    val windowLine = p.linesIterator.find(_.contains("ntile")).getOrElse("")
    assert(windowLine.nonEmpty, "no ntile window in plan:\n" + p.take(800))
    assert(!windowLine.contains("text"), s"window input carries text: $windowLine")
    assert(!p.contains("CartesianProduct"))
  }

  test("q76_promo_share: month range pushed to scan, part pruned to 2 columns") {
    val p = plan("q76_promo_share")
    assert(p.contains("GreaterThanOrEqual(l_shipdate"),
      "month lower bound not pushed to the lineitem scan:\n" + p.take(800))
    // the part scan must read only the join key and p_type
    val partSchema = p.linesIterator
      .filter(_.contains("ReadSchema")).find(_.contains("p_type")).getOrElse("")
    assert(partSchema.nonEmpty && !partSchema.contains("p_name"),
      s"part scan reads unreferenced columns: $partSchema")
  }

  test("x29_dsir_weights: the log-ratio table rides a broadcast; no shuffle join") {
    val p = plan("x29_dsir_weights")
    // the 256-row ratio frame must be the build side against the token
    // frame — the corpus-proportional side never shuffles for the scoring
    assert(p.contains("BroadcastHashJoin"),
      "ratio join not broadcast:\n" + p.take(1000))
    assert(!p.contains("SortMergeJoin"), "unexpected shuffle join:\n" + p.take(1000))
    assert(!p.contains("CartesianProduct"))
  }

  test("q94_hdr_quantiles: one corpus exchange; everything after is sketch-sized") {
    val p = plan("q94_hdr_quantiles")
    // the lb grouped count is the only hash exchange over corpus-derived
    // rows (partial+final agg collapses the scan to <= 64*2^m buckets);
    // the window and target probes run on the sketch
    assert("Exchange hashpartitioning".r.findAllIn(p).size <= 1,
      "extra corpus-sized exchange:\n" + p.take(1200))
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"),
      "quantile probes must ride broadcasts:\n" + p.take(1000))
  }
}
