package graft

/** Metamorphic certification of the engine's core safety claim: query
  * output is PARTITIONING-INDEPENDENT (SCALE.md "Cross-cutting
  * determinism" — decimal-quantized pre-shuffle sums, total-ordered
  * windows/argmins, hash-derived pseudo-randomness), which is what makes
  * 1000-way parallelism safe. The driver gate proves engine == oracle at
  * ONE partitioning; this suite proves engine == engine across
  * partitionings: each sampled query runs in a sibling session whose
  * `spark.sql.shuffle.partitions` differs (4 → 7, a non-divisor so no
  * partition boundary survives), and the collected outputs must be
  * byte-identical row for row.
  *
  * The sibling session gets its own `Materialized` memo space (the memo
  * keys on the session), so shared family builds are genuinely recomputed
  * under the new partitioning — this exercises the builds, not just the
  * final projections. One representative per family keeps the suite
  * fast; the property they certify is engine-wide by construction
  * (every operator flows through the same quantization/ordering
  * discipline).
  */
class PartitionInvarianceSpec extends SparkSpec {

  private val sampled = Seq(
    "q1_agg",              // decimal grouped sums
    "q10_window",          // window functions
    "q40_grouped_corr",    // five-moment decimal aggregate (+ spread)
    "t2_tfidf_multi",      // postings build + cosine ranking
    "t7_tfidf_batch",      // bounded TopKAggregator (map-side state)
    "t9_hybrid_rrf",       // two-leg fusion
    "d3_lsh_near_dups",    // minhash lanes + band join + verify
    "s3_near_dup_pairs",   // LSH bucket kernel (+ spread)
    "s10_kmeans",          // iterative Lloyd with argmin tie-breaks
    "s20_incremental_assign", // persisted-index serve path
    "g2_pagerank",         // iterative checkpointed fixpoint
    "x14_unigram_logprob", // rounded-log LM scoring
    "x26_filter_funnel",   // first-fail labeling + running window
    "m12_logreg_gd",       // exact-decimal gradient descent
    "t11_rm3_search",      // two-pass weighted retrieval (greedy fb set)
    "s23_mmr_rerank",      // driver-looped greedy argmax trajectory
    "d23_leakage_split",   // cluster-keyed hash split + leak audit
    "q88_user_ewma",       // integer-micro-unit half-up pipeline
    "s24_sq8_recall",      // integer code dots + dual bounded top-k
    "d24_entity_resolution", // banded-lev pairs + transitive closure
    "t12_textrank_keywords", // word-graph PageRank fixpoint
    "g22_scc",             // trim-loop + FW-BW min-reach fixpoints
    "g23_condensation_levels", // frontier max-relaxation on the memoized SCC
    "x29_dsir_weights",    // hashed-bucket importance log-ratios
    "q94_hdr_quantiles",   // mergeable integer histogram + ordered window
    "t14_ndcg_eval",       // k-row metric frame over the memoized ranking
    "s27_silhouette",      // Lloyd refit + per-point distance kernels
    "st11_hourly_quantiles", // per-window sketch + partitioned read-off
    "g27_betweenness",     // two-phase BFS + micro-unit integer recursion
    "g28_random_walks",    // md5-drawn walk chain over ranked adjacency
    "x30_bpe_train",       // iterative argmax-merge loop (broadcast 1-row)
    "x32_bpe_batch")       // sorted-candidate greedy fold (batched BPE)

  private lazy val alt = {
    val s = spark.newSession()
    s.conf.set("spark.sql.shuffle.partitions", "7")
    s
  }

  for (name <- sampled) test(s"$name: identical output at 4 and 7 shuffle partitions") {
    val base = SparkEntry.queries(name)(spark, sf("sf0.001"))
      .collect().map(_.toSeq).toSeq
    val other = SparkEntry.queries(name)(alt, sf("sf0.001"))
      .collect().map(_.toSeq).toSeq
    assert(base == other,
      s"$name output depends on the shuffle partitioning")
    assert(base.nonEmpty, s"$name: degenerate empty fixture")
  }
}
