package org.apache.spark.sql.graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.classic.Dataset
import org.apache.spark.sql.execution.LogicalRDD

/** Fix for the iterative-checkpoint stats explosion.
  *
  * `Dataset.localCheckpoint` truncates the logical plan to a
  * [[LogicalRDD]] but PRESERVES the pre-checkpoint plan's estimated
  * `Statistics` as `originStats` (`LogicalRDD.fromDataset` attaches
  * `optimizedPlan.stats` so broadcast decisions survive the
  * truncation). For a one-shot checkpoint that is exactly right; in an
  * ITERATIVE loop it compounds: join size estimates are the PRODUCT of
  * child sizes, an un-scanned leaf defaults to `Long.MaxValue` (~2^63),
  * and each generation's product becomes the next generation's leaf —
  * so the carried `sizeInBytes` BigInt's bit-length grows geometrically
  * with iteration count. By ~iteration 20 the driver spends minutes
  * inside ONE `BigInteger.multiply` (Toom-Cook on multi-million-bit
  * operands) during `SizeInBytesOnlyStatsPlanVisitor`, with no Spark
  * job running — observed as a planner livelock in the g22 SCC trim
  * loop, and latent in every label-propagation loop at high diameter.
  *
  * The fix keeps the stats (a genuinely small frame should still
  * auto-broadcast) but CLAMPS `sizeInBytes`/`rowCount` to
  * `Long.MaxValue`: any estimate already past the broadcast threshold
  * behaves identically at any magnitude, so clamping changes no plan
  * choice — it only bounds the arithmetic. Applied at every checkpoint
  * generation the carried stats can never exceed ~63 bits, so the
  * per-plan products stay a few hundred bits no matter how many
  * iterations run.
  *
  * Lives under `org.apache.spark.sql` for `private[sql]` access to
  * [[LogicalRDD]]'s curried constructor and `Dataset.ofRows` — the
  * standard extension-library shim pattern (public API surface only,
  * no behavior forks).
  */
object LineageStats {
  private val Cap = BigInt(Long.MaxValue)

  /** Re-attach the TRUE output partitioning to an eagerly-checkpointed
    * frame (round-16 optimization: exchange-free co-partitioned loop
    * joins).
    *
    * `LogicalRDD.fromDataset` tries to carry the physical plan's
    * `outputPartitioning` across the checkpoint, but under AQE the top
    * node is `AdaptiveSparkPlanExec`, whose reported partitioning at
    * capture time is unusable — so every checkpointed frame comes back
    * `UnknownPartitioning` and every downstream join/aggregate on the
    * loop key pays a full Exchange per iteration (measured: the
    * PageRank/HITS/label-propagation family spends most of its wall on
    * those per-round exchanges, not on compute).
    *
    * For an EAGER checkpoint the adaptive plan has already executed, so
    * its `finalPhysicalPlan` — and therefore its true, materialized
    * `outputPartitioning` — is known. This helper copies a
    * `HashPartitioning` from the final plan onto the checkpoint's
    * [[LogicalRDD]], remapping attributes positionally (final-plan
    * output(i) → LogicalRDD output(i), same contract
    * `LogicalRDD.fromDataset` uses). The claim is always truthful: the
    * checkpointed RDD is `finalPlan.execute().map(_.copy())` —
    * partition-for-partition the final plan's layout.
    *
    * Bails (returns `cp` unchanged) whenever the partitioning is not a
    * plain `HashPartitioning` over attribute references, or any
    * attribute cannot be remapped — worst case is the status quo, never
    * a wrong claim. */
  def preservePartitioning(origin: org.apache.spark.sql.DataFrame,
                           cp: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference}
    import org.apache.spark.sql.catalyst.plans.physical.{HashPartitioning, Partitioning, SinglePartition}
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    try {
      val ds = cp.asInstanceOf[Dataset[Row]]
      val lr = ds.queryExecution.logical match {
        case l: LogicalRDD => l
        case _ => return cp
      }
      // already carried (non-AQE path) — nothing to do
      if (lr.outputPartitioning.isInstanceOf[HashPartitioning] ||
        lr.outputPartitioning == SinglePartition) return cp
      val oqe = origin.asInstanceOf[Dataset[Row]].queryExecution
      val finalPlan = oqe.executedPlan match {
        case a: AdaptiveSparkPlanExec => a.finalPhysicalPlan
        case p => p
      }
      def rewrap(p: Partitioning): org.apache.spark.sql.DataFrame = {
        val rewrapped = new LogicalRDD(
          lr.output, lr.rdd, p, lr.outputOrdering,
          lr.isStreaming, lr.stream)(
          ds.sparkSession, Some(lr.computeStats()), None)
        Dataset.ofRows(ds.sparkSession, rewrapped)
      }
      finalPlan.outputPartitioning match {
        // a 1-partition layout is SinglePartition by definition — it
        // satisfies every clustered distribution, so downstream joins /
        // aggregates over it never exchange (the np=1 gate-scale case)
        case SinglePartition => rewrap(SinglePartition)
        case _ if lr.rdd.getNumPartitions == 1 => rewrap(SinglePartition)
        case hp: HashPartitioning
          if hp.expressions.forall(_.isInstanceOf[AttributeReference]) =>
          val src = finalPlan.output
          val dst = lr.output
          if (src.size != dst.size) return cp
          val byExprId = src.zip(dst).map { case (s, d) => s.exprId -> d }.toMap
          val remapped = hp.expressions.map {
            case a: AttributeReference => byExprId.get(a.exprId)
            case _ => None
          }
          if (remapped.exists(_.isEmpty)) return cp
          rewrap(HashPartitioning(
            remapped.map(_.get.asInstanceOf[Attribute]), hp.numPartitions))
        case _ => cp
      }
    } catch { case _: Throwable => cp }
  }

  /** Replace an EAGER checkpoint's carried size ESTIMATE with its
    * MEASURED size (round 17; the stats sibling of
    * [[preservePartitioning]]).
    *
    * `LogicalRDD.fromDataset` carries the pre-checkpoint plan's
    * estimated `sizeInBytes` forward. For a loop-body frame that
    * estimate is a join-product fiction (a 60 KB rank frame at gate
    * scale carries a ~600 GiB estimate), and since SPARK-41986
    * EnsureRequirements consults exactly that number: a SinglePartition
    * join child whose ESTIMATED size exceeds
    * `spark.sql.maxSinglePartitionBytes` (128 MB) is force-re-shuffled
    * to `spark.sql.shuffle.partitions` for parallelism — so every
    * claimed-SinglePartition loop join was paying two phantom Exchanges
    * plus their AQE stage jobs per round (measured: the g14 auth/hub
    * update joins, g26/g27 frontier joins, g29 community joins).
    *
    * An eager checkpoint's blocks are materialized, so the TRUE bytes
    * are known — the same block-store measurement
    * `graft.plans.Lineage.sizedParts` already uses for loop partition
    * counts. Carrying the measured number is truthful at every scale:
    * at gate scale the frame really is KBs (keep SinglePartition, no
    * exchange); on a cluster the measured bytes are real GBs and the
    * maxSinglePartitionBytes guard — and every other size-based
    * decision — keeps behaving exactly as designed. Returns `cp`
    * unchanged when the blocks are not measurable (lazy checkpoint,
    * evicted, non-checkpoint root). */
  def measuredSize(cp: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val ds = cp.asInstanceOf[Dataset[Row]]
    ds.queryExecution.logical match {
      case lr: LogicalRDD =>
        val sc = ds.sparkSession.sparkContext
        val measured = sc.getRDDStorageInfo.find(_.id == lr.rdd.id)
          .map(i => math.max(1L, i.memSize + i.diskSize))
        measured match {
          case Some(bytes) if BigInt(bytes) != lr.computeStats().sizeInBytes =>
            val st = lr.computeStats().copy(
              sizeInBytes = BigInt(bytes), rowCount = None)
            val clean = new LogicalRDD(
              lr.output, lr.rdd, lr.outputPartitioning, lr.outputOrdering,
              lr.isStreaming, lr.stream)(
              ds.sparkSession, Some(st), None)
            Dataset.ofRows(ds.sparkSession, clean)
          case _ => cp
        }
      case _ => cp
    }
  }

  /** An observed metric's first column from an EXECUTED query (round
    * 17): after an eager checkpoint materializes a plan carrying a
    * `Dataset.observe(name, count(...))` node, the collected value is
    * on the QueryExecution — so a count-gated loop reads its per-round
    * row count from the materialization it already paid for instead of
    * running a separate count() job. None when the metric did not
    * populate (caller falls back to a real count — never wrong, only
    * slower). */
  def observedCount(df: org.apache.spark.sql.DataFrame, name: String): Option[Long] =
    observedRow(df, name).map(_.getLong(0))

  /** The full observed-metrics row for `name` — None when it did not
    * populate (see [[observedCount]]). */
  def observedRow(df: org.apache.spark.sql.DataFrame, name: String): Option[Row] =
    try df.asInstanceOf[Dataset[Row]].queryExecution.observedMetrics.get(name)
    catch { case _: Throwable => None }

  /** MEASURED-chain size (round 17, the SHJ build-side guard): the
    * frame's estimated bytes, but only when that estimate derives from
    * measured checkpoint blocks — i.e. the optimized plan is a
    * [[LogicalRDD]] or a narrow unary chain (Project/Filter/alias) over
    * one, whose size the stats visitor scales from the measured leaf.
    * None for anything containing a join/aggregate/union — those carry
    * multiplicative estimates no caller should act on. */
  def measurableBytes(df: org.apache.spark.sql.DataFrame): Option[BigInt] = {
    import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, Project, SubqueryAlias}
    val plan = df.asInstanceOf[Dataset[Row]].queryExecution.optimizedPlan
    @scala.annotation.tailrec
    def measured(p: LogicalPlan): Boolean = p match {
      case _: LogicalRDD => true
      case pr: Project => measured(pr.child)
      case f: Filter => measured(f.child)
      case a: SubqueryAlias => measured(a.child)
      case _ => false
    }
    if (measured(plan)) Some(plan.stats.sizeInBytes) else None
  }

  /** The checkpoint-backing RDD of a localCheckpoint'd frame: the
    * [[LogicalRDD]] root's `rdd` field — exactly the RDD
    * `Dataset.localCheckpoint` persisted (and the id that appears in
    * `sc.getPersistentRDDs`). None when the root is not a LogicalRDD
    * (the frame was never checkpointed). Used by
    * [[graft.plans.Lineage.Gen]] to release superseded loop
    * generations and by `Materialized.liveRddIds` so Bench's
    * between-query block sweep can spare the session memo (VERDICT
    * r13 finding 2). */
  def checkpointRdd(df: org.apache.spark.sql.DataFrame): Option[org.apache.spark.rdd.RDD[_]] =
    df.asInstanceOf[Dataset[Row]].queryExecution.logical match {
      case lr: LogicalRDD => Some(lr.rdd)
      case _ => None
    }

  /** Rebuild `df`'s root [[LogicalRDD]] with clamped carried stats.
    * No-op (returns `df` as-is) when the root is not a LogicalRDD or
    * the stats are already within bounds. */
  def clampCheckpointStats(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val ds = df.asInstanceOf[Dataset[Row]]
    ds.queryExecution.logical match {
      case lr: LogicalRDD =>
        val st = lr.computeStats()
        if (st.sizeInBytes <= Cap && st.rowCount.forall(_ <= Cap)) df
        else {
          val clamped = st.copy(
            sizeInBytes = st.sizeInBytes.min(Cap),
            rowCount = st.rowCount.map(_.min(Cap)))
          val clean = new LogicalRDD(
            lr.output, lr.rdd, lr.outputPartitioning, lr.outputOrdering,
            lr.isStreaming, lr.stream)(
            ds.sparkSession, Some(clamped), None)
          Dataset.ofRows(ds.sparkSession, clean)
        }
      case _ => df
    }
  }
}
