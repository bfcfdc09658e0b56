package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.graft.LineageStats

/** Checkpoint helper for ITERATIVE algorithms (label propagation,
  * PageRank-family fixpoints, SCC trim/FW-BW rounds).
  *
  * `localCheckpoint` alone truncates lineage but carries the
  * pre-checkpoint plan's estimated stats forward (`originStats`), and
  * across checkpoint GENERATIONS those estimates compound
  * multiplicatively — by ~20 iterations the driver livelocks inside
  * BigInteger arithmetic during size-only stats estimation (see
  * [[org.apache.spark.sql.graft.LineageStats]] for the full mechanism).
  * [[checkpoint]] = `localCheckpoint` + per-generation clamp, which
  * bounds the carried stats at `Long.MaxValue` forever without changing
  * any join-strategy decision (everything past the broadcast threshold
  * is equivalent).
  *
  * Use this — not bare `localCheckpoint` — for any frame reassigned
  * inside a loop. One-shot checkpoints (e.g. [[Materialized]]) don't
  * compound and don't need it.
  */
object Lineage {
  /** `df.localCheckpoint(eager)` with carried-stats clamping. Lazy
    * (`eager = false`) still truncates the plan immediately — the
    * single downstream action materializes the blocks, same contract
    * as bare `localCheckpoint(false)`. */
  def checkpoint(df: DataFrame, eager: Boolean): DataFrame =
    LineageStats.clampCheckpointStats(df.localCheckpoint(eager))

  /** Postfix form so loop bodies read like the bare API:
    * `frame.loopCheckpoint(true)`. */
  implicit class CheckpointOps(private val df: DataFrame) extends AnyVal {
    def loopCheckpoint(eager: Boolean): DataFrame = checkpoint(df, eager)
  }
}
