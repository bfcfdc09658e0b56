package graft.plans

import java.util.WeakHashMap

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Session-scoped memo of materialized shared subplans.
  *
  * Several registered queries share an expensive prefix: the ML metric
  * queries all score the same model over the same split, the near-dup
  * queries all need the same LSH-verified pair set, the search queries
  * all build the same postings. Running each query stand-alone refits /
  * re-joins that prefix every time — correct, but at any scale the right
  * engine design is to materialize the shared subplan ONCE per session
  * and let every consumer reuse it (the DataFrame analogue of a shared
  * scan / common-table materialization; on a cluster this is a cached
  * intermediate dataset, here `localCheckpoint` pins the computed
  * partitions).
  *
  * Scoping: the outer map holds each SparkSession WEAKLY, so one
  * session's entries can never be served to another (the key is the
  * session object itself, not a reusable hash) and everything a session
  * pinned becomes collectable when the session is — no cross-session
  * leaks, no "SparkContext has been shutdown" served from a stale memo.
  * The per-SF-dir logical key keeps scale factors apart. Callers memoize
  * bounded, small frames (pair lists, signatures, postings), not raw
  * corpora.
  *
  * Every query remains independently DuckDB-oracled: memoization changes
  * WHEN the shared plan runs, never what any query returns.
  */
object Materialized {
  private val sessions = new WeakHashMap[SparkSession, TrieMap[String, DataFrame]]()

  private def forSession(spark: SparkSession): TrieMap[String, DataFrame] =
    sessions.synchronized {
      var m = sessions.get(spark)
      if (m == null) { m = TrieMap.empty; sessions.put(spark, m) }
      m
    }

  /** Return the memoized frame for `key`, building + eagerly
    * checkpointing it on first use in this session. */
  def apply(spark: SparkSession, key: String)(build: => DataFrame): DataFrame =
    forSession(spark).getOrElseUpdate(key, build.localCheckpoint(true))

  /** Drop all entries across sessions (tests; a production engine would
    * evict by LRU). */
  def clear(): Unit = sessions.synchronized(sessions.clear())
}
