package graft.plans

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
  * Keyed by (session identity, logical key): a new SparkSession never
  * sees another session's pinned RDDs, and the per-SF-dir key keeps
  * different scale factors apart. Entries live for the session — callers
  * memoize bounded, small frames (pair lists, signatures, postings), not
  * raw corpora.
  *
  * Every query remains independently DuckDB-oracled: memoization changes
  * WHEN the shared plan runs, never what any query returns.
  */
object Materialized {
  private val cache = TrieMap[(Int, String), DataFrame]()

  /** Return the memoized frame for `key`, building + eagerly
    * checkpointing it on first use in this session. */
  def apply(spark: SparkSession, key: String)(build: => DataFrame): DataFrame =
    cache.getOrElseUpdate((System.identityHashCode(spark), key),
      build.localCheckpoint(true))

  /** Drop entries (tests; a production engine would evict by LRU). */
  def clear(): Unit = cache.clear()
}
