package graft.sources

/** Per-JVM temp-artifact namespace for the persisted-fit oracle pattern
  * (scored predictions, embeddings, IVF assignments, written indexes).
  *
  * Paths are namespaced by the JVM pid: concurrent Verify/Bench runs on
  * the shared sandbox each write their own copies, so an overwrite in one
  * JVM can never interleave with a read in another (ADVICE r2). Within a
  * JVM the namespace is stable, so the oracle SQL builders — evaluated
  * after the queries run, in the same process — point DuckDB at exactly
  * the files that run wrote.
  */
object Artifacts {
  private val ns: Long = ProcessHandle.current().pid()

  /** `/tmp/graft_<pid>/<tag>` — parquet directory for one artifact. */
  def path(tag: String): String =
    s"${System.getProperty("java.io.tmpdir")}/graft_$ns/$tag"
}
