package graft.sources

import java.nio.file.{Files, Path, Paths}
import java.util.Comparator

import scala.jdk.CollectionConverters._
import scala.util.Try

/** Per-JVM temp-artifact namespace for the persisted-fit oracle pattern
  * (scored predictions, embeddings, IVF assignments, written indexes).
  *
  * Paths are namespaced by the JVM pid: concurrent Verify/Bench runs on
  * the shared sandbox each write their own copies, so an overwrite in one
  * JVM can never interleave with a read in another (ADVICE r2). Within a
  * JVM the namespace is stable, so the oracle SQL builders — evaluated
  * after the queries run, in the same process — point DuckDB at exactly
  * the files that run wrote.
  *
  * Tags are sanitized to `[A-Za-z0-9._-]` (callers embed sf-dir paths;
  * raw slashes would nest the data path under the namespace and a `..`
  * segment could escape it — ADVICE r3), and dirs left by dead JVMs are
  * swept on first use so /tmp does not accumulate one dir per past run.
  */
object Artifacts {
  private val ns: Long = ProcessHandle.current().pid()
  private val tmpRoot: String = System.getProperty("java.io.tmpdir")

  // Verify redirects the whole namespace under its OUT dir so the dump +
  // oracle_sql.json form one self-contained unit: the oracle SQL it embeds
  // then points inside the dump, immune to any other JVM's startup sweep
  // (VERDICT r15 finding 1 — a concurrent sbt-test JVM swept the exited
  // Verify JVM's /tmp/graft_<pid> dir mid-comparison and 10 artifact-backed
  // queries failed with IO errors).
  @volatile private var rootOverride: Option[String] = None

  /** Redirect all subsequent artifact paths under `dir` (made absolute).
    * Call before any query runs; the pid sweep is skipped for redirected
    * paths since nothing under `dir` is pid-namespaced. */
  def setRoot(dir: String): Unit =
    rootOverride = Some(Paths.get(dir).toAbsolutePath.toString)

  // One-time startup sweep: delete graft_<pid> dirs whose JVM is gone.
  // Only exact `graft_<digits>` names are considered, and only when the
  // pid is verifiably absent — a live concurrent run is never touched.
  private lazy val swept: Unit = {
    val root = Paths.get(tmpRoot)
    val stale = Try(Files.list(root)).map(_.iterator().asScala.filter { p =>
      p.getFileName.toString match {
        case s if s.startsWith("graft_") =>
          s.drop(6).toLongOption match {
            case Some(pid) if pid != ns => ProcessHandle.of(pid).isEmpty
            case _ => false
          }
        case _ => false
      }
    }.toList).getOrElse(Nil)
    stale.foreach { dir =>
      Try(Files.walk(dir).sorted(Comparator.reverseOrder[Path]())
        .iterator().asScala.foreach(p => Try(Files.delete(p))))
    }
  }

  private[sources] def sanitize(tag: String): String =
    tag.replaceAll("[^A-Za-z0-9._-]", "_")

  /** `<root>/<sanitized tag>` — parquet directory for one artifact, where
    * root is the redirected dir (Verify gate runs) or `/tmp/graft_<pid>`. */
  def path(tag: String): String = rootOverride match {
    case Some(r) => s"$r/${sanitize(tag)}"
    case None =>
      swept
      s"$tmpRoot/graft_$ns/${sanitize(tag)}"
  }
}
