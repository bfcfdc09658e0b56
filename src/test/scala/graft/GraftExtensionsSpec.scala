package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.unsafe.types.UTF8String

/** End-to-end check of the `spark.sql.extensions=graft.GraftExtensions`
  * deployment path: a session built with the extension must expose every
  * kernel as a plain SQL function, agreeing with the kernels' own eval.
  */
class GraftExtensionsSpec extends SparkSpec {

  test("GraftExtensions registers every kernel as a SQL function") {
    val base = spark // materialize the shared suite session first
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    // a NEW session over the same SparkContext, built with the extension.
    // (`withExtensions` is the programmatic twin of
    // `spark.sql.extensions=graft.GraftExtensions`; the config form is
    // only read when the SparkContext itself is created, which a shared
    // test JVM can't redo.)
    val ext = SparkSession.builder()
      .master("local[4]")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    try {
      assert(ext ne base, "expected a fresh session for the extension path")
      val h = ext.sql("SELECT graft_md5_hash32('spark') AS h").head().getLong(0)
      assert(h == functions.Md5Hash32.hash(UTF8String.fromString("spark")))
      val nb = ext.sql("SELECT graft_md5_nibble_msbs('spark') AS b").head().getLong(0)
      assert(nb == functions.Md5NibbleMsbs.msbs(UTF8String.fromString("spark")))
      val dot = ext.sql(
        "SELECT graft_vector_dot_exact(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d")
        .head().getDouble(0)
      assert(dot == 11.0)
      val vl = ext.sql(
        "SELECT graft_vector_dot_long(array(2L, 3L), array(4L, 5L)) AS d")
        .head().getLong(0)
      assert(vl == 23L)
      // int8 quantize and LSH buckets: shapes + determinism via SQL
      val q8 = ext.sql(
        "SELECT graft_quantize_int8(array(CAST(0.5 AS FLOAT), CAST(-0.5 AS FLOAT))) AS q")
        .head().getSeq[Long](0)
      assert(q8.length == 2 && q8.forall(v => v >= -127 && v <= 127))
      val buckets = ext.sql(
        "SELECT graft_lsh_buckets_exact(array(CAST(0.5 AS FLOAT)), 2, 3, 1) AS b")
        .head().getSeq[Long](0)
      assert(buckets.length == 2 && buckets.forall(b => b >= 0 && b < 8))
    } finally {
      SparkSession.setDefaultSession(base)
      SparkSession.setActiveSession(base)
    }
  }
}
