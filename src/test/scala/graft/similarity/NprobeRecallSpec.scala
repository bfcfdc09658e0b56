package graft.similarity

import graft.SparkSpec

/** s26 sweep invariants on real sf0.001 data. The key property is
  * PROVABLE monotonicity: candidate sets nest as nprobe grows, and any
  * candidate that displaces a previous top-k member scores above it —
  * so the displacer is itself in the global (brute) top-k, and overlap
  * can never decrease. Probing every cell must recover brute force
  * exactly (recall 1). */
class NprobeRecallSpec extends SparkSpec {

  test("nprobeRecall: recall is monotone in nprobe and 1.0 at full probe width") {
    val nc = 16
    val rows = Similarity.nprobeRecall(spark, sf("sf0.001"),
        nprobes = Seq(1, 2, 4, 8, nc), nCentroids = nc)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDecimal(2).doubleValue))
    assert(rows.map(_._1).toSeq == Seq(1L, 2L, 4L, 8L, nc.toLong))
    val recalls = rows.map(_._3).toSeq
    assert(recalls == recalls.sorted,
      s"recall must not decrease as the probe set widens: $recalls")
    assert(recalls.last == 1.0,
      s"probing all $nc cells IS brute force; recall must be 1: $recalls")
    assert(rows.last._2 == 10L, "full-probe overlap must equal k")
  }

  test("nprobeRecall: persisted probe-rank facts are a 1..k permutation") {
    // the sweep writes its facts on first use per (session, dir); the
    // read-back below sees exactly what the oracle will
    Similarity.nprobeRecall(spark, sf("sf0.001")).collect()
    val base = new java.io.File(
      graft.sources.Artifacts.path("ivf_sweep_" + sf("sf0.001")))
    val pr = spark.read.parquet(s"$base/pranks")
      .collect().map(r => r.getAs[Int]("pr"))
    assert(pr.sorted.toSeq == (1 to 16).toSeq,
      s"probe ranks must enumerate every centroid exactly once: ${pr.toSeq}")
  }
}
