package graft.similarity

import org.apache.spark.sql.functions._

import graft.CertSpec
import graft.sources.Tables

/** Registry certification for the similarity (s-family) queries not
  * already literally cited by SimilaritySpec — see [[graft.CertSpec]].
  * Cross-checks recompute cosines/means in plain double precision over
  * the collected fixture embeddings; score comparisons allow ±2 micro
  * for the decimal-kernel vs double summation-order difference. */
class SimilarityCertSpec extends CertSpec {

  private lazy val emb: Map[Long, Array[Double]] =
    Tables.embeddings(spark, fx).select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) ->
        r.getSeq[Any](1).map(v => v.asInstanceOf[Number].doubleValue).toArray)
      .toMap

  private def dot(a: Array[Double], b: Array[Double]): Double =
    a.zip(b).map { case (x, y) => x * y }.sum

  private def cos(a: Long, b: Long): Double =
    dot(emb(a), emb(b)) / (math.sqrt(dot(emb(a), emb(a))) * math.sqrt(dot(emb(b), emb(b))))

  test("s4_ann_ivf: returned scores are TRUE cosines against query 0, descending") {
    val r = rows("s4_ann_ivf")
    assert(r.size == 10)
    val cs = r.map(micro(_, "cos"))
    assert(cs == cs.sortBy(-_))
    r.foreach { x =>
      val id = x.getAs[Long]("vec_id")
      assert(id != 0L)
      assert(math.abs(micro(x, "cos") - math.round(cos(0L, id) * 1e6)) <= 2, s"vec $id")
    }
  }

  test("s5_embedding_clusters: min-member labels, closed under membership") {
    val r = rows("s5_embedding_clusters")
    assert(r.nonEmpty)
    assert(r.forall(x => x.getAs[Long]("cluster") <= x.getAs[Long]("vec_id")))
    val lbl = r.map(x => x.getAs[Long]("vec_id") -> x.getAs[Long]("cluster")).toMap
    assert(lbl.values.toSet.subsetOf(lbl.keySet))
  }

  test("s6_label_centroids: per-label per-dim means recompute exactly") {
    val r = rows("s6_label_centroids")
    val labels = Tables.embeddings(spark, fx).select("vec_id", "label").collect()
      .map(x => x.getLong(0) -> x.getInt(1))
    val byLabel = labels.groupBy(_._2).view.mapValues(_.map(_._1)).toMap
    assert(r.size == byLabel.size * 64)
    r.foreach { x =>
      val (l, d) = (x.getAs[Int]("label"), x.getAs[Int]("d"))
      val mean = byLabel(l).map(id => emb(id)(d)).sum / byLabel(l).size
      assert(math.abs(micro(x, "centroid") - math.round(mean * 1e6)) <= 2, s"label $l dim $d")
    }
  }

  test("s8_ann_int8: ten distinct non-query neighbors, score-descending") {
    val r = rows("s8_ann_int8")
    assert(r.size == 10)
    val ids = r.map(_.getAs[Long]("vec_id"))
    assert(ids.distinct.size == 10 && !ids.contains(0L))
    val qs = r.map(_.getAs[Long]("qdot"))
    assert(qs == qs.sortBy(-_))
  }

  test("s11_knn_graph: per-source dense ranks with true descending cosines") {
    val r = rows("s11_knn_graph")
    assert(r.nonEmpty)
    for ((src, g0) <- r.groupBy(_.getAs[Long]("src"))) {
      val g = g0.sortBy(_.getAs[Long]("rk"))
      assert(g.map(_.getAs[Long]("rk")) == (1L to g.size).toVector, s"src $src")
      val cs = g.map(micro(_, "cos"))
      assert(cs == cs.sortBy(-_), s"src $src")
      g.foreach { x =>
        val dst = x.getAs[Long]("dst")
        assert(dst != src)
        assert(math.abs(micro(x, "cos") - math.round(cos(src, dst) * 1e6)) <= 2,
          s"edge $src->$dst")
      }
    }
  }

  test("s12_semantic_dedup: one keeper per cluster; singletons all kept") {
    val r = rows("s12_semantic_dedup")
    assert(r.size.toLong == emb.size.toLong)
    val (clustered, single) = r.partition(!_.isNullAt(1))
    assert(single.forall(_.getAs[Long]("keep") == 1L),
      "unclustered vectors are trivially kept")
    for ((c, g) <- clustered.groupBy(_.getAs[Long]("cluster")))
      assert(g.count(_.getAs[Long]("keep") == 1L) == 1, s"cluster $c needs ONE keeper")
  }

  test("s14_ann_recall: recall is overlap over k") {
    val r = rows("s14_ann_recall").head
    val (k, ov) = (r.getAs[Long]("k"), r.getAs[Long]("n_overlap"))
    assert(ov >= 0 && ov <= k)
    assert(micro(r, "recall") == math.round(ov.toDouble / k * 1e6))
  }

  test("s15_ann_pq: ten distinct non-query candidates, ADC-descending") {
    val r = rows("s15_ann_pq")
    assert(r.size == 10)
    val ids = r.map(_.getAs[Long]("vec_id"))
    assert(ids.distinct.size == 10 && !ids.contains(0L))
    val s = r.map(micro(_, "adc"))
    assert(s == s.sortBy(-_))
  }

  test("s16_mips: exact top-10 inner products against query 0") {
    val r = rows("s16_mips")
    assert(r.size == 10)
    val want = emb.keys.filter(_ != 0L).toVector
      .map(id => (id, dot(emb(0L), emb(id))))
      .sortBy(x => (-x._2, x._1)).take(10)
    assert(r.map(_.getAs[Long]("vec_id")) == want.map(_._1),
      "MIPS brute force must return the exact top-10")
    r.zip(want).foreach { case (x, (id, ip)) =>
      assert(math.abs(micro(x, "ip") - math.round(ip * 1e6)) <= 2, s"vec $id")
    }
  }

  test("s18_pca_power: an L1-normalized 64-dim principal direction") {
    val r = rows("s18_pca_power")
    assert(r.map(_.getAs[Int]("d")).sorted == (0 until 64).toVector)
    // the power iteration normalizes by the L1 norm (Similarity
    // pcaPowerCollected), so Σ|loading| = 1 up to per-dim 6-dp rounding
    val l1 = r.map(x => math.abs(micro(x, "loading"))).sum
    assert(math.abs(l1 - 1000000L) <= 64, s"PC1 L1 norm $l1")
  }

  test("s21_cell_occupancy: cells partition the s20 corpus side") {
    val r = rows("s21_cell_occupancy")
    val corpusN = emb.keys.count(_ % 5 != 0).toLong
    assert(r.map(_.getAs[Long]("n_vectors")).sum == corpusN)
    assert(r.forall(_.getAs[Long]("n_vectors") > 0))
    assert(r.map(_.getAs[Long]("cid")).distinct.size == r.size)
  }

  test("s22_ingest_merge: generation flags split corpus and delta correctly") {
    val r = rows("s22_ingest_merge")
    val ids = r.map(_.getAs[Long]("vec_id"))
    assert(ids.distinct.size == ids.size)
    val gen0 = r.filter(_.getAs[Long]("gen") == 0L).map(_.getAs[Long]("vec_id"))
    val gen1 = r.filter(_.getAs[Long]("gen") == 1L).map(_.getAs[Long]("vec_id"))
    assert(gen0.toSet == emb.keys.filter(_ % 5 != 0).toSet,
      "generation 0 is exactly the corpus side")
    assert(gen1.forall(_ % 5 == 0), "generation 1 only admits delta ids")
  }

  test("s25_mrl_recall: full truncation-dims x query grid with exact recall ratios") {
    val r = rows("s25_mrl_recall")
    val grid = r.map(x => (x.getAs[Long]("dims"), x.getAs[Long]("qid"))).toSet
    assert(grid == (for (d <- Set(8L, 16L, 32L); q <- Set(0L, 1L, 2L)) yield (d, q)))
    r.foreach { x =>
      val ov = x.getAs[Long]("n_overlap")
      assert(ov >= 0 && ov <= 10)
      assert(micro(x, "recall") == math.round(ov.toDouble / 10 * 1e6))
    }
  }

  test("s26_nprobe_recall: recall is monotone in nprobe (candidate sets nest)") {
    val r = rows("s26_nprobe_recall").sortBy(_.getAs[Long]("nprobe"))
    assert(r.map(_.getAs[Long]("nprobe")) == Vector(1L, 2L, 4L, 8L))
    val rec = r.map(micro(_, "recall"))
    assert(rec == rec.sorted, "a wider probe set can only add candidates")
    r.foreach(x => assert(micro(x, "recall") ==
      math.round(x.getAs[Long]("n_overlap").toDouble / 10 * 1e6)))
  }
}
