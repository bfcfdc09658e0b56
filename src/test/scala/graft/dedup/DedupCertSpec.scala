package graft.dedup

import org.apache.spark.sql.functions._

import graft.CertSpec
import graft.sources.Tables

/** Registry certification for the dedup (d-family) queries not already
  * literally cited by DedupSpec — see [[graft.CertSpec]]. */
class DedupCertSpec extends CertSpec {
  import spark.implicits._

  private lazy val docs = Tables.documents(spark, fx)

  test("d1_exact_dedup: copy-count histogram equals the raw md5-group recompute") {
    val got = rows("d1_exact_dedup")
      .map(x => x.getAs[Long]("n_copies") -> x.getAs[Long]("n_groups")).toMap
    val want = docs.groupBy(md5(col("text").cast("binary")).as("h"))
      .agg(count(lit(1)).as("c")).groupBy("c").count()
      .as[(Long, Long)].collect().toMap
    assert(got == want)
    // conservation: Σ copies·groups = corpus size
    assert(got.map { case (c, g) => c * g }.sum == docs.count())
  }

  test("d2_minhash_sig: a hand recompute of one doc's 8-lane signature matches") {
    val r = rows("d2_minhash_sig")
    assert(r.size.toLong == docs.count())
    val lane = "[0-9a-f]{8}"
    assert(r.forall(_.getAs[String]("sig").matches(s"$lane(,$lane){7}")))
    // independent plain-JVM recompute for doc 0: normalized 3-gram
    // shingles, two salted md5s, four 8-hex windows each, min per lane
    val text = docs.filter(col("doc_id") === 0).select("text").as[String].head()
    val toks = text.toLowerCase.replaceAll("[^a-z0-9 ]", " ")
      .split(" +").filter(_.nonEmpty)
    val shingles = toks.sliding(3).filter(_.length == 3).map(_.mkString(" ")).toSeq.distinct
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
    val want = (0 until 8).map { laneNo =>
      val salt = laneNo / 4
      val off = (laneNo % 4) * 8
      shingles.map(sh => md5hex(s"$salt|$sh").substring(off, off + 8)).min
    }.mkString(",")
    val got = r.find(_.getAs[Long]("doc_id") == 0L).get.getAs[String]("sig")
    assert(got == want, s"doc 0 signature mismatch: $got vs $want")
  }

  test("d4_ngram_jaccard: canonical high-similarity pairs, descending") {
    val r = rows("d4_ngram_jaccard")
    assert(r.nonEmpty)
    assert(r.forall(x => x.getAs[Long]("doc_a") < x.getAs[Long]("doc_b")))
    val js = r.map(micro(_, "jaccard"))
    assert(js == js.sortBy(-_) && js.forall(j => j > 0 && j <= 1000000))
  }

  test("d5_simhash: one 32-bit fingerprint per doc") {
    val r = rows("d5_simhash")
    assert(r.size.toLong == docs.count())
    assert(r.map(_.getAs[Long]("doc_id")).distinct.size == r.size)
    assert(r.forall(x =>
      x.getAs[Long]("simhash") >= 0 && x.getAs[Long]("simhash") < (1L << 32)))
  }

  test("d6_simhash_pairs: hamming distances recompute from d5's fingerprints") {
    val r = rows("d6_simhash_pairs")
    assert(r.nonEmpty)
    assert(r.forall(x => x.getAs[Long]("doc_a") < x.getAs[Long]("doc_b")))
    assert(r.forall(x => (0 to 3).contains(x.getAs[Int]("hamming"))))
    val sh = rows("d5_simhash")
      .map(x => x.getAs[Long]("doc_id") -> x.getAs[Long]("simhash")).toMap
    r.foreach { x =>
      val want = java.lang.Long.bitCount(
        sh(x.getAs[Long]("doc_a")) ^ sh(x.getAs[Long]("doc_b")))
      assert(x.getAs[Int]("hamming") == want,
        s"pair $x: hamming must equal the xor-popcount of the d5 fingerprints")
    }
  }

  test("d7_curation_pipeline: quality-filtered, md5-deduped survivor list") {
    val keep = rows("d7_curation_pipeline").map(_.getAs[Long]("doc_id"))
    assert(keep.nonEmpty && keep.distinct.size == keep.size)
    val meta = docs.select(col("doc_id"), length(col("text")).as("len"),
        md5(col("text").cast("binary")).as("h"))
      .as[(Long, Int, String)].collect().map(x => x._1 -> (x._2, x._3)).toMap
    assert(keep.forall(meta(_)._1 >= 150), "every survivor passes the length gate")
    val hs = keep.map(meta(_)._2)
    assert(hs.distinct.size == hs.size, "no two survivors share text")
    // each survivor is the minimum id of its quality-passing md5 group
    val minOfGroup = meta.toSeq.filter(_._2._1 >= 150)
      .groupBy(_._2._2).view.mapValues(_.map(_._1).min).toMap
    assert(keep.forall(id => minOfGroup(meta(id)._2) == id))
  }

  test("d8_dup_clusters: min-member labeling with no singleton clusters") {
    val r = rows("d8_dup_clusters")
    assert(r.nonEmpty)
    assert(r.forall(x => x.getAs[Long]("cluster") <= x.getAs[Long]("doc_id")))
    val lbl = r.map(x => x.getAs[Long]("doc_id") -> x.getAs[Long]("cluster")).toMap
    assert(lbl.values.toSet.subsetOf(lbl.keySet),
      "every cluster label is itself a clustered member (min-member convention)")
    assert(lbl.forall { case (id, c) => c != id || lbl.values.count(_ == c) >= 2 },
      "a cluster representative must have at least one other member")
    assert(r.map(_.getAs[Long]("doc_id")).distinct.size == r.size)
  }

  test("d10_minhash_estimate: 8-lane estimate is k/8-quantized near the exact Jaccard") {
    val r = rows("d10_minhash_estimate")
    assert(r.nonEmpty)
    r.foreach { x =>
      val est = micro(x, "jaccard_est")
      assert(est % 125000 == 0, "8-lane estimate must be a multiple of 1/8")
      assert(math.abs(est - micro(x, "jaccard")) <= 500000,
        s"estimate too far from exact on a verified pair: $x")
    }
  }

  test("d11_canonical_docs: canon is the longest member of its d8 cluster") {
    val r = rows("d11_canonical_docs")
    assert(r.nonEmpty)
    val members = rows("d8_dup_clusters")
      .groupBy(_.getAs[Long]("cluster"))
      .view.mapValues(_.map(_.getAs[Long]("doc_id"))).toMap
    val len = docs.select(col("doc_id"), length(col("text")).cast("long"))
      .as[(Long, Long)].collect().toMap
    r.foreach { x =>
      val c = x.getAs[Long]("cluster")
      val canon = x.getAs[Long]("canon_doc")
      val m = members(c)
      assert(x.getAs[Long]("n_members") == m.size.toLong)
      assert(m.contains(canon))
      // longest text wins, ties to the smallest id
      val best = m.map(id => (-len(id), id)).min
      assert(((-len(canon)), canon) == best, s"cluster $c: canon $canon vs $best")
    }
  }

  test("d12_repeated_spans: shared fraction recomputes; keep threshold separates") {
    val r = rows("d12_repeated_spans")
    assert(r.size.toLong == docs.count())
    r.foreach { x =>
      val (n, s) = (x.getAs[Long]("n_spans"), x.getAs[Long]("n_shared"))
      assert(s <= n)
      if (n > 0)
        assert(micro(x, "shared_frac") ==
          BigDecimal(s.toDouble / n).setScale(6, BigDecimal.RoundingMode.HALF_UP)
            .*(BigDecimal(1000000)).toLong)
      assert(Set(0L, 1L).contains(x.getAs[Long]("keep")))
    }
    val kept = r.filter(_.getAs[Long]("keep") == 1).map(micro(_, "shared_frac"))
    val dropped = r.filter(_.getAs[Long]("keep") == 0).map(micro(_, "shared_frac"))
    if (kept.nonEmpty && dropped.nonEmpty)
      assert(kept.max < dropped.min, "keep flag must be a clean threshold")
  }

  test("d13_span_novelty: novelty fraction recomputes and is bounded") {
    val r = rows("d13_span_novelty")
    assert(r.size.toLong == docs.count())
    r.foreach { x =>
      val (n, nov) = (x.getAs[Long]("n_spans"), x.getAs[Long]("n_novel"))
      assert(nov <= n)
      if (n > 0)
        assert(micro(x, "novel_frac") ==
          BigDecimal(nov.toDouble / n).setScale(6, BigDecimal.RoundingMode.HALF_UP)
            .*(BigDecimal(1000000)).toLong)
    }
  }

  test("d15_source_contamination: all canonical source pairs with bounded overlap") {
    val r = rows("d15_source_contamination")
    val n = docs.select("source").distinct().count()
    assert(r.size.toLong == n * (n - 1) / 2)
    assert(r.forall(x => x.getAs[String]("source_a") < x.getAs[String]("source_b")))
    assert(r.forall(x => micro(x, "jaccard") >= 0 && micro(x, "jaccard") <= 1000000))
  }

  test("d16_lsh_tuning: the S-curve is exactly 1-(1-s^r)^b on the three configs") {
    val r = rows("d16_lsh_tuning")
    assert(r.size == 57)
    val cfgs = r.map(x => (x.getAs[Long]("bands"), x.getAs[Long]("rows_per_band"))).toSet
    assert(cfgs == Set((2L, 4L), (4L, 2L), (8L, 1L)), "b*r = 8 lane budget")
    r.foreach { x =>
      val (b, rr) = (x.getAs[Long]("bands"), x.getAs[Long]("rows_per_band"))
      val s = micro(x, "s") / 1e6
      val p = 1.0 - math.pow(1.0 - math.pow(s, rr.toDouble), b.toDouble)
      val want = BigDecimal(p).setScale(6, BigDecimal.RoundingMode.HALF_UP)
        .*(BigDecimal(1000000)).toLong
      assert(micro(x, "p_candidate") == want, s"b=$b r=$rr s=$s")
    }
  }

  test("d18_dup_rate_by_source: rates recompute from counts; docs conserve") {
    val r = rows("d18_dup_rate_by_source")
    assert(r.map(_.getAs[Long]("n_docs")).sum == docs.count())
    r.foreach { x =>
      val n = x.getAs[Long]("n_docs")
      def rate(c: Long) = BigDecimal(c.toDouble / n)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).*(BigDecimal(1000000)).toLong
      assert(x.getAs[Long]("n_exact") <= n && x.getAs[Long]("n_near") <= n)
      assert(micro(x, "exact_rate") == rate(x.getAs[Long]("n_exact")))
      assert(micro(x, "near_rate") == rate(x.getAs[Long]("n_near")))
    }
  }

  test("d19_containment: asymmetric containment is bounded and descending") {
    val r = rows("d19_containment")
    assert(r.nonEmpty)
    assert(r.forall(x => x.getAs[Long]("src_doc") != x.getAs[Long]("dst_doc")))
    val cs = r.map(micro(_, "containment"))
    assert(cs == cs.sortBy(-_) && cs.forall(c => c > 0 && c <= 1000000))
  }
}
