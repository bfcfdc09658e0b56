package graft.ml

import org.apache.spark.sql.Row

import graft.CertSpec
import graft.sources.Tables

/** Registry certification for the ML (m-family) queries not already
  * literally cited by the ml specs — see [[graft.CertSpec]]. The
  * strongest checks here are CROSS-QUERY consistency laws: m3's
  * per-label metrics must tabulate m1's confusion matrix, m4's
  * weighted metrics must aggregate m3, the Mann-Whitney AUC must
  * recompute from m15's own rank sum, and weighted recall must equal
  * accuracy by algebra. */
class MlCertSpec extends CertSpec {
  import org.apache.spark.sql.functions._
  import spark.implicits._

  private def q6(v: Double): Long =
    BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP)
      .*(BigDecimal(1000000)).toLong

  private def confusion(id: String): Map[(Double, Double), Long] =
    rows(id).map(x => (x.getAs[Double]("label"), x.getAs[Double]("prediction")) ->
      x.getAs[Long]("n")).toMap

  test("m1_confusion: a square-domain confusion matrix over the scored test set") {
    val m = confusion("m1_confusion")
    assert(m.values.sum > 0)
    val labels = m.keys.map(_._1).toSet
    val preds = m.keys.map(_._2).toSet
    assert(preds.subsetOf(labels), "predictions live in the label domain")
    assert(m.values.forall(_ > 0), "only occupied cells are emitted")
  }

  test("m5_cv_confusion: the CV variant scores the same test set as m1") {
    val (m1, m5) = (confusion("m1_confusion"), confusion("m5_cv_confusion"))
    assert(m5.values.sum == m1.values.sum,
      "both pipelines score the identical held-out split")
    assert(m5.keys.map(_._1).toSet == m1.keys.map(_._1).toSet)
  }

  test("m3_label_metrics: per-label P/R/FPR/F1 tabulate m1's confusion matrix") {
    val m = confusion("m1_confusion")
    val total = m.values.sum
    rows("m3_label_metrics").foreach { x =>
      val l = x.getAs[Double]("label")
      val tp = m.getOrElse((l, l), 0L)
      val nTrue = m.collect { case ((a, _), n) if a == l => n }.sum
      val nPred = m.collect { case ((_, p), n) if p == l => n }.sum
      assert(x.getAs[Long]("tp") == tp, s"label $l tp")
      assert(x.getAs[Long]("n_true") == nTrue, s"label $l n_true")
      assert(x.getAs[Long]("n_pred") == nPred, s"label $l n_pred")
      val prec = if (nPred == 0) 0.0 else tp.toDouble / nPred
      val rec = if (nTrue == 0) 0.0 else tp.toDouble / nTrue
      val fpr = (nPred - tp).toDouble / (total - nTrue)
      assert(math.abs(micro(x, "precision") - q6(prec)) <= 1, s"label $l precision")
      assert(math.abs(micro(x, "recall") - q6(rec)) <= 1, s"label $l recall")
      assert(math.abs(micro(x, "fpr") - q6(fpr)) <= 1, s"label $l fpr")
      if (prec + rec > 0)
        assert(math.abs(micro(x, "f1") - q6(2 * prec * rec / (prec + rec))) <= 1)
    }
  }

  test("m4_weighted_metrics: weighted recall equals accuracy; weights aggregate m3") {
    val r = rows("m4_weighted_metrics").head
    assert(micro(r, "weighted_recall") == micro(r, "accuracy"),
      "Σ (n_true/N)·(tp/n_true) = Σtp/N — an algebraic identity")
    val m = confusion("m1_confusion")
    val total = m.values.sum
    val acc = m.collect { case ((l, p), n) if l == p => n }.sum.toDouble / total
    assert(math.abs(micro(r, "accuracy") - q6(acc)) <= 1)
    val wp = rows("m3_label_metrics").map(x =>
      x.getAs[Long]("n_true").toDouble / total * (micro(x, "precision") / 1e6)).sum
    assert(math.abs(micro(r, "weighted_precision") - q6(wp)) <= 3)
  }

  test("m9_cv_metrics: the weighted-recall/accuracy identity holds for the CV winner") {
    val r = rows("m9_cv_metrics").head
    assert(micro(r, "weighted_recall") == micro(r, "accuracy"))
    Seq("accuracy", "weighted_precision", "weighted_recall", "weighted_f1",
      "weighted_fpr").foreach(c =>
      assert(micro(r, c) >= 0 && micro(r, c) <= 1000000, c))
  }

  test("m10_naive_bayes: exactly the hash-test split, with exact correctness flags") {
    val r = rows("m10_naive_bayes")
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
    val testIds = Tables.documents(spark, fx).select("doc_id").as[Long].collect()
      .filter(id => Integer.parseInt(md5hex(id.toString).substring(0, 2), 16) >= 204)
      .toSet
    assert(r.map(_.getAs[Long]("doc_id")).toSet == testIds)
    r.foreach(x => assert(x.getAs[Long]("correct") ==
      (if (x.getAs[String]("lang") == x.getAs[String]("pred")) 1L else 0L)))
  }

  test("m13_calibration: ten score deciles with monotone mean confidence") {
    val r = rows("m13_calibration").sortBy(_.getAs[Long]("bin"))
    assert(r.map(_.getAs[Long]("bin")) == (1L to 10L).toVector)
    assert(r.map(_.getAs[Long]("n")).sum == 500L)
    val mp = r.map(micro(_, "mean_p"))
    assert(mp == mp.sorted, "mean predicted probability rises with the score decile")
    assert(r.forall(x => micro(x, "pos_rate") >= 0 && micro(x, "pos_rate") <= 1000000))
  }

  test("m14_pr_curve: precision/recall recompute from tp at each cut, using m15's n_pos") {
    val nPos = rows("m15_auc").head.getAs[Long]("n_pos")
    val r = rows("m14_pr_curve").sortBy(_.getAs[Long]("k"))
    assert(r.map(_.getAs[Long]("k")) == (1 to 20).map(_ * 25L).toVector)
    var prevTp = 0L
    r.foreach { x =>
      val (k, tp) = (x.getAs[Long]("k"), x.getAs[Long]("tp"))
      assert(tp >= prevTp, "deeper cuts can only add true positives"); prevTp = tp
      assert(micro(x, "precision") == q6(tp.toDouble / k))
      assert(micro(x, "recall") == q6(tp.toDouble / nPos))
    }
  }

  test("m15_auc: Mann-Whitney AUC recomputes from its own rank sum") {
    val r = rows("m15_auc").head
    val (rs, np, nn) = (r.getAs[Long]("rank_sum"), r.getAs[Long]("n_pos"), r.getAs[Long]("n_neg"))
    assert(np + nn == 500L)
    val auc = (rs - np * (np + 1) / 2).toDouble / (np * nn)
    assert(math.abs(micro(r, "auc") - q6(auc)) <= 1)
  }

  test("m16_chi2_features: nonnegative scores, frequency-sane, descending") {
    val r = rows("m16_chi2_features")
    assert(r.nonEmpty && r.size <= 20)
    val cs = r.map(micro(_, "chi2"))
    assert(cs == cs.sortBy(-_) && cs.forall(_ >= 0))
    assert(r.forall(x => x.getAs[Long]("n_docs") > 0 && x.getAs[Long]("n_docs") <= 500))
  }

  test("m17_ndcg: nDCG is DCG over ideal DCG, bounded by one") {
    val r = rows("m17_ndcg")
    assert(r.map(_.getAs[Long]("qid")).toSet == Set(0L, 1L, 2L, 3L, 4L))
    r.foreach { x =>
      assert(x.getAs[Long]("n_rel_at_k") <= x.getAs[Long]("n_rel_total"))
      assert(micro(x, "dcg") <= micro(x, "idcg"), "ideal ordering maximizes DCG")
      if (micro(x, "idcg") > 0)
        assert(math.abs(micro(x, "ndcg") -
          q6(micro(x, "dcg").toDouble / micro(x, "idcg"))) <= 2)
    }
  }

  test("m18_mcc: the coefficient recomputes from its own confusion cells") {
    val r = rows("m18_mcc").head
    val (tp, fp) = (r.getAs[Long]("tp"), r.getAs[Long]("fp"))
    val (fn, tn) = (r.getAs[Long]("fn"), r.getAs[Long]("tn"))
    assert(tp + fp + fn + tn == 500L)
    val den = math.sqrt((tp + fp).toDouble * (tp + fn) * (tn + fp) * (tn + fn))
    val mcc = if (den == 0) 0.0 else (tp * tn - fp * fn).toDouble / den
    assert(math.abs(micro(r, "mcc") - q6(mcc)) <= 1)
  }

  test("m2_multimodal_features: every asset carries typed opaque-payload features") {
    val r = rows("m2_multimodal_features")
    assert(r.size == 500)
    assert(r.map(_.getAs[String]("kind")).toSet == Set("image", "audio", "video"))
    r.foreach { x =>
      assert(x.getAs[Long]("n_bytes") > 0)
      assert(x.getAs[Int]("head_byte") >= 0 && x.getAs[Int]("head_byte") <= 255)
      assert(x.getAs[Int]("n_frames") >= 0)
    }
  }

  test("m20_decode_audit: ok and bad partition every asset of each modality") {
    val r = rows("m20_decode_audit")
    assert(r.map(_.getAs[String]("kind")).toSet == Set("image", "audio", "video"))
    assert(r.map(_.getAs[Long]("n_assets")).sum == 500L)
    r.foreach(x => assert(
      x.getAs[Long]("n_ok") + x.getAs[Long]("n_bad") == x.getAs[Long]("n_assets")))
  }

  test("m19_wav_stats: one stats row per audio asset; decodable ones carry samples") {
    val r = rows("m19_wav_stats")
    val audit = rows("m20_decode_audit")
      .find(_.getAs[String]("kind") == "audio").get
    assert(r.size.toLong == audit.getAs[Long]("n_assets"),
      "one row per audio asset (bad decodes surface with degenerate stats)")
    assert(r.count(_.getAs[Long]("n_samples") > 0).toLong >= audit.getAs[Long]("n_ok"))
    r.foreach { x =>
      assert(x.getAs[Long]("n_samples") >= 0)
      assert(x.getAs[Long]("sum_sq") >= 0)
    }
  }

  test("m6_resize_features: half-resolution dims with pixel-count and byte bounds") {
    val r = rows("m6_resize_features")
    val okImage = rows("m20_decode_audit")
      .find(_.getAs[String]("kind") == "image").get.getAs[Long]("n_ok")
    assert(r.size.toLong >= okImage, "at least one row per decodable BMP")
    r.filter(_.getAs[Int]("w") > 0).foreach { x =>
      assert(x.getAs[Int]("out_w") == x.getAs[Int]("w") / 2)
      assert(x.getAs[Int]("out_h") == x.getAs[Int]("h") / 2)
      val nPx = x.getAs[Long]("n_px")
      assert(nPx == x.getAs[Int]("out_w").toLong * x.getAs[Int]("out_h"))
      Seq("sum_r", "sum_g", "sum_b").foreach(c =>
        assert(x.getAs[Long](c) >= 0 && x.getAs[Long](c) <= 255L * nPx, c))
    }
  }

  test("m7_frame_sample: dense frame numbering with bounded RGB sums") {
    val r = rows("m7_frame_sample")
    assert(r.nonEmpty)
    for ((a, g0) <- r.groupBy(_.getAs[Long]("asset_id"))) {
      val g = g0.sortBy(_.getAs[Int]("frame_no"))
      assert(g.map(_.getAs[Int]("frame_no")) == (0 until g.size).toVector, s"asset $a")
      g.foreach { x =>
        val cap = 255L * 3 * x.getAs[Int]("w") * x.getAs[Int]("h")
        assert(x.getAs[Long]("sum_px") >= 0 && x.getAs[Long]("sum_px") <= cap, s"asset $a")
      }
    }
  }

  test("m21_learning_curve: nested subsets score one fixed test set") {
    checkCurve(rows("m21_learning_curve"))
  }

  test("m23_learnable_curve: accuracy never degrades as training data doubles") {
    val r = checkCurve(rows("m23_learnable_curve"))
    val accs = r.sortBy(_.getAs[Long]("train_pct")).map(_.getAs[Double]("accuracy"))
    assert(accs == accs.sorted, "a learnable label must benefit from more data")
  }

  private def checkCurve(r: Vector[Row]): Vector[Row] = {
    assert(r.map(_.getAs[Long]("train_pct")).toSet == Set(25L, 50L, 100L))
    val sorted = r.sortBy(_.getAs[Long]("train_pct"))
    val ns = sorted.map(_.getAs[Long]("n_train"))
    assert(ns == ns.sorted, "training subsets nest")
    val sizes = r.map(x => x.getAs[Long]("tp") + x.getAs[Long]("fp")
      + x.getAs[Long]("fn") + x.getAs[Long]("tn")).toSet
    assert(sizes.size == 1, "every point scores the same test set")
    r.foreach { x =>
      val tot = sizes.head.toDouble
      val acc = (x.getAs[Long]("tp") + x.getAs[Long]("tn")) / tot
      assert(math.abs(x.getAs[Double]("accuracy") - acc) < 1e-6)
      assert(x.getAs[Double]("mean_logloss") >= 0)
    }
    r
  }

  test("m22_model_weights: one finite converged weight row") {
    val r = rows("m22_model_weights").head
    Seq("w1", "w2", "b").foreach { c =>
      assert(math.abs(micro(r, c)) < 100L * 1000000L, s"$c diverged")
    }
  }

  test("m24_temp_scaling: the flagged temperature minimizes NLL over the grid") {
    val r = rows("m24_temp_scaling")
    assert(r.map(_.getAs[Double]("t")).toSet == Set(0.25, 0.5, 1.0, 2.0, 4.0))
    assert(r.count(_.getAs[Long]("is_best") == 1L) == 1)
    val best = r.find(_.getAs[Long]("is_best") == 1L).get
    assert(micro(best, "avg_nll") == r.map(micro(_, "avg_nll")).min)
    r.foreach(x => assert(micro(x, "avg_nll") > 0
      && micro(x, "avg_brier") >= 0 && micro(x, "avg_brier") <= 1000000))
  }

  test("m25_target_encoding: out-of-fold cells conserve the corpus; rates bounded") {
    val r = rows("m25_target_encoding")
    assert(r.map(_.getAs[Long]("fold")).toSet.subsetOf(Set(0L, 1L, 2L, 3L)))
    assert(r.map(_.getAs[Long]("n_fold")).sum == 500L)
    r.foreach { x =>
      assert(x.getAs[Long]("n_fold") > 0)
      assert(micro(x, "enc_oof") >= 0 && micro(x, "enc_oof") <= 1000000)
      assert(micro(x, "prior_oof") >= 0 && micro(x, "prior_oof") <= 1000000)
    }
  }

  test("m26_group_metrics: per-source slices conserve the corpus with bounded rates") {
    val r = rows("m26_group_metrics")
    assert(r.map(_.getAs[Long]("n")).sum == 500L)
    r.foreach { x =>
      Seq("acc", "tpr", "fpr", "ppr").foreach(c =>
        assert(micro(x, c) >= 0 && micro(x, c) <= 1000000, c))
    }
  }

  test("m27_assoc_rules: confidence dominates support; lift-ordered directed rules") {
    val r = rows("m27_assoc_rules")
    assert(r.nonEmpty && r.size <= 30)
    assert(r.forall(x => x.getAs[Long]("antecedent") != x.getAs[Long]("consequent")))
    assert(r.forall(x => micro(x, "confidence") >= micro(x, "support")),
      "confidence = n_ab/s_ant >= n_ab/N = support")
    val ls = r.map(micro(_, "lift"))
    assert(ls == ls.sortBy(-_) && ls.forall(_ > 0))
  }

  test("m28_w2v_analogy: each probe resolves outside its own probe words") {
    val r = rows("m28_w2v_analogy")
    assert(r.size == 3)
    r.foreach { x =>
      val probe = Set(x.getAs[String]("a"), x.getAs[String]("b"), x.getAs[String]("c"))
      assert(!probe.contains(x.getAs[String]("predicted")),
        "3CosAdd excludes the probe words themselves")
      assert(math.abs(micro(x, "cos")) <= 1000000)
    }
  }

  test("m29_decile_lift: pure-Scala ntile/lift recompute from the m12 scores") {
    val r = rows("m29_decile_lift")
    assert(r.size == 10)
    // independent recompute: rank m12's scores desc, ntile-10 by hand
    val y = Tables.documents(spark, fx)
      .select(col("doc_id"), (col("lang") === "en").cast("long").as("y"))
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    val scored = rows("m12_logreg_gd")
      .map(x => (x.getAs[Long]("doc_id"), micro(x, "p")))
      .sortBy { case (id, p) => (-p, id) }
    val n = scored.size
    val base = n / 10
    val extra = n % 10 // ntile: first (n % 10) buckets get one extra row
    val bounds = (0 to 10).map(i => i * base + math.min(i, extra))
    val expected = (0 until 10).map { i =>
      val slice = scored.slice(bounds(i), bounds(i + 1))
      (slice.size.toLong, slice.map(s => y(s._1)).sum)
    }
    val totPos = expected.map(_._2).sum
    var cumN = 0L; var cumPos = 0L
    r.zip(expected).foreach { case (x, (en, epos)) =>
      cumN += en; cumPos += epos
      assert(x.getAs[Long]("n") == en, s"decile ${x.getAs[Long]("decile")} n")
      assert(x.getAs[Long]("n_pos") == epos, s"decile ${x.getAs[Long]("decile")} n_pos")
      assert(math.abs(micro(x, "resp_rate") - math.round(epos.toDouble / en * 1e6)) <= 1,
        s"decile ${x.getAs[Long]("decile")} resp_rate")
      val lift = (cumPos.toDouble / cumN) / (totPos.toDouble / n)
      assert(math.abs(micro(x, "cum_lift") - math.round(lift * 1e6)) <= 1,
        s"decile ${x.getAs[Long]("decile")} cum_lift")
      assert(math.abs(micro(x, "cum_gain") -
        math.round(cumPos.toDouble / totPos * 1e6)) <= 1,
        s"decile ${x.getAs[Long]("decile")} cum_gain")
    }
    // full-depth sanity: all positives captured, lift converges to 1
    assert(micro(r.last, "cum_gain") == 1000000L)
    assert(micro(r.last, "cum_lift") == 1000000L)
  }

  test("m30_ks_drift: per-source KS matches a pure-Scala two-sample ECDF recompute") {
    val r = rows("m30_ks_drift")
    val srcOf = Tables.documents(spark, fx).select("doc_id", "source")
      .collect().map(x => x.getLong(0) -> x.getString(1)).toMap
    val scores = rows("m12_logreg_gd")
      .map(x => srcOf(x.getAs[Long]("doc_id")) -> micro(x, "p"))
    val n = scores.size.toLong
    assert(r.size == srcOf.values.toSet.size, "one row per source")
    r.foreach { x =>
      val src = x.getAs[String]("source")
      val a = scores.collect { case (s, p) if s == src => p }.sorted
      val b = scores.collect { case (s, p) if s != src => p }.sorted
      assert(x.getAs[Long]("n_src") == a.size.toLong)
      assert(x.getAs[Long]("n_rest") == b.size.toLong)
      // exact integer sup over the union of jump points
      val ksNum = (a ++ b).distinct.map { v =>
        math.abs(a.count(_ <= v).toLong * b.size - b.count(_ <= v).toLong * a.size)
      }.max
      val want = math.round(ksNum.toDouble / (a.size.toLong * b.size) * 1e6)
      assert(math.abs(micro(x, "ks") - want) <= 1, s"$src ks")
      assert(micro(x, "ks") >= 0 && micro(x, "ks") <= 1000000, src)
    }
    assert(r.map(_.getAs[Long]("n_src")).sum == n, "sources partition the corpus")
    val ks = r.map(micro(_, "ks"))
    assert(ks == ks.sortBy(-_), "ordered by ks desc")
  }
}
