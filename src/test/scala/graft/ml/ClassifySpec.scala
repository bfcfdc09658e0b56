package graft.ml

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sources.Tables

class ClassifySpec extends SparkSpec {
  import spark.implicits._

  /** Read a DECIMAL(18,6) metric column back as Double for comparisons. */
  private def dec(r: org.apache.spark.sql.Row, c: String): Double =
    r.getAs[java.math.BigDecimal](c).doubleValue

  test("pipeline fit+transform on a separable toy corpus is near-perfect") {
    val docs = (0 until 80).map { i =>
      if (i % 2 == 0) (i.toLong, "apple banana cherry fruit salad sweet", "en")
      else (i.toLong, "der hund die katze und das haus", "de")
    }.toDF("doc_id", "text", "lang")
    val model = Classify.pipeline().fit(docs)
    val scored = model.transform(docs)
    val acc = scored.filter(col("label") === col("prediction")).count().toDouble /
      scored.count()
    assert(acc > 0.99, s"separable corpus accuracy was $acc")
  }

  test("confusion matrix + metrics shapes and accuracy math") {
    val scored = Seq(
      (0.0, 0.0), (0.0, 0.0), (0.0, 1.0), (1.0, 1.0), (1.0, 0.0), (1.0, 1.0))
      .toDF("label", "prediction")
    val cm = Classify.confusionMatrix(scored).collect()
      .map(r => (r.getDouble(0), r.getDouble(1), r.getLong(2)))
    assert(cm.toSeq == Seq((0.0, 0.0, 2L), (0.0, 1.0, 1L), (1.0, 0.0, 1L), (1.0, 1.0, 2L)))
    val m = Classify.metrics(scored).collect()
    val row0 = m.find(_.getDouble(0) == 0.0).get
    // metric ratios are DECIMAL(18,6) — the hashed-output type
    assert(dec(row0, "precision") == 0.666667) // round(2/3, 6)
    assert(dec(row0, "recall") == 0.666667)
  }

  test("metrics + weightedMetrics match MulticlassMetrics on every ref-printed stat") {
    // every statistic AirlineSentimentAnalysis.scala:109-136 prints:
    // accuracy, per-label precision/recall/FPR/F1, weighted P/R/F1/FPR
    val scored = Seq(
      (0.0, 0.0), (0.0, 0.0), (0.0, 1.0), (1.0, 1.0),
      (1.0, 0.0), (1.0, 1.0), (2.0, 2.0), (2.0, 0.0))
      .toDF("label", "prediction")
    val rdd = scored.rdd.map(r => (r.getDouble(1), r.getDouble(0)))
    val mm = new org.apache.spark.mllib.evaluation.MulticlassMetrics(rdd)
    def close(a: Double, b: Double) = math.abs(a - b) < 1e-5
    val perLabel = Classify.metrics(scored).collect()
      .map(r => r.getDouble(0) -> r).toMap
    mm.labels.foreach { l =>
      val row = perLabel(l)
      assert(close(dec(row, "precision"), mm.precision(l)), s"precision($l)")
      assert(close(dec(row, "recall"), mm.recall(l)), s"recall($l)")
      assert(close(dec(row, "fpr"), mm.falsePositiveRate(l)), s"fpr($l)")
      assert(close(dec(row, "f1"), mm.fMeasure(l)), s"f1($l)")
    }
    val w = Classify.weightedMetrics(scored).head()
    assert(close(dec(w, "accuracy"), mm.accuracy), "accuracy")
    assert(close(dec(w, "weighted_precision"), mm.weightedPrecision), "wP")
    assert(close(dec(w, "weighted_recall"), mm.weightedRecall), "wR")
    assert(close(dec(w, "weighted_f1"), mm.weightedFMeasure), "wF1")
    assert(close(dec(w, "weighted_fpr"), mm.weightedFalsePositiveRate), "wFPR")
  }

  test("trainAndConfusion on real sf0.001 docs beats nothing-learned floor") {
    val cm = Classify.trainAndConfusion(spark, sf("sf0.001"))
    val total = cm.agg(sum("n")).head().getLong(0)
    assert(total > 0)
    // diagonal mass ≥ majority-class share − slack (model can't be worse
    // than badly-tuned majority voting on this near-signal-free corpus)
    val diag = cm.filter(col("label") === col("prediction"))
      .agg(sum("n")).head().getLong(0)
    assert(diag.toDouble / total > 0.2, s"diag=$diag total=$total")
  }

  test("crossValidate picks a model and scores the test half") {
    val (train, test) = Classify.split(Tables.documents(spark, sf("sf0.001")))
    val cv = Classify.crossValidate(train)
    // reference-shaped grid: 2 regParam × 2 elasticNet × 2 maxIter ×
    // 2 numFeatures (all four of the reference's axes, scaled)
    assert(cv.avgMetrics.length == 16)
    val scored = cv.transform(test)
    assert(scored.select("prediction").distinct().count() >= 1)
  }

  test("fullGrid opt-in runs the reference's exact 36-combo grid (3x2x2x3)") {
    // ref AirlineSentimentAnalysis.scala:72-85: maxIter{5,10,20} x
    // elasticNet{.1,.01} x regParam{.1,.01} x numFeatures{10,100,1000};
    // default m9 stays on the 16-combo scaled grid (previous test)
    val full = Classify.buildCrossValidator(fullGrid = true)
    assert(full.getEstimatorParamMaps.length == 36)
    // distinct memo key from the default grid — the two variants can
    // never collide in the per-session fit cache
    assert(Classify.cvFitKey(full) != Classify.cvFitKey(Classify.buildCrossValidator()))
    val (train, test) = Classify.split(Tables.documents(spark, sf("sf0.001")))
    val cv = Classify.crossValidate(train, fullGrid = true)
    assert(cv.avgMetrics.length == 36)
    assert(cv.avgMetrics.forall(m => !m.isNaN && m >= 0.0 && m <= 1.0))
    val scored = cv.transform(test)
    assert(scored.select("prediction").distinct().count() >= 1)
  }

  test("fitKey is stable across fresh pipeline instances (memo hit)") {
    // array-valued params (StopWordsRemover.stopWords) must render
    // element-wise, not as per-instance identity-hash strings
    assert(Classify.fitKey(Classify.pipeline()) ==
      Classify.fitKey(Classify.pipeline()))
    assert(Classify.fitKey(Classify.pipelineCountVectorizer()) ==
      Classify.fitKey(Classify.pipelineCountVectorizer()))
    // and structurally different pipelines must NOT alias
    assert(Classify.fitKey(Classify.pipeline()) !=
      Classify.fitKey(Classify.pipelineCountVectorizer()))
    assert(Classify.fitKey(Classify.pipeline(numFeatures = 512)) !=
      Classify.fitKey(Classify.pipeline(numFeatures = 1024)))
  }

  test("chi2Features: discriminative words max out, ubiquitous words score 0") {
    import spark.implicits._
    // aa only in en docs, bb only in de docs, zz in every doc
    val docs = Seq(
      (1L, "aa zz", "en"), (2L, "aa zz", "en"),
      (3L, "bb zz", "de"), (4L, "bb zz", "de")).toDF("doc_id", "text", "lang")
    val got = Classify.chi2Features(docs, topK = 10).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getDecimal(3).doubleValue)).toSeq
    assert(got.length == 6) // 2 langs × 3 vocab words, full grid incl. a=0
    // perfect 2×2 association (present OR absent) → χ² = N = 4;
    // the word present in every doc has a degenerate margin → 0
    val byPair = got.map(t => (t._1, t._2) -> (t._3, t._4)).toMap
    assert(byPair(("en", "aa")) == ((2L, 4.0)))
    assert(byPair(("de", "bb")) == ((2L, 4.0)))
    assert(byPair(("de", "aa")) == ((0L, 4.0))) // absence is evidence too
    assert(byPair(("en", "zz"))._2 == 0.0 && byPair(("de", "zz"))._2 == 0.0)
    // sorted by χ² desc with (lang, word) tie order
    assert(got.sameElements(got.sortBy(t => (-t._4, t._1, t._2))))
  }

  test("naiveBayesLang: disjoint vocabularies classify eval docs perfectly") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // two languages with disjoint vocab; the md5 split decides
    // train/eval per doc_id, so assert against the same rule
    val docs = (0L until 60L).map { i =>
      if (i % 2 == 0) (i, s"alpha beta gamma w$i alpha", "aa")
      else (i, s"delta epsilon zeta w$i delta", "bb")
    }.toDF("doc_id", "text", "lang")
    val evalIds = docs
      .select(col("doc_id"), graft.text.TextStats.hashBucket(col("doc_id")).as("b"))
      .collect().filter(_.getInt(1) >= 204).map(_.getLong(0)).toSet
    assert(evalIds.nonEmpty && evalIds.size < 60) // both splits populated
    val got = Classify.naiveBayesLang(docs).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(got.map(_._1).toSet == evalIds) // exactly the eval split scored
    got.foreach { case (id, lang, pred, correct) =>
      assert(pred == lang && correct == 1L, s"doc $id: $pred vs $lang")
    }
  }
}
