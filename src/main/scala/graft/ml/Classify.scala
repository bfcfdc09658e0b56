package graft.ml

import org.apache.spark.ml.{Pipeline, PipelineModel}
import org.apache.spark.ml.classification.LogisticRegression
import org.apache.spark.ml.evaluation.MulticlassClassificationEvaluator
import org.apache.spark.ml.feature.{HashingTF, StopWordsRemover, StringIndexer, Tokenizer}
import org.apache.spark.ml.tuning.{CrossValidator, CrossValidatorModel, ParamGridBuilder}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Text-classification pipeline + model selection + metrics
  * (ref: StandaloneScala/AirlineSentimentAnalysis.scala — pipeline stages
  * :43-67, param grid + 2-fold CV :72-85, MulticlassMetrics :100-136).
  *
  * Same spark.ml stage chain as the reference (Tokenizer →
  * StopWordsRemover → HashingTF → StringIndexer → LogisticRegression in
  * a Pipeline; SURVEY §2.8 M3-M8, unchanged — mllib is available), with
  * two engine-grade changes:
  *  - metrics are DataFrame-native (confusion matrix =
  *    groupBy(label, prediction).count + joins) instead of the RDD-based
  *    MulticlassMetrics (ref :100) — stays in Catalyst, scales, and the
  *    same frame doubles as the registered query output;
  *  - the default grid is small (SURVEY §7: the reference's 36-combo ×
  *    2-fold = 72 fits dominates its runtime; grid size is a caller knob).
  *
  * Demo task: predict `documents.lang` from `text` (the only labeled
  * text in the testdata). Train/test split on doc_id parity —
  * deterministic, no RNG.
  */
object Classify {
  /** Reference stage chain (ref :43-67), label column → `label`,
    * text column → tokens → filtered → TF vector `features`. */
  def pipeline(numFeatures: Int = 1024, maxIter: Int = 20): Pipeline = {
    val tok = new Tokenizer().setInputCol("text").setOutputCol("tokens")
    val stop = new StopWordsRemover().setInputCol("tokens").setOutputCol("filtered")
    val tf = new HashingTF().setInputCol("filtered").setOutputCol("features")
      .setNumFeatures(numFeatures)
    val idx = new StringIndexer().setInputCol("lang").setOutputCol("label")
      .setStringOrderType("alphabetAsc") // deterministic label ids
    val lr = new LogisticRegression().setMaxIter(maxIter)
    new Pipeline().setStages(Array(tok, stop, tf, idx, lr))
  }

  /** 2-fold cross-validation over a small grid (ref :72-85 shape:
    * elasticNet × regParam × numFeatures; folds=2, parallelism=2). */
  def crossValidate(train: DataFrame): CrossValidatorModel = {
    val pipe = pipeline()
    val lr = pipe.getStages.last.asInstanceOf[LogisticRegression]
    val tf = pipe.getStages(2).asInstanceOf[HashingTF]
    val grid = new ParamGridBuilder()
      .addGrid(lr.regParam, Array(0.1, 0.01))
      .addGrid(tf.numFeatures, Array(256, 1024))
      .build()
    new CrossValidator()
      .setEstimator(pipe)
      .setEvaluator(new MulticlassClassificationEvaluator().setMetricName("accuracy"))
      .setEstimatorParamMaps(grid)
      .setNumFolds(2)
      .setParallelism(2)
      .setSeed(42L)
      .fit(train)
  }

  /** Deterministic parity split: even doc_id → train, odd → test. */
  def split(docs: DataFrame): (DataFrame, DataFrame) =
    (docs.filter(col("doc_id") % 2 === 0), docs.filter(col("doc_id") % 2 === 1))

  /** DataFrame-native confusion matrix (ref :100-110 semantics). */
  def confusionMatrix(scored: DataFrame): DataFrame =
    scored.groupBy(col("label"), col("prediction"))
      .agg(count(lit(1)).as("n"))
      .orderBy("label", "prediction")

  /** Per-label precision/recall/F1 + overall accuracy, all relational
    * (ref :113-136 semantics without the RDD hop). */
  def metrics(scored: DataFrame): DataFrame = {
    val cm = scored.groupBy("label", "prediction").agg(count(lit(1)).as("n"))
    val byLabel = cm.groupBy("label").agg(sum("n").as("n_true"))
    val byPred = cm.groupBy("prediction").agg(sum("n").as("n_pred"))
    val tp = cm.filter(col("label") === col("prediction"))
      .select(col("label"), col("n").as("tp"))
    byLabel.join(tp, Seq("label"), "left_outer")
      .join(byPred, byLabel("label") === byPred("prediction"), "left_outer")
      .select(col("label"),
        coalesce(col("tp"), lit(0L)).as("tp"), col("n_true"),
        coalesce(col("n_pred"), lit(0L)).as("n_pred"))
      .withColumn("precision", round(col("tp") / col("n_pred"), 6))
      .withColumn("recall", round(col("tp") / col("n_true"), 6))
      .withColumn("f1", round(lit(2) * col("precision") * col("recall") /
        (col("precision") + col("recall")), 6))
      .orderBy("label")
  }

  /** Train on even ids, score odd ids, return the confusion matrix.
    * Registered without an oracle (model fitting is not SQL-expressible;
    * driver rows-only check), but fully deterministic: fixed seed, fixed
    * split, alphabetic label indexing. */
  def trainAndConfusion(spark: SparkSession, dir: String): DataFrame = {
    val (train, test) = split(Tables.documents(spark, dir))
    val model: PipelineModel = pipeline().fit(train)
    confusionMatrix(model.transform(test))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "m1_confusion" -> trainAndConfusion _,
  )
}
