package graft.ml

import graft.plans.Lineage.CheckpointOps
import java.math.{BigDecimal => JBigDecimal, RoundingMode}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.sources.Tables
import graft.text.Tokenize

/** Logistic regression trained from scratch by full-batch gradient
  * descent, with EVERY training step DuckDB-oracle-checked — the
  * optimization-loop companion to Similarity.kmeans (iterative ML where
  * the oracle re-derives the whole algorithm, not a persisted-fit dump).
  * The MLlib pipeline path (Classify.scala m1/m3-m5/m9) remains the
  * production trainer; this operator exists to pin down the exact
  * arithmetic of a distributed GD step.
  *
  * Model: p(en | doc) = σ(w₁·x₁ + w₂·x₂ + b) over two cheap features
  * (kilo-chars from the table's own n_chars column, hecto-tokens from
  * the shared tokenizer), label y = [lang = 'en'].
  *
  * Determinism contract (NOTES rules): features are rounded to 6 dp into
  * DECIMAL(18,6) at birth; each step's gradient sums Σ(p−y)·x are exact
  * decimal aggregates (order-independent under any partitioning); the
  * only libm call (exp in σ) is immediately rounded to 6 dp into decimal
  * (the x14 ln precedent); weights live as 6-dp decimals on both
  * engines, so step k+1 starts from byte-identical weights.
  *
  * 100 TB shape per step: ONE corpus scan producing three partial-
  * aggregated decimal sums (map-side combine, 3 numbers per partition to
  * the driver — collecting the gradient IS the algorithm, the same
  * justification as the Graph loops' convergence aggregates). The
  * feature frame is localCheckpoint'd once and reused by every step.
  */
object LogRegGd {
  private val Out6 = DecimalType(18, 6)

  /** Per-doc features + label; checkpointed — every GD step rescans it. */
  private def features(docs: DataFrame): DataFrame = docs
    .select(col("doc_id"),
      round(col("n_chars") / 1000.0, 6).cast(Out6).as("x1"),
      round(size(Tokenize.rawTokens(col("text"))) / 100.0, 6).cast(Out6).as("x2"),
      (col("lang") === "en").cast("long").as("y"))

  private def featuresSql: String =
    s"""SELECT doc_id,
       |  CAST(round(n_chars / 1000.0, 6) AS DECIMAL(18,6)) AS x1,
       |  CAST(round(len(${Tokenize.rawTokensSql("text")}) / 100.0, 6) AS DECIMAL(18,6)) AS x2,
       |  CAST(lang = 'en' AS BIGINT) AS y
       |FROM documents""".stripMargin

  /** σ(z) rounded to 6 dp as a Column over decimal weight literals. */
  private def pCol(w1: JBigDecimal, w2: JBigDecimal, b: JBigDecimal) = {
    val z = (lit(w1) * col("x1") + lit(w2) * col("x2") + lit(b)).cast("double")
    round(lit(1.0) / (lit(1.0) + exp(-z)), 6).cast(Out6)
  }

  private def round6(d: Double): JBigDecimal =
    JBigDecimal.valueOf(d).setScale(6, RoundingMode.HALF_UP)

  /** Train `steps` full-batch GD steps over a (x1, x2, y) feature frame,
    * returning the final 6-dp decimal weights (w1, w2, b). Extracted so
    * [[learningCurve]] can train on subsets and score the full set. */
  def trainWeights(f: DataFrame, lr: JBigDecimal = new JBigDecimal("0.5"),
                   steps: Int = 2): (JBigDecimal, JBigDecimal, JBigDecimal) = {
    val n = f.count()
    var w1 = JBigDecimal.ZERO.setScale(6)
    var w2 = JBigDecimal.ZERO.setScale(6)
    var b = JBigDecimal.ZERO.setScale(6)
    for (_ <- 1 to steps) {
      // Σ(p−y)·x as exact decimal sums — one scan, three partial sums.
      // Operand types narrowed EXPLICITLY (residual fits (8,6), features
      // fit (10,6)) so the product is DECIMAL(19,12) exact on both
      // engines; at default widths Spark's 38-digit cap would reduce the
      // product scale below DuckDB's and the sums would diverge.
      val r = (col("p") - col("y")).cast(DecimalType(8, 6))
      val g = f.select(pCol(w1, w2, b).as("p"), col("x1"), col("x2"), col("y"))
        .agg(sum(r * col("x1").cast(DecimalType(10, 6))).as("s1"),
          sum(r * col("x2").cast(DecimalType(10, 6))).as("s2"),
          sum(r).as("sb"))
        .head()
      def grad(i: Int): JBigDecimal =
        round6(g.getDecimal(i).doubleValue() / n)
      // w ← round(w − lr·grad, 6): exact decimal product, one clean
      // double cast before the quantize (the oracle mirrors this text)
      def step(w: JBigDecimal, gr: JBigDecimal): JBigDecimal =
        round6(w.subtract(lr.multiply(gr)).doubleValue())
      val (g1, g2, gb) = (grad(0), grad(1), grad(2))
      w1 = step(w1, g1); w2 = step(w2, g2); b = step(b, gb)
    }
    (w1, w2, b)
  }

  /** Train `steps` full-batch GD steps, return per-doc final scores:
    * (doc_id, p, pred, correct). */
  def logregGd(docs: DataFrame, lr: JBigDecimal = new JBigDecimal("0.5"),
               steps: Int = 2): DataFrame = {
    val f = features(docs).loopCheckpoint(true)
    val (w1, w2, b) = trainWeights(f, lr, steps)
    f.select(col("doc_id"), pCol(w1, w2, b).as("p"), col("y"))
      .select(col("doc_id"), col("p"),
        (col("p") >= 0.5).cast("long").as("pred"),
        ((col("p") >= 0.5).cast("long") === col("y")).cast("long").as("correct"))
      .orderBy("doc_id")
  }

  /** The unrolled GD-step CTE chain with a name suffix, training on the
    * `featSrc` CTE — shared by [[logregGdSql]] (sfx = "", featSrc = "f")
    * and [[learningCurveSql]] (one suffixed chain per training subset).
    * Emits `,w0$sfx AS (...), p0$sfx ..., w$steps$sfx AS (...)`. */
  private def gdChainSql(sfx: String, featSrc: String, lr: String,
                         steps: Int): String = {
    val sb = new StringBuilder
    sb ++= s""", w0$sfx AS (
              |  SELECT CAST(0 AS DECIMAL(18,6)) AS w1, CAST(0 AS DECIMAL(18,6)) AS w2,
              |    CAST(0 AS DECIMAL(18,6)) AS b
              |)""".stripMargin
    for (i <- 0 until steps) {
      sb ++= s""",
                |p$i$sfx AS (
                |  SELECT f.x1, f.x2, f.y,
                |    CAST(round(1 / (1 + exp(-(CAST(w.w1 * f.x1 + w.w2 * f.x2 + w.b AS DOUBLE)))), 6)
                |      AS DECIMAL(18,6)) AS p
                |  FROM $featSrc f, w$i$sfx w
                |), g$i$sfx AS (
                |  SELECT
                |    CAST(round(CAST(SUM(CAST(p - y AS DECIMAL(8,6)) * CAST(x1 AS DECIMAL(10,6))) AS DOUBLE) / COUNT(*), 6) AS DECIMAL(18,6)) AS g1,
                |    CAST(round(CAST(SUM(CAST(p - y AS DECIMAL(8,6)) * CAST(x2 AS DECIMAL(10,6))) AS DOUBLE) / COUNT(*), 6) AS DECIMAL(18,6)) AS g2,
                |    CAST(round(CAST(SUM(CAST(p - y AS DECIMAL(8,6))) AS DOUBLE) / COUNT(*), 6) AS DECIMAL(18,6)) AS gb
                |  FROM p$i$sfx
                |), w${i + 1}$sfx AS (
                |  SELECT
                |    CAST(round(CAST(w.w1 - $lr * g.g1 AS DOUBLE), 6) AS DECIMAL(18,6)) AS w1,
                |    CAST(round(CAST(w.w2 - $lr * g.g2 AS DOUBLE), 6) AS DECIMAL(18,6)) AS w2,
                |    CAST(round(CAST(w.b - $lr * g.gb AS DOUBLE), 6) AS DECIMAL(18,6)) AS b
                |  FROM w$i$sfx w, g$i$sfx g
                |)""".stripMargin
    }
    sb.toString
  }

  /** Oracle: the GD steps unrolled as CTEs — each step's gradient CTE
    * reads the previous weight CTE (1-row cross join), ending in the
    * per-doc scores at the final weights. */
  def logregGdSql(lr: String = "0.5", steps: Int = 2): String = {
    val sb = new StringBuilder
    sb ++= s"""WITH f AS (
              |  ${featuresSql.replace("\n", "\n  ")}
              |)""".stripMargin
    sb ++= gdChainSql("", "f", lr, steps)
    sb ++= s"""
              |SELECT f.doc_id,
              |  CAST(round(1 / (1 + exp(-(CAST(w.w1 * f.x1 + w.w2 * f.x2 + w.b AS DOUBLE)))), 6)
              |    AS DECIMAL(18,6)) AS p,
              |  CAST(CAST(round(1 / (1 + exp(-(CAST(w.w1 * f.x1 + w.w2 * f.x2 + w.b AS DOUBLE)))), 6)
              |    AS DECIMAL(18,6)) >= 0.5 AS BIGINT) AS pred,
              |  CAST((CAST(round(1 / (1 + exp(-(CAST(w.w1 * f.x1 + w.w2 * f.x2 + w.b AS DOUBLE)))), 6)
              |    AS DECIMAL(18,6)) >= 0.5) = (f.y = 1) AS BIGINT) AS correct
              |FROM f, w$steps w ORDER BY f.doc_id""".stripMargin
    sb.toString
  }

  /** Calibration deciles (reliability diagram) for [[logregGd]]'s
    * scores: equal-frequency score bins (ntile — the construction that
    * stays informative when scores cluster, as 2 GD steps from zero
    * weights do), with per-bin count, mean predicted probability, and
    * observed positive rate. A well-calibrated model has mean_p ≈
    * pos_rate per bin; the gap IS the calibration error. The ntile
    * window ranks the narrow (doc_id, p, y) score table, never corpus
    * text (the x15 pattern); ties ordered (p, doc_id) — total order,
    * both engines bucket identically. Sums are exact decimal; one clean
    * double division before the round→DECIMAL output cast. */
  def calibration(scored: DataFrame, n: Int = 10): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(asc("p"), asc("doc_id"))
    scored
      .select(col("p"), col("y"), ntile(n).over(w).cast("bigint").as("bin"))
      .groupBy("bin")
      .agg(count(lit(1)).as("n"),
        sum(col("p")).as("sum_p"),
        sum(col("y")).cast("long").as("n_pos"))
      .select(col("bin"), col("n"),
        round(col("sum_p").cast("double") / col("n"), 6)
          .cast(Out6).as("mean_p"),
        round(col("n_pos").cast("double") / col("n"), 6)
          .cast(Out6).as("pos_rate"))
      .orderBy("bin")
  }

  /** m29: decile lift / gains table for [[logregGd]]'s scores — the
    * targeting-eval twin of m13's reliability diagram: rank documents
    * by score DESC into equal-frequency deciles ((p desc, doc_id asc)
    * total order, both engines bucket identically), then per decile
    * the response rate, and cumulatively the lift over the base rate
    * and the gain (share of all positives captured so far). Decile 1's
    * lift is what a campaign gains by contacting only the top 10%; the
    * gains column is the curve mailed-depth decisions read.
    *
    * Determinism: counts are integers; every ratio is a double
    * division of exact integer sums, round(·, 6)-quantized at birth
    * (identical expression chain oracle-side). The cumulative windows
    * run over the 10-row aggregate, not the corpus.
    *
    * 100 TB shape: like m13/x15, the ntile window ranks the narrow
    * (doc_id, p, y) score table — one global sort of a 3-column frame,
    * never corpus text; everything after is a 10-row frame. */
  def decileLift(scored: DataFrame, n: Int = 10): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(desc("p"), asc("doc_id"))
    val wc = org.apache.spark.sql.expressions.Window
      .orderBy("decile").rowsBetween(Long.MinValue, 0)
    val wt = org.apache.spark.sql.expressions.Window
      .orderBy("decile").rowsBetween(Long.MinValue, Long.MaxValue)
    scored
      .select(col("p"), col("y"), ntile(n).over(w).cast("bigint").as("decile"))
      .groupBy("decile")
      .agg(count(lit(1)).as("n"), sum(col("y")).cast("long").as("n_pos"))
      .withColumn("cum_n", sum("n").over(wc).cast("long"))
      .withColumn("cum_pos", sum("n_pos").over(wc).cast("long"))
      .withColumn("tot_n", sum("n").over(wt).cast("long"))
      .withColumn("tot_pos", sum("n_pos").over(wt).cast("long"))
      .select(col("decile"), col("n"), col("n_pos"),
        round(col("n_pos").cast("double") / col("n"), 6)
          .cast(Out6).as("resp_rate"),
        round((col("cum_pos").cast("double") / col("cum_n")) /
          (col("tot_pos").cast("double") / col("tot_n")), 6)
          .cast(Out6).as("cum_lift"),
        round(col("cum_pos").cast("double") / col("tot_pos"), 6)
          .cast(Out6).as("cum_gain"))
      .orderBy("decile")
  }

  def decileLiftSql(lr: String = "0.5", steps: Int = 2, n: Int = 10): String =
    s"""WITH scored AS (
       |  ${logregGdSql(lr, steps).replace("\n", "\n  ")}
       |), withy AS (
       |  SELECT s.doc_id, s.p, CAST(d.lang = 'en' AS BIGINT) AS y
       |  FROM scored s JOIN documents d USING (doc_id)
       |), binned AS (
       |  SELECT p, y,
       |    CAST(ntile($n) OVER (ORDER BY p DESC, doc_id ASC) AS BIGINT) AS decile
       |  FROM withy
       |), agg AS (
       |  SELECT decile, count(*) AS n, CAST(SUM(y) AS BIGINT) AS n_pos
       |  FROM binned GROUP BY decile
       |), cum AS (
       |  SELECT decile, n, n_pos,
       |    CAST(SUM(n) OVER (ORDER BY decile ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_n,
       |    CAST(SUM(n_pos) OVER (ORDER BY decile ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_pos,
       |    CAST(SUM(n) OVER () AS BIGINT) AS tot_n,
       |    CAST(SUM(n_pos) OVER () AS BIGINT) AS tot_pos
       |  FROM agg
       |)
       |SELECT decile, n, n_pos,
       |  CAST(round(CAST(n_pos AS DOUBLE) / n, 6) AS DECIMAL(18,6)) AS resp_rate,
       |  CAST(round((CAST(cum_pos AS DOUBLE) / cum_n) /
       |    (CAST(tot_pos AS DOUBLE) / tot_n), 6) AS DECIMAL(18,6)) AS cum_lift,
       |  CAST(round(CAST(cum_pos AS DOUBLE) / tot_pos, 6) AS DECIMAL(18,6)) AS cum_gain
       |FROM cum ORDER BY decile""".stripMargin

  /** m30: per-source Kolmogorov–Smirnov drift audit of the model score
    * distribution — the standard two-sample test a serving stack runs
    * per data slice ("which source's score distribution deviates most
    * from the rest of the corpus?"): for each source,
    * KS = sup_p |F_src(p) − F_rest(p)|, evaluated exactly.
    *
    * Exactness: the sup over a step-function difference is attained at
    * a jump point, and every jump point is one of the DISTINCT 6-dp
    * score values, so the whole test is integer arithmetic on ECDF
    * counts — |cum_src·n_rest − cum_rest·n_src| cross-multiplied in
    * DECIMAL(38,0) (n²-scaled products pass 2⁶³ at corpus scale — the
    * lift lesson), one double division at output. No sampling, no
    * approximation, no libm.
    *
    * 100 TB shape: scores are round(·, 6)-quantized at birth, so the
    * distinct-value grid is BOUNDED at ≤ 1e6+1 rows regardless of
    * corpus size; the evaluation frame is |sources| × |distinct p| —
    * metadata-sized by construction. One corpus-touching aggregate
    * (the (source, p) counts, map-side combinable), then everything
    * runs on the bounded grid; the global total rides a broadcast
    * 1-row frame. */
  def ksDrift(scored: DataFrame, docs: DataFrame): DataFrame = {
    val W = org.apache.spark.sql.expressions.Window
    val D380 = DecimalType(38, 0)
    val counts = scored.join(docs.select("doc_id", "source"), "doc_id")
      .groupBy("source", "p").agg(count(lit(1)).as("c"))
    val srcTot = counts.groupBy("source").agg(sum("c").cast("long").as("n_src"))
    val grid = srcTot.crossJoin(counts.select("p").distinct())
      .join(counts, Seq("source", "p"), "left")
      .na.fill(0, Seq("c"))
      .withColumn("cum_src",
        sum("c").over(W.partitionBy("source").orderBy("p")
          .rowsBetween(Long.MinValue, 0)).cast("long"))
    val cumAll = counts.groupBy("p").agg(sum("c").cast("long").as("cp"))
      .withColumn("cum_all",
        sum("cp").over(W.orderBy("p").rowsBetween(Long.MinValue, 0)).cast("long"))
      .select("p", "cum_all")
    val nTot = broadcast(srcTot.agg(sum("n_src").cast("long").as("n_total")))
    grid.join(cumAll, "p").crossJoin(nTot)
      .select(col("source"), col("n_src"),
        (col("n_total") - col("n_src")).as("n_rest"),
        abs(col("cum_src").cast(D380) * (col("n_total") - col("n_src")) -
          (col("cum_all") - col("cum_src")).cast(D380) * col("n_src")).as("diff"))
      .groupBy("source", "n_src", "n_rest")
      .agg(max("diff").as("ks_num"))
      .select(col("source"), col("n_src"), col("n_rest"),
        round(col("ks_num").cast("double") /
          (col("n_src").cast("double") * col("n_rest").cast("double")), 6)
          .cast(Out6).as("ks"))
      .orderBy(desc("ks"), asc("source"))
  }

  def ksDriftSql(lr: String = "0.5", steps: Int = 2): String =
    s"""WITH scored AS (
       |  ${logregGdSql(lr, steps).replace("\n", "\n  ")}
       |), sp AS (
       |  SELECT d.source, s.p FROM scored s JOIN documents d USING (doc_id)
       |), counts AS (
       |  SELECT source, p, count(*) AS c FROM sp GROUP BY source, p
       |), srctot AS (
       |  SELECT source, CAST(SUM(c) AS BIGINT) AS n_src FROM counts GROUP BY source
       |), grid AS (
       |  SELECT st.source, st.n_src, dp.p, COALESCE(c.c, 0) AS c
       |  FROM srctot st CROSS JOIN (SELECT DISTINCT p FROM counts) dp
       |  LEFT JOIN counts c ON c.source = st.source AND c.p = dp.p
       |), cums AS (
       |  SELECT source, n_src, p,
       |    CAST(SUM(c) OVER (PARTITION BY source ORDER BY p
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_src
       |  FROM grid
       |), callp AS (
       |  SELECT p, CAST(SUM(cp) OVER (ORDER BY p
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_all
       |  FROM (SELECT p, CAST(SUM(c) AS BIGINT) AS cp FROM counts GROUP BY p)
       |), ntot AS (SELECT CAST(SUM(n_src) AS BIGINT) AS n_total FROM srctot)
       |SELECT source, n_src, n_rest,
       |  CAST(round(CAST(ks_num AS DOUBLE) /
       |    (CAST(n_src AS DOUBLE) * CAST(n_rest AS DOUBLE)), 6) AS DECIMAL(18,6)) AS ks
       |FROM (
       |  SELECT c.source, c.n_src, n.n_total - c.n_src AS n_rest,
       |    MAX(ABS(CAST(c.cum_src AS DECIMAL(38,0)) * (n.n_total - c.n_src) -
       |            CAST(a.cum_all - c.cum_src AS DECIMAL(38,0)) * c.n_src)) AS ks_num
       |  FROM cums c JOIN callp a USING (p) CROSS JOIN ntot n
       |  GROUP BY c.source, c.n_src, n.n_total
       |)
       |ORDER BY ks DESC, source ASC""".stripMargin

  def calibrationSql(lr: String = "0.5", steps: Int = 2, n: Int = 10): String =
    s"""WITH scored AS (
       |  ${logregGdSql(lr, steps).replace("\n", "\n  ")}
       |), withy AS (
       |  SELECT s.doc_id, s.p, CAST(d.lang = 'en' AS BIGINT) AS y
       |  FROM scored s JOIN documents d USING (doc_id)
       |), binned AS (
       |  SELECT p, y,
       |    CAST(ntile($n) OVER (ORDER BY p ASC, doc_id ASC) AS BIGINT) AS bin
       |  FROM withy
       |)
       |SELECT bin, count(*) AS n,
       |  CAST(round(CAST(SUM(p) AS DOUBLE) / count(*), 6) AS DECIMAL(18,6)) AS mean_p,
       |  CAST(round(CAST(SUM(y) AS DOUBLE) / count(*), 6) AS DECIMAL(18,6)) AS pos_rate
       |FROM binned GROUP BY bin ORDER BY bin""".stripMargin

  /** m24: temperature-scaling calibration sweep (Guo et al.'s post-hoc
    * calibration, the standard confidence-calibration fix for modern
    * classifiers) — rescore the trained model's logits at each
    * temperature T in a literal grid, p_T = σ(z/T), and report the
    * negative log-likelihood and Brier score per T with the NLL argmin
    * flagged. T < 1 sharpens, T > 1 softens; T* is the temperature a
    * serving stack should divide logits by.
    *
    * Determinism: z is the exact-decimal-weight linear form (one double
    * cast, the m12 rule); p_T is the exp() output rounded to 6 dp into
    * DECIMAL at birth, then CLAMPED to [1e-6, 1−1e-6] as exact decimals
    * (so ln(0) can never occur at extreme T); each NLL contribution is a
    * ln() output rounded to decimal at birth, each Brier contribution an
    * exact narrowed-decimal square — both sums are order-independent.
    * The best-row flag compares exact decimals against a broadcast 1-row
    * min, never doubles.
    *
    * Shape: ONE narrow feature scan crossed with the |grid|-row literal
    * frame (broadcast), one grouped aggregate — at 100 TB this is the
    * same single-pass cost as m12 scoring, ×|grid| rows in flight, no
    * extra shuffle beyond the |grid|-key aggregate. */
  def tempScaling(docs: DataFrame,
                  ts: Seq[String] = Seq("0.25", "0.5", "1", "2", "4"),
                  lr: JBigDecimal = new JBigDecimal("0.5"),
                  steps: Int = 2): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val f = features(docs).loopCheckpoint(true)
    val (w1, w2, b) = trainWeights(f, lr, steps)
    val grid = ts.map(_.toDouble).toDF("t")
    val z = (lit(w1) * col("x1") + lit(w2) * col("x2") + lit(b)).cast("double")
    val pT = round(lit(1.0) / (lit(1.0) + exp(-(z / col("t")))), 6).cast(Out6)
    val lo = new JBigDecimal("0.000001")
    val hi = new JBigDecimal("0.999999")
    val scored = f.crossJoin(broadcast(grid))
      .select(col("t"), col("y"),
        least(greatest(pT, lit(lo)), lit(hi)).as("p"))
    val perT = scored
      .select(col("t"),
        when(col("y") === 1, -round(log(col("p").cast("double")), 6).cast(Out6))
          .otherwise(-round(log((lit(new JBigDecimal("1.000000")) - col("p"))
            .cast("double")), 6).cast(Out6)).as("nll_c"),
        (((col("p") - col("y")).cast(DecimalType(8, 6))) *
          ((col("p") - col("y")).cast(DecimalType(8, 6)))).as("brier_c"))
      .groupBy("t")
      .agg(count(lit(1)).as("n"), sum("nll_c").as("nll_sum"),
        sum("brier_c").as("brier_sum"))
      .select(col("t"),
        round(col("nll_sum").cast("double") / col("n"), 6).cast(Out6).as("avg_nll"),
        round(col("brier_sum").cast("double") / col("n"), 6).cast(Out6).as("avg_brier"))
      .loopCheckpoint(true) // |grid| rows; feeds the min AND the flag join
    val best = perT.agg(min("avg_nll").as("min_nll"))
    perT.crossJoin(broadcast(best))
      .select(col("t"), col("avg_nll"), col("avg_brier"),
        (col("avg_nll") === col("min_nll")).cast("long").as("is_best"))
      .orderBy("t")
  }

  def tempScalingSql(ts: Seq[String] = Seq("0.25", "0.5", "1", "2", "4"),
                     lr: String = "0.5", steps: Int = 2): String = {
    val gridRows = ts.map(t => s"(CAST($t AS DOUBLE))").mkString(", ")
    s"""WITH f AS (
       |  ${featuresSql.replace("\n", "\n  ")}
       |)${gdChainSql("", "f", lr, steps)},
       |grid AS (SELECT t FROM (VALUES $gridRows) AS g(t)),
       |scored AS (
       |  SELECT g.t, f.y,
       |    least(greatest(
       |      CAST(round(1 / (1 + exp(-(CAST(w.w1 * f.x1 + w.w2 * f.x2 + w.b AS DOUBLE) / g.t))), 6)
       |        AS DECIMAL(18,6)),
       |      CAST(0.000001 AS DECIMAL(18,6))), CAST(0.999999 AS DECIMAL(18,6))) AS p
       |  FROM f CROSS JOIN grid g CROSS JOIN w$steps w
       |), contribs AS (
       |  SELECT t,
       |    CASE WHEN y = 1 THEN -CAST(round(ln(CAST(p AS DOUBLE)), 6) AS DECIMAL(18,6))
       |         ELSE -CAST(round(ln(CAST(CAST(1.000000 AS DECIMAL(18,6)) - p AS DOUBLE)), 6) AS DECIMAL(18,6))
       |    END AS nll_c,
       |    CAST(p - y AS DECIMAL(8,6)) * CAST(p - y AS DECIMAL(8,6)) AS brier_c
       |  FROM scored
       |), per_t AS (
       |  SELECT t,
       |    CAST(round(CAST(SUM(nll_c) AS DOUBLE) / COUNT(*), 6) AS DECIMAL(18,6)) AS avg_nll,
       |    CAST(round(CAST(SUM(brier_c) AS DOUBLE) / COUNT(*), 6) AS DECIMAL(18,6)) AS avg_brier
       |  FROM contribs GROUP BY t
       |), best AS (SELECT MIN(avg_nll) AS min_nll FROM per_t)
       |SELECT t, avg_nll, avg_brier,
       |  CAST(avg_nll = min_nll AS BIGINT) AS is_best
       |FROM per_t CROSS JOIN best ORDER BY t""".stripMargin
  }

  /** m26: sliced (per-group) classifier evaluation — the fairness-style
    * audit a model card reports: accuracy, TPR, FPR and the positive-
    * prediction rate PER SOURCE (the slice column), so a model that is
    * fine on average but broken for one slice is visible. Demographic-
    * parity and equalized-odds gaps are max−min over the ppr/tpr/fpr
    * columns — derivable from the output by inspection; the table IS
    * the artifact. Degenerate slices guard to 0 (no positives → tpr 0,
    * no negatives → fpr 0) rather than NaN.
    *
    * Shape: predictions come from the session-memoized GD scorer; one
    * doc-keyed join attaches (source, y), one grouped integer aggregate
    * (map-side combinable, |sources| keys) produces the table — the
    * only corpus-proportional stages are the scan and that join's
    * shuffle, both unavoidable and both key-partitioned. */
  def groupMetrics(scored: DataFrame, docs: DataFrame): DataFrame = {
    val joined = scored.select(col("doc_id"), col("pred"))
      .join(docs.select(col("doc_id"), col("source"),
        (col("lang") === "en").cast("long").as("y")), "doc_id")
    joined.groupBy("source")
      .agg(count(lit(1)).as("n"),
        sum("pred").cast("long").as("n_pos_pred"),
        sum((col("pred") === col("y")).cast("long")).cast("long").as("n_correct"),
        sum(when(col("y") === 1 && col("pred") === 1, 1L).otherwise(0L))
          .cast("long").as("tp"),
        sum("y").cast("long").as("n_pos"),
        sum(when(col("y") === 0 && col("pred") === 1, 1L).otherwise(0L))
          .cast("long").as("fp"))
      .select(col("source"), col("n"),
        round(col("n_correct").cast("double") / col("n"), 6).cast(Out6).as("acc"),
        when(col("n_pos") === 0L, lit(java.math.BigDecimal.ZERO).cast(Out6))
          .otherwise(round(col("tp").cast("double") / col("n_pos"), 6).cast(Out6))
          .as("tpr"),
        when(col("n") === col("n_pos"), lit(java.math.BigDecimal.ZERO).cast(Out6))
          .otherwise(round(col("fp").cast("double") / (col("n") - col("n_pos")), 6)
            .cast(Out6)).as("fpr"),
        round(col("n_pos_pred").cast("double") / col("n"), 6).cast(Out6).as("ppr"))
      .orderBy("source")
  }

  def groupMetricsSql(lr: String = "0.5", steps: Int = 2): String =
    s"""WITH scored AS (
       |  ${logregGdSql(lr, steps).replace("\n", "\n  ")}
       |), g AS (
       |  SELECT d.source, s.pred, CAST(d.lang = 'en' AS BIGINT) AS y
       |  FROM scored s JOIN documents d USING (doc_id)
       |), agg AS (
       |  SELECT source, count(*) AS n,
       |    CAST(SUM(pred) AS BIGINT) AS n_pos_pred,
       |    CAST(SUM(CASE WHEN pred = y THEN 1 ELSE 0 END) AS BIGINT) AS n_correct,
       |    CAST(SUM(CASE WHEN y = 1 AND pred = 1 THEN 1 ELSE 0 END) AS BIGINT) AS tp,
       |    CAST(SUM(y) AS BIGINT) AS n_pos,
       |    CAST(SUM(CASE WHEN y = 0 AND pred = 1 THEN 1 ELSE 0 END) AS BIGINT) AS fp
       |  FROM g GROUP BY source
       |)
       |SELECT source, n,
       |  CAST(round(CAST(n_correct AS DOUBLE) / n, 6) AS DECIMAL(18,6)) AS acc,
       |  CASE WHEN n_pos = 0 THEN CAST(0 AS DECIMAL(18,6))
       |       ELSE CAST(round(CAST(tp AS DOUBLE) / n_pos, 6) AS DECIMAL(18,6)) END AS tpr,
       |  CASE WHEN n = n_pos THEN CAST(0 AS DECIMAL(18,6))
       |       ELSE CAST(round(CAST(fp AS DOUBLE) / (n - n_pos), 6) AS DECIMAL(18,6)) END AS fpr,
       |  CAST(round(CAST(n_pos_pred AS DOUBLE) / n, 6) AS DECIMAL(18,6)) AS ppr
       |FROM agg ORDER BY source""".stripMargin

  /** m25: out-of-fold smoothed target encoding — the leakage-correct way
    * to turn a categorical column into a numeric feature: for every
    * (category, fold) cell, the encoding is the label mean over the
    * category's rows in the OTHER folds, shrunk toward the global prior
    * by a pseudo-count m (Micci-Barreca's empirical-Bayes smoothing). A
    * row's own fold never contributes to the statistic applied to it, so
    * the feature carries no target leakage — the d23 companion (d23
    * splits leakage-free, m25 encodes leakage-free).
    *
    * Category = source, label y = [lang = 'en'] (the module's standard
    * label), fold = md5-bucket(doc_id) mod K via the engine-portable
    * hash idiom ([[graft.text.TextStats.hashBucket]]) — folds are
    * reproducible across engines, runs, and partitionings, never an RNG.
    *
    * The smoothing prior is ALSO out-of-fold (per fold: the label mean
    * over every row outside that fold) — a global prior would leak each
    * row's label back into its own feature through the shrinkage term.
    * That makes the defining invariant exact and metamorphically
    * testable: relabeling rows inside fold f cannot move ANY encoding
    * applied to fold f.
    *
    * Output is the ENCODER ARTIFACT itself (≤ |categories|·K rows), not
    * the encoded corpus: at 100 TB the artifact is metadata-sized and is
    * applied to training rows via a broadcast join on (category, fold).
    * Shape: one corpus scan → per-(category, fold) partial-aggregated
    * integer sums (map-side combine; |cats|·K keys); everything after —
    * per-category roll-up, per-fold prior, the final joins — runs on
    * that metadata-sized cell frame. No corpus-proportional shuffle
    * anywhere. Needs ≥ 2 nonempty folds (any real corpus).
    *
    * Determinism: cell counts and label sums are exact integers; the
    * prior is round→DECIMAL at birth; the encoding divides exact-integer
    * differences plus m·prior in ONE double expression of identical
    * shape on both engines, rounded to 6 dp into DECIMAL. */
  def targetEncoding(docs: DataFrame, k: Int = 4, m: Int = 20): DataFrame = {
    val cells = docs
      .select(col("source"),
        (graft.text.TextStats.hashBucket(col("doc_id")) % k).cast("bigint").as("fold"),
        (col("lang") === "en").cast("long").as("y"))
      .groupBy("source", "fold")
      .agg(count(lit(1)).as("n_fold"), sum("y").cast("long").as("s_fold"))
      .loopCheckpoint(true) // |cats|·K rows; feeds roll-ups AND the output
    val perCat = cells.groupBy("source")
      .agg(sum("n_fold").cast("long").as("n_tot"),
        sum("s_fold").cast("long").as("s_tot"))
    val perFold = cells.groupBy("fold")
      .agg(sum("n_fold").cast("long").as("nf_all"),
        sum("s_fold").cast("long").as("sf_all"))
    val tot = cells.agg(sum("n_fold").cast("long").as("n_all"),
      sum("s_fold").cast("long").as("s_all"))
    val priorOof = perFold.crossJoin(broadcast(tot))
      .select(col("fold"),
        round((col("s_all") - col("sf_all")).cast("double") /
          (col("n_all") - col("nf_all")).cast("double"), 6).cast(Out6).as("prior_oof"))
    cells.join(broadcast(perCat), "source")
      .join(broadcast(priorOof), "fold")
      .select(col("source"), col("fold"), col("n_fold"),
        round(((col("s_tot") - col("s_fold")).cast("double") +
            lit(m.toDouble) * col("prior_oof").cast("double")) /
          ((col("n_tot") - col("n_fold")).cast("double") + lit(m.toDouble)), 6)
          .cast(Out6).as("enc_oof"),
        col("prior_oof"))
      .orderBy("source", "fold")
  }

  def targetEncodingSql(k: Int = 4, m: Int = 20): String = {
    val b = graft.text.TextStats.hashBucketSqlExpr("doc_id")
    s"""WITH cells AS (
       |  SELECT source, CAST(($b) % $k AS BIGINT) AS fold,
       |    count(*) AS n_fold,
       |    CAST(SUM(CAST(lang = 'en' AS BIGINT)) AS BIGINT) AS s_fold
       |  FROM documents GROUP BY 1, 2
       |), per_cat AS (
       |  SELECT source, CAST(SUM(n_fold) AS BIGINT) AS n_tot,
       |    CAST(SUM(s_fold) AS BIGINT) AS s_tot
       |  FROM cells GROUP BY source
       |), per_fold AS (
       |  SELECT fold, CAST(SUM(n_fold) AS BIGINT) AS nf_all,
       |    CAST(SUM(s_fold) AS BIGINT) AS sf_all
       |  FROM cells GROUP BY fold
       |), tot AS (
       |  SELECT CAST(SUM(n_fold) AS BIGINT) AS n_all,
       |    CAST(SUM(s_fold) AS BIGINT) AS s_all
       |  FROM cells
       |), prior AS (
       |  SELECT fold,
       |    CAST(round(CAST(s_all - sf_all AS DOUBLE) / CAST(n_all - nf_all AS DOUBLE), 6)
       |      AS DECIMAL(18,6)) AS prior_oof
       |  FROM per_fold CROSS JOIN tot
       |)
       |SELECT c.source, c.fold, c.n_fold,
       |  CAST(round((CAST(p.s_tot - c.s_fold AS DOUBLE) + $m.0 * CAST(pr.prior_oof AS DOUBLE))
       |    / (CAST(p.n_tot - c.n_fold AS DOUBLE) + $m.0), 6) AS DECIMAL(18,6)) AS enc_oof,
       |  pr.prior_oof
       |FROM cells c JOIN per_cat p USING (source) JOIN prior pr USING (fold)
       |ORDER BY source, fold""".stripMargin
  }

  /** Final scores memoized per (session, sf-dir): m12 emits them, m13
    * buckets them — one GD training per session (|docs| rows, narrow). */
  private def cachedScores(s: SparkSession, dir: String): DataFrame =
    graft.plans.Materialized(s, s"logreg_scored:${Tables.norm(dir)}")(
      logregGd(Tables.documents(s, dir)))

  /** Precision/recall curve points by descending-score sweep: rank the
    * scored docs by (p desc, doc_id), and at every rank the cumulative
    * positives give precision@k and recall@k — the full PR curve in ONE
    * window pass, sampled at 20 evenly spaced ranks to keep the output
    * bounded. The windows run over the narrow score table (x15 pattern);
    * ranks and cumulative counts are exact integers, ratios take the
    * round→DECIMAL path. */
  def prCurve(scored: DataFrame, points: Int = 20): DataFrame = {
    val ord = org.apache.spark.sql.expressions.Window
      .orderBy(desc("p"), asc("doc_id"))
    val ranked = scored
      .select(col("doc_id"), col("p"), col("y"),
        row_number().over(ord).cast("bigint").as("k"),
        sum(col("y")).over(ord.rowsBetween(
          org.apache.spark.sql.expressions.Window.unboundedPreceding, 0))
          .cast("long").as("tp"))
    val n = scored.count()
    val nPos = broadcast(scored.agg(sum("y").cast("long").as("n_pos")))
    val step = math.max(1L, n / points)
    ranked.filter(col("k") % step === 0)
      .crossJoin(nPos)
      .select(col("k"), col("tp"),
        round(col("tp").cast("double") / col("k"), 6)
          .cast(Out6).as("precision"),
        round(col("tp").cast("double") / col("n_pos"), 6)
          .cast(Out6).as("recall"))
      .orderBy("k")
  }

  def prCurveSql(lr: String = "0.5", steps: Int = 2, points: Int = 20): String =
    s"""WITH scored AS (
       |  ${logregGdSql(lr, steps).replace("\n", "\n  ")}
       |), withy AS (
       |  SELECT s.doc_id, s.p, CAST(d.lang = 'en' AS BIGINT) AS y
       |  FROM scored s JOIN documents d USING (doc_id)
       |), ranked AS (
       |  SELECT doc_id, p, y,
       |    CAST(row_number() OVER (ORDER BY p DESC, doc_id ASC) AS BIGINT) AS k,
       |    CAST(SUM(y) OVER (ORDER BY p DESC, doc_id ASC
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS tp
       |  FROM withy
       |), tot AS (
       |  SELECT count(*) AS n, CAST(SUM(y) AS BIGINT) AS n_pos FROM withy
       |)
       |SELECT k, tp,
       |  CAST(round(CAST(tp AS DOUBLE) / k, 6) AS DECIMAL(18,6)) AS precision,
       |  CAST(round(CAST(tp AS DOUBLE) / n_pos, 6) AS DECIMAL(18,6)) AS recall
       |FROM ranked, tot
       |WHERE k % greatest(1, n // $points) = 0 ORDER BY k""".stripMargin

  /** ROC AUC by the Mann-Whitney rank identity:
    * AUC = (Σ ranks(positives) − n₊(n₊+1)/2) / (n₊·n₋), ranks ascending
    * by score with doc_id tie-break (deterministic; under score ties
    * this is the standard row_number approximation, stated rather than
    * hidden). ONE rank window over the narrow score table and a 1-row
    * aggregate — every intermediate is an exact integer, so the only
    * float op is the final division (round→DECIMAL as usual). */
  def auc(scored: DataFrame): DataFrame = {
    val ord = org.apache.spark.sql.expressions.Window
      .orderBy(asc("p"), asc("doc_id"))
    scored
      .select(col("y"), row_number().over(ord).cast("long").as("rank"))
      .agg(sum(when(col("y") === 1, col("rank"))).cast("long").as("rank_sum"),
        sum(col("y")).cast("long").as("n_pos"),
        count(lit(1)).as("n"))
      .select(col("rank_sum"), col("n_pos"),
        (col("n") - col("n_pos")).as("n_neg"),
        round(expr("rank_sum - (n_pos * (n_pos + 1)) DIV 2").cast("double")
          / (col("n_pos") * (col("n") - col("n_pos"))), 6)
          .cast(Out6).as("auc"))
  }

  def aucSql(lr: String = "0.5", steps: Int = 2): String =
    s"""WITH scored AS (
       |  ${logregGdSql(lr, steps).replace("\n", "\n  ")}
       |), withy AS (
       |  SELECT s.doc_id, s.p, CAST(d.lang = 'en' AS BIGINT) AS y
       |  FROM scored s JOIN documents d USING (doc_id)
       |), ranked AS (
       |  SELECT y,
       |    CAST(row_number() OVER (ORDER BY p ASC, doc_id ASC) AS BIGINT) AS rank
       |  FROM withy
       |), agg AS (
       |  SELECT CAST(SUM(CASE WHEN y = 1 THEN rank END) AS BIGINT) AS rank_sum,
       |    CAST(SUM(y) AS BIGINT) AS n_pos, count(*) AS n
       |  FROM ranked
       |)
       |SELECT rank_sum, n_pos, (n - n_pos) AS n_neg,
       |  CAST(round(CAST(rank_sum - (n_pos * (n_pos + 1)) // 2 AS DOUBLE)
       |    / (n_pos * (n - n_pos)), 6) AS DECIMAL(18,6)) AS auc
       |FROM agg""".stripMargin

  /** m18: Matthews correlation coefficient at the p ≥ ½ decision
    * threshold — the single-number confusion summary that stays honest
    * under class imbalance (accuracy and F1 both inflate when one class
    * dominates, the usual case for quality-filter labels). The four
    * confusion cells are exact integer counts from one aggregate; the
    * p ≥ 0.5 compare is exact (p is DECIMAL(18,6)); MCC's denominator
    * factors are multiplied in DOUBLE — at corpus scale the product of
    * four marginals overflows BIGINT (ANSI would throw), and the
    * mirrored-order double product keeps both engines byte-identical. */
  def mcc(scored: DataFrame): DataFrame = {
    val pred = (col("p") >= 0.5).cast("long")
    val cells = scored.agg(
      sum((pred * col("y"))).cast("long").as("tp"),
      sum((pred * (lit(1) - col("y")))).cast("long").as("fp"),
      sum(((lit(1) - pred) * col("y"))).cast("long").as("fn"),
      sum(((lit(1) - pred) * (lit(1) - col("y")))).cast("long").as("tn"))
    val d = cells.select(col("tp"), col("fp"), col("fn"), col("tn"),
      (col("tp").cast("double") * col("tn").cast("double") -
        col("fp").cast("double") * col("fn").cast("double")).as("num"),
      ((col("tp") + col("fp")).cast("double") * (col("tp") + col("fn")).cast("double") *
        (col("tn") + col("fp")).cast("double") * (col("tn") + col("fn")).cast("double"))
        .as("den"))
    d.select(col("tp"), col("fp"), col("fn"), col("tn"),
      when(col("den") > 0, round(col("num") / sqrt(col("den")), 6))
        .otherwise(lit(0.0)).cast(Out6).as("mcc"))
  }

  def mccSql(lr: String = "0.5", steps: Int = 2): String =
    s"""WITH scored AS (
       |  ${logregGdSql(lr, steps).replace("\n", "\n  ")}
       |), withy AS (
       |  SELECT s.doc_id, s.p, CAST(d.lang = 'en' AS BIGINT) AS y
       |  FROM scored s JOIN documents d USING (doc_id)
       |), cells AS (
       |  SELECT
       |    CAST(SUM(CASE WHEN p >= 0.5 THEN y ELSE 0 END) AS BIGINT) AS tp,
       |    CAST(SUM(CASE WHEN p >= 0.5 THEN 1 - y ELSE 0 END) AS BIGINT) AS fp,
       |    CAST(SUM(CASE WHEN p >= 0.5 THEN 0 ELSE y END) AS BIGINT) AS fn,
       |    CAST(SUM(CASE WHEN p >= 0.5 THEN 0 ELSE 1 - y END) AS BIGINT) AS tn
       |  FROM withy
       |), d AS (
       |  SELECT tp, fp, fn, tn,
       |    CAST(tp AS DOUBLE) * CAST(tn AS DOUBLE) - CAST(fp AS DOUBLE) * CAST(fn AS DOUBLE) AS num,
       |    CAST(tp + fp AS DOUBLE) * CAST(tp + fn AS DOUBLE)
       |      * CAST(tn + fp AS DOUBLE) * CAST(tn + fn AS DOUBLE) AS den
       |  FROM cells
       |)
       |SELECT tp, fp, fn, tn,
       |  CAST(CASE WHEN den > 0 THEN round(num / sqrt(den), 6) ELSE 0.0 END AS DECIMAL(18,6)) AS mcc
       |FROM d""".stripMargin

  /** m21: learning curve — retrain the GD model on nested hash-split
    * subsets (doc_id % 4 < {1, 2, 4} → 25 / 50 / 100 % of the corpus,
    * the x6 split discipline: membership is a pure function of the key,
    * stable under any repartitioning, and each subset contains the
    * previous one, so the curve isolates data volume from data mix) and
    * evaluate EVERY model on the full corpus. The answer to "is this
    * pipeline data-bound or model-bound" — the first question before
    * paying for more training data.
    *
    * Scale shape: the feature frame is built and checkpointed ONCE; each
    * of the 3 trainings is the m12 loop (per step: one scan, three
    * partial-aggregated decimal sums) over a filtered view, and each
    * evaluation is one more scan into a 4-integer confusion aggregate
    * plus an exact-decimal log-loss sum. Everything cross-engine-exact:
    * weights are 6-dp decimals by the m12 proof, confusion cells are
    * integers, accuracy is one double division of exact integers,
    * per-row log terms are round(ln, 6) decimals at birth (the x14
    * precedent) with probabilities clamped to [1e-6, 1−1e-6].
    *
    * On THIS synthetic corpus the accuracy column is flat at the
    * majority-class rate — the lang label is uncorrelated with every
    * text statistic (verified: the de/fr/es stopword dictionaries get
    * zero hits; token pools are shared across declared langs). That
    * flat curve is the correct reading, and mean_logloss still moves
    * with the training subset, which is why it is part of the output.
    * [[learnableCurve]] (m23) is the companion on a derived label that
    * IS correlated with the features, where the curve visibly bends.
    *
    * m21 is the deliberate NEGATIVE CONTROL for m23 (VERDICT r10 task
    * 7): its flat accuracy is what an honest curve on a signal-free
    * label looks like, and the m21/m23 pair is the methodology check —
    * a curve that bends on m23 but stays flat here demonstrates the
    * harness measures the DATA, not an artifact of the trainer. Do not
    * "fix" m21's flatness (more steps, a higher lr, feature changes):
    * that would destroy the control. */
  def learningCurve(docs: DataFrame, lr: JBigDecimal = new JBigDecimal("0.5"),
                    steps: Int = 2): DataFrame =
    curveFrames(features(docs).loopCheckpoint(true), lr, steps)

  /** m23 features: the m21 feature pair recentred (x1 = kilo-chars
    * MINUS 0.3, so the class boundary sits near z = 0 and is reachable
    * by a from-zero GD) and a DERIVED learnable label (VERDICT r9 #7):
    * y = [n_chars > 310] ⊕ [md5 bucket(doc_id) < 26] — the true class
    * is a pure x1 threshold, flipped for a deterministic ~10% of docs
    * ([[graft.text.TextStats.hashBucket]], the x6 split discipline:
    * cross-engine, RNG-free, stable under repartitioning). The label is
    * correlated with the features BY CONSTRUCTION, so unlike m21's
    * signal-free lang label the learning curve bends: more training
    * data averages out the label noise and accuracy rises toward the
    * ~90% ceiling (spec-asserted monotone on sf0.001). */
  private def learnableFeatures(docs: DataFrame): DataFrame = docs
    .select(col("doc_id"),
      round((col("n_chars") - 300.0) / 1000.0, 6).cast(Out6).as("x1"),
      round(size(Tokenize.rawTokens(col("text"))) / 100.0, 6).cast(Out6).as("x2"),
      ((col("n_chars") > 310) =!=
        (graft.text.TextStats.hashBucket(col("doc_id")) < 26)).cast("long").as("y"))

  private def learnableFeaturesSql: String =
    s"""SELECT doc_id,
       |  CAST(round((n_chars - 300.0) / 1000.0, 6) AS DECIMAL(18,6)) AS x1,
       |  CAST(round(len(${Tokenize.rawTokensSql("text")}) / 100.0, 6) AS DECIMAL(18,6)) AS x2,
       |  CAST((n_chars > 310) != (${graft.text.TextStats.hashBucketSqlExpr("doc_id")} < 26) AS BIGINT) AS y
       |FROM documents""".stripMargin

  /** m23: the m21 learning curve on the learnable derived label —
    * lr = 2.0 / 10 steps so the from-zero GD actually converges per
    * subset (at m21's 2 steps every subset is equally underfit and the
    * curve cannot separate them). Same output schema, same unrolled-CTE
    * oracle, same one-checkpoint/3-trainings scale shape as m21.
    * [[learningCurve]] (m21) is this query's NEGATIVE CONTROL — its
    * flat curve on the signal-free lang label is intentional and must
    * stay flat; see its scaladoc before touching either. */
  def learnableCurve(docs: DataFrame, lr: JBigDecimal = new JBigDecimal("2.0"),
                     steps: Int = 10): DataFrame =
    curveFrames(learnableFeatures(docs).loopCheckpoint(true), lr, steps)

  private def curveFrames(f: DataFrame, lr: JBigDecimal, steps: Int): DataFrame = {
    val n = f.count()
    val frames = Seq(1 -> 25, 2 -> 50, 4 -> 100).map { case (m, pct) =>
      val tr = if (m == 4) f else f.filter(col("doc_id") % 4 < m)
      val nTrain = tr.count()
      val (w1, w2, b) = trainWeights(tr, lr, steps)
      val pred = (col("p") >= 0.5).cast("long")
      val pd = least(greatest(col("p").cast("double"), lit(0.000001)),
        lit(0.999999))
      val term = when(col("y") === 1, -round(log(pd), 6).cast(Out6))
        .otherwise(-round(log(lit(1.0) - pd), 6).cast(Out6))
      f.select(pCol(w1, w2, b).as("p"), col("y"))
        .agg(sum(pred * col("y")).cast("long").as("tp"),
          sum(pred * (lit(1) - col("y"))).cast("long").as("fp"),
          sum((lit(1) - pred) * col("y")).cast("long").as("fn"),
          sum((lit(1) - pred) * (lit(1) - col("y"))).cast("long").as("tn"),
          sum(term).as("sll"))
        .select(lit(pct).cast("long").as("train_pct"),
          lit(nTrain).as("n_train"),
          col("tp"), col("fp"), col("fn"), col("tn"),
          round((col("tp") + col("tn")).cast("double") / lit(n.toDouble), 6)
            .as("accuracy"),
          round(col("sll").cast("double") / lit(n.toDouble), 6)
            .as("mean_logloss"))
    }
    frames.reduce(_.union(_)).orderBy("train_pct")
  }

  def learningCurveSql(lr: String = "0.5", steps: Int = 2): String =
    curveSql(featuresSql, lr, steps)

  def learnableCurveSql(lr: String = "2.0", steps: Int = 10): String =
    curveSql(learnableFeaturesSql, lr, steps)

  private def curveSql(featsSql: String, lr: String, steps: Int): String = {
    val subsets = Seq(("_25", "tr25", 25, "doc_id % 4 < 1"),
      ("_50", "tr50", 50, "doc_id % 4 < 2"), ("_100", "f", 100, ""))
    val sb = new StringBuilder
    sb ++= s"""WITH f AS (
              |  ${featsSql.replace("\n", "\n  ")}
              |), tr25 AS (SELECT * FROM f WHERE doc_id % 4 < 1
              |), tr50 AS (SELECT * FROM f WHERE doc_id % 4 < 2
              |)""".stripMargin
    for ((sfx, src, _, _) <- subsets) sb ++= gdChainSql(sfx, src, lr, steps)
    val selects = subsets.map { case (sfx, src, pct, _) =>
      s"""SELECT CAST($pct AS BIGINT) AS train_pct,
         |  (SELECT count(*) FROM $src) AS n_train,
         |  CAST(SUM(CASE WHEN p >= 0.5 THEN y ELSE 0 END) AS BIGINT) AS tp,
         |  CAST(SUM(CASE WHEN p >= 0.5 THEN 1 - y ELSE 0 END) AS BIGINT) AS fp,
         |  CAST(SUM(CASE WHEN p >= 0.5 THEN 0 ELSE y END) AS BIGINT) AS fn,
         |  CAST(SUM(CASE WHEN p >= 0.5 THEN 0 ELSE 1 - y END) AS BIGINT) AS tn,
         |  round(CAST(SUM(CASE WHEN (p >= 0.5) = (y = 1) THEN 1 ELSE 0 END) AS DOUBLE)
         |    / count(*), 6) AS accuracy,
         |  round(CAST(SUM(CASE WHEN y = 1
         |      THEN -CAST(round(ln(least(greatest(CAST(p AS DOUBLE), 0.000001), 0.999999)), 6) AS DECIMAL(18,6))
         |      ELSE -CAST(round(ln(1.0 - least(greatest(CAST(p AS DOUBLE), 0.000001), 0.999999)), 6) AS DECIMAL(18,6))
         |    END) AS DOUBLE) / count(*), 6) AS mean_logloss
         |FROM (
         |  SELECT f.y,
         |    CAST(round(1 / (1 + exp(-(CAST(w.w1 * f.x1 + w.w2 * f.x2 + w.b AS DOUBLE)))), 6)
         |      AS DECIMAL(18,6)) AS p
         |  FROM f, w$steps$sfx w)""".stripMargin
    }
    sb ++= "\nSELECT * FROM (\n" + selects.mkString("\nUNION ALL\n") +
      "\n) ORDER BY train_pct"
    sb.toString
  }

  /** m22: the trained model itself as a 1-row frame (w1, w2, b) — the
    * model-registry export a serving layer consumes (score = σ(w·x+b)
    * anywhere, no Spark needed). The weights are 6-dp decimals by the
    * m12 determinism proof, so the export is byte-stable across runs
    * and engines; the oracle re-derives the same weights through the
    * unrolled GD CTE chain. */
  def modelWeights(docs: DataFrame, lr: JBigDecimal = new JBigDecimal("0.5"),
                   steps: Int = 2): DataFrame = {
    val f = features(docs).loopCheckpoint(true)
    val (w1, w2, b) = trainWeights(f, lr, steps)
    val spark = docs.sparkSession
    import spark.implicits._
    Seq((w1.toPlainString, w2.toPlainString, b.toPlainString))
      .toDF("w1s", "w2s", "bs")
      .select(col("w1s").cast(Out6).as("w1"), col("w2s").cast(Out6).as("w2"),
        col("bs").cast(Out6).as("b"))
  }

  def modelWeightsSql(lr: String = "0.5", steps: Int = 2): String =
    s"""WITH f AS (
       |  ${featuresSql.replace("\n", "\n  ")}
       |)${gdChainSql("", "f", lr, steps).replace("\n", "\n")}
       |SELECT w1, w2, b FROM w$steps""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "m12_logreg_gd" -> ((s: SparkSession, dir: String) =>
      cachedScores(s, dir).orderBy("doc_id")),
    "m13_calibration" -> ((s: SparkSession, dir: String) => {
      val f = features(Tables.documents(s, dir))
      calibration(cachedScores(s, dir)
        .join(f.select(col("doc_id"), col("y")), "doc_id")
        .select(col("doc_id"), col("p"), col("y")))
    }),
    "m14_pr_curve" -> ((s: SparkSession, dir: String) => {
      val f = features(Tables.documents(s, dir))
      prCurve(cachedScores(s, dir)
        .join(f.select(col("doc_id"), col("y")), "doc_id")
        .select(col("doc_id"), col("p"), col("y")))
    }),
    "m15_auc" -> ((s: SparkSession, dir: String) => {
      val f = features(Tables.documents(s, dir))
      auc(cachedScores(s, dir)
        .join(f.select(col("doc_id"), col("y")), "doc_id")
        .select(col("doc_id"), col("p"), col("y")))
    }),
    "m18_mcc" -> ((s: SparkSession, dir: String) => {
      val f = features(Tables.documents(s, dir))
      mcc(cachedScores(s, dir)
        .join(f.select(col("doc_id"), col("y")), "doc_id")
        .select(col("doc_id"), col("p"), col("y")))
    }),
    "m21_learning_curve" -> ((s: SparkSession, dir: String) =>
      learningCurve(Tables.documents(s, dir))),
    "m22_model_weights" -> ((s: SparkSession, dir: String) =>
      modelWeights(Tables.documents(s, dir))),
    "m23_learnable_curve" -> ((s: SparkSession, dir: String) =>
      learnableCurve(Tables.documents(s, dir))),
    "m24_temp_scaling" -> ((s: SparkSession, dir: String) =>
      tempScaling(Tables.documents(s, dir))),
    "m25_target_encoding" -> ((s: SparkSession, dir: String) =>
      targetEncoding(Tables.documents(s, dir))),
    "m26_group_metrics" -> ((s: SparkSession, dir: String) =>
      groupMetrics(cachedScores(s, dir), Tables.documents(s, dir))),
    "m29_decile_lift" -> ((s: SparkSession, dir: String) => {
      val f = features(Tables.documents(s, dir))
      decileLift(cachedScores(s, dir)
        .join(f.select(col("doc_id"), col("y")), "doc_id")
        .select(col("doc_id"), col("p"), col("y")))
    }),
    "m30_ks_drift" -> ((s: SparkSession, dir: String) =>
      ksDrift(cachedScores(s, dir), Tables.documents(s, dir))),
  )

  def oracles: Map[String, String] = Map(
    "m12_logreg_gd" -> logregGdSql(),
    "m13_calibration" -> calibrationSql(),
    "m14_pr_curve" -> prCurveSql(),
    "m15_auc" -> aucSql(),
    "m18_mcc" -> mccSql(),
    "m21_learning_curve" -> learningCurveSql(),
    "m22_model_weights" -> modelWeightsSql(),
    "m23_learnable_curve" -> learnableCurveSql(),
    "m24_temp_scaling" -> tempScalingSql(),
    "m25_target_encoding" -> targetEncodingSql(),
    "m26_group_metrics" -> groupMetricsSql(),
    "m29_decile_lift" -> decileLiftSql(),
    "m30_ks_drift" -> ksDriftSql(),
  )
}
