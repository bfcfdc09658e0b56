package graft.search

import graft.plans.Lineage.CheckpointOps
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.text.Tokenize

/** TF-IDF inverted index + ranked retrieval.
  *
  * Re-expresses the reference's Movie Search Engine
  * (ref: ScalaNotebooks/MovieSearchEngine.scala) as a single all-Catalyst
  * dataflow. The reference hops DataFrame→RDD→DataFrame (its :111-192) which
  * kills pushdown/codegen; here every step is a DataFrame op so the whole
  * index build is 3 hash-aggregate stages + 1 join, fully whole-stage
  * codegen'd, and the corpus size N is a broadcast 1-row cross join instead
  * of a driver-side `count()` action (ref :158) — at 100 TB that matters:
  * no driver round-trip, one DAG. The tf frame is materialized once so
  * the df aggregation consumes it instead of re-tokenizing the corpus
  * (ReuseExchange cannot fire there: column pruning gives the two
  * branches structurally different aggregates).
  *
  * Determinism note (oracle parity): per-document float sums (norms, dot
  * products) are quantized to DECIMAL before the shuffle-sum so the result
  * is independent of partial-aggregation order, then cast back to double.
  * The cost is one extra cast in the aggregate — negligible vs the shuffle.
  */
object TfIdf {
  private val Dec = DecimalType(32, 12)

  /** Inverted index: (term, doc_id, tf, df, idf, tfidf).
    * tf = term count within doc (ref MovieSearchEngine.scala:128-135),
    * df = #docs containing term (ref :144-151), idf = ln(N/df) (ref :163),
    * tfidf = tf·idf (ref :186).
    */
  def postings(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text",
               termXform: Column => Column = identity): DataFrame = {
    // termXform (default identity — Catalyst collapses the extra
    // projection) lets t15 build the index over STEMMED terms with the
    // exact same downstream dataflow
    val toks = docs.select(col(idCol).cast("long").as("doc_id"),
        explode(Tokenize.tokens(col(textCol))).as("term0"))
      .select(col("doc_id"), termXform(col("term0")).as("term"))
    // materialize tf once: without this, Catalyst column-prunes the df
    // branch into a structurally different aggregate (no count column),
    // which defeats ReuseExchange — the corpus would be scanned and
    // tokenized TWICE, once per branch (verified via the final AQE plan).
    // tf is the small distinct-(doc,term) frame, cheap to hold.
    val tf = toks.groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
      .loopCheckpoint(true)
    val dfreq = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val n = docs.agg(count(lit(1)).as("n_docs"))
    tf.join(dfreq, "term")
      .crossJoin(broadcast(n))
      .withColumn("idf", log(col("n_docs").cast("double") / col("df").cast("double")))
      .withColumn("tfidf", col("tf").cast("double") * col("idf"))
      .select("term", "doc_id", "tf", "df", "idf", "tfidf")
  }

  /** Per-document squared norm Σ tfidf² (ref MovieSearchEngine.scala:232).
    * Decimal-quantized sum for order-independence. */
  def docNorms(postings: DataFrame): DataFrame =
    postings.groupBy("doc_id")
      .agg(sum((col("tfidf") * col("tfidf")).cast(Dec)).cast("double").as("norm2"))

  /** Single-term search: point lookup + top-k by tfidf
    * (ref MovieSearchEngine.scala:244-256). Catalyst turns the
    * orderBy+limit into TakeOrderedAndProject — no global sort. */
  def searchSingle(postings: DataFrame, term: String, k: Int = 10): DataFrame =
    postings.filter(col("term") === lit(term))
      .select(col("doc_id"), round(col("tfidf"), 6).as("score"))
      .orderBy(desc("score"), asc("doc_id"))
      .limit(k)

  /** Shared TF-IDF cosine scoring core — ONE body serving both the
    * single-query path ([[searchMulti]], a batch of one) and the batch
    * path ([[graft.search.Rank.searchBatch]]), so the batch/single
    * slice-parity pinned by `RankSpec` cannot silently rot (a constant
    * tweak here changes both paths together; VERDICT r9 finding 2).
    *
    * Input `qtf` is a tiny (qid, term, qtf) frame; output is
    * (qid, doc_id, score) with score = round(dot/denom, 6) as DOUBLE.
    * The query side is explicitly `broadcast()` into the postings join
    * (ref MovieSearchEngine.scala:297 relied on auto-broadcast; at
    * 100 TB the postings side must never be the build side); per-query
    * squared norms are |Q| metadata rows broadcast after the dot
    * aggregate — never a driver action (ref :291-294's `first()`).
    *
    * `trueCosine=false` preserves the reference quirk at its :304: the
    * score divides by the SQUARED norms (`size * querySize`, no sqrt) —
    * monotonic per query w.r.t. the doc ranking but not true cosine. */
  private[graft] def cosineScores(postings: DataFrame, norms: DataFrame,
                                   qtf: DataFrame, trueCosine: Boolean): DataFrame = {
    // attach corpus idf (ref :284); idf is doc-independent so dedup postings
    val idf = postings.select("term", "idf").groupBy("term").agg(first("idf").as("idf"))
    val qvec = qtf.join(idf, "term")
      .withColumn("q_tfidf", col("qtf").cast("double") * col("idf"))
    val qnorms = qvec.groupBy("qid")
      .agg(sum((col("q_tfidf") * col("q_tfidf")).cast(Dec)).cast("double").as("qnorm2"))
    // dot product per (query, doc) (ref :297-300)
    val dot = postings.join(broadcast(qvec.select("qid", "term", "q_tfidf")), "term")
      .withColumn("mult", col("tfidf") * col("q_tfidf"))
      .groupBy("qid", "doc_id")
      .agg(sum(col("mult").cast(Dec)).cast("double").as("dot"))
    val denom: Column =
      if (trueCosine) sqrt(col("norm2")) * sqrt(col("qnorm2"))
      else col("norm2") * col("qnorm2") // ref :304 quirk
    dot.join(norms, "doc_id")
      .join(broadcast(qnorms), "qid")
      .select(col("qid"), col("doc_id"), round(col("dot") / denom, 6).as("score"))
  }

  /** Multi-term cosine search (ref MovieSearchEngine.scala:268-308) —
    * a batch of one through [[cosineScores]]; see its scaladoc for the
    * `trueCosine` quirk and the broadcast/scale shape. The final
    * orderBy+limit compiles to TakeOrderedAndProject (partial top-k per
    * partition, no global sort). */
  def searchMulti(postings: DataFrame, norms: DataFrame, terms: Seq[String],
                  k: Int = 10, trueCosine: Boolean = false): DataFrame = {
    val spark = postings.sparkSession
    import spark.implicits._
    // query term frequencies (ref :277-281), under a single constant qid
    val qtf = terms.toDF("term").groupBy("term").agg(count(lit(1)).as("qtf"))
      .withColumn("qid", lit(0L))
    cosineScores(postings, norms, qtf, trueCosine)
      .select("doc_id", "score")
      .orderBy(desc("score"), asc("doc_id"))
      .limit(k)
  }

  /** Persist an index range-partitioned and sorted by term: parquet
    * row-group min/max stats then prune term point-lookups (the
    * `filter(term === t)` in [[searchSingle]] reads only the row groups
    * whose [min,max] covers t — at 100 TB the difference between a full
    * scan and a few megabytes). */
  def writeIndex(postings: DataFrame, path: String, partitions: Int = 32): Unit =
    postings.repartitionByRange(partitions, col("term"))
      .sortWithinPartitions("term")
      .write.mode("overwrite").parquet(path)

  def readIndex(spark: org.apache.spark.sql.SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  // ---------------------------------------------------------------- oracle

  /** Shared tail from a `toks(doc_id, term)` CTE to the `postings` CTE —
    * one definition for the raw and stemmed index twins so they cannot
    * drift. */
  private def postingsTailSql: String =
    s""", tf AS (
       |  SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY doc_id, term
       |), dfreq AS (
       |  SELECT term, count(*) AS df FROM tf GROUP BY term
       |), n AS (
       |  SELECT count(*) AS n_docs FROM documents
       |), postings AS (
       |  SELECT tf.doc_id, tf.term, tf.tf, dfreq.df,
       |         ln(CAST(n.n_docs AS DOUBLE) / CAST(dfreq.df AS DOUBLE)) AS idf,
       |         CAST(tf.tf AS DOUBLE) * ln(CAST(n.n_docs AS DOUBLE) / CAST(dfreq.df AS DOUBLE)) AS tfidf
       |  FROM tf JOIN dfreq USING (term) CROSS JOIN n
       |)""".stripMargin

  /** DuckDB CTE prefix building postings over `documents` — must mirror
    * [[postings]] exactly (natural log; duplicate-preserving tokens). */
  def postingsSql: String =
    s"""WITH toks AS (
       |  SELECT doc_id, t.term
       |  FROM documents, UNNEST(${Tokenize.tokensSql("text")}) AS t(term)
       |)$postingsTailSql""".stripMargin

  /** Stemmed twin of [[postingsSql]] — the three stem stages run as
    * staged CTEs (DuckDB lacks bindable expressions; staging avoids
    * textual self-repetition of the CASE chains). */
  def stemmedPostingsSql: String =
    s"""WITH toks0 AS (
       |  SELECT doc_id, t.term AS w
       |  FROM documents, UNNEST(${Tokenize.tokensSql("text")}) AS t(term)
       |), tok1 AS (
       |  SELECT doc_id, ${Tokenize.stemStep1Sql("w").replace("\n", "\n  ")} AS w FROM toks0
       |), tok2 AS (
       |  SELECT doc_id, ${Tokenize.stemStep2Sql("w").replace("\n", "\n  ")} AS w FROM tok1
       |), toks AS (
       |  SELECT doc_id, ${Tokenize.stemUndoubleSql("w").replace("\n", "\n  ")} AS term FROM tok2
       |)$postingsTailSql""".stripMargin

  /** Single-term search over the STEMMED index (t15); `term` must
    * already be stemmed by the caller with [[Tokenize.stemString]]. */
  def stemmedSearchSingleSql(term: String, k: Int = 10): String =
    s"""$stemmedPostingsSql
       |SELECT doc_id, round(tfidf, 6) AS score
       |FROM postings WHERE term = '$term'
       |ORDER BY score DESC, doc_id ASC LIMIT $k""".stripMargin

  def searchSingleSql(term: String, k: Int = 10): String =
    s"""$postingsSql
       |SELECT doc_id, round(tfidf, 6) AS score
       |FROM postings WHERE term = '$term'
       |ORDER BY score DESC, doc_id ASC LIMIT $k""".stripMargin

  def searchMultiSql(terms: Seq[String], k: Int = 10): String = {
    val termRows = terms.map(t => s"('$t')").mkString(", ")
    s"""$postingsSql, norms AS (
       |  SELECT doc_id, CAST(SUM(CAST(tfidf * tfidf AS DECIMAL(32,12))) AS DOUBLE) AS norm2
       |  FROM postings GROUP BY doc_id
       |), qterms AS (
       |  SELECT term, count(*) AS qtf FROM (VALUES $termRows) AS q(term) GROUP BY term
       |), idf AS (
       |  SELECT term, any_value(idf) AS idf FROM postings GROUP BY term
       |), qvec AS (
       |  SELECT q.term, CAST(q.qtf AS DOUBLE) * idf.idf AS q_tfidf
       |  FROM qterms q JOIN idf USING (term)
       |), qnorm AS (
       |  SELECT CAST(SUM(CAST(q_tfidf * q_tfidf AS DECIMAL(32,12))) AS DOUBLE) AS qnorm2 FROM qvec
       |), dot AS (
       |  SELECT p.doc_id, CAST(SUM(CAST(p.tfidf * q.q_tfidf AS DECIMAL(32,12))) AS DOUBLE) AS dot
       |  FROM postings p JOIN qvec q USING (term) GROUP BY p.doc_id
       |)
       |SELECT d.doc_id, round(d.dot / (n.norm2 * q.qnorm2), 6) AS score
       |FROM dot d JOIN norms n USING (doc_id) CROSS JOIN qnorm q
       |ORDER BY score DESC, doc_id ASC LIMIT $k""".stripMargin
  }
}
