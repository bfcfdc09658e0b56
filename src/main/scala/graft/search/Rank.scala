package graft.search

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.plans.Materialized
import graft.sources.Tables
import graft.text.Tokenize

/** Ranked-retrieval extensions over the TF-IDF inverted index: Okapi
  * BM25 scoring and positional phrase search (ref:
  * ScalaNotebooks/MovieSearchEngine.scala builds the tf/df index this
  * module consumes — :128-151; BM25 and phrase matching are the two
  * standard retrieval operators the reference's engine stops short of).
  *
  * Both reuse the SAME memoized postings build as t1/t2/t3 (one
  * tokenize+aggregate pass per session/sf-dir), so registering them adds
  * no new corpus scan.
  *
  * Scale shape: BM25's per-query work after the index build is a
  * broadcast semi-join of the (tiny) query-term set against the
  * term-partitioned postings followed by one doc-keyed aggregate —
  * identical to the t2 cosine plan. Phrase search shuffles ONLY the two
  * phrase terms' positional postings (filter pushed below the join),
  * never the corpus.
  *
  * Cross-engine determinism: ln() outputs are rounded to 6 dp into
  * DECIMAL at birth (the libm rule); the remaining per-term arithmetic
  * is IEEE double with identical association on both engines; per-doc
  * sums are decimal-quantized (order-independent); the final rounded
  * score is emitted as DECIMAL(18,6) on both sides (no double bit
  * patterns reach the driver's hash).
  */
object Rank {
  private val Dec = DecimalType(32, 12)
  private val Out6 = DecimalType(18, 6)

  /** Same memo key as SparkEntry's postings cache — t1/t2/t3/t4 all
    * share one index build per (session, sf-dir). */
  private def cachedPostings(s: SparkSession, dir: String): DataFrame =
    Materialized(s, s"tfidf_postings:${Tables.norm(dir)}")(
      TfIdf.postings(Tables.documents(s, dir)))

  /** Okapi BM25 top-k: score(D) = Σ_t idf_t · (tf·(k1+1)) /
    * (tf + k1·(1 − b + b·dl/avgdl)), idf_t = ln((N − df + ½)/(df + ½) + 1)
    * (the Robertson/Sparck-Jones plus-one variant — always positive).
    * k1 = 1.2, b = 0.75 (the standard constants, inlined identically in
    * the oracle).
    *
    * dl (doc length) and avgdl are measured over the same stopword-
    * filtered tokens as the index, derived FROM the postings frame
    * (Σ tf per doc) — no second corpus scan. N is the doc-length table's
    * row count (docs with ≥1 indexed token; a doc with no tokens can
    * match no query term). */
  def bm25(postings: DataFrame, terms: Seq[String], k: Int = 10): DataFrame = {
    val spark = postings.sparkSession
    import spark.implicits._
    val dl = postings.groupBy("doc_id").agg(sum("tf").as("dl"))
      .localCheckpoint(true) // feeds both the scalar stats and the score join
    val stats = dl.agg(count(lit(1)).as("n_docs"), sum("dl").as("total_dl"))
    val qterms = terms.distinct.toDF("term")
    // df for the query terms only — the aggregate runs AFTER the
    // broadcast semi-join prunes the postings scan to the query terms
    val qpost = postings.join(broadcast(qterms), "term")
      .select("term", "doc_id", "tf", "df")
    // idf per query term: decimal at birth (6-dp round of the ln output)
    val scored = qpost.crossJoin(broadcast(stats))
      .withColumn("idf6",
        round(log((col("n_docs").cast("double") - col("df").cast("double") + lit(0.5)) /
          (col("df").cast("double") + lit(0.5)) + lit(1.0)), 6).cast(Out6))
      .join(dl, "doc_id")
      .withColumn("avgdl", col("total_dl").cast("double") / col("n_docs").cast("double"))
      .withColumn("score_t",
        ((col("idf6").cast("double") * (col("tf").cast("double") * lit(2.2))) /
          (col("tf").cast("double") +
            lit(1.2) * (lit(0.25) + lit(0.75) * col("dl").cast("double") / col("avgdl"))))
          .cast(Dec))
    scored.groupBy("doc_id")
      .agg(round(sum("score_t").cast("double"), 6).cast(Out6).as("score"))
      .orderBy(desc("score"), asc("doc_id"))
      .limit(k)
  }

  /** Positional phrase search: count of exact adjacent occurrences of a
    * two-word phrase per document, via the positional-postings
    * intersection plan (p2.pos = p1.pos + 1). Positions come from ONE
    * posexplode pass filtered to the two phrase terms BEFORE the
    * self-join — only those terms' postings are materialized and
    * shuffled. Raw tokens (stopwords kept): phrase adjacency must see
    * the original token stream. */
  def phraseSearch(docs: DataFrame, w1: String, w2: String): DataFrame = {
    val pos = docs.select(col("doc_id"),
        posexplode(Tokenize.rawTokens(col("text"))).as(Seq("pos", "term")))
      .filter(col("term").isin(w1, w2))
      .localCheckpoint(true) // two-term postings only; feeds both join sides
    val a = pos.filter(col("term") === w1).select(col("doc_id"), col("pos"))
    val b = pos.filter(col("term") === w2)
      .select(col("doc_id").as("doc_b"), col("pos").as("pos_b"))
    a.join(b, col("doc_id") === col("doc_b") && col("pos_b") === col("pos") + 1)
      .groupBy("doc_id").agg(count(lit(1)).as("n_hits"))
      .orderBy(desc("n_hits"), asc("doc_id"))
  }

  /** More-like-this: rank documents by true-cosine TF-IDF similarity to
    * a SOURCE document, using its `maxTerms` highest-tfidf terms as the
    * query vector (the Lucene MLT shape — truncating the query vector
    * bounds the postings probe to a handful of term lookups regardless
    * of document length; the candidate set is the union of those terms'
    * postings, never the corpus). Term selection is deterministic:
    * tfidf desc, term asc. The source doc's own row is excluded. */
  def moreLikeThis(postings: DataFrame, norms: DataFrame, docId: Long,
                   k: Int = 10, maxTerms: Int = 8): DataFrame = {
    val qvec = postings.filter(col("doc_id") === docId)
      .orderBy(desc("tfidf"), asc("term")).limit(maxTerms)
      .select(col("term"), col("tfidf").as("q_tfidf"))
    val qnorm = qvec.agg(
      sum((col("q_tfidf") * col("q_tfidf")).cast(Dec)).cast("double").as("qnorm2"))
    val dot = postings.filter(col("doc_id") =!= docId)
      .join(broadcast(qvec), "term")
      .groupBy("doc_id")
      .agg(sum((col("tfidf") * col("q_tfidf")).cast(Dec)).cast("double").as("dot"))
    dot.join(norms, "doc_id")
      .crossJoin(broadcast(qnorm))
      .select(col("doc_id"),
        round(col("dot") / (sqrt(col("norm2")) * sqrt(col("qnorm2"))), 6)
          .cast(Out6).as("score"))
      .orderBy(desc("score"), asc("doc_id"))
      .limit(k)
  }

  // ----------------------------------------------------- batched queries

  /** Batched multi-query TF-IDF search — N queries served from ONE
    * postings pass (ref: ScalaNotebooks/MovieSearchEngine.scala:244,268
    * drives a FILE of search terms through a driver-side foreach, one
    * Spark job per term; at 100 TB that plan reads the index N times).
    * Here the whole query batch becomes a tiny (qid, term, q_tfidf)
    * frame broadcast into a single postings join; per-doc dots aggregate
    * by (qid, doc_id) in one shuffle, and each query ranks its own
    * candidates via a row_number window PARTITIONED BY qid — no global
    * sort, no per-query job. The same skeleton as the vector batch path
    * ([[graft.similarity.Similarity.knnBatch]]).
    *
    * Scoring is per-slice IDENTICAL to [[TfIdf.searchMulti]] (including
    * the reference's squared-norm denominator quirk at its :304, and the
    * corrected `trueCosine` variant) — spec-pinned: slicing the batch
    * output at one qid equals the single-query call. */
  def searchBatch(postings: DataFrame, norms: DataFrame,
                  queries: Seq[(Long, Seq[String])], k: Int = 10,
                  trueCosine: Boolean = false): DataFrame = {
    val spark = postings.sparkSession
    import spark.implicits._
    // query term frequencies per query id (duplicate terms counted, the
    // searchMulti qtf rule)
    val qtf = queries.flatMap { case (q, ts) => ts.map(t => (q, t)) }
      .toDF("qid", "term")
      .groupBy("qid", "term").agg(count(lit(1)).as("qtf"))
    val idf = postings.select("term", "idf").groupBy("term").agg(first("idf").as("idf"))
    val qvec = qtf.join(idf, "term")
      .withColumn("q_tfidf", col("qtf").cast("double") * col("idf"))
    // per-query squared norms: |Q| metadata rows, broadcast after the dot agg
    val qnorms = qvec.groupBy("qid")
      .agg(sum((col("q_tfidf") * col("q_tfidf")).cast(Dec)).cast("double").as("qnorm2"))
    val dot = postings.join(broadcast(qvec.select("qid", "term", "q_tfidf")), "term")
      .withColumn("mult", col("tfidf") * col("q_tfidf"))
      .groupBy("qid", "doc_id")
      .agg(sum(col("mult").cast(Dec)).cast("double").as("dot"))
    val denom: org.apache.spark.sql.Column =
      if (trueCosine) sqrt(col("norm2")) * sqrt(col("qnorm2"))
      else col("norm2") * col("qnorm2") // ref :304 quirk, as searchMulti
    val scored = dot.join(norms, "doc_id")
      .join(broadcast(qnorms), "qid")
      .select(col("qid"), col("doc_id"), round(col("dot") / denom, 6).as("score"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("qid").orderBy(desc("score"), asc("doc_id"))
    scored.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k).drop("rk")
      .orderBy(asc("qid"), desc("score"), asc("doc_id"))
  }

  /** Batched BM25 — the same one-postings-pass batch plan as
    * [[searchBatch]] with the [[bm25]] scorer: per-(qid, doc) partial
    * scores aggregate in one shuffle, per-query top-k via the qid rank
    * window. Per-slice identical to the single-query [[bm25]]
    * (spec-pinned); dl/avgdl/N come from the same postings-derived
    * doc-length frame, computed once for the whole batch. */
  def bm25Batch(postings: DataFrame, queries: Seq[(Long, Seq[String])],
                k: Int = 10): DataFrame = {
    val spark = postings.sparkSession
    import spark.implicits._
    val dl = postings.groupBy("doc_id").agg(sum("tf").as("dl"))
      .localCheckpoint(true) // feeds both the scalar stats and the score join
    val stats = dl.agg(count(lit(1)).as("n_docs"), sum("dl").as("total_dl"))
    val qterms = queries.flatMap { case (q, ts) => ts.distinct.map(t => (q, t)) }
      .toDF("qid", "term")
    val qpost = postings.join(broadcast(qterms), "term")
      .select("qid", "term", "doc_id", "tf", "df")
    val scored = qpost.crossJoin(broadcast(stats))
      .withColumn("idf6",
        round(log((col("n_docs").cast("double") - col("df").cast("double") + lit(0.5)) /
          (col("df").cast("double") + lit(0.5)) + lit(1.0)), 6).cast(Out6))
      .join(dl, "doc_id")
      .withColumn("avgdl", col("total_dl").cast("double") / col("n_docs").cast("double"))
      .withColumn("score_t",
        ((col("idf6").cast("double") * (col("tf").cast("double") * lit(2.2))) /
          (col("tf").cast("double") +
            lit(1.2) * (lit(0.25) + lit(0.75) * col("dl").cast("double") / col("avgdl"))))
          .cast(Dec))
    val perDoc = scored.groupBy("qid", "doc_id")
      .agg(round(sum("score_t").cast("double"), 6).cast(Out6).as("score"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("qid").orderBy(desc("score"), asc("doc_id"))
    perDoc.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k).drop("rk")
      .orderBy(asc("qid"), desc("score"), asc("doc_id"))
  }

  // ---------------------------------------------------------------- oracle

  def bm25Sql(terms: Seq[String], k: Int = 10): String = {
    val termRows = terms.distinct.map(t => s"('$t')").mkString(", ")
    s"""${TfIdf.postingsSql},
       |dl AS (
       |  SELECT doc_id, CAST(SUM(tf) AS BIGINT) AS dl FROM postings GROUP BY doc_id
       |), stats AS (
       |  SELECT count(*) AS n_docs, CAST(SUM(dl) AS BIGINT) AS total_dl FROM dl
       |), qterms AS (SELECT term FROM (VALUES $termRows) AS q(term)),
       |qpost AS (
       |  SELECT p.term, p.doc_id, p.tf, p.df FROM postings p JOIN qterms USING (term)
       |), scored AS (
       |  SELECT q.doc_id,
       |    CAST(
       |      (CAST(CAST(round(ln((CAST(s.n_docs AS DOUBLE) - CAST(q.df AS DOUBLE) + 0.5) /
       |                      (CAST(q.df AS DOUBLE) + 0.5) + 1.0), 6) AS DECIMAL(18,6)) AS DOUBLE)
       |        * (CAST(q.tf AS DOUBLE) * 2.2))
       |      / (CAST(q.tf AS DOUBLE)
       |         + 1.2 * (0.25 + 0.75 * CAST(d.dl AS DOUBLE)
       |                   / (CAST(s.total_dl AS DOUBLE) / CAST(s.n_docs AS DOUBLE))))
       |      AS DECIMAL(32,12)) AS score_t
       |  FROM qpost q JOIN dl d USING (doc_id) CROSS JOIN stats s
       |)
       |SELECT doc_id, CAST(round(CAST(SUM(score_t) AS DOUBLE), 6) AS DECIMAL(18,6)) AS score
       |FROM scored GROUP BY doc_id
       |ORDER BY score DESC, doc_id ASC LIMIT $k""".stripMargin
  }

  def moreLikeThisSql(docId: Long, k: Int = 10, maxTerms: Int = 8): String =
    s"""${TfIdf.postingsSql},
       |norms AS (
       |  SELECT doc_id, CAST(SUM(CAST(tfidf * tfidf AS DECIMAL(32,12))) AS DOUBLE) AS norm2
       |  FROM postings GROUP BY doc_id
       |), qv AS (
       |  SELECT term, tfidf AS q_tfidf FROM postings WHERE doc_id = $docId
       |  ORDER BY tfidf DESC, term ASC LIMIT $maxTerms
       |), qn AS (
       |  SELECT CAST(SUM(CAST(q_tfidf * q_tfidf AS DECIMAL(32,12))) AS DOUBLE) AS qnorm2 FROM qv
       |), dots AS (
       |  SELECT p.doc_id, CAST(SUM(CAST(p.tfidf * q.q_tfidf AS DECIMAL(32,12))) AS DOUBLE) AS dot
       |  FROM postings p JOIN qv q USING (term) WHERE p.doc_id != $docId GROUP BY p.doc_id
       |)
       |SELECT d.doc_id,
       |  CAST(round(d.dot / (sqrt(n.norm2) * sqrt(q.qnorm2)), 6) AS DECIMAL(18,6)) AS score
       |FROM dots d JOIN norms n USING (doc_id) CROSS JOIN qn q
       |ORDER BY score DESC, doc_id ASC LIMIT $k""".stripMargin

  def phraseSearchSql(w1: String, w2: String): String = {
    val toks = Tokenize.rawTokensSql("text")
    s"""WITH t AS (
       |  SELECT doc_id, $toks AS toks FROM documents
       |)
       |SELECT doc_id, count(*) AS n_hits
       |FROM t, UNNEST(range(1, len(toks))) AS u(i)
       |WHERE toks[u.i] = '$w1' AND toks[u.i + 1] = '$w2'
       |GROUP BY doc_id ORDER BY n_hits DESC, doc_id ASC""".stripMargin
  }

  // -------------------------------------------------------------- registry

  private val bm25Terms = Seq("spark", "table", "query")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "t4_bm25" -> ((s: SparkSession, dir: String) =>
      bm25(cachedPostings(s, dir), bm25Terms)),
    "t5_phrase_search" -> ((s: SparkSession, dir: String) =>
      phraseSearch(Tables.documents(s, dir), "table", "hash")),
    "t6_more_like_this" -> ((s: SparkSession, dir: String) => {
      val p = cachedPostings(s, dir)
      moreLikeThis(p, TfIdf.docNorms(p), docId = 0L)
    }),
  )

  def oracles: Map[String, String] = Map(
    "t4_bm25" -> bm25Sql(bm25Terms),
    "t5_phrase_search" -> phraseSearchSql("table", "hash"),
    "t6_more_like_this" -> moreLikeThisSql(0L),
  )
}
