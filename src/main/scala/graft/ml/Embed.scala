package graft.ml

import org.apache.spark.ml.Pipeline
import org.apache.spark.ml.feature.{Tokenizer, Word2Vec}
import org.apache.spark.ml.functions.vector_to_array
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.VectorDotExact
import graft.sources.Tables

/** Learned text embeddings: a Word2Vec pipeline over `documents` plus
  * cosine retrieval on the resulting document vectors (SURVEY §2.8
  * family — the reference's spark.ml surface extended with the embedding
  * stage an LLM-data pipeline needs; ref pipeline shape
  * StandaloneScala/AirlineSentimentAnalysis.scala:43-67).
  *
  * Word2Vec averages trained word vectors per document (spark.ml
  * semantics), giving each doc a dense vector WITHOUT a labeled corpus —
  * the unsupervised complement to [[Classify]].
  *
  * Oracle strategy (persisted-fit, pattern: t3_tfidf_persisted /
  * s4_ann_ivf): the fit is not SQL-expressible, but its OUTPUT is a fact
  * once written — doc vectors land in parquet, the query re-ranks from
  * the file, and DuckDB recomputes the entire cosine top-k from the same
  * file. The dot products go through the decimal-quantized kernel
  * ([[VectorDotExact]]) so both engines sum exactly.
  *
  * Scale: fit cost is one vocab aggregate + iterations over token
  * windows; at corpus scale the fit would train on a deterministic
  * hash-bucket sample (same posture as the IVF quantizer) while
  * TRANSFORM still covers every document. Retrieval is per-row dot
  * products against one broadcast query vector — zero wide shuffles.
  */
object Embed {
  private val Dims = 16

  private def embPath(tag: String): String =
    graft.sources.Artifacts.path(s"${tag}_emb")

  /** Tokenizer → Word2Vec document vectors, persisted to parquet and read
    * back (doc_id, emb: array<double>). */
  def word2vecPersist(spark: SparkSession, dir: String, tag: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val tok = new Tokenizer().setInputCol("text").setOutputCol("tokens")
    val w2v = new Word2Vec().setInputCol("tokens").setOutputCol("w2v")
      .setVectorSize(Dims).setMinCount(2).setMaxIter(1).setSeed(42L)
    val model = new Pipeline().setStages(Array(tok, w2v)).fit(docs)
    model.transform(docs)
      .select(col("doc_id"), vector_to_array(col("w2v")).as("emb"))
      .write.mode("overwrite").parquet(embPath(tag))
    spark.read.parquet(embPath(tag))
  }

  /** Cosine top-k over the persisted doc vectors: broadcast the one query
    * row, per-row exact dot, TakeOrdered. Zero-vector docs (all tokens
    * below minCount) are excluded on both engines — cosine is undefined
    * for them. */
  def w2vKnn(emb: DataFrame, queryId: Long, k: Int = 10): DataFrame = {
    VectorDotExact.register(emb.sparkSession)
    def norm2(c: org.apache.spark.sql.Column) = VectorDotExact(c, c)
    val q = emb.filter(col("doc_id") === queryId)
      .select(col("emb").as("qe"), norm2(col("emb")).as("qnorm2"))
      .filter(col("qnorm2") > 0)
    emb.filter(col("doc_id") =!= queryId)
      .withColumn("norm2", norm2(col("emb")))
      .filter(col("norm2") > 0)
      .crossJoin(broadcast(q))
      .select(col("doc_id"),
        round(VectorDotExact(col("emb"), col("qe")) /
          (sqrt(col("norm2")) * sqrt(col("qnorm2"))), 6)
          // DECIMAL(18,6) output: exact bytes on both engines, no
          // double bit-pattern hash risk (VERDICT r4, the m3 class)
          .cast(org.apache.spark.sql.types.DecimalType(18, 6)).as("cos"))
      .orderBy(desc("cos"), asc("doc_id"))
      .limit(k)
  }

  /** DuckDB re-rank over the SAME persisted vectors. */
  def w2vKnnSql(tag: String, queryId: Long, k: Int = 10): String =
    s"""WITH ex AS (
       |  SELECT doc_id, u.d, emb[u.d + 1] AS x
       |  FROM '${embPath(tag)}/*.parquet', UNNEST(range($Dims)) AS u(d)
       |), norms AS (
       |  SELECT doc_id, CAST(SUM(CAST(x * x AS DECIMAL(32,16))) AS DOUBLE) AS norm2
       |  FROM ex GROUP BY doc_id
       |), q AS (SELECT d, x AS qx FROM ex WHERE doc_id = $queryId),
       |qn AS (SELECT norm2 AS qnorm2 FROM norms WHERE doc_id = $queryId AND norm2 > 0),
       |dots AS (
       |  SELECT ex.doc_id, CAST(SUM(CAST(ex.x * q.qx AS DECIMAL(32,16))) AS DOUBLE) AS dot
       |  FROM ex JOIN q USING (d) WHERE ex.doc_id != $queryId GROUP BY ex.doc_id
       |)
       |SELECT d.doc_id, CAST(round(d.dot / (sqrt(n.norm2) * sqrt(qn.qnorm2)), 6) AS DECIMAL(18,6)) AS cos
       |FROM dots d JOIN norms n USING (doc_id) CROSS JOIN qn
       |WHERE n.norm2 > 0
       |ORDER BY cos DESC, doc_id ASC LIMIT $k""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "m8_w2v_knn" -> ((s: SparkSession, dir: String) =>
      w2vKnn(word2vecPersist(s, dir, "m8"), queryId = 0L)),
  )

  def oracles: Map[String, String] = Map(
    "m8_w2v_knn" -> w2vKnnSql("m8", 0L),
  )
}
