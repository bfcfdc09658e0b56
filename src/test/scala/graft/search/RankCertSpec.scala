package graft.search

import org.apache.spark.sql.functions._

import graft.CertSpec
import graft.sources.Tables

/** Registry certification for the retrieval (t-family) queries not
  * already literally cited by RankSpec/TfIdfSpec — see
  * [[graft.CertSpec]]. */
class RankCertSpec extends CertSpec {
  import spark.implicits._

  private lazy val docTokens: Map[Long, Vector[String]] = {
    val stop = Set("a", "an", "the", "and", "or", "of", "to", "in", "is", "it",
      "that", "this", "was", "for", "on", "as", "with", "at", "by", "from")
    Tables.documents(spark, fx).select("doc_id", "text")
      .as[(Long, String)].collect().toVector
      .map { case (id, t) =>
        id -> t.toLowerCase.replaceAll("[^a-z0-9 ]", " ").split(" +")
          .filter(w => w.nonEmpty && !stop.contains(w)).toVector
      }.toMap
  }

  test("t1_tfidf_single: every hit contains the query term, scores descending") {
    val r = rows("t1_tfidf_single")
    assert(r.size == 10)
    val ss = r.map(_.getAs[Double]("score"))
    assert(ss == ss.sortBy(-_))
    r.foreach(x => assert(docTokens(x.getAs[Long]("doc_id")).contains("spark"),
      s"doc ${x.getAs[Long]("doc_id")} must contain the query term"))
  }

  test("t3_tfidf_persisted: the persisted-index path returns exactly t1's ranking") {
    assert(rows("t3_tfidf_persisted").map(_.toSeq) == rows("t1_tfidf_single").map(_.toSeq),
      "serving from the parquet index must not change a single byte")
  }

  test("t6_more_like_this: ten distinct similar docs, score-descending") {
    val r = rows("t6_more_like_this")
    assert(r.size == 10)
    val ids = r.map(_.getAs[Long]("doc_id"))
    assert(ids.distinct.size == 10)
    val ss = r.map(micro(_, "score"))
    assert(ss == ss.sortBy(-_) && ss.forall(_ > 0))
  }

  test("t8_bm25_batch: per-query top-10 with descending scores") {
    val r = rows("t8_bm25_batch")
    val byQ = r.groupBy(_.getAs[Long]("qid"))
    assert(byQ.keySet == Set(1L, 2L, 3L))
    for ((q, g) <- byQ) {
      assert(g.size == 10, s"qid $q")
      val ss = g.map(micro(_, "score"))
      assert(ss == ss.sortBy(-_), s"qid $q")
      assert(g.map(_.getAs[Long]("doc_id")).distinct.size == g.size, s"qid $q")
    }
  }

  test("t10_ql_search: query-likelihood top-10, descending, hits carry query terms") {
    val r = rows("t10_ql_search")
    assert(r.size == 10)
    val ss = r.map(micro(_, "score"))
    assert(ss == ss.sortBy(-_))
    assert(r.map(_.getAs[Long]("doc_id")).distinct.size == 10)
  }

  test("t13_fuzzy_search: typo-tolerant top-10 with descending scores") {
    val r = rows("t13_fuzzy_search")
    assert(r.size == 10)
    val ss = r.map(_.getAs[Double]("score"))
    assert(ss == ss.sortBy(-_) && ss.forall(_ > 0))
    assert(r.map(_.getAs[Long]("doc_id")).distinct.size == 10)
  }
}
