package graft.search

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Golden BM25 + phrase-search tests over hand-computed mini corpora. */
class RankSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Seq(
    (0L, "cat runs"),
    (1L, "cat dog"),
    (2L, "bird bird")).toDF("doc_id", "text")

  private lazy val p = TfIdf.postings(docs).cache()

  test("bm25 matches hand computation on the mini corpus") {
    // N = 3, every doc has dl = 2, avgdl = 2 → length norm = 1.
    // "cat": df = 2, idf = ln((3-2+0.5)/(2+0.5)+1) = ln(1.6) ≈ 0.470004;
    // tf = 1 → score = idf·(1·2.2)/(1+1.2·1) = idf.
    val got = Rank.bm25(p, Seq("cat")).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        r.getAs[java.math.BigDecimal]("score").doubleValue).toMap
    assert(got.keySet == Set(0L, 1L))
    assert(math.abs(got(0L) - 0.470004) < 1e-9)
    assert(math.abs(got(1L) - 0.470004) < 1e-9)
  }

  test("bm25 rare term outranks common term; tf saturates sublinearly") {
    // "bird" df=1 idf=ln(2.5/1.5+1)=ln(8/3); tf=2 → saturation < 2× the tf=1 score
    val bird = Rank.bm25(p, Seq("bird")).collect()
      .map(r => r.getAs[java.math.BigDecimal]("score").doubleValue).head
    val idfBird = BigDecimal(math.log(8.0 / 3.0)).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val expected = idfBird * (2 * 2.2) / (2 + 1.2 * 1.0)
    assert(math.abs(bird - BigDecimal(expected).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9)
    assert(bird < 2 * idfBird && bird > idfBird) // sublinear in tf
  }

  test("bm25 multi-term sums per-term scores; docs without any term dropped") {
    val got = Rank.bm25(p, Seq("cat", "dog")).collect()
      .map(r => r.getAs[Long]("doc_id")).toSeq
    assert(got.head == 1L) // contains both terms
    assert(got.toSet == Set(0L, 1L)) // doc 2 matches neither
  }

  test("phraseSearch counts exact adjacencies only") {
    val d = Seq(
      (0L, "the cat dog runs"),   // "cat dog" once
      (1L, "cat and dog"),        // not adjacent
      (2L, "cat dog cat dog"),    // twice
      (3L, "dog cat")             // wrong order
    ).toDF("doc_id", "text")
    val got = Rank.phraseSearch(d, "cat", "dog").collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("n_hits"))).toSeq
    assert(got == Seq((2L, 2L), (0L, 1L))) // ordered by n_hits desc, doc_id asc
  }

  test("phraseSearch handles self-adjacent repeated word") {
    val d = Seq((0L, "go go go"), (1L, "go stop go")).toDF("doc_id", "text")
    val got = Rank.phraseSearch(d, "go", "go").collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("n_hits"))).toSeq
    assert(got == Seq((0L, 2L))) // positions (0,1) and (1,2); doc 1 has none
  }

  test("moreLikeThis: identical doc scores cosine 1, excludes the source") {
    val d = Seq(
      (0L, "cat dog bird"),
      (1L, "cat dog bird"),   // identical vector → cosine 1
      (2L, "cat fish"),       // partial overlap
      (3L, "worm slug")       // no overlap → absent
    ).toDF("doc_id", "text")
    val p = TfIdf.postings(d).localCheckpoint(true)
    val got = Rank.moreLikeThis(p, TfIdf.docNorms(p), docId = 0L).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        r.getAs[java.math.BigDecimal]("score").doubleValue).toMap
    assert(!got.contains(0L) && !got.contains(3L))
    assert(math.abs(got(1L) - 1.0) < 1e-9)
    assert(got(2L) < 1.0 && got(2L) > 0.0)
  }

  test("moreLikeThis: maxTerms truncation keeps the highest-tfidf terms") {
    // doc 0 has a rare term ("zebra", df=1) and a common one ("cat", df=3);
    // with maxTerms=1 only the top-tfidf term (zebra) forms the query
    val d = Seq(
      (0L, "zebra cat"),
      (1L, "zebra dog"),
      (2L, "cat dog"),
      (3L, "cat mouse")).toDF("doc_id", "text")
    val p = TfIdf.postings(d).localCheckpoint(true)
    val got = Rank.moreLikeThis(p, TfIdf.docNorms(p), docId = 0L, maxTerms = 1)
      .collect().map(_.getAs[Long]("doc_id")).toSet
    assert(got == Set(1L)) // only the other zebra doc matches the truncated query
  }
}
