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

  test("qlSearch matches hand computation; longer docs pay the length normalizer") {
    // corpus: (0)"cat runs" (1)"cat dog" (2)"bird bird"; |C| = 6, μ = 2000
    // query "cat": cf = 2, p = 2/6; match term for docs 0,1 (tf = 1):
    //   ln(1 + 1/(2000·(2/6))) rounded 6 dp; dl = 2 both → score equal:
    //   round6(lp + 1·round6(ln(2000/2002)))
    val lp = BigDecimal(math.log(1.0 + 1.0 / (2000.0 * (2.0 / 6.0))))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val norm = BigDecimal(math.log(2000.0 / 2002.0))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val expected = BigDecimal(lp + 1.0 * norm)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val got = Rank.qlSearch(p, Seq("cat")).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        r.getAs[java.math.BigDecimal]("score").doubleValue).toMap
    assert(got.keySet == Set(0L, 1L))
    assert(math.abs(got(0L) - expected) < 1e-9)
    assert(math.abs(got(1L) - expected) < 1e-9)
    // two-term query: doc 1 matches both terms and must outrank doc 0
    // (same length, one extra matching term)
    val both = Rank.qlSearch(p, Seq("cat", "dog")).collect()
      .map(_.getAs[Long]("doc_id")).toSeq
    assert(both.head == 1L)
    assert(both.toSet == Set(0L, 1L)) // bird-only doc matches neither term
    // rarer term scores higher than common at equal tf/dl: "bird" cf=2
    // but concentrated — compare "runs" (cf=1) vs "cat" (cf=2) on doc 0
    val runs = Rank.qlSearch(p, Seq("runs")).collect()
      .map(r => r.getAs[java.math.BigDecimal]("score").doubleValue).head
    assert(runs > got(0L)) // smaller collection probability → bigger lift
  }

  test("rm3Weights: hand-computed interpolation on the mini corpus") {
    // query "cat", fbDocs = 2 → feedback = docs 0,1 (the two cat docs).
    // RM1 (uniform doc weights, pre-normalization sums over F):
    //   cat 1/2 + 1/2 = 1.0, runs 1/2, dog 1/2 → Z = 2.0
    // w(cat)  = 0.5·1 + 0.5·(1.0/2) = 0.75
    // w(dog)  = 0.5·(0.5/2) = 0.125 = w(runs); Σw = 1.
    val dl = p.groupBy("doc_id").agg(sum("tf").as("dl")).localCheckpoint(true)
    val w = Rank.rm3Weights(p, Seq("cat"), fbDocs = 2, fbTerms = 10,
        lambda = 0.5, mu = 2000.0, dl = dl)
      .collect().map(r => r.getAs[String]("term") -> r.getAs[Double]("w")).toMap
    assert(w.keySet == Set("cat", "dog", "runs"))
    assert(math.abs(w("cat") - 0.75) < 1e-12)
    assert(math.abs(w("dog") - 0.125) < 1e-12)
    assert(math.abs(w("runs") - 0.125) < 1e-12)
    assert(math.abs(w.values.sum - 1.0) < 1e-12)
  }

  test("rm3Search with lambda=1 reproduces the unexpanded QL ranking") {
    // λ=1 zeroes the expansion mass, so score = (1/|q|)·Σlp + norm —
    // a positive affine transform of the t10 score: same doc order.
    val ql = Rank.qlSearch(p, Seq("cat", "dog")).collect()
      .map(_.getAs[Long]("doc_id")).toSeq
    val rm3 = Rank.rm3Search(p, Seq("cat", "dog"), lambda = 1.0).collect()
      .map(_.getAs[Long]("doc_id")).toSeq
    assert(rm3 == ql)
  }

  test("rm3 expansion retrieves feedback-co-occurring docs the raw query cannot") {
    val d = Seq(
      (0L, "apple banana"),
      (1L, "apple banana"),
      (2L, "banana cherry"),   // no "apple" — only reachable via expansion
      (3L, "cherry cherry")).toDF("doc_id", "text")
    val pp = TfIdf.postings(d).localCheckpoint(true)
    val raw = Rank.qlSearch(pp, Seq("apple")).collect()
      .map(_.getAs[Long]("doc_id")).toSeq
    assert(!raw.contains(2L)) // QL candidate rule: must match a query term
    val rm3 = Rank.rm3Search(pp, Seq("apple"), fbDocs = 2).collect()
      .map(_.getAs[Long]("doc_id")).toSeq
    // feedback docs {0,1} surface "banana"; doc 2 joins the candidate set…
    assert(rm3.contains(2L))
    // …but the original-term docs keep their λ·1/|q| head start
    assert(rm3.indexOf(0L) < rm3.indexOf(2L) && rm3.indexOf(1L) < rm3.indexOf(2L))
    assert(!rm3.contains(3L)) // matches neither original nor expansion terms
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

  // ------------------------------------------------- batch slice parity

  private lazy val sliceDocs = Seq(
    (0L, "cat runs fast"),
    (1L, "cat dog bird"),
    (2L, "bird bird dog"),
    (3L, "dog runs"),
    (4L, "fast cat cat")).toDF("doc_id", "text")
  private lazy val sliceP = TfIdf.postings(sliceDocs).cache()
  private lazy val sliceBatch: Seq[(Long, Seq[String])] = Seq(
    1L -> Seq("cat", "dog"),
    2L -> Seq("bird"),
    3L -> Seq("cat", "dog", "cat")) // duplicate term

  private def rows(df: org.apache.spark.sql.DataFrame): Seq[Seq[Any]] =
    df.collect().toSeq.map(_.toSeq)

  test("searchBatch slice at each qid equals the single-query searchMulti (both variants)") {
    val norms = TfIdf.docNorms(sliceP)
    for (tc <- Seq(false, true)) {
      val batch = Rank.searchBatch(sliceP, norms, sliceBatch, k = 10, trueCosine = tc)
      for ((qid, terms) <- sliceBatch) {
        val slice = rows(batch.filter(col("qid") === qid).select("doc_id", "score"))
        val single = rows(TfIdf.searchMulti(sliceP, norms, terms, k = 10, trueCosine = tc))
        assert(slice == single, s"qid=$qid trueCosine=$tc")
        assert(slice.nonEmpty, s"qid=$qid produced no rows — vacuous parity")
      }
    }
  }

  test("bm25Batch slice at each qid equals the single-query bm25") {
    val batch = Rank.bm25Batch(sliceP, sliceBatch, k = 10)
    for ((qid, terms) <- sliceBatch) {
      val slice = rows(batch.filter(col("qid") === qid).select("doc_id", "score"))
      val single = rows(Rank.bm25(sliceP, terms, k = 10))
      assert(slice == single, s"qid=$qid")
      assert(slice.nonEmpty, s"qid=$qid produced no rows — vacuous parity")
    }
  }

  test("duplicate qids in the batch merge into one query (documented contract)") {
    // searchBatch: term lists concatenate (qtf counts across tuples)
    val norms = TfIdf.docNorms(sliceP)
    val dupT = Rank.searchBatch(sliceP, norms,
      Seq(7L -> Seq("cat"), 7L -> Seq("dog", "cat")), k = 10)
    val mergedT = rows(TfIdf.searchMulti(sliceP, norms, Seq("cat", "dog", "cat"), k = 10))
    assert(rows(dupT.select("doc_id", "score")) == mergedT)
    // bm25Batch: terms union ((qid, term) deduped globally — no double count)
    val dupB = Rank.bm25Batch(sliceP, Seq(7L -> Seq("cat"), 7L -> Seq("dog", "cat")), k = 10)
    val mergedB = rows(Rank.bm25(sliceP, Seq("cat", "dog"), k = 10))
    assert(rows(dupB.select("doc_id", "score")) == mergedB)
  }

  test("batch top-k truncates per query, not globally") {
    val norms = TfIdf.docNorms(sliceP)
    val batch = Rank.searchBatch(sliceP, norms, sliceBatch, k = 1)
    val perQid = batch.groupBy("qid").count().collect()
      .map(r => r.getAs[Long]("qid") -> r.getAs[Long]("count")).toMap
    assert(perQid.values.forall(_ == 1L) && perQid.keySet == Set(1L, 2L, 3L))
  }

  test("topKPerQueryAgg is row-identical to the window form (decimal + double scores, ties)") {
    // hand-built (qid, doc_id, score) with an exact tie inside qid 1 at
    // the k-boundary: tie must break doc_id asc in BOTH forms
    val raw = Seq(
      (1L, 10L, 0.5), (1L, 11L, 0.9), (1L, 12L, 0.5), (1L, 13L, 0.1),
      (2L, 20L, 0.3), (2L, 21L, 0.3),
      (3L, 30L, 0.7)).toDF("qid", "doc_id", "score")
    for (df <- Seq(raw, raw.withColumn("score",
        col("score").cast(org.apache.spark.sql.types.DecimalType(18, 6))))) {
      val agg = rows(Rank.topKPerQueryAgg(df, k = 2))
      val win = rows(Rank.topKPerQuery(df, k = 2))
      val salted = rows(Rank.topKPerQuerySalted(df, k = 2, salts = 3))
      assert(agg == win, s"scoreType=${df.schema("score").dataType}")
      assert(salted == win, s"salted, scoreType=${df.schema("score").dataType}")
      assert(agg.map(_.head).distinct == Seq(1L, 2L, 3L)) // all queries present
      // the qid-1 tie at 0.5 kept the lower doc_id (10, not 12)
      assert(agg.contains(Seq(1L, 11L, agg.find(r => r.head == 1L && r(1) == 11L).get(2))))
      assert(agg.exists(r => r.head == 1L && r(1) == 10L)
        && !agg.exists(r => r.head == 1L && r(1) == 12L))
    }
  }

  test("topKPerQueryAgg guards its contract: exact shape, lossless score magnitude") {
    // extra columns would be silently projected away where the window
    // form keeps them — the require fails loudly instead (ADVICE r10)
    val extra = Seq((1L, 10L, 0.5, "x")).toDF("qid", "doc_id", "score", "meta")
    val e = intercept[IllegalArgumentException](Rank.topKPerQueryAgg(extra, 2))
    assert(e.getMessage.contains("meta"))
    // |score| ≥ 2^33 breaks the decimal→double→decimal round-trip (ulp
    // grows past the 6-dp grid — e.g. 8999999999.123456 comes back as
    // ...123455): the per-row assert raises instead of silently diverging
    val wide = Seq((1L, 10L, BigDecimal("8999999999.123456")), (1L, 11L, BigDecimal("1.0")))
      .toDF("qid", "doc_id", "score")
      .withColumn("score",
        col("score").cast(org.apache.spark.sql.types.DecimalType(18, 6)))
    val err = intercept[Exception](Rank.topKPerQueryAgg(wide, 2).collect())
    assert(err.getMessage.contains("lossless")
      || Option(err.getCause).exists(_.getMessage.contains("lossless")))
    // just below the 2^33 bound the round-trip is exact: agg == window
    // on a 6-dp decimal near-maximal fixture, ties included
    val big = Seq(
      (1L, 10L, BigDecimal("8589934591.123456")),
      (1L, 12L, BigDecimal("8589934591.123456")), // tie → doc_id asc
      (1L, 11L, BigDecimal("8589934591.123457")),
      (2L, 20L, BigDecimal("-8589934591.999999")))
      .toDF("qid", "doc_id", "score")
      .withColumn("score",
        col("score").cast(org.apache.spark.sql.types.DecimalType(18, 6)))
    assert(rows(Rank.topKPerQueryAgg(big, 2)) == rows(Rank.topKPerQuery(big, 2)))
  }

  test("salted top-k S defaults to spark.sql.shuffle.partitions") {
    val df = Seq((1L, 10L, 0.5)).toDF("qid", "doc_id", "score")
    assert(Rank.saltCount(df, -1) ==
      spark.sessionState.conf.numShufflePartitions)
    assert(Rank.saltCount(df, 7) == 7) // explicit override wins
    // the default path still produces the window-identical output
    assert(rows(Rank.topKPerQuerySalted(df, 1)) == rows(Rank.topKPerQuery(df, 1)))
  }

  test("t4/t8 memoized doc-length table (cachedDl) is output-identical to the inline build") {
    val dir = sf("sf0.001")
    val p = Rank.cachedPostings(spark, dir)
    val dl = Rank.cachedDl(spark, dir)
    val terms = Seq("spark", "table", "query")
    val memo = Rank.bm25(p, terms, dlOpt = Some(dl)).collect().map(_.toSeq).toSeq
    val inline = Rank.bm25(p, terms).collect().map(_.toSeq).toSeq
    assert(memo == inline)
    val batch = Seq(1L -> terms, 2L -> Seq("table", "hash"))
    val memoB = Rank.bm25Batch(p, batch, dlOpt = Some(dl)).collect().map(_.toSeq).toSeq
    val inlineB = Rank.bm25Batch(p, batch).collect().map(_.toSeq).toSeq
    assert(memoB == inlineB)
  }

  test("hybridRrf: fusion equals driver-side RRF of the two legs (sf0.001)") {
    val dir = sf("sf0.001")
    val p = Rank.cachedPostings(spark, dir)
    val emb = graft.sources.Tables.embeddings(spark, dir)
    val terms = Seq("spark", "table", "query")
    val n = 20
    // independent leg rankings, straight from the registered primitives
    val textRank = TfIdf.searchMulti(p, TfIdf.docNorms(p), terms, k = n)
      .collect().map(_.getLong(0)).zipWithIndex
      .map { case (d, i) => d -> (i + 1L) }.toMap
    val vecRank = graft.similarity.Similarity.knnBrute(emb, 0L, n)
      .collect().map(_.getLong(0)).zipWithIndex
      .map { case (d, i) => d -> (i + 1L) }.toMap
    def rrf(d: Long): Double = {
      val t = textRank.get(d).map(r => 1.0 / (60.0 + r)).getOrElse(0.0)
      val v = vecRank.get(d).map(r => 1.0 / (60.0 + r)).getOrElse(0.0)
      BigDecimal(t + v).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    val expected = (textRank.keySet ++ vecRank.keySet).toSeq
      .map(d => (d, textRank.getOrElse(d, 0L), vecRank.getOrElse(d, 0L), rrf(d)))
      .sortBy { case (d, _, _, s) => (-s, d) }.take(10)
    val got = Rank.hybridRrf(p, TfIdf.docNorms(p), emb, terms, queryVec = 0L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getAs[java.math.BigDecimal](3).doubleValue))
    assert(got.toSeq == expected, s"got ${got.toSeq}\nexp $expected")
    // both legs must actually contribute: some doc is vector-only and
    // some is text-only in the fused top-10, or the fixture is degenerate
    assert(got.exists(_._2 == 0L) || got.exists(_._3 == 0L),
      "expected at least one single-leg doc in the fused top-10")
  }

  test("hybridRrf plan: each leg's top-n compiles to TakeOrderedAndProject (no global sort)") {
    val dir = sf("sf0.001")
    val p = Rank.cachedPostings(spark, dir)
    val emb = graft.sources.Tables.embeddings(spark, dir)
    val plan = Rank.hybridRrf(p, TfIdf.docNorms(p), emb,
      Seq("spark", "table"), queryVec = 0L)
      .queryExecution.executedPlan.toString
    // two bounded partial top-k operators (one per leg); a Sort + Limit
    // pair instead would materialize and globally sort each leg's full
    // candidate set
    val takeOrdered = "TakeOrderedAndProject".r.findAllIn(plan).length
    assert(takeOrdered >= 2, s"expected both legs on TakeOrderedAndProject:\n$plan")
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

  test("fuzzySearch: exact term scores identically to searchMulti; typo preserves ranking") {
    val d = Seq(
      (0L, "zebra cat"),
      (1L, "zebra dog"),
      (2L, "cat dog"),
      (3L, "cat mouse")).toDF("doc_id", "text")
    val p = TfIdf.postings(d).localCheckpoint(true)
    val n = TfIdf.docNorms(p)
    // distance-0 hit carries weight 1 → byte-identical to the exact path
    val exact = TfIdf.searchMulti(p, n, Seq("cat")).collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val viaFuzzy = Rank.fuzzySearch(p, n, Seq("cat")).collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(viaFuzzy == exact, s"$viaFuzzy vs $exact")
    // "zebr" expands to zebra at dist 1 (weight ½) — the uniform weight
    // cannot change the RANKING vs searching zebra itself
    val typo = Rank.fuzzySearch(p, n, Seq("zebr")).collect().map(_.getLong(0)).toSeq
    val ref = TfIdf.searchMulti(p, n, Seq("zebra")).collect().map(_.getLong(0)).toSeq
    assert(typo == ref, s"$typo vs $ref")
  }

  test("fuzzySearch: min-distance wins, OOV typos drop out") {
    val d = Seq(
      (0L, "cat runs"),
      (1L, "cart wheels"),
      (2L, "dog runs")).toDF("doc_id", "text")
    val p = TfIdf.postings(d).localCheckpoint(true)
    val n = TfIdf.docNorms(p)
    // "ca": cat at dist 1 beats cart at dist 2 → only cat's doc matches
    val got = Rank.fuzzySearch(p, n, Seq("ca")).collect().map(_.getLong(0)).toSet
    assert(got == Set(0L), s"min-dist selection failed: $got")
    // "car": cat AND cart both at dist 1 → both docs match
    val both = Rank.fuzzySearch(p, n, Seq("car")).collect().map(_.getLong(0)).toSet
    assert(both == Set(0L, 1L), s"equal-dist expansion failed: $both")
    // far-from-vocabulary garbage term → empty result, no error
    assert(Rank.fuzzySearch(p, n, Seq("qqqqzz")).collect().isEmpty)
  }

  test("textRank: chain graph ranks the hub word highest, symmetric ends tie") {
    // "alpha beta gamma" → undirected path alpha—beta—gamma: beta (the
    // hub) must out-rank the ends, and alpha/gamma are graph-symmetric
    // so their ranks must be EQUAL (tie broken by term asc)
    val d = Seq((0L, "alpha beta gamma")).toDF("doc_id", "text")
    val got = Rank.textRank(d).collect()
      .map(r => (r.getString(0), r.getDouble(1)))
    assert(got.map(_._1).toSeq == Seq("beta", "alpha", "gamma"),
      s"unexpected order: ${got.mkString(",")}")
    assert(got(1)._2 == got(2)._2, "symmetric ends must tie exactly")
    assert(got(0)._2 > got(1)._2, "hub must out-rank the ends")
  }

  test("textRank: stopwords are removed BEFORE windowing, edges bridge them") {
    // raw text "spark the table": 'the' is filtered first, so spark and
    // table become ADJACENT in the filtered sequence — the co-occurrence
    // edge must exist (both words ranked, symmetric ranks), and no
    // stopword may appear as a keyword
    val d = Seq((0L, "spark the table"), (1L, "spark of table")).toDF("doc_id", "text")
    val got = Rank.textRank(d).collect()
      .map(r => (r.getString(0), r.getDouble(1)))
    assert(got.map(_._1).toSet == Set("spark", "table"))
    assert(got.head._2 == got.last._2, "2-node symmetric graph must tie")
    assert(!got.exists(t => graft.text.Tokenize.stopwords.contains(t._1)))
  }

  test("textRank: topK truncates by (rank desc, term asc)") {
    // star around 'hub' with 4 leaves: hub first, then leaves in
    // lexicographic order; topK=3 keeps hub + first two leaves
    val d = Seq((0L, "hub aa hub bb hub cc hub dd")).toDF("doc_id", "text")
    val got = Rank.textRank(d, topK = 3).collect().map(_.getString(0)).toSeq
    assert(got == Seq("hub", "aa", "bb"), s"got $got")
  }

  test("dcgDiscounts: 6-dp literals match hand values") {
    val d = Rank.dcgDiscounts(3).map { case (p, v) => p -> v.toPlainString }.toMap
    // 1/log2(2)=1, 1/log2(3)=0.6309297..., 1/log2(4)=0.5
    assert(d == Map(1 -> "1.000000", 2 -> "0.630930", 3 -> "0.500000"), d.toString)
  }

  test("ndcgEval: perfectly-ordered fixture scores ndcg=1 with hand-computed DCG") {
    // q = (aa, bb). idf(aa)=ln(2/2)=0, idf(bb)=ln(2/1)>0 → d1 ("aa bb",
    // rel 2) outscores d2 ("aa cc", rel 1 — its only query term carries
    // zero idf weight, but cc keeps its doc norm nonzero).
    // gains 3, 1; discounts 1.000000, 0.630930 → DCG = 3.630930 = IDCG.
    val d = Seq((1L, "aa bb"), (2L, "aa cc")).toDF("doc_id", "text")
    val pp = TfIdf.postings(d)
    val r = Rank.ndcgEval(pp, TfIdf.docNorms(pp), Seq("aa", "bb")).collect()
    assert(r.length == 1)
    val row = r.head
    assert(row.getAs[Long]("n_ranked") == 2L)
    assert(row.getAs[java.math.BigDecimal]("dcg").toPlainString == "3.630930")
    assert(row.getAs[java.math.BigDecimal]("idcg").toPlainString == "3.630930")
    assert(row.getAs[java.math.BigDecimal]("ndcg").toPlainString == "1.000000")
    assert(row.getAs[java.math.BigDecimal]("rr").toPlainString == "1.000000")
  }

  test("ndcgEval: metric invariants on the real corpus ranking") {
    val pp = Rank.cachedPostings(spark, sf("sf0.001"))
    val row = Rank.ndcgEval(pp, TfIdf.docNorms(pp),
      Seq("spark", "table", "query")).collect().head
    val (dcg, idcg, ndcg, rr) = (
      row.getAs[java.math.BigDecimal]("dcg").doubleValue,
      row.getAs[java.math.BigDecimal]("idcg").doubleValue,
      row.getAs[java.math.BigDecimal]("ndcg").doubleValue,
      row.getAs[java.math.BigDecimal]("rr").doubleValue)
    assert(row.getAs[Long]("n_ranked") == 10L)
    assert(dcg > 0 && dcg <= idcg, s"dcg=$dcg idcg=$idcg")
    assert(ndcg > 0 && ndcg <= 1.0, s"ndcg=$ndcg")
    assert(rr == 0.0 || (rr >= 0.1 && rr <= 1.0), s"rr=$rr")
  }
}
