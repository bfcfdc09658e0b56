package graft.dedup

import org.apache.spark.sql.functions._

import graft.SparkSpec

class DedupSpec extends SparkSpec {
  import spark.implicits._

  private val corpus = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, "the quick brown fox jumps over the lazy cat"), // near-dup of 1
    (3L, "the quick brown fox jumps over the lazy dog"), // exact dup of 1
    (4L, "completely different text about spark engines here"),
  ).toDF("doc_id", "text")

  test("exactDedup keeps min id per text hash") {
    val groups = Dedup.exactDedup(corpus).collect()
      .map(r => (r.getLong(1), r.getLong(2))).sortBy(_._1)
    assert(groups.toSeq == Seq((1L, 2L), (2L, 1L), (4L, 1L)))
  }

  test("shingles: distinct word trigrams") {
    val sh = corpus.filter($"doc_id" === 4)
      .select(Dedup.shingles(col("text")).as("sh")).as[Seq[String]].head()
    assert(sh.contains("completely different text"))
    assert(sh.length == 5) // 7 tokens → 5 trigrams, all distinct
    val tiny = Seq("one two").toDF("text")
      .select(Dedup.shingles(col("text"))).as[Seq[String]].head()
    assert(tiny.isEmpty) // below shingle width
  }

  test("lshNearDups finds near and exact pairs with correct jaccard") {
    val pairs = Dedup.lshNearDups(corpus, minJaccard = 0.1).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDecimal(2).doubleValue))
    assert(pairs.contains((1L, 3L, 1.0))) // exact dup → jaccard 1
    val near = pairs.find(p => p._1 == 1L && p._2 == 2L)
    assert(near.isDefined && near.get._3 > 0.5 && near.get._3 < 1.0)
    assert(!pairs.exists(p => p._2 == 4L)) // unrelated doc never pairs
  }

  test("ngramJaccardTop ranks exact dup first") {
    val top = Dedup.ngramJaccardTop(corpus, topK = 3).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDecimal(2).doubleValue))
    assert(top.head == (1L, 3L, 1.0))
  }

  test("containmentTop: embedded quote scores 1.0 from the short side only") {
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta"),
      (2L, "intro words alpha beta gamma delta epsilon zeta eta theta trailing words here"),
    ).toDF("doc_id", "text")
    val rows = Dedup.containmentTop(docs, topK = 10).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDecimal(2).doubleValue)).toSeq
    // all 6 trigrams of doc 1 appear contiguously inside doc 2
    assert(rows.head == (1L, 2L, 1.0))
    // the long side is NOT contained: 6 of its 11 trigrams are shared
    val back = rows.find(r => r._1 == 2L && r._2 == 1L).get
    assert(math.abs(back._3 - 6.0 / 11) < 1e-6)
  }

  test("thresholdCurve: counts monotone non-increasing, exact dup survives 0.9") {
    val pairs = Dedup.lshNearDups(corpus, minJaccard = 0.1).localCheckpoint(true)
    val curve = Dedup.thresholdCurve(pairs).collect()
      .map(r => (r.getDecimal(0).doubleValue, r.getLong(1), r.getLong(2)))
    assert(curve.map(_._1).toSeq == Seq(0.1, 0.3, 0.5, 0.7, 0.9))
    assert(curve.sliding(2).forall { case Array(lo, hi) =>
      lo._2 >= hi._2 && lo._3 >= hi._3 })
    // the (1,3) exact dup (jaccard 1.0) survives every threshold
    assert(curve.last._2 >= 1 && curve.last._3 >= 1)
    // thresholds below the memo's minJaccard are rejected loudly
    intercept[IllegalArgumentException] {
      Dedup.thresholdCurve(pairs, thresholds = Seq("0.05"))
    }
  }

  test("simhash: identical texts get identical hashes, near-dups close") {
    val sh = Dedup.simhash(corpus).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sh(1L) == sh(3L))
    val hamming = java.lang.Long.bitCount(sh(1L) ^ sh(2L))
    assert(hamming <= 6, s"near-dup hamming was $hamming")
    assert(java.lang.Long.bitCount(sh(1L) ^ sh(4L)) > hamming)
  }

  test("simhashPairs: exact dup pair found at hamming 0") {
    val pairs = Dedup.simhashPairs(corpus, maxDist = 3).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(pairs.exists(p => p._1 == 1L && p._2 == 3L && p._3 == 0))
  }

  test("curationPipeline: quality gate, exact dedup, near-dup removal compose") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog and runs far away home tonight"),
      (2L, "the quick brown fox jumps over the lazy dog and runs far away home today"), // near-dup of 1
      (3L, "the quick brown fox jumps over the lazy dog and runs far away home tonight"), // exact dup of 1
      (4L, "short"),                                                                      // fails quality
      (5L, "a completely different long document about spark engines and data processing pipelines")
    ).toDF("doc_id", "text")
    val kept = Dedup.curationPipeline(docs, minChars = 20, minJaccard = 0.3)
      .collect().map(_.getLong(0)).toSeq
    // 4 fails quality; 3 is exact-dup of 1 (min id kept); 2 is near-dup doc_b of 1
    assert(kept == Seq(1L, 5L), s"got $kept")
  }

  test("nearDupClusters: transitivity via connected components") {
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta iota kappa one"),
      (2L, "alpha beta gamma delta epsilon zeta eta theta iota kappa two"),   // ~1
      (3L, "alpha beta gamma delta epsilon zeta eta theta iota kappa three"), // ~1, ~2
      (4L, "unrelated text about completely different things entirely here now")
    ).toDF("doc_id", "text")
    val clusters = Dedup.nearDupClusters(docs, minJaccard = 0.3).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // 1,2,3 form one cluster labeled by min id; 4 pairs with nobody
    assert(clusters == Map(1L -> 1L, 2L -> 1L, 3L -> 1L), s"got $clusters")
  }

  test("decontaminate flags eval docs sharing shingles with train docs") {
    // engine-derived splits: find ids of each kind first, then plant text
    val ids = (0L until 200L).toDF("doc_id")
      .select(col("doc_id"), graft.text.TextStats.assignSplit(col("doc_id")).as("split"))
      .collect().map(r => r.getLong(0) -> r.getString(1))
    val testIds = ids.collect { case (id, "test") => id }
    assert(testIds.length >= 3, s"need ≥3 test ids in 0..199, got ${testIds.length}")
    val (cleanId, shortId) = (testIds(0), testIds(1))
    val shared = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val docs = ids.toSeq.toDF("doc_id", "split").select(col("doc_id"),
      when(col("doc_id") === cleanId, "unique gibberish xylophone quasar nebula wombat fjord")
        .when(col("doc_id") === shortId, "too short") // < shingle width w=3
        .otherwise(shared).as("text"))
    val got = Dedup.decontaminate(docs).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(4))).toMap
    // exactly the test-split docs are assessed
    assert(got.keySet == testIds.toSet)
    // shared-text eval docs: full overlap with train copies of the same text
    testIds.filter(id => id != cleanId && id != shortId).foreach { id =>
      val (n, ov, flag) = got(id)
      assert(n > 0 && ov == n && flag == 1L, s"doc $id: $n/$ov/$flag")
    }
    // unique text: shingles exist, none overlap
    assert(got(cleanId)._2 == 0L && got(cleanId)._3 == 0L)
    // sub-shingle-width text: zero shingles, never contaminated
    assert(got(shortId) == ((0L, 0L, 0L)))
  }

  test("canonicalDocs: longest text wins, ties break to min doc_id") {
    import spark.implicits._
    val docs = Seq((1L, "aa"), (2L, "aaaa"), (3L, "a"), (7L, "xx"), (8L, "xx"))
      .toDF("doc_id", "text")
    val clusters = Seq((1L, 1L), (2L, 1L), (3L, 1L), (7L, 7L), (8L, 7L))
      .toDF("doc_id", "cluster")
    val got = Dedup.canonicalDocs(docs, clusters).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // cluster 1: doc 2 longest; cluster 7: equal lengths → min id 7
    assert(got.toSeq == Seq((1L, 2L, 3L), (7L, 7L, 2L)))
  }

  test("repeatedSpans: shared 3-token spans counted with multiplicity") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a b c d"),  // spans: "a b c", "b c d"
      (2L, "a b c e"),  // spans: "a b c", "b c e"
      (3L, "x y z w"),  // no overlap with others
      (4L, "p q"),      // shorter than span width → absent from output
    ).toDF("doc_id", "text")
    val got = Dedup.repeatedSpans(docs).collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getDecimal(3).doubleValue, r.getLong(4)))
      .toMap
    assert(got.keySet == Set(1L, 2L, 3L))
    assert(got(1L) == ((2L, 1L, 0.5, 1L))) // "a b c" shared with doc 2
    assert(got(2L) == ((2L, 1L, 0.5, 1L)))
    assert(got(3L) == ((2L, 0L, 0.0, 1L)))
  }

  test("incrementalIngest: corpus dup, batch dup, and admit fates") {
    import spark.implicits._
    // corpus = ids not divisible by 5; incoming = 0, 5, 10, 15
    val docs = Seq(
      (1L, "already indexed"), (2L, "other corpus doc"),
      (0L, "already indexed"),   // hash exists in corpus → dup_of_corpus
      (5L, "fresh text"),        // first of its hash in batch → admitted
      (10L, "fresh text"),       // same hash, higher id → dup_in_batch
      (15L, "unique newcomer")). // admitted
      toDF("doc_id", "text")
    val got = Dedup.incrementalIngest(docs).collect()
      .map(r => (r.getLong(0), r.getString(1))).toMap
    assert(got == Map(0L -> "dup_of_corpus", 5L -> "admitted",
      10L -> "dup_in_batch", 15L -> "admitted"))
  }

  test("crossSourceContamination: shared spans counted once per source pair") {
    import spark.implicits._
    // sources A and B share the single span "a b c"; C shares nothing
    val docs = Seq(
      (1L, "a b c", "A"), (2L, "a b c x", "B"), (3L, "a b c", "B"),
      (4L, "p q r", "C")).toDF("doc_id", "text", "lang")
      .withColumnRenamed("lang", "source")
    val got = Dedup.crossSourceContamination(docs, Dedup.spanHashes(docs))
      .collect()
      .map(r => ((r.getString(0), r.getString(1)),
        (r.getLong(2), r.getDecimal(3).doubleValue))).toMap
    // A has 1 distinct span; B has 2 ("a b c", "b c x"); shared = 1 →
    // jaccard 1/(1+2−1) = 0.5. C pairs are absent (inner join, 0 shared)
    assert(got.keySet == Set(("A", "B")))
    assert(got(("A", "B")) == ((1L, 0.5)))
  }

  test("lshTuning: s-curves are monotone and steeper for more rows per band") {
    val got = Dedup.lshTuning(spark).collect()
      .map(r => ((r.getLong(0), r.getLong(1)),
        (r.getDecimal(2).doubleValue, r.getDecimal(3).doubleValue)))
      .groupBy(_._1).view.mapValues(_.map(_._2).sortBy(_._1)).toMap
    assert(got.keySet == Set((8L, 1L), (4L, 2L), (2L, 4L)))
    got.values.foreach { curve =>
      assert(curve.length == 19)
      curve.map(_._2).sliding(2).foreach {
        case Array(a, b) => assert(a <= b); case _ => // monotone in s
      }
      curve.foreach { case (_, pc) => assert(pc >= 0.0 && pc <= 1.0) }
    }
    // at low similarity, more rows per band admits FEWER candidates
    val low = 0.2
    def at(b: Long, r: Long) = got((b, r)).find(_._1 == low).get._2
    assert(at(8L, 1L) > at(4L, 2L) && at(4L, 2L) > at(2L, 4L))
  }

  test("spanNovelty: first corpus occurrence wins, repeats score zero") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a b c d"),  // both spans first here → novelty 1.0
      (2L, "a b c e"),  // "a b c" first seen in doc 1 → novelty 0.5
      (3L, "a b c d"),  // exact repeat of doc 1 → novelty 0.0
    ).toDF("doc_id", "text")
    val got = Dedup.spanNoveltyFromSpans(Dedup.spanHashes(docs)).collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getDecimal(3).doubleValue)).toMap
    assert(got(1L) == ((2L, 2L, 1.0)))
    assert(got(2L) == ((2L, 1L, 0.5)))
    assert(got(3L) == ((2L, 0L, 0.0)))
  }

  private def prefixBase(rows: (Long, String)*) = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
      .select(col("doc_id"), Dedup.shingles(col("text")).as("sh"))
      .select(col("doc_id"),
        transform(col("sh"), s => xxhash64(s)).as("shh"),
        size(col("sh")).cast("long").as("n"))
  }

  test("prefixFilterPairs: complete vs brute force at J ≥ 1/2") {
    // d0↔d1 share 3 of 5 shingles (J = 0.6), d3 duplicates d0 (J = 1),
    // d1↔d3 = 0.6, d2 disjoint; d4 overlaps d0 at J = 1/3 (excluded)
    val base = prefixBase(
      0L -> "a b c d e f",
      1L -> "a b c d e g",
      2L -> "x y z w v u",
      3L -> "a b c d e f",
      4L -> "a b c d x y").localCheckpoint(true)
    val got = Dedup.prefixFilterPairs(base).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDecimal(2).doubleValue)).toSeq
    assert(got == Seq((0L, 1L, 0.6), (0L, 3L, 1.0), (1L, 3L, 0.6)))
  }

  test("dupRateBySource: exact and near flags aggregate per source") {
    import spark.implicits._
    val docs = Seq(
      (0L, "same text here", "web"),   // exact dup of 1
      (1L, "same text here", "web"),
      (2L, "unique text one", "web"),
      (3L, "unique text two", "books"),
      (4L, "unique text three", "books")
    ).toDF("doc_id", "text", "source")
    // near pairs supplied directly: docs 3 and 4 are near-dups
    val pairs = Seq((3L, 4L)).toDF("doc_a", "doc_b")
    val got = Dedup.dupRateBySource(docs, pairs).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3),
          r.getDecimal(4).doubleValue, r.getDecimal(5).doubleValue)).toMap
    assert(got("web") == ((3L, 2L, 0L, 0.666667, 0.0)))
    assert(got("books") == ((2L, 0L, 2L, 0.0, 1.0)))
  }

  test("prefixFilterPairs: prefix index is strictly smaller than full index") {
    val base = prefixBase(
      0L -> "a b c d e f g h i j",
      1L -> "a b c d e f g h i k",
      2L -> "p q r s t u v w x y").localCheckpoint(true)
    // 3-gram shingles: n = 8 per doc → prefix keeps 8 − ⌈8/2⌉ + 1 = 5
    val inv = base.select(col("doc_id"), explode(col("shh"))).count()
    // reproduce the internal prune bound: Σ per-doc prefix lengths
    val prefLen = base.select(
      sum(col("n") - (col("n") + lit(1)).divide(2).cast("long") + lit(1))).head.getLong(0)
    assert(prefLen < inv && prefLen == 15)
    // and the borderline J = 7/9 pair still survives end-to-end
    val got = Dedup.prefixFilterPairs(base).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got == Seq((0L, 1L)))
  }

  test("leakageSplit: cluster-keyed assignment keeps every dup pair in one split") {
    import spark.implicits._
    val docs = (1L to 6L).map(i => (i, s"doc $i")).toDF("doc_id", "text")
    val clusters = Seq((1L, 1L), (2L, 1L), (3L, 3L), (4L, 3L))
      .toDF("doc_id", "cluster")
    val pairs = Seq((1L, 2L), (3L, 4L)).toDF("doc_a", "doc_b")
    val got = Dedup.leakageSplit(docs, clusters, pairs).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.map(_._2).sum == 6L)                    // every doc assigned
    assert(got.map(_._3).sum == 4L)                    // clusters {1,3,5,6}
    assert(got.forall(_._4 == 0L), s"leak detected: ${got.toSeq}")
  }

  test("leakageSplit audit DETECTS doc-keyed (naive) split leakage") {
    import spark.implicits._
    // hashBucket twin: first two hex digits of md5(id) — find one id in
    // the train range (< 204) and one in the test range (>= 230)
    def bucket(k: Long): Int = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(k.toString.getBytes("UTF-8"))
      ((md(0) & 0xff))
    }
    val train = (1L to 500L).find(bucket(_) < 204).get
    val test0 = (1L to 500L).find(bucket(_) >= 230).get
    val docs = Seq(train, test0).map(i => (i, s"doc $i")).toDF("doc_id", "text")
    // no cluster map (each doc hashes its own id — the naive rule) but
    // the two docs ARE near-dups: the audit must count the straddle
    val noClusters = Seq.empty[(Long, Long)].toDF("doc_id", "cluster")
    val pairs = Seq((math.min(train, test0), math.max(train, test0)))
      .toDF("doc_a", "doc_b")
    val got = Dedup.leakageSplit(docs, noClusters, pairs).collect()
      .map(r => r.getString(0) -> r.getLong(3)).toMap
    assert(got.values.sum == 2L, s"straddling pair not audited: $got")
    // and the cluster-keyed rule on the same docs repairs it
    val fixed = Dedup.leakageSplit(docs,
        Seq((train, train), (test0, train)).toDF("doc_id", "cluster"), pairs)
      .collect().map(r => r.getLong(3))
    assert(fixed.forall(_ == 0L))
  }

  test("entityResolution: transitive merge, canonical min-name, singleton identity") {
    import spark.implicits._
    // all four share the 16-char block "entity_record_00" / "…_99"-ish
    // prefixes long enough to co-block; 1~2 and 2~3 at dist 1 (3 is dist
    // 2 from 1 — the closure must merge all three), 4 is far from all
    val cust = Seq(
      (1L, "entity_record_0001a", 10.0),
      (2L, "entity_record_0001b", 20.0),
      (3L, "entity_record_0001bc", 30.0),
      (4L, "entity_record_9999x", 5.0)).toDF("c_custkey", "c_name", "c_acctbal")
    val got = Dedup.entityResolution(cust).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getDouble(3))).toSeq
    assert(got == Seq(
      (1L, 3L, "entity_record_0001a", 60.0),
      (4L, 1L, "entity_record_9999x", 5.0)), s"unexpected: $got")
  }

  test("entityResolution on real sf0.001 customers: records conserved, keys covered") {
    val cust = graft.sources.Tables.customer(spark, sf("sf0.001"))
    val got = Dedup.entityResolution(cust).collect()
    assert(got.map(_.getLong(1)).sum == cust.count()) // every record in exactly one entity
    // entity ids are member min-keys: each appears at most once and is a real key
    val ids = got.map(_.getLong(0))
    assert(ids.distinct.length == ids.length)
  }

  test("blockedCandidatePairs: forced-hot triangle decomposition equals the plain join") {
    // cap = 0 forces EVERY block through the bucket-cell path; the pair
    // set must be identical to the zero-replication self-join — the
    // partition-not-approximation claim of the skew gate (VERDICT r11
    // item 3)
    val c = graft.sources.Tables.customer(spark, sf("sf0.001"))
      .select(col("c_custkey"), col("c_name"),
        substring(col("c_name"), 1, 16).as("blk"))
      .localCheckpoint(true)
    val plain = c.as("a").join(c.as("b"),
        col("a.blk") === col("b.blk") && col("a.c_custkey") < col("b.c_custkey"))
      .select(col("a.c_custkey"), col("b.c_custkey"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    for (s <- Seq(3, 16)) {
      val hot = Dedup.blockedCandidatePairs(c, cap = 0, s = s)
        .collect().map(r => (r.getAs[Long]("a_key"), r.getAs[Long]("b_key")))
      assert(hot.length == plain.size, s"S=$s: duplicate or missing cells")
      assert(hot.toSet == plain, s"S=$s: pair set diverged")
    }
    // and the gated default on this corpus (blocks under the cap) is
    // byte-identical too — the cold path IS the plain join
    val cold = Dedup.blockedCandidatePairs(c)
      .collect().map(r => (r.getAs[Long]("a_key"), r.getAs[Long]("b_key")))
    assert(cold.toSet == plain && cold.length == plain.size)
  }

  test("d22_fuzzy_match / d24_entity_resolution are cap-invariant on real customers") {
    // the skew gate only changes the physical pair enumeration — both
    // registered outputs must be identical whichever path runs
    val cust = graft.sources.Tables.customer(spark, sf("sf0.001"))
    val census = Dedup.fuzzyNameMatch(cust).collect().map(_.toSeq).toSeq
    val ents = Dedup.entityResolution(cust).collect().map(_.toSeq).toSeq
    assert(census.nonEmpty && ents.nonEmpty)
    // independent plain-join recompute of the d22 census
    val c = cust.select(col("c_custkey"), col("c_name"),
      substring(col("c_name"), 1, 16).as("blk"))
    val plainCensus = c.as("a").join(c.as("b"),
        col("a.blk") === col("b.blk") && col("a.c_custkey") < col("b.c_custkey"))
      .select(levenshtein(col("a.c_name"), col("b.c_name")).as("dist"))
      .filter(col("dist") >= 1 && col("dist") <= 2)
      .groupBy("dist").count().orderBy("dist")
      .collect().map(_.toSeq).toSeq
    assert(census == plainCensus, "skew-gated census must equal the plain recompute")
  }

  test("leakageSplit on real sf0.001 clusters: zero leaked pairs in every split") {
    val dir = sf("sf0.001")
    val docs = graft.sources.Tables.documents(spark, dir)
    val got = Dedup.leakageSplit(docs, Dedup.cachedClusters(spark, dir),
        Dedup.cachedLshPairs(spark, dir)).collect()
    assert(got.map(_.getLong(3)).forall(_ == 0L))
    assert(got.map(_.getLong(1)).sum == docs.count())
  }
}
