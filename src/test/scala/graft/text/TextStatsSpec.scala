package graft.text

import org.apache.spark.sql.functions._

import graft.SparkSpec

class TextStatsSpec extends SparkSpec {
  import spark.implicits._

  test("entities: capitalized runs, lowercased, duplicates kept") {
    val df = Seq("Sherlock Holmes met Dr Watson in London. Holmes smiled.").toDF("t")
    val e = df.select(TextStats.entities(col("t")).as("e")).as[Seq[String]].head()
    assert(e == Seq("sherlock holmes", "dr watson", "london", "holmes"))
  }

  test("langId: picks list with highest weighted score; und when none") {
    val df = Seq(
      "the cat sat on the mat and it was good",   // en
      "der hund und die katze ist nicht hier",    // de
      "xyzzy qwerty").toDF("t")                   // none
    val got = df.select(TextStats.langId(Tokenize.rawTokens(col("t")))).as[String].collect()
    assert(got.toSeq == Seq("en", "de", "und"))
  }

  test("langId weighting: unique markers beat shared function words") {
    // "la"/"un" live in BOTH the fr and es profiles (weight 1), while
    // "el"/"los" are unique to es and "le" unique to fr (weight 2):
    //   "el los la" → es 2+2+1=5 vs fr 1  → es
    //   "le la un"  → fr 2+1+1=4 vs es 1+1=2 → fr
    val df = Seq("el los la", "le la un").toDF("t")
    val got = df.select(TextStats.langId(Tokenize.rawTokens(col("t")))).as[String].collect()
    assert(got.toSeq == Seq("es", "fr"))
  }

  test("bpeMergeCandidates: pair counts weighted by word frequency") {
    // vocab: "banana"×2, "bann"×1, "a"×3 (filtered: length < 2)
    // banana pairs: ba, an, na, an, na → weighted ×2
    // bann pairs:   ba, an, nn
    // totals: an 2*2+1=5, na 2*2=4, ba 2+1=3, nn 1
    val docs = Seq((1L, "banana bann a a"), (2L, "banana a")).toDF("doc_id", "text")
    val got = TextStats.bpeMergeCandidates(docs, topK = 10).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got == Seq(("an", 5L), ("na", 4L), ("ba", 3L), ("nn", 1L)))
  }

  test("bpeMerges (x30_bpe_train): freq-weighted argmax, multi-char merges, early stop") {
    // "abab"×2: round 1 merges (a,b) n=4 (two occurrences per word,
    // weighted by freq 2); round 2 merges the MULTI-CHAR pair (ab,ab)
    // n=2 — the step x13's first-iteration statistic cannot take;
    // round 3 finds no pair and stops early (recorded 2 < requested 5)
    val docs = Seq((1L, "abab abab")).toDF("doc_id", "text")
    val m = TextStats.bpeMerges(docs, rounds = 5, recordKey = Some("spec_x30"))
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(m.toSeq == Seq((1, "a", "b", 4L), (2, "ab", "ab", 2L)), m.mkString(","))
    assert(TextStats.bpeRoundsRec("spec_x30") == 2)
  }

  test("bpeMerges: lexicographic tie-break on equal pair counts") {
    // "ab" and "ba" tie at n=1 → (a,b) wins on lhs asc
    val docs = Seq((1L, "ab ba")).toDF("doc_id", "text")
    val m = TextStats.bpeMerges(docs, rounds = 1)
      .collect().map(r => (r.getString(1), r.getString(2), r.getLong(3)))
    assert(m.toSeq == Seq(("a", "b", 1L)), m.mkString(","))
  }

  test("bpeApply (x31_bpe_encode core): greedy-leftmost overlap, rank-ordered replay") {
    // "aaa": (a,a) counted per occurrence (2); the merge is
    // greedy-leftmost → [aa, a]; (aa, a) merges the round after
    val docs = Seq((1L, "aaa")).toDF("doc_id", "text")
    val m = TextStats.bpeMerges(docs, rounds = 5)
    val got = m.collect().map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(got.toSeq == Seq((1, "a", "a", 2L), (2, "aa", "a", 1L)), got.mkString(","))
    val after1 = TextStats.bpeApply(docs, m, 1).select("sym").as[String].collect()
    assert(after1.toSeq == Seq("##aa##a##"), after1.mkString(","))
    val after2 = TextStats.bpeApply(docs, m, 2).select("sym").as[String].collect()
    assert(after2.toSeq == Seq("##aaa##"), after2.mkString(","))
  }

  test("bpeApply: adjacent merge sites both fire in one pass (boundary anchoring)") {
    // "abab" with merge (a,b): both non-overlapping occurrences must
    // merge in a single replace pass — the double-'#' boundary keeps
    // the second site's leading anchor after the first consumes one '#'
    val docs = Seq((1L, "abab")).toDF("doc_id", "text")
    val m = TextStats.bpeMerges(docs, rounds = 1)
    val syms = TextStats.bpeApply(docs, m, 1).select("sym").as[String].collect()
    assert(syms.toSeq == Seq("##ab##ab##"), syms.mkString(","))
  }

  // ---- x32 batched BPE: driver-side reference implementation --------
  // Independent of the engine's string-replace encoding: symbols live in
  // Vector[String], merges are greedy-leftmost scans, pair counts are
  // freq-weighted with overlaps — the documented x30 conventions.
  private def mergeAll(syms: Vector[String], l: String, r: String): Vector[String] = {
    val out = Vector.newBuilder[String]
    var i = 0
    while (i < syms.length) {
      if (i + 1 < syms.length && syms(i) == l && syms(i + 1) == r) {
        out += (l + r); i += 2
      } else { out += syms(i); i += 1 }
    }
    out.result()
  }

  private def refBatched(wordFreq: Map[String, Long], batches: Int, b: Int,
                         k: Int): Seq[(Int, Int, String, String, Long)] = {
    var vocab: Map[String, (Vector[String], Long)] =
      wordFreq.map { case (w, f) => w -> (w.map(_.toString).toVector, f) }
    val rules = Seq.newBuilder[(Int, Int, String, String, Long)]
    var batch = 1
    var stop = false
    while (batch <= batches && !stop) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      for { (_, (syms, f)) <- vocab; w <- syms.sliding(2) if w.length == 2 }
        counts((w(0), w(1))) = counts.getOrElse((w(0), w(1)), 0L) + f
      if (counts.isEmpty) stop = true
      else {
        val ranked = counts.toSeq.sortBy { case ((l, r), n) => (-n, l, r) }.take(k)
        var used = Set.empty[String]
        var cnt = 0
        val sel = Seq.newBuilder[((String, String), Long)]
        // disjointness over inputs AND the merged output symbol — (a,b)
        // and (ab,c) must not share a batch (ADVICE r15)
        for (((l, r), n) <- ranked
             if cnt < b && !used(l) && !used(r) && !used(l + r)) {
          sel += (((l, r), n)); used = used + l + r + (l + r); cnt += 1
        }
        val s = sel.result()
        s.zipWithIndex.foreach { case (((l, r), n), i) =>
          rules += ((batch, i + 1, l, r, n))
        }
        vocab = vocab.map { case (w, (syms, f)) =>
          var cur = syms
          for (((l, r), _) <- s) cur = mergeAll(cur, l, r)
          w -> (cur, f)
        }
        batch += 1
      }
    }
    rules.result()
  }

  test("bpeMergesBatched (x32): matches the driver-side reference on an interlocking corpus") {
    // shared letters force the greedy to SKIP interlocked candidates:
    // the reference recomputes rank + greedy + simultaneous apply
    // independently of the engine's sym-string encoding
    val text1 = "the cat sat on the mat and the rat ate"
    val text2 = "that hat that chat then that the thatch"
    val docs = Seq((1L, text1), (2L, text2)).toDF("doc_id", "text")
    val wf = (text1.split(" ") ++ text2.split(" ")).toSeq
      .groupBy(identity).map { case (w, ws) => w -> ws.size.toLong }
    val got = TextStats.bpeMergesBatched(docs, batches = 3, batchSize = 3,
      candCap = 10, recordKey = Some("spec_x32"))
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getString(2),
        r.getString(3), r.getLong(4))).toSeq
    val want = refBatched(wf, batches = 3, b = 3, k = 10)
    assert(got == want, s"\ngot  = ${got.mkString(",")}\nwant = ${want.mkString(",")}")
    assert(TextStats.bpeBatchRec("spec_x32") == 3)
    // within-batch symbol-disjointness over inputs AND outputs (the
    // property that makes the batch order-independent and its
    // round-start counts valid — a rule's output colliding with another
    // rule's input would cascade merges within the batch)
    got.groupBy(_._1).foreach { case (_, rs) =>
      val syms = rs.flatMap(r => Seq(r._3, r._4, r._3 + r._4))
      assert(syms.distinct.size == syms.size, s"batch shares symbols: $rs")
    }
  }

  test("bpeMergesBatched: batch 1 rule 1 is sequential BPE's first merge; exhaustion recorded") {
    val docs = Seq((1L, "ab ab ab")).toDF("doc_id", "text")
    val seqFirst = TextStats.bpeMerges(docs, rounds = 1)
      .collect().map(r => (r.getString(1), r.getString(2), r.getLong(3))).head
    val got = TextStats.bpeMergesBatched(docs, batches = 3, batchSize = 4,
      candCap = 8, recordKey = Some("spec_x32_exh"))
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getString(2),
        r.getString(3), r.getLong(4))).toSeq
    assert(got.head._3 == seqFirst._1 && got.head._4 == seqFirst._2 &&
      got.head._5 == seqFirst._3)
    // "ab": batch 1 merges (a,b); nothing remains → stops early
    assert(got == Seq((1, 1, "a", "b", 3L)), got.mkString(","))
    assert(TextStats.bpeBatchRec("spec_x32_exh") == 1)
  }

  test("rolling fingerprint is order-sensitive, tokenset md5 is not") {
    val df = Seq((1L, "alpha beta gamma"), (2L, "gamma beta alpha")).toDF("doc_id", "text")
    val toks = Tokenize.rawTokens(col("text"))
    val th = transform(toks, t => lit(31L) * length(t) + ascii(substring(t, 1, 1)))
    val r = df.select(
      md5(array_join(array_sort(array_distinct(toks)), " ").cast("binary")).as("ts"),
      aggregate(th, lit(0L), (a, x) => (a * 31L + x) % 2147483647L).as("roll"))
      .collect()
    assert(r(0).getString(0) == r(1).getString(0))   // same token set
    assert(r(0).getLong(1) != r(1).getLong(1))       // different order
  }

  test("quality cols: exact counts on a known doc") {
    val df = Seq("ab cd, ee!").toDF("text")
    val r = df.select(TextStats.qualityCols(col("text")): _*).collect()(0)
    assert(r.getAs[Int]("n_chars") == 10)
    assert(r.getAs[Int]("n_tokens") == 3)
    assert(r.getAs[Double]("punct_ratio") == 0.2) // ',' and '!'
  }

  test("repetition: dup-token and top-bigram fractions on known docs") {
    val df = Seq(
      (1L, "spam spam spam spam"),        // 4 tokens, 1 distinct, bigram "spam spam" ×3/3
      (2L, "alpha beta gamma delta"),     // all distinct, each bigram once (1/3)
      (3L, "solo")).toDF("doc_id", "text") // no bigrams -> 0.0
    val r = TextStats.repetition(df).collect()
      .map(x => (x.getLong(0), x.getInt(1), x.getDouble(2), x.getDouble(3)))
    assert(r(0) == ((1L, 4, 0.75, 1.0)))
    assert(r(1) == ((2L, 4, 0.0, 0.333333)))
    assert(r(2) == ((3L, 1, 0.0, 0.0)))
  }

  test("pii scrub: emails and long digit runs redacted, counts exact") {
    val df = Seq(
      (1L, "mail bob.smith@corp.example.org now or dial 12345678 ok"),
      (2L, "digits 123456 stay short no at-sign here")) // 6 digits: below threshold
      .toDF("doc_id", "text")
    val r = TextStats.piiScrub(df, col("text")).collect()
    assert(r(0).getInt(1) == 1 && r(0).getInt(2) == 1)
    assert(r(0).getInt(3) == "mail <EMAIL> now or dial <NUM> ok".length)
    assert(r(1).getInt(1) == 0 && r(1).getInt(2) == 0)
    assert(r(1).getInt(3) == "digits 123456 stay short no at-sign here".length)
  }

  test("hash split: deterministic, complete, roughly 80/10/10") {
    val ids = (0L until 2000L).toDF("doc_id")
    val got = ids.select(TextStats.assignSplit(col("doc_id")).as("s"))
      .groupBy("s").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got.values.sum == 2000)
    assert(got("train") > 1500 && got("train") < 1700) // ~79.7% of 256ths
    assert(got("val") > 120 && got("test") > 120)
    // determinism: same assignment on recompute
    val a = ids.select(col("doc_id"), TextStats.assignSplit(col("doc_id")).as("s")).collect()
    val b = ids.select(col("doc_id"), TextStats.assignSplit(col("doc_id")).as("s")).collect()
    assert(a.map(r => (r.getLong(0), r.getString(1))).toSeq ==
      b.map(r => (r.getLong(0), r.getString(1))).toSeq)
  }

  test("stratifiedSample caps strata deterministically") {
    val docs = graft.sources.Tables.documents(spark, sf("sf0.01"))
    val got = TextStats.stratifiedSample(docs, cap = 40).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toMap
    val totals = docs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got.keySet == totals.keySet) // every stratum sampled (cap ≥ 1 ⇒ threshold ≥ 1)
    got.foreach { case (lang, (nTotal, threshold, nSampled, _)) =>
      assert(nTotal == totals(lang))
      assert(nSampled <= nTotal && nSampled > 0, s"$lang: $nSampled of $nTotal")
      // binomial concentration around cap·(threshold exactness is ±1 bucket)
      assert(nSampled < 3 * 40, s"$lang kept $nSampled, cap 40")
      assert(threshold <= 256L)
    }
    // deterministic: identical on recompute
    val again = TextStats.stratifiedSample(docs, cap = 40).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toMap
    assert(again == got)
    // cap ≥ stratum size ⇒ threshold 256 ⇒ whole stratum kept
    val all = TextStats.stratifiedSample(docs, cap = 100000).collect()
      .map(r => r.getString(0) -> r.getLong(3)).toMap
    assert(all == totals)
  }

  test("mixWeights caps each source at the token budget") {
    import spark.implicits._
    val docs = Seq(
      (1L, "one two three four five six seven eight", "web"),
      (2L, "one two", "web"),
      (3L, "alpha beta gamma", "books"),
    ).toDF("doc_id", "text", "source")
    val got = TextStats.mixWeights(docs, budgetTokens = 5L).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3), r.getLong(4)))
      .toMap
    assert(got("web") == ((2L, 10L, 0.5, 5L)))     // 10 tokens, budget 5 → w=0.5
    assert(got("books") == ((1L, 3L, 1.0, 3L)))    // under budget → w=1
  }

  test("sequencePack maps docs to context windows with exact offsets") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a b c"), (2L, "d e f g"), (3L, "h i"),
    ).toDF("doc_id", "text")
    val got = TextStats.sequencePack(docs, seqLen = 4L).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
      .toMap
    // cum: 3, 7, 9 → offsets 0, 3, 7
    assert(got(1L) == ((3L, 0L, 0L, 0L, 0L)))
    assert(got(2L) == ((4L, 3L, 0L, 1L, 1L))) // spans the chunk-0/1 boundary
    assert(got(3L) == ((2L, 7L, 1L, 2L, 1L))) // spans 1/2
  }

  test("unigramLogprob scores docs by corpus unigram distribution") {
    import spark.implicits._
    // corpus: a:2, b:2, N=4 → logp(a) = logp(b) = round(ln(1/2), 6)
    val docs = Seq((1L, "a a b"), (2L, "b")).toDF("doc_id", "text")
    val got = TextStats.unigramLogprob(docs).collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getDecimal(2).doubleValue, r.getDecimal(3).doubleValue))
      .toMap
    val lp = -0.693147 // round(ln(0.5), 6)
    assert(got(1L)._1 == 3L)
    assert(math.abs(got(1L)._2 - 3 * lp) < 1e-9) // exact decimal sum
    assert(math.abs(got(1L)._3 - lp) < 1e-9)
    assert(got(2L) == ((1L, lp, lp)))
  }

  test("bigramLogprob: conditional probs under the corpus bigram table") {
    import spark.implicits._
    // bigrams: "a b" ×2 (docs 1, 2), "a c" ×1 (doc 1) → prefix a· = 3;
    // logp(b|a) = ln(2/3), logp(c|a) = ln(1/3); doc 3 has 1 token → drops
    val docs = Seq((1L, "a b a c"), (2L, "a b"), (3L, "x")).toDF("doc_id", "text")
    val got = TextStats.bigramLogprob(docs).collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getDecimal(3).doubleValue))
      .toMap
    val lpAB = BigDecimal(math.log(2.0 / 3)).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val lpAC = BigDecimal(math.log(1.0 / 3)).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    // doc 1's bigrams are "a b", "b a", "a c" — "b a" occurs once with
    // prefix b· = 1 → logp 0; avg = (lpAB + 0 + lpAC) / 3
    val want1 = BigDecimal((lpAB + 0.0 + lpAC) / 3)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got(1L)._1 == 3L)
    assert(math.abs(got(1L)._2 - want1) < 1e-9)
    assert(got(2L)._1 == 1L)
    assert(math.abs(got(2L)._2 - lpAB) < 1e-9)
    assert(!got.contains(3L))
  }

  test("sourceProfile: per-source masses sum to corpus totals") {
    val docs = graft.sources.Tables.documents(spark, "/root/testdata/sf0.001")
    val got = TextStats.sourceProfile(docs).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(4), r.getDouble(5), r.getDecimal(6).doubleValue))
    assert(got.nonEmpty)
    assert(got.map(_._2).sum == docs.count())
    val totalChars = docs.agg(org.apache.spark.sql.functions.sum("n_chars"))
      .head().getLong(0)
    assert(got.map(_._3).sum == totalChars)
    got.foreach { case (src, _, _, p50, p90, enFrac) =>
      assert(p50 <= p90, s"$src percentiles inverted")
      assert(enFrac >= 0.0 && enFrac <= 1.0)
    }
  }

  test("vocabCoverage: ranks dense, counts and coverage monotone") {
    import spark.implicits._
    val docs = Seq((1L, "a a a b b c"), (2L, "a b d")).toDF("doc_id", "text")
    val got = TextStats.vocabCoverage(docs, k = 3).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getDecimal(4).doubleValue))
    // 9 tokens total: a×4, b×3, c×1, d×1 (c before d by name)
    assert(got.map(t => (t._1, t._2, t._3)).toSeq ==
      Seq((1L, "a", 4L), (2L, "b", 3L), (3L, "c", 1L)))
    assert(got.map(_._4).toSeq == Seq(4L, 7L, 8L))
    assert(math.abs(got.last._5 - 8.0 / 9) < 1e-6)
  }

  test("ragChunks: windows tile the token stream with the fixed overlap") {
    import spark.implicits._
    // 40 tokens → 2 chunks: [1..32] and [25..40] (16 tokens); 10 tokens
    // → 1 full-doc chunk; identical content hashes to identical keys
    val t40 = (1 to 40).map(i => s"w$i").mkString(" ")
    val t10 = (1 to 10).map(i => s"w$i").mkString(" ")
    val docs = Seq((1L, t40), (2L, t10), (3L, t10)).toDF("doc_id", "text")
    val got = TextStats.ragChunks(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getString(4)))
    assert(got.map(t => (t._1, t._2, t._3, t._4)).toSeq == Seq(
      (1L, 0L, 1L, 32L), (1L, 1L, 25L, 16L),
      (2L, 0L, 1L, 10L), (3L, 0L, 1L, 10L)))
    // every token position is covered: last chunk reaches the end
    assert(got(1)._3 + got(1)._4 - 1 == 40)
    // same chunk content → same hash (the downstream dedup key)
    assert(got(2)._5 == got(3)._5 && got(0)._5 != got(2)._5)
  }

  test("sourceKl: zero for an identical mix, nonnegative always") {
    import spark.implicits._
    // srcA and srcB share the corpus distribution exactly → KL = 0;
    // srcC is skewed → KL > 0 (Gibbs); all ≥ 0 up to 6-dp log rounding
    val docs = Seq(
      (1L, "a a b", "srcA"), (2L, "a a b", "srcB"), (3L, "c c c", "srcC"))
      .toDF("doc_id", "text", "source")
    val got = TextStats.sourceKl(docs).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDecimal(2).doubleValue))
    assert(got.map(_._1).toSeq == Seq("srcA", "srcB", "srcC"))
    assert(got.map(_._2).toSeq == Seq(3L, 3L, 3L))
    got.foreach { case (s, _, kl) => assert(kl >= -1e-6, s"$s kl=$kl") }
    // identical-mix sources score 0 exactly is false (they differ from
    // the pooled corpus because srcC shifts it) — but A and B must agree
    assert(math.abs(got(0)._3 - got(1)._3) < 1e-9)
    assert(got(2)._3 > got(0)._3)
  }

  test("pplBuckets: even deciles with monotone non-overlapping score ranges") {
    import spark.implicits._
    // doc i repeats word w_i (i times) plus a shared word — scores vary
    val docs = (1L to 8L).map { i =>
      (i, (Seq.fill(i.toInt)(s"w$i") :+ "shared").mkString(" "))
    }.toDF("doc_id", "text")
    val per = TextStats.unigramLogprob(docs)
    val got = TextStats.pplBuckets(per, n = 4).collect()
      .map(r => (r.getLong(0), r.getLong(1),
        r.getDecimal(2).doubleValue, r.getDecimal(3).doubleValue))
    assert(got.map(_._1).toSeq == Seq(1L, 2L, 3L, 4L)) // all buckets present
    assert(got.map(_._2).sum == 8L && got.forall(_._2 == 2L)) // even split
    got.foreach { case (_, _, lo, hi) => assert(lo <= hi) }
    got.sliding(2).foreach { case Array(a, b) => assert(a._4 <= b._3); case _ => }
  }

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  test("cdcChunks: boundaries re-synchronize after a front insertion") {
    import spark.implicits._
    // pick tokens by their actual boundary property (md5 first hex = '0')
    val toks = (1 to 200).map(i => s"w$i")
    val boundary = toks.find(t => md5hex(t).startsWith("0")).get
    val plain = toks.filterNot(t => md5hex(t).startsWith("0")).take(5)
    val Seq(n1, n2, n3, n4, n5) = plain
    // A chunks: [n1 n2 boundary], [n3 n4]; B inserts n5 at the front —
    // its first chunk differs but the post-boundary chunk [n3 n4] aligns
    val docs = Seq(
      (0L, s"$n1 $n2 $boundary $n3 $n4"),
      (1L, s"$n5 $n1 $n2 $boundary $n3 $n4")).toDF("doc_id", "text")
    val got = TextStats.cdcChunks(docs).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.length == 1) // exactly one shared chunk
    val (hash, nToks, nOcc, nDocs) = got.head
    assert(hash == md5hex(s"$n3 $n4"))
    assert((nToks, nOcc, nDocs) == ((2L, 2L, 2L)))
  }

  test("cdcChunks: exact duplicate docs share every chunk") {
    import spark.implicits._
    val text = (1 to 40).map(i => s"w$i").mkString(" ")
    val docs = Seq((0L, text), (1L, text), (2L, "qq rr ss")).toDF("doc_id", "text")
    val got = TextStats.cdcChunks(docs).collect()
      .map(r => (r.getLong(2), r.getLong(3)))
    assert(got.nonEmpty)
    assert(got.forall { case (nOcc, nDocs) => nOcc == 2L && nDocs == 2L })
    // every one of doc 0's chunks is in the repeated set: total repeated
    // tokens = 2 × 40
    val totToks = TextStats.cdcChunks(docs).collect()
      .map(r => r.getLong(1) * r.getLong(2)).sum
    assert(totToks == 80L)
  }

  test("zipfSlope: two-point fit matches the closed form") {
    import spark.implicits._
    // freqs: "aa" ×4, "bb" ×2 → points (ln1, ln4), (ln2, ln2)
    val docs = Seq((0L, "aa aa aa aa bb bb")).toDF("doc_id", "text")
    val r = TextStats.zipfSlope(docs).collect().head
    assert(r.getLong(0) == 2L)
    def r6(v: Double) = BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val (x1, y1) = (r6(math.log(1.0)), r6(math.log(4.0)))
    val (x2, y2) = (r6(math.log(2.0)), r6(math.log(2.0)))
    val slope = (y2 - y1) / (x2 - x1)
    val intercept = y1 - slope * x1
    assert(math.abs(r.getDecimal(1).doubleValue - r6(slope)) < 2e-6)
    assert(math.abs(r.getDecimal(2).doubleValue - r6(intercept)) < 2e-6)
  }

  test("heapsLaw: two-checkpoint fit matches the closed form") {
    import spark.implicits._
    // buckets (max_id=3, 2 buckets): docs {0,1} and {2,3}
    // cumulative (toks, vocab): (4, 3) then (8, 4)
    val docs = Seq(
      (0L, "aa bb"), (1L, "aa cc"), (2L, "aa dd"), (3L, "aa bb")
    ).toDF("doc_id", "text")
    val r = TextStats.heapsLaw(docs, nBuckets = 2).collect().head
    assert(r.getLong(0) == 2L)
    def r6(v: Double) = BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val beta = (r6(math.log(4.0)) - r6(math.log(3.0))) /
      (r6(math.log(8.0)) - r6(math.log(4.0)))
    assert(math.abs(r.getDecimal(1).doubleValue - r6(beta)) < 2e-6)
  }

  test("heapsLaw: saturated vocabulary fits beta ≈ 0") {
    import spark.implicits._
    val docs = (0L to 3L).map(i => (i, "aa bb")).toDF("doc_id", "text")
    val r = TextStats.heapsLaw(docs, nBuckets = 2).collect().head
    assert(math.abs(r.getDecimal(1).doubleValue) < 1e-9) // vocab never grows
  }

  test("zipfSlope: a perfect Zipf corpus fits slope ≈ −1") {
    import spark.implicits._
    // freq(rank r) = 60/r for r = 1..5 → exactly ln y = ln 60 − 1·ln x
    val words = Seq("aa" -> 60, "bb" -> 30, "cc" -> 20, "dd" -> 15, "ee" -> 12)
    val text = words.flatMap { case (w, n) => Seq.fill(n)(w) }.mkString(" ")
    val r = TextStats.zipfSlope(Seq((0L, text)).toDF("doc_id", "text")).collect().head
    assert(r.getLong(0) == 5L)
    assert(math.abs(r.getDecimal(1).doubleValue - (-1.0)) < 1e-3)
  }

  test("jsDivergence: zero for identical sources, ln2 for disjoint, bounded") {
    val docs = Seq(
      (1L, "alpha beta gamma alpha", "srcA"),
      (2L, "alpha beta gamma alpha", "srcB"),   // identical dist to srcA
      (3L, "delta epsilon zeta eta", "srcC"),   // disjoint from both
    ).toDF("doc_id", "text", "source")
    val js = TextStats.jsDivergence(docs).collect()
      .map(r => ((r.getString(0), r.getString(1)), r.getDecimal(2).doubleValue)).toMap
    assert(js(("srcA", "srcB")) == 0.0)
    // disjoint vocab → JS = ln 2 (the 6-dp quantized constant)
    assert(math.abs(js(("srcA", "srcC")) - 0.693147) < 1e-6)
    assert(js.values.forall(v => v >= 0.0 && v <= 0.693148))
  }

  test("xLangConfusion: cells partition the corpus and agree with xLangId") {
    val dir = sf("sf0.001")
    val rows = TextStats.xLangConfusion(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    val nDocs = graft.sources.Tables.documents(spark, dir).count()
    assert(rows.map(_._3).sum == nDocs) // every doc lands in exactly one cell
    assert(rows.map(p => (p._1, p._2)).distinct.length == rows.length)
    // cells re-aggregate from the per-doc detector output
    val perDoc = TextStats.xLangId(spark, dir)
      .join(graft.sources.Tables.documents(spark, dir).select("doc_id", "lang"), "doc_id")
      .groupBy("lang", "pred_lang").count().collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    assert(rows.toSet == perDoc)
  }

  test("xWeightedSample: deterministic, and selection is length-biased") {
    val dir = sf("sf0.001")
    val docs = graft.sources.Tables.documents(spark, dir)
    val sample = TextStats.xWeightedSample(docs, k = 25).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(sample.length == 25)
    // rerun → identical set (pure hash keys, no RNG)
    val again = TextStats.xWeightedSample(docs, k = 25).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(sample.toSeq == again.toSeq)
    // A-ES with w = n_chars must over-select long docs: the sampled mean
    // length exceeds the corpus mean (deterministic given the fixed hash)
    val corpusMean = docs.agg(avg("n_chars")).head().getDouble(0)
    val sampleMean = sample.map(_._2).sum.toDouble / sample.length
    assert(sampleMean > corpusMean,
      s"weighted sample not length-biased: sample $sampleMean vs corpus $corpusMean")
  }

  test("FunnelConfig tunes every threshold; engine and oracle SQL render from one instance") {
    import spark.implicits._
    val docs = Seq(
      (0L, "the and of to " + (1 to 12).map(i => s"word$i").mkString(" "), "en", "s"),
      (1L, "short one", "en", "s")).toDF("doc_id", "text", "lang", "source")
    // default config: doc 0 retained, doc 1 too short
    val d = TextStats.filterFunnel(docs).collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(d.get("6_retained").contains(1L) && d.get("1_too_short").contains(1L))
    // raised minTokens: everything is too short — API-only retune
    val strict = TextStats.FunnelConfig(minTokens = 100)
    val s2 = TextStats.filterFunnel(docs, strict).collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(s2 == Map("1_too_short" -> 2L))
    // oracle twin renders the SAME instance's thresholds
    val sql = TextStats.filterFunnelSql(strict)
    assert(sql.contains("n_tokens < 100"))
    assert(TextStats.filterFunnelSql(TextStats.FunnelConfig()) == TextStats.filterFunnelSql)
    // waterfill config: one instance drives both sides
    val wf = TextStats.WaterfillConfig(budget = 5L)
    val alloc = TextStats.tokenWaterfill(docs, wf).agg(sum("alloc")).head().getLong(0)
    assert(alloc == 5L, s"budget-capped total alloc, got $alloc")
    assert(TextStats.tokenWaterfillSql(wf).contains("5"))
  }

  test("filterFunnel: first-fail attribution and telescoping remainders") {
    import spark.implicits._
    // one doc per rule plus survivors; the "shortnostop" doc fails BOTH
    // rule 1 (too short) and rule 3 (no stopwords) — it must be charged
    // to rule 1 only (first-fail)
    val survivorText = ("the and of to " + (1 to 12).map(i => s"word$i").mkString(" "))
    val docs = Seq(
      (0L, "tiny doc", "en", "s"),                         // 1_too_short (and no stopwords)
      (1L, survivorText, "en", "s"),
      (2L, survivorText + " " + "x" * 540, "en", "s"),     // 2_too_long (>513 chars)
      (3L, (1 to 20).map(i => s"tok$i").mkString(" "), "en", "s"), // 3_low_stopword
      (4L, "the and of to " + ("dup " * 16), "en", "s"),   // 4_repetitive
      (5L, "the and of to " + ("abcdefghijkl " * 12), "en", "s"), // 5_token_shape (long tokens)
      (6L, survivorText, "en", "s"))
      .toDF("doc_id", "text", "lang", "source")
    val rows = TextStats.filterFunnel(docs).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val byRule = rows.map(t => t._1 -> t).toMap
    assert(rows.map(_._2).sum == 7, s"funnel rows must sum to the corpus: $rows")
    assert(byRule("1_too_short")._2 == 1, s"first-fail violated: $rows")
    assert(byRule("2_too_long")._2 == 1)
    assert(byRule("3_low_stopword")._2 == 1)
    assert(byRule("4_repetitive")._2 == 1)
    assert(byRule("5_token_shape")._2 == 1)
    // remainders telescope in rule order; retained row repeats its count
    val ordered = rows.sortBy(_._1)
    var remaining = 7L
    ordered.dropRight(1).foreach { case (rule, n, rem) =>
      remaining -= n
      assert(rem == remaining, s"$rule: expected $remaining got $rem")
    }
    val retained = ordered.last
    assert(retained._1 == "6_retained" && retained._2 == retained._3)
    assert(retained._3 == remaining)
  }

  test("dsirWeights: disjoint-vocab target docs outscore raw docs") {
    // pick 3+3 tokens whose md5 buckets don't collide across the pools,
    // so target and raw mass live in different buckets by construction
    val pool = Seq("alpha", "bravo", "charlie", "delta", "echo", "foxtrot",
      "golf", "hotel", "india", "juliet", "kilo", "lima")
    val bOf = pool.toDF("w")
      .select(col("w"), TextStats.hashBucket(col("w")).as("b"))
      .collect().map(r => r.getString(0) -> r.getInt(1)).toMap
    val (tgtW, rawW) = {
      val distinct = pool.foldLeft(Vector.empty[String]) { (acc, w) =>
        if (acc.map(bOf).contains(bOf(w))) acc else acc :+ w
      }
      (distinct.take(3), distinct.slice(3, 6))
    }
    val docs = Seq(
      (1L, tgtW.mkString(" "), "en"),
      (2L, (tgtW :+ tgtW.head).mkString(" "), "en"),
      (3L, rawW.mkString(" "), "de"),
      (4L, (rawW :+ rawW.head).mkString(" "), "de"))
      .toDF("doc_id", "text", "lang")
    val got = TextStats.dsirWeights(docs)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getDecimal(2).doubleValue())).toMap
    assert(got.keySet == Set(1L, 2L, 3L, 4L))
    assert(got(2L)._1 == 4L && got(1L)._1 == 3L, "token counts")
    // every target doc strictly outscores every raw doc
    assert(Seq(1L, 2L).map(got(_)._2).min > Seq(3L, 4L).map(got(_)._2).max, got.toString)
    // target-only vocabulary gives positive evidence, raw-only negative
    assert(got(1L)._2 > 0 && got(3L)._2 < 0)
  }

  test("dsirWeights: exact per-doc sums match a driver-side recomputation") {
    val docs = Seq(
      (1L, "red blue blue green", "en"),
      (2L, "red red yellow", "en"),
      (3L, "blue yellow yellow pink", "de"),
      (4L, "green pink pink", "fr"))
      .toDF("doc_id", "text", "lang")
    val bOf = Seq("red", "blue", "green", "yellow", "pink").toDF("w")
      .select(col("w"), TextStats.hashBucket(col("w")).as("b"))
      .collect().map(r => r.getString(0) -> r.getInt(1).toLong).toMap
    val toks = Map(
      1L -> Seq("red", "blue", "blue", "green"),
      2L -> Seq("red", "red", "yellow"),
      3L -> Seq("blue", "yellow", "yellow", "pink"),
      4L -> Seq("green", "pink", "pink"))
    val isT = Map(1L -> true, 2L -> true, 3L -> false, 4L -> false)
    val ct = toks.toSeq.filter(t => isT(t._1)).flatMap(_._2).groupBy(bOf)
      .map { case (b, ws) => b -> ws.size.toLong }
    val cr = toks.toSeq.filter(t => !isT(t._1)).flatMap(_._2).groupBy(bOf)
      .map { case (b, ws) => b -> ws.size.toLong }
    val (tt, tr) = (ct.values.sum, cr.values.sum)
    def logr(b: Long): BigDecimal = BigDecimal(math.log(
      ((ct.getOrElse(b, 0L) + 1).toDouble / (tt + 256).toDouble) /
        ((cr.getOrElse(b, 0L) + 1).toDouble / (tr + 256).toDouble)))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP)
    val expected = toks.map { case (d, ws) =>
      d -> ws.groupBy(bOf).map { case (b, g) => logr(b) * g.size }.sum }
    val got = TextStats.dsirWeights(docs)
      .collect().map(r => r.getLong(0) -> BigDecimal(r.getDecimal(2))).toMap
    assert(got == expected, s"got $got expected $expected")
  }
}
