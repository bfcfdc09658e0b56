package graft.text

import org.apache.spark.sql.functions._

import graft.CertSpec
import graft.sources.Tables

/** Registry certification for the text-curation (x-family) queries not
  * already literally cited by TextStatsSpec — see [[graft.CertSpec]].
  * The cross-checks recompute the engine's normalized-token convention
  * (`lower`, `[^a-z0-9 ]` → space, split on runs of spaces) in plain
  * Scala over the collected 500-doc fixture. */
class TextCertSpec extends CertSpec {
  import spark.implicits._

  private lazy val corpus: Vector[(Long, String, Int, String, String)] =
    Tables.documents(spark, fx)
      .select(col("doc_id"), col("text"), col("n_chars").cast("int"),
        col("lang"), col("source"))
      .as[(Long, String, Int, String, String)].collect().toVector

  private def toks(text: String): Vector[String] =
    text.toLowerCase.replaceAll("[^a-z0-9 ]", " ").split(" +")
      .filter(_.nonEmpty).toVector

  private lazy val tokensById: Map[Long, Vector[String]] =
    corpus.map(d => d._1 -> toks(d._2)).toMap

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  private def q6(v: Double): Long =
    BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP)
      .*(BigDecimal(1000000)).toLong

  test("x1_entity_count: full recompute of the capitalized-entity histogram") {
    val texts = Tables.customer(spark, fx)
      .join(Tables.nation(spark, fx), col("c_nationkey") === col("n_nationkey"))
      .select(concat(col("c_name"), lit(" of "), initcap(lower(col("n_name")))))
      .as[String].collect()
    val pat = "[A-Z][a-z]+(?: [A-Z][a-z]+)*".r
    val want = texts.flatMap(t => pat.findAllIn(t)).map(_.toLowerCase)
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    val got = rows("x1_entity_count")
      .map(x => x.getAs[String]("entity") -> x.getAs[Long]("n")).toMap
    assert(got == want)
  }

  test("x2_lang_id: total prediction over the known label set; x24 cross-consistency") {
    val r = rows("x2_lang_id")
    assert(r.size == corpus.size)
    assert(r.map(_.getAs[String]("pred_lang")).toSet.subsetOf(
      Set("en", "de", "fr", "es", "zh", "und")))
    // confusion-matrix cross-check: x24 must be exactly the join of
    // x2's predictions with the documents' true labels
    val pred = r.map(x => x.getAs[Long]("doc_id") -> x.getAs[String]("pred_lang")).toMap
    val want = corpus.groupBy(d => (d._4, pred(d._1)))
      .view.mapValues(_.size.toLong).toMap
    val got = rows("x24_lang_confusion")
      .map(x => (x.getAs[String]("lang"), x.getAs[String]("pred_lang")) ->
        x.getAs[Long]("n")).toMap
    assert(got == want, "x24 must tabulate exactly x2's predictions")
  }

  test("x24_lang_confusion: cells conserve the corpus") {
    assert(rows("x24_lang_confusion").map(_.getAs[Long]("n")).sum == corpus.size.toLong)
  }

  test("x3_quality: char/token counts recompute; ratios bounded") {
    val r = rows("x3_quality")
    assert(r.size == corpus.size)
    val text = corpus.map(d => d._1 -> d._2).toMap
    r.foreach { x =>
      val id = x.getAs[Long]("doc_id")
      assert(x.getAs[Int]("n_chars") == text(id).length, s"doc $id chars")
      assert(x.getAs[Int]("n_tokens") == tokensById(id).size, s"doc $id tokens")
      assert(x.getAs[Double]("stopword_ratio") >= 0 && x.getAs[Double]("stopword_ratio") <= 1)
      assert(x.getAs[Double]("punct_ratio") >= 0 && x.getAs[Double]("punct_ratio") <= 1)
      assert(x.getAs[Double]("mean_tok_len") > 0)
    }
  }

  test("x4_token_count: whitespace, BPE-piece, and distinct counts recompute") {
    val r = rows("x4_token_count")
    val bpe = "[a-z]+|[0-9]+|[^a-z0-9\\s]".r
    val text = corpus.map(d => d._1 -> d._2).toMap
    r.foreach { x =>
      val id = x.getAs[Long]("doc_id")
      assert(x.getAs[Int]("n_ws_tokens") == tokensById(id).size, s"doc $id ws")
      assert(x.getAs[Int]("n_bpe_pieces") ==
        bpe.findAllIn(text(id).toLowerCase).size, s"doc $id bpe")
      assert(x.getAs[Int]("n_distinct") == tokensById(id).distinct.size, s"doc $id distinct")
    }
  }

  test("x5_fingerprint: md5 text/tokenset and the rolling hash all recompute") {
    val r = rows("x5_fingerprint")
    val text = corpus.map(d => d._1 -> d._2).toMap
    r.foreach { x =>
      val id = x.getAs[Long]("doc_id")
      assert(x.getAs[String]("md5_text") == md5hex(text(id)), s"doc $id md5")
      assert(x.getAs[String]("md5_tokenset") ==
        md5hex(tokensById(id).distinct.sorted.mkString(" ")), s"doc $id tokenset")
      val want = tokensById(id)
        .map(t => 31L * t.length + t.head.toLong)
        .foldLeft(0L)((acc, v) => (acc * 31 + v) % 2147483647L)
      assert(x.getAs[Long]("rolling") == want, s"doc $id rolling")
    }
  }

  test("x6_hash_split: md5-bucket split recomputes; corpus conserves") {
    val r = rows("x6_hash_split")
    val want = corpus.groupBy { d =>
      val h = md5hex(d._1.toString)
      val bucket = Integer.parseInt(h.substring(0, 2), 16)
      val split = if (bucket < 204) "train" else if (bucket < 230) "val" else "test"
      (split, d._4)
    }.view.mapValues(_.size.toLong).toMap
    val got = r.map(x => (x.getAs[String]("split"), x.getAs[String]("lang")) ->
      x.getAs[Long]("n")).toMap
    assert(got == want)
  }

  test("x10_mix_weights: budget-capped weights recompute from token totals") {
    val r = rows("x10_mix_weights")
    val want = corpus.groupBy(_._5).view
      .mapValues(ds => (ds.size.toLong, ds.map(d => tokensById(d._1).size.toLong).sum)).toMap
    assert(r.size == want.size)
    r.foreach { x =>
      val (nd, nt) = want(x.getAs[String]("source"))
      assert(x.getAs[Long]("n_docs") == nd)
      assert(x.getAs[Long]("n_tokens") == nt)
      val w = x.getAs[Double]("weight")
      assert(math.abs(w - math.min(1.0, 100000.0 / nt)) < 1e-6)
      assert(x.getAs[Long]("sampled_tokens") <= nt)
    }
  }

  test("x11_sequence_pack: offsets telescope in doc order; chunk flags consistent") {
    val r = rows("x11_sequence_pack").sortBy(_.getAs[Long]("doc_id"))
    var run = 0L
    r.foreach { x =>
      val id = x.getAs[Long]("doc_id")
      assert(x.getAs[Long]("n_tokens") == tokensById(id).size.toLong, s"doc $id")
      assert(x.getAs[Long]("tok_offset") == run, s"doc $id offset")
      run += x.getAs[Long]("n_tokens")
      assert(x.getAs[Long]("chunk_first") <= x.getAs[Long]("chunk_last"), s"doc $id")
      assert(x.getAs[Long]("crosses_boundary") ==
        (if (x.getAs[Long]("chunk_first") != x.getAs[Long]("chunk_last")) 1L else 0L),
        s"doc $id crosses")
    }
  }

  test("x12_shard_shuffle: seeded md5 shard + dense in-shard positions recompute") {
    val r = rows("x12_shard_shuffle")
    assert(r.size == corpus.size)
    val want = corpus.map { d =>
      val h = md5hex(s"42|${d._1}")
      (d._1, Integer.parseInt(h.substring(0, 1), 16) % 8, h)
    }
    val wantPos = want.groupBy(_._2).flatMap { case (_, g) =>
      g.sortBy(x => (x._3, x._1)).zipWithIndex.map { case (x, i) => x._1 -> (x._2, i + 1) }
    }
    r.foreach { x =>
      val (shard, pos) = wantPos(x.getAs[Long]("doc_id"))
      assert(x.getAs[Int]("shard") == shard && x.getAs[Int]("pos") == pos,
        s"doc ${x.getAs[Long]("doc_id")}")
    }
  }

  test("x15_ppl_buckets: ten non-overlapping score deciles conserving the corpus") {
    val r = rows("x15_ppl_buckets").sortBy(_.getAs[Long]("bucket"))
    assert(r.map(_.getAs[Long]("bucket")) == (1L to 10L).toVector)
    assert(r.map(_.getAs[Long]("n_docs")).sum == corpus.size.toLong)
    r.foreach(x => assert(micro(x, "lo") <= micro(x, "hi")))
    r.sliding(2).filter(_.size == 2).foreach { w =>
      assert(micro(w(0), "hi") <= micro(w(1), "lo"),
        "decile score ranges must be ordered and disjoint")
    }
  }

  test("x16_bigram_logprob: bigram counts recompute; averages consistent") {
    val r = rows("x16_bigram_logprob")
    assert(r.size == corpus.size)
    r.foreach { x =>
      val id = x.getAs[Long]("doc_id")
      val n = x.getAs[Long]("n_bigrams")
      assert(n == math.max(0, tokensById(id).size - 1).toLong, s"doc $id")
      assert(micro(x, "sum_logp") <= 0, s"doc $id: log-probs cannot be positive")
      if (n > 0)
        assert(math.abs(micro(x, "avg_logp") -
          q6(micro(x, "sum_logp") / 1e6 / n)) <= 1, s"doc $id avg")
    }
  }

  test("x17_source_profile: per-source totals recompute; quantiles monotone") {
    val r = rows("x17_source_profile")
    val want = corpus.groupBy(_._5).view.mapValues { ds =>
      (ds.size.toLong, ds.map(_._3.toLong).sum, ds.map(d => tokensById(d._1).size.toLong).sum)
    }.toMap
    assert(r.size == want.size)
    r.foreach { x =>
      val (nd, nc, nt) = want(x.getAs[String]("source"))
      assert(x.getAs[Long]("n_docs") == nd)
      assert(x.getAs[Long]("total_chars") == nc)
      assert(x.getAs[Long]("total_tokens") == nt)
      assert(x.getAs[Double]("p50_chars") <= x.getAs[Double]("p90_chars"))
      assert(micro(x, "en_frac") >= 0 && micro(x, "en_frac") <= 1000000)
    }
  }

  test("x18_vocab_coverage: head-word counts and cumulative coverage recompute") {
    val r = rows("x18_vocab_coverage").sortBy(_.getAs[Long]("rank"))
    val counts = corpus.flatMap(d => tokensById(d._1))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val total = counts.values.sum
    var run = 0L
    r.foreach { x =>
      assert(counts(x.getAs[String]("word")) == x.getAs[Long]("n"),
        s"word ${x.getAs[String]("word")}")
      run += x.getAs[Long]("n")
      assert(x.getAs[Long]("cum_n") == run)
      assert(math.abs(micro(x, "coverage") - q6(run.toDouble / total)) <= 1)
    }
    val ns = r.map(_.getAs[Long]("n"))
    assert(ns == ns.sortBy(-_), "head words must be frequency-ordered")
  }

  test("x20_source_kl: nonnegative divergence for every source") {
    val r = rows("x20_source_kl")
    assert(r.size == corpus.map(_._5).distinct.size)
    assert(r.forall(micro(_, "kl") >= 0), "KL divergence is nonnegative")
  }

  test("x22_zipf_slope: ln-ln regression over the rank-frequency curve recomputes") {
    val r = rows("x22_zipf_slope").head
    val freqs = corpus.flatMap(d => tokensById(d._1))
      .groupBy(identity).values.map(_.size).toVector.sortBy(-_)
    assert(r.getAs[Long]("n_words") == freqs.size.toLong)
    val pts = freqs.zipWithIndex.map { case (f, i) =>
      (math.log((i + 1).toDouble), math.log(f.toDouble))
    }
    val n = pts.size.toDouble
    val (sx, sy) = (pts.map(_._1).sum, pts.map(_._2).sum)
    val sxx = pts.map(p => p._1 * p._1).sum
    val sxy = pts.map(p => p._1 * p._2).sum
    val slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    val icept = (sy - slope * sx) / n
    assert(math.abs(micro(r, "slope") - q6(slope)) <= 2)
    assert(math.abs(micro(r, "intercept") - q6(icept)) <= 2)
    assert(micro(r, "slope") < 0, "Zipf slope must be negative")
  }

  test("x23_heaps_law: 32 growth points with a sub-linear exponent") {
    val r = rows("x23_heaps_law").head
    assert(r.getAs[Long]("n_points") == 32)
    assert(micro(r, "beta") >= 0 && micro(r, "beta") < 1000000,
      "Heaps exponent must be sub-linear")
  }

  test("x25_js_divergence: canonical source pairs bounded by ln 2") {
    val r = rows("x25_js_divergence")
    val n = corpus.map(_._5).distinct.size
    assert(r.size == n * (n - 1) / 2)
    assert(r.forall(x => x.getAs[String]("s1") < x.getAs[String]("s2")))
    assert(r.forall(x => micro(x, "js") >= 0 && micro(x, "js") <= 693148),
      "JS divergence lives in [0, ln 2]")
  }

  test("x27_weighted_sample: the 25 smallest A-Res keys, fully recomputed") {
    val r = rows("x27_weighted_sample")
    val nchars = corpus.map(d => d._1 -> d._3).toMap
    val want = corpus.map { d =>
      val hv = java.lang.Long.parseLong(md5hex(d._1.toString).substring(0, 12), 16)
      val lnU = BigDecimal(math.log((hv + 1).toDouble / 281474976710656.0))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      (-lnU / d._3, d._1)
    }.sorted.take(25).map(_._2)
    assert(r.map(_.getAs[Long]("doc_id")) == want)
    r.foreach { x =>
      assert(x.getAs[Long]("w") == nchars(x.getAs[Long]("doc_id")).toLong)
      assert(micro(x, "key") >= 0)
    }
  }

  test("x28_token_waterfill: exhausted sources keep avail; the rest share one level") {
    val r = rows("x28_token_waterfill")
    val avail = corpus.groupBy(_._5).view
      .mapValues(ds => ds.map(d => tokensById(d._1).size.toLong).sum).toMap
    assert(r.size == avail.size)
    r.foreach(x => assert(x.getAs[Long]("avail") == avail(x.getAs[String]("source"))))
    assert(r.map(_.getAs[Long]("alloc")).sum == 26000L, "allocations exhaust the budget")
    val (ex, free) = r.partition(_.getAs[Long]("exhausted") == 1)
    ex.foreach(x => assert(x.getAs[Long]("alloc") == x.getAs[Long]("avail")))
    if (free.nonEmpty) {
      val allocs = free.map(_.getAs[Long]("alloc"))
      assert(allocs.max - allocs.min <= 1, "free sources share one water level")
      if (ex.nonEmpty)
        assert(allocs.min >= ex.map(_.getAs[Long]("avail")).max,
          "the water level sits above every exhausted source")
    }
  }

  // in-memory BPE trainer twin: same freq-weighted pair counts (every
  // occurrence, overlaps included), same (n desc, lhs, rhs) argmax,
  // same greedy-leftmost merge, same 10-round cap with early stop
  private lazy val bpeTwin: (Vector[(Int, String, String, Long)], Map[String, Vector[String]]) = {
    def mergePass(syms: Vector[String], l: String, r: String): Vector[String] = {
      val out = Vector.newBuilder[String]
      var i = 0
      while (i < syms.size) {
        if (i + 1 < syms.size && syms(i) == l && syms(i + 1) == r) { out += l + r; i += 2 }
        else { out += syms(i); i += 1 }
      }
      out.result()
    }
    val freq = tokensById.values.flatten.groupBy(identity)
      .view.mapValues(_.size.toLong).toMap
    var vocab: Map[String, Vector[String]] =
      freq.keys.map(w => w -> w.split("").toVector).toMap
    var merges = Vector.empty[(Int, String, String, Long)]
    var stop = false
    while (!stop && merges.size < 10) {
      val counts = scala.collection.mutable.Map[(String, String), Long]().withDefaultValue(0L)
      for ((w, syms) <- vocab; i <- 0 until syms.size - 1)
        counts((syms(i), syms(i + 1))) += freq(w)
      if (counts.isEmpty) stop = true
      else {
        val ((l, r), n) = counts.minBy { case ((l, r), n) => (-n, l, r) }
        merges :+= ((merges.size + 1, l, r, n))
        vocab = vocab.map { case (w, syms) => w -> mergePass(syms, l, r) }
      }
    }
    (merges, vocab)
  }

  test("x30_bpe_train: exact in-memory iterative-BPE trainer recompute") {
    val r = rows("x30_bpe_train")
    val got = r.map(x => (x.getAs[Int]("merge_rank"), x.getAs[String]("lhs"),
      x.getAs[String]("rhs"), x.getAs[Long]("n")))
    assert(got == bpeTwin._1, s"got $got\nwant ${bpeTwin._1}")
    // real BPE, not first-iteration pair stats: at least one learned
    // merge must combine a multi-char symbol
    assert(got.exists(m => m._2.length > 1 || m._3.length > 1),
      "no multi-char merge learned — corpus too thin for the cert to bite")
  }

  test("x31_bpe_encode: per-doc token/char counts recompute under the trained merges") {
    val r = rows("x31_bpe_encode")
    val symsBy = bpeTwin._2
    assert(r.map(_.getAs[Long]("doc_id")).toSet == corpus.map(_._1).toSet)
    r.foreach { x =>
      val id = x.getAs[Long]("doc_id")
      val ws = tokensById(id)
      val tk = ws.map(w => symsBy(w).size.toLong).sum
      val ch = ws.map(_.length.toLong).sum
      assert(x.getAs[Long]("n_tokens") == tk, s"doc $id tokens")
      assert(x.getAs[Long]("n_chars") == ch, s"doc $id chars")
      val wantMicro =
        if (tk == 0) 0L else (2 * ch * 1000000L + tk) / (2 * tk)
      assert(micro(x, "chars_per_token") == wantMicro, s"doc $id ratio")
    }
  }
}
