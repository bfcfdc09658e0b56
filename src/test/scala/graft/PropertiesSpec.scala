package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.dedup.Dedup
import graft.graph.Graph
import graft.search.TfIdf
import graft.text.Tokenize

/** ScalaCheck properties (SURVEY.md §5.4): algebraic invariants that must
  * hold for arbitrary inputs, not just fixtures. */
class PropertiesSpec extends SparkSpec {

  /** Raw-ScalaCheck bridge (the scalatestplus adapter isn't in the
    * offline cache): run a Prop with a fixed seed, assert it passed. */
  private def check(prop: Prop, n: Int = 15): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(n)
        .withInitialSeed(org.scalacheck.rng.Seed(42L)), prop)
    assert(res.passed, res.status.toString)
  }
  import spark.implicits._

  private val word = Gen.nonEmptyListOf(Gen.alphaLowerChar).map(_.mkString).suchThat(_.nonEmpty)
  private val doc = Gen.listOf(Gen.oneOf(word, Gen.oneOf(Tokenize.stopwords), Gen.const("x!y")))
    .map(_.mkString(" "))

  test("tokenize is idempotent: tokens(join(tokens(t))) == tokens(t)") {
    check(Prop.forAll(Gen.listOfN(8, doc)) { docs =>
      docs.isEmpty || {
        val df = docs.toDF("text")
        val once = df.select(Tokenize.tokens(col("text")).as("t"))
        val twice = once.select(Tokenize.tokens(array_join(col("t"), " ")).as("t"))
        once.as[Seq[String]].collect().toSeq == twice.as[Seq[String]].collect().toSeq
      }
    })
  }

  test("tf-idf is non-negative and idf=0 iff term is in every doc") {
    check(Prop.forAll(Gen.listOfN(6, doc)) { docs =>
      docs.count(_.trim.nonEmpty) < 2 || {
        val df = docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
        val p = TfIdf.postings(df).collect()
        // N is the FULL corpus size — token-less docs (empty/all-stopword)
        // still count, so idf=0 requires presence in every input doc
        val nDocs = docs.length
        p.forall { r =>
          val (df_, idf, tfidf) = (r.getLong(3), r.getDouble(4), r.getDouble(5))
          idf >= 0.0 && tfidf >= 0.0 && ((idf == 0.0) == (df_ == nDocs))
        }
      }
    }, n = 8)
  }

  test("searchSingle: top-k is a prefix of top-(k+5)") {
    val docs = (0 until 40).map(i => (i.toLong, s"alpha beta w$i alpha")).toDF("doc_id", "text")
    val p = TfIdf.postings(docs).cache()
    val k5 = TfIdf.searchSingle(p, "alpha", 5).collect().map(_.getLong(0)).toSeq
    val k10 = TfIdf.searchSingle(p, "alpha", 10).collect().map(_.getLong(0)).toSeq
    assert(k10.take(5) == k5)
  }

  test("degrees: out-degree sum == in-degree sum == |E|") {
    check(Prop.forAll(Gen.listOf(Gen.zip(Gen.choose(0L, 20L), Gen.choose(0L, 20L)))) { pairs =>
      val e = pairs.filter(p => p._1 != p._2).distinct
      e.isEmpty || {
        val d = Graph.degrees(e.toDF("src", "dst")).collect()
        d.map(_.getLong(1)).sum == e.length && d.map(_.getLong(2)).sum == e.length
      }
    })
  }

  test("shingle sets: |sh| <= max(0, tokens-2) and dup text => equal sets") {
    check(Prop.forAll(doc) { t =>
      val df = Seq(t, t).toDF("text")
      val sh = df.select(Dedup.shingles(col("text")).as("s")).as[Seq[String]].collect()
      val nTok = df.select(size(Tokenize.rawTokens(col("text")))).as[Int].head()
      sh(0).toSet == sh(1).toSet && sh(0).length <= math.max(0, nTok - 2)
    })
  }

  test("filterFunnel: partitions any corpus — counts sum, remainders telescope") {
    check(Prop.forAll(Gen.choose(1, 12).flatMap(n => Gen.listOfN(n, doc))) { docs =>
      val df = docs.zipWithIndex
        .map { case (t, i) => (i.toLong, t, "en", "s") }
        .toDF("doc_id", "text", "lang", "source")
      val rows = graft.text.TextStats.filterFunnel(df).collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      val total = docs.length.toLong
      val sumOk = rows.map(_._2).sum == total
      // telescoping in rule order; the retained row repeats its count
      var remaining = total
      val teleOk = rows.sortBy(_._1).forall { case (rule, n, rem) =>
        if (rule == "6_retained") rem == n && rem == remaining
        else { remaining -= n; rem == remaining }
      }
      sumOk && teleOk
    }, n = 10)
  }

  test("tokenWaterfill: exact budget, per-source cap, single waterline") {
    // synthetic corpora with controlled availabilities: each source gets
    // `a` single-token docs, so avail == a exactly
    val avails = Gen.choose(1, 8).flatMap(n => Gen.listOfN(n, Gen.choose(1L, 60L)))
    check(Prop.forAll(Gen.zip(avails, Gen.choose(1L, 300L))) { case (as, budget) =>
      val docs = as.zipWithIndex.flatMap { case (a, s) =>
        (0L until a).map(i => (s * 1000L + i, "tok", "en", f"src$s%02d"))
      }.toDF("doc_id", "text", "lang", "source")
      val rows = graft.text.TextStats.tokenWaterfill(docs, budget).collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      val total = as.sum
      val sumOk = rows.map(_._4).sum == math.min(budget, total)
      val capOk = rows.forall { case (_, avail, _, alloc) => alloc <= avail }
      val exhOk = rows.forall { case (_, avail, ex, alloc) => ex == 0L || alloc == avail }
      // all non-exhausted sources sit on one waterline (within the ±1
      // remainder distribution)
      val free = rows.filter(_._3 == 0L).map(_._4)
      val lineOk = free.isEmpty || free.max - free.min <= 1
      sumOk && capOk && exhOk && lineOk
    }, n = 12)
  }
}
