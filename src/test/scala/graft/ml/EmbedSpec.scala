package graft.ml

import org.apache.spark.sql.functions._

import graft.SparkSpec

class EmbedSpec extends SparkSpec {
  import spark.implicits._

  test("word2vec persist + knn: 16-dim vectors, valid cosine ranking") {
    val emb = Embed.word2vecPersist(spark, sf("sf0.001"), tag = "m8test")
    assert(emb.columns.toSeq == Seq("doc_id", "emb"))
    assert(emb.select(size(col("emb"))).distinct().collect().map(_.getInt(0)).toSeq == Seq(16))
    val knn = Embed.w2vKnn(emb, queryId = 0L).collect()
    assert(knn.length == 10)
    val cosines = knn.map(_.getDecimal(1).doubleValue) // cos is DECIMAL(18,6)
    assert(cosines.forall(c => c >= -1.000001 && c <= 1.000001))
    // TakeOrdered contract: descending, ties broken by doc_id
    assert(cosines.sameElements(cosines.sortBy(-_)))
    assert(!knn.map(_.getLong(0)).contains(0L)) // query doc excluded
  }

  test("word2vec top neighbor shares vocabulary with a near-duplicate query doc") {
    // two docs with identical text must embed identically -> cosine 1.0
    val docs = (0 until 40).map { i =>
      if (i < 2) (i.toLong, "alpha beta gamma delta alpha beta gamma delta")
      else (i.toLong, s"omega sigma tau rho pi phi chi psi word$i")
    }.toDF("doc_id", "text")
    val tok = new org.apache.spark.ml.feature.Tokenizer()
      .setInputCol("text").setOutputCol("tokens")
    val w2v = new org.apache.spark.ml.feature.Word2Vec()
      .setInputCol("tokens").setOutputCol("w2v")
      .setVectorSize(16).setMinCount(1).setMaxIter(1).setSeed(42L)
    val model = new org.apache.spark.ml.Pipeline().setStages(Array(tok, w2v)).fit(docs)
    val emb = model.transform(docs)
      .select(col("doc_id"), org.apache.spark.ml.functions.vector_to_array(col("w2v")).as("emb"))
    val top = Embed.w2vKnn(emb, queryId = 0L, k = 1).collect()
    assert(top.head.getLong(0) == 1L, s"expected identical-text doc 1 first, got ${top.head}")
    assert(math.abs(top.head.getDecimal(1).doubleValue - 1.0) < 1e-6)
  }

  test("analogies: 3CosAdd picks the exact-target word; probe words excluded") {
    import spark.implicits._
    // target = vb − va + vc = (2, 1); "hit" sits exactly there (cos 1);
    // "b" itself also equals... no: b=(1,1) has cos < 1 to (2,1) AND is
    // excluded anyway; "near" is close but not exact
    val vecs = Seq(
      ("a", Seq(1.0, 0.0)), ("b", Seq(1.0, 1.0)), ("c", Seq(2.0, 0.0)),
      ("hit", Seq(2.0, 1.0)), ("near", Seq(1.0, 2.0)), ("far", Seq(-2.0, -1.0)))
      .toDF("word", "emb")
    val got = Embed.analogies(vecs, Seq(("a", "b", "c"))).collect()
    assert(got.length == 1)
    val r = got.head
    assert(r.getString(3) == "hit", r.toString)
    assert(math.abs(r.getDecimal(4).doubleValue - 1.0) < 1e-6)
  }

  test("analogies: exclusion forces the second-best when the target IS a probe word") {
    import spark.implicits._
    // target = (1,1) = b exactly — b must be excluded, so the best
    // NON-probe word wins ("close", scaled copy of the target direction)
    val vecs = Seq(
      ("a", Seq(1.0, 0.0)), ("b", Seq(1.0, 1.0)), ("c", Seq(1.0, 0.0)),
      ("close", Seq(2.0, 2.0)), ("off", Seq(1.0, 0.0)))
      .toDF("word", "emb")
    val got = Embed.analogies(vecs, Seq(("a", "b", "c"))).collect()
    assert(got.length == 1 && got.head.getString(3) == "close", got.mkString(","))
    assert(math.abs(got.head.getDecimal(4).doubleValue - 1.0) < 1e-6)
  }
}
