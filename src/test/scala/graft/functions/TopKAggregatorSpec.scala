package graft.functions

import graft.SparkSpec

class TopKAggregatorSpec extends SparkSpec {
  import spark.implicits._

  test("typed per-group top-k equals sort-based reference on real postings") {
    val docs = graft.sources.Tables.documents(spark, sf("sf0.001"))
    val postings = graft.search.TfIdf.postings(docs)
      .select("term", "doc_id", "tfidf").as[(String, Long, Double)].cache()

    val agg = new TopKAggregator(3).toColumn
    val got = postings.groupByKey(_._1)
      .mapValues { case (_, id, score) => (id, score) }
      .agg(agg.name("topk"))
      .collect().toMap

    // reference: plain sort per term
    val ref = postings.collect().groupBy(_._1).map { case (t, rows) =>
      t -> rows.map(r => (r._3, r._2)).sortBy { case (s, id) => (-s, id) }.take(3).toSeq
    }
    assert(got.keySet == ref.keySet)
    got.foreach { case (t, topk) => assert(topk == ref(t), s"term $t: $topk vs ${ref(t)}") }
  }

  test("bounded state: reduce never holds more than k entries") {
    val a = new TopKAggregator(2)
    var buf = a.zero
    (1L to 100L).foreach { i => buf = a.reduce(buf, (i, i.toDouble)) }
    assert(buf.length == 2 && buf.map(_._1).toSet == Set(100.0, 99.0))
    val merged = a.merge(buf, a.reduce(a.zero, (500L, 1000.0)))
    assert(merged.length == 2 && merged.head._1 == 1000.0)
  }
}
