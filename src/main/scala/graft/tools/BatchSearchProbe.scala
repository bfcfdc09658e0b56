package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.search.{Rank, TfIdf}

/** Skewed-batch top-k probe (SCALE.md "batched search skew probe"):
  * measures the per-query top-k stage of the batched search path under
  * the adversarial regime the r9 ADVICE flagged — a query containing
  * the corpus's HIGHEST-df indexed term, whose candidate set is
  * (nearly) corpus-sized. Compares the two formulations on the SAME
  * pre-materialized (qid, doc_id, score) frame:
  *
  *   - window: row_number over PARTITION BY qid — every candidate row
  *     of a query lands in one reducer partition and is fully sorted;
  *   - agg: the bounded [[graft.functions.TopKAggregator]] — O(k)
  *     map-side state per (qid, input partition), only k pairs per
  *     (qid, partition) reach the shuffle. The REGISTERED t7/t8 path.
  *
  * Scoring work (identical for both) is excluded by localCheckpointing
  * the scored frame first, so the reading isolates the ranking stage.
  *
  *   sbt "runMain graft.tools.BatchSearchProbe <sfDir> [nHot] [reps]"
  *
  * `nHot` hot queries each pair the max-df term with a distinct rare
  * term (so their candidate sets are corpus-sized but rankings differ);
  * run against an sf dir and its graft.tools.ScaleProbe replica to see
  * how each formulation scales with corpus size.
  */
object BatchSearchProbe {
  private def f3(d: Double): String = f"$d%.3f"

  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: BatchSearchProbe <sfDir> [nHot] [reps]")
    val dir = args(0)
    val nHot = if (args.length > 1) args(1).toInt else 8
    val reps = if (args.length > 2) args(2).toInt else 5
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val postings = TfIdf.postings(docs).localCheckpoint(true)
    val norms = TfIdf.docNorms(postings).localCheckpoint(true)
    // the adversarial term: highest df among indexed (stopword-filtered)
    // terms, plus nHot distinct low-df partners so rankings differ
    val byDf = postings.select("term", "df").groupBy("term")
      .agg(first("df").as("df"))
    val hot = byDf.orderBy(desc("df"), asc("term")).head().getString(0)
    val rare = byDf.filter(col("term") =!= hot)
      .orderBy(asc("df"), asc("term")).limit(nHot)
      .collect().map(_.getString(0)).toSeq
    val batch: Seq[(Long, Seq[String])] =
      rare.zipWithIndex.map { case (r, i) => (i.toLong, Seq(hot, r)) }
    val qtf = batch.flatMap { case (q, ts) => ts.map(t => (q, t)) }
      .toDF("qid", "term")
      .groupBy("qid", "term").agg(count(lit(1)).as("qtf"))
    // materialize scoring ONCE so the probe times only the ranking stage
    val scored = TfIdf.cosineScores(postings, norms, qtf, trueCosine = true)
      .localCheckpoint(true)
    val candidates = scored.count()

    def run(f: DataFrame => DataFrame): Double = {
      val times = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        f(scored).write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      times.sorted.apply(reps / 2)
    }
    // warm all plans (codegen) before timing
    Rank.topKPerQuery(scored, 10).write.format("noop").mode("overwrite").save()
    Rank.topKPerQueryAgg(scored, 10).write.format("noop").mode("overwrite").save()
    Rank.topKPerQuerySalted(scored, 10).write.format("noop").mode("overwrite").save()
    val win = run(Rank.topKPerQuery(_, 10))
    val agg = run(Rank.topKPerQueryAgg(_, 10))
    val salted = run(Rank.topKPerQuerySalted(_, 10))
    // sanity: identical output (the spec pins this on small frames; the
    // probe re-checks at probe scale)
    val diffAgg = Rank.topKPerQuery(scored, 10)
      .exceptAll(Rank.topKPerQueryAgg(scored, 10)).count()
    val diffSalted = Rank.topKPerQuery(scored, 10)
      .exceptAll(Rank.topKPerQuerySalted(scored, 10)).count()
    println(s"""{"metric":"batch_topk_skew","sf_dir":"$dir","hot_term":"$hot",""" +
      s""""n_queries":$nHot,"candidates":$candidates,"reps":$reps,""" +
      s""""window_sec":${f3(win)},"agg_sec":${f3(agg)},"salted_sec":${f3(salted)},""" +
      s""""rows_diff_agg":$diffAgg,"rows_diff_salted":$diffSalted}""")
    spark.stop()
  }
}
