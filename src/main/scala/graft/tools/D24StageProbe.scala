package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage-level timing of the d24 pipeline (round-12 30× probe
  * instrument): times pair enumeration + banded levenshtein, the pair
  * checkpoint, connectedComponents (current loop AND an inline copy of
  * the plain r11 loop for contraction A/Bs), and the entity roll-up
  * separately. This probe localized the 30× superlinearity to CC's
  * triple evaluation of the raw match pipeline (76 s × 3 of the 259 s
  * read) — fixed by deriving CC's vertex set from the checkpointed
  * symmetric frame — and measured Borůvka-style contraction SLOWER
  * (52 vs 35 s) on the low-diameter clique-blocked match graph. */
object D24StageProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/graft_probe_30x")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val customer = spark.read.parquet(s"$dir/customer.parquet")
    def t[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"$tag: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val c = customer.select(col("c_custkey"), col("c_name"),
        substring(col("c_name"), 1, 16).as("blk"))
      .localCheckpoint(true)
    val pairs = graft.dedup.Dedup.blockedCandidatePairs(c)
      .filter(col("a_name") =!= col("b_name") &&
        levenshtein(col("a_name"), col("b_name"), 2) =!= -1)
      .select(col("a_key").as("src"), col("b_key").as("dst"))
    val n = t("1 pairs count (lev incl.)") { pairs.count() }
    println(s"   pairs = $n")
    val pc = t("1b pairs checkpoint") { pairs.localCheckpoint(true) }
    val ents = t("2 connectedComponents (current)") {
      graft.graph.Graph.connectedComponents(pc).localCheckpoint(true)
    }
    t("2b CC, no contraction (r11 loop)") {
      import graft.plans.Lineage.CheckpointOps
      val und = pc.select("src", "dst")
        .union(pc.select(col("dst").as("src"), col("src").as("dst")))
        .distinct().loopCheckpoint(true)
      var labels = und.select(col("src").as("id")).distinct()
        .select(col("id"), col("id").as("component")).loopCheckpoint(true)
      var changed = 1L
      while (changed > 0) {
        val nbrMin = und.join(labels, und("src") === labels("id"))
          .groupBy(col("dst").as("id2")).agg(min("component").as("nbr_min"))
        val stepped = labels.join(nbrMin, labels("id") === nbrMin("id2"), "left_outer")
          .select(col("id"),
            least(col("component"), coalesce(col("nbr_min"), col("component"))).as("component"),
            col("component").as("prev"))
          .loopCheckpoint(false)
        val jump = stepped.select(col("id").as("jid"), col("component").as("jcomp"))
        val next = stepped.join(jump, stepped("component") === jump("jid"))
          .select(stepped("id"),
            least(stepped("component"), col("jcomp")).as("component"),
            (least(stepped("component"), col("jcomp")) < col("prev")).as("changed"))
          .loopCheckpoint(false)
        changed = next.filter(col("changed")).count()
        labels = next.select("id", "component")
      }
      labels.count()
    }
    t("3 rollup") {
      customer.join(ents.select(col("id").as("c_custkey"), col("component").as("entity")),
          Seq("c_custkey"), "left")
        .select(col("c_custkey"), col("c_name"), col("c_acctbal"),
          coalesce(col("entity"), col("c_custkey")).as("entity"))
        .groupBy("entity")
        .agg(count(lit(1)).as("n_records"))
        .count()
    }
    spark.stop()
  }
}
