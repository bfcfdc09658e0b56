object Profile {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]").config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def t(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f; println(f"PROF $name ${(System.nanoTime()-t0)/1e9}%.2f s")
    }
    val dir = "/root/testdata/sf0.1"
    for (round <- 1 to 2; q <- Seq("d3_lsh_near_dups", "d6_simhash_pairs", "s3_near_dup_pairs", "d4_ngram_jaccard"))
      t(s"$q r$round") { graft.SparkEntry.queries(q)(spark, dir).write.format("noop").mode("overwrite").save() }
  }
}
