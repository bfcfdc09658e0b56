object ProbeS5 {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]").config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val emb = graft.sources.Tables.embeddings(spark, "/tmp/graft_sf1")
    for (p <- Seq(6, 10)) {
      val t0 = System.nanoTime()
      graft.similarity.Similarity.embeddingClusters(
        graft.similarity.Similarity.scoredPairs(emb, p = p))
        .write.format("noop").mode("overwrite").save()
      println(f"RESULT p=$p sec=${(System.nanoTime() - t0) / 1e9}%.1f")
    }
    spark.stop()
  }
}
