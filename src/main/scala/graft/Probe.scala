package graft

import graft.analytics.Similarity
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    for (sf <- Seq("sf0.01", "sf0.1")) {
      val emb = spark.read.parquet(s"/root/testdata/$sf/embeddings.parquet")
      val probes = emb.where(col("vec_id") < 10)
      for (iters <- Seq(1, 2, 3)) {
        val t0 = System.nanoTime()
        val ann = Similarity.ivfBatchTopK(emb, probes, "vec_id", "embedding", 10, 16, 8, iters)
          .select("query_id", "id")
        val exact = Similarity.batchTopK(emb, probes, "vec_id", "embedding", 10)
          .select("query_id", "id")
        val hits = ann.join(exact, Seq("query_id", "id"))
          .groupBy("query_id").agg(count(lit(1)).as("hits"))
        val mean = probes.select(col("vec_id").as("query_id")).distinct()
          .join(hits, Seq("query_id"), "left")
          .agg(avg(coalesce(col("hits"), lit(0L))).as("m")).head().getDouble(0) / 10
        println(f"PROBE $sf iters=$iters meanRecall=$mean%.3f (${(System.nanoTime()-t0)/1e9}%.1f s)")
      }
    }
    spark.stop()
  }
}
