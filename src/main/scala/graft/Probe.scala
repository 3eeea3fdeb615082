package graft

import graft.analytics.Dedup
import org.apache.spark.sql.functions._
import org.apache.spark.sql.SparkSession

object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1 << 20).selectExpr("sum(id)").collect()
    def timed[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"PROBE $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    val docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    docs.count()
    // warm (bench runs dedup_minhash before clusters)
    timed("minhashPairs-warmup") {
      Dedup.minhashPairs(docs, "doc_id", "text", 0.5)
        .write.mode("overwrite").format("noop").save()
    }
    timed("minhashPairs-again") {
      Dedup.minhashPairs(docs, "doc_id", "text", 0.5)
        .write.mode("overwrite").format("noop").save()
    }
    timed("clusters") {
      Dedup.clusters(docs, "doc_id", "text", 0.5)
        .write.mode("overwrite").format("noop").save()
    }
    spark.stop()
  }
}
