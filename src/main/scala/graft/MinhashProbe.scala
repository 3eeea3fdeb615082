package graft
import graft.analytics.Dedup
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object MinhashProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val doc = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    println("docs=" + doc.count() + " avgChars=" + doc.agg(avg(length(col("text")))).head.getDouble(0))
    def time(label: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"$label: ${(System.nanoTime() - t0) / 1e9}%.2fs")
    }
    time("signatures") {
      Dedup.minhashSignatures(doc, "doc_id", "text").write.format("noop").mode("overwrite").save()
    }
    time("pairs-total") {
      Dedup.minhashPairs(doc, "doc_id", "text", threshold = 0.5).write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
