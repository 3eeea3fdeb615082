package graft

import graft.analytics.Dedup
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
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
    val threshold = 0.8
    // cold full run (what the bench sees)
    timed("jaccardJoin-cold") {
      Dedup.jaccardJoin(docs, "doc_id", "text", threshold, 9)
        .write.mode("overwrite").format("noop").save()
    }
    // stage split, second run (sets cache shared within the run only)
    val rows = timed("shingleRows") {
      val r = Dedup.charShingleRows(docs, "doc_id", "text", 9)
      r.write.mode("overwrite").format("noop").save(); r
    }
    val sets = timed("sets-build+cache") {
      val s = Dedup.shingleSets(rows).cache(); s.count(); s
    }
    val prefix = timed("prefix (freq+window)") {
      val rws = sets.select(col("id"), col("sz"), explode(col("sh")).as("h"))
      val freq = rws.groupBy("h").agg(count(lit(1)).as("df"))
      val p = rws.join(freq, "h")
        .withColumn("rn", row_number().over(
          Window.partitionBy("id").orderBy(col("df"), col("h"))))
        .where(col("rn") <= col("sz") - ceil(col("sz") * threshold) + 1)
        .select("id", "h", "sz", "rn")
      p.write.mode("overwrite").format("noop").save(); p
    }
    timed("cand+verify") {
      val cand = prefix.alias("l").join(prefix.alias("r"),
          col("l.h") === col("r.h") && col("l.id") < col("r.id") &&
            col("l.sz") * threshold <= col("r.sz") &&
            col("r.sz") * threshold <= col("l.sz") &&
            lit(1) + least(col("l.sz") - col("l.rn"), col("r.sz") - col("r.rn"))
              >= ceil((col("l.sz") + col("r.sz")) * (threshold / (1 + threshold))))
        .select(col("l.id").as("id_a"), col("r.id").as("id_b"))
        .dropDuplicates("id_a", "id_b")
      Dedup.jaccardVerify(cand, sets).where(col("jaccard") >= threshold)
        .write.mode("overwrite").format("noop").save()
    }
    spark.stop()
  }
}
