package graft

import graft.analytics.Dedup
import org.apache.spark.sql.functions._
import org.apache.spark.sql.SparkSession

object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    docs.count()
    def timed[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"PROBE $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    val sh = timed("simhashes")(
      Dedup.simhashes(docs, "doc_id", "text").cache())
    println(s"PROBE sims=${sh.count()}")
    val pairs = timed("pairs-from-cached-sims") {
      val bands = 4
      val bandKeys = array((0 until bands).map { j =>
        val start = j * Dedup.SimhashBits / bands
        val width = (j + 1) * Dedup.SimhashBits / bands - start
        shiftrightunsigned(col("sim"), start).bitwiseAND(lit((1L << width) - 1))
      }: _*)
      val banded = sh.select(col("id"), col("sim"),
        posexplode(bandKeys).as(Seq("bandIdx", "bandKey")))
      banded.alias("l").join(banded.alias("r"),
          col("l.bandIdx") === col("r.bandIdx") &&
            col("l.bandKey") === col("r.bandKey") && col("l.id") < col("r.id"))
        .select(col("l.id").as("id_a"), col("r.id").as("id_b"),
          bit_count(col("l.sim").bitwiseXOR(col("r.sim"))).cast("long")
            .as("hamming"))
        .dropDuplicates("id_a", "id_b")
        .where(col("hamming") <= 3).count()
    }
    println(s"PROBE pairs=$pairs")
    // where does simhashes() spend: token explode+md5 vs 60 aggregates?
    val tok = timed("token-rows") {
      val t = docs.select(col("doc_id").as("id"),
        array_distinct(split(graft.analytics.TextOps.normalize(col("text")), " ")).as("toks"))
        .select(col("id"), explode(col("toks")).as("tok"))
        .select(col("id"), Dedup.tokenHash(col("tok")).as("h"))
      t.count()
    }
    println(s"PROBE tokens=$tok")
    spark.stop()
  }
}
