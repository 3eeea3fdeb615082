package graft.analytics

import org.apache.spark.sql.SparkSession

/** Temporary harness: time the forced-distributed Louvain tier on the
  * planted instance and report round/level counts (set
  * GRAFT_LOUVAIN_DEBUG=1). Not part of the suite.
  */
object LouvainDebug {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[16]")
      .appName("louvain-debug")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val c = if (args.length > 0) args(0).toInt else 10
    val sz = if (args.length > 1) args(1).toInt else 20
    val t0 = System.nanoTime()
    val got = GraphAlgos.louvainPlanted(spark, c = c, sz = sz,
      forceDistributed = true).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    val secs = (System.nanoTime() - t0) / 1e9
    val expect = (0L until (c.toLong * sz))
      .map(i => i -> (i / sz) * sz).toMap
    val wrong = expect.count { case (n, e) => got.get(n) != Some(e) }
    println(f"c=$c sz=$sz secs=$secs%.1f nodes=${got.size} wrong=$wrong")
    if (wrong > 0) {
      val byComm = got.groupBy(_._2).map { case (cc, xs) =>
        cc -> xs.keys.toSeq.sorted }
      byComm.toSeq.sortBy(_._1).foreach { case (cc, ns) =>
        println(s"  comm $cc: ${ns.take(30).mkString(",")}") }
    }
    spark.stop()
  }
}
