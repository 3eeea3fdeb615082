package graft

import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

/** Measurement tool (optimization guide §1.2/§7.2): dump
  * `.explain("formatted")` for named SparkEntry queries to
  * `<outDir>/<name><suffix>.txt` so plan claims in OPTIMIZATION notes
  * are verifiable without running Spark.
  * Usage: `runMain graft.ExplainDump <sfDir> <outDir> <suffix> q1,q2,...`
  */
object ExplainDump {
  def main(args: Array[String]): Unit = {
    val (sfDir, outDir, suffix) = (args(0), args(1), args(2))
    val names = args(3).split(",").toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    val qs = SparkEntry.queries
    names.foreach { name =>
      qs.get(name) match {
        case Some(fn) =>
          try {
            val df = fn(spark, sfDir)
            val plan = df.queryExecution.explainString(
              org.apache.spark.sql.execution.FormattedMode)
            Files.writeString(Paths.get(s"$outDir/$name$suffix.txt"), plan)
            println(s"[explain] wrote $name$suffix")
          } catch { case scala.util.control.NonFatal(e) =>
            System.err.println(s"[explain] $name failed: ${e.getMessage}")
          }
        case None => System.err.println(s"[explain] unknown query $name")
      }
    }
    spark.stop()
  }
}
