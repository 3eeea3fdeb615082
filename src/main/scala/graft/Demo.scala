package graft

import graft.core.{Graph, QValue}
import graft.exec.Exec
import graft.path.Path
import org.apache.spark.sql.SparkSession

/** Minimal end-to-end driver: load an N-Quads file, run traversals, print
  * results. Usage: runMain graft.Demo [path/to/file.nq]
  */
object Demo {
  def main(args: Array[String]): Unit = {
    val nq = args.headOption.getOrElse("/root/reference/data/testdata.nq")
    val spark = SparkSession.builder()
      .master("local[4]").appName("graft-demo")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val g = Graph.fromNQuads(spark, nq).cached()
    val (nNodes, nQuads) = g.stats
    println(s"loaded $nq: $nNodes nodes, $nQuads quads")

    def show(name: String, vs: Seq[QValue]): Unit =
      println(f"$name%-40s => ${vs.map(_.sortKey).mkString(", ")}")

    val follows = QValue.Iri("follows")
    val status = QValue.Iri("status")

    show("who bob follows [out]",
      Exec.run(g, Path.start(QValue.Iri("bob")).out(follows)).values())
    show("who follows bob [in]",
      Exec.run(g, Path.start(QValue.Iri("bob")).in(follows)).values())
    show("cool people [has]",
      Exec.run(g, Path.start().has(status, QValue.Str("cool_person"))).values())
    show("reachable from charlie [recursive]",
      Exec.run(g, Path.start(QValue.Iri("charlie")).followRecursive(follows)).values())
    val saved = Exec.run(g,
      Path.start().tag("who").out(status).tag("what"))
    saved.tagMaps().foreach(m => println(s"  status: ${m.map { case (k, v) => s"$k=${v.sortKey}" }.mkString(" ")}"))

    spark.stop()
  }
}
