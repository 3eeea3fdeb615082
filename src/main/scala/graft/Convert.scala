package graft

import graft.core.{Formats, Graph}
import org.apache.spark.sql.SparkSession

/** Format transcoder (the reference's `cayley convert`,
  * /root/reference/cmd/cayley/command/convert.go): read any readable
  * format, write any writable one.
  *
  * Usage: runMain graft.Convert <in> <inFormat> <out> <outFormat>
  *   inFormat:  nquads | json | jsonld | graphml | gml | pq | parquet
  *   outFormat: nquads | json | jsonld | graphml | gml | pq | parquet
  */
object Convert {
  def main(args: Array[String]): Unit = {
    require(args.length == 4,
      "usage: Convert <in> <inFormat> <out> <outFormat>")
    val Array(in, inFmt, out, outFmt) = args
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val g = inFmt match {
      case "nquads" | "ntriples" => Graph.fromNQuads(spark, in)
      case "json"    => Formats.readJsonLines(spark, in)
      case "jsonld"  => Formats.readJsonLd(spark, in)
      case "graphml" => Formats.readGraphml(spark, in)
      case "gml"     => Formats.readGml(spark, in)
      case "pq"      => graft.core.Pquads.readFile(spark, in)
      case "parquet" => Graph.read(spark, in)
      case other => sys.error(s"unreadable format: $other")
    }
    outFmt match {
      case "nquads"   => Formats.writeNQuads(g, out)
      case "ntriples" => Formats.writeNTriples(g, out)
      case "json"     => Formats.writeJsonLines(g, out)
      case "dot" =>
        val w = java.nio.file.Files.newBufferedWriter(
          java.nio.file.Paths.get(out))
        try Formats.writeDot(g, w) finally w.close()
      case "jsonld" =>
        val w = java.nio.file.Files.newBufferedWriter(
          java.nio.file.Paths.get(out))
        try Formats.writeJsonLd(g, w) finally w.close()
      case "graphml" =>
        val w = java.nio.file.Files.newBufferedWriter(
          java.nio.file.Paths.get(out))
        try Formats.writeGraphml(g, w) finally w.close()
      case "gml" =>
        val w = java.nio.file.Files.newBufferedWriter(
          java.nio.file.Paths.get(out))
        try Formats.writeGml(g, w) finally w.close()
      case "pq"      => graft.core.Pquads.writeFile(g, out)
      case "parquet" => g.write(out)
      case other => sys.error(s"unwritable format: $other")
    }
    val (n, q) = g.stats
    println(s"converted $in ($inFmt) -> $out ($outFmt): $n nodes, $q quads")
    spark.stop()
  }
}
