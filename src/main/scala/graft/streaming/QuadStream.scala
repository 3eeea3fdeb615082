package graft.streaming

import graft.core.{Graph, NQuads, Values}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamWriter
import org.apache.spark.sql.types._

/** Structured-Streaming ingest: the reference's write path
  * (/root/reference/graph/quadwriter.go ApplyDeltas / writer.Single) as a
  * continuous pipeline. N-Quads lines stream in, parse distributes, and
  * each micro-batch lands as dictionary-encoded quad rows. The reference
  * has no streaming *query* operators (SURVEY §1.5) — ingest and
  * event-stream analytics are where Structured Streaming applies.
  */
object QuadStream {
  /** Streaming N-Quads source → (sub, pred, obj, lbl) struct rows. */
  def readNQuadsStream(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    spark.readStream.schema(StructType(Seq(StructField("value", StringType))))
      .text(dir)
      .as[String]
      .flatMap(l => NQuads.parseLine(l).map(Graph.QuadRow(_)))
      .toDF()
  }

  /** Continuous quad append: each micro-batch becomes id-encoded quads in
    * `outDir/quads` (dictionary entries in `outDir/nodes`). Exactly-once
    * via the checkpoint; dedup against history is a batch compaction
    * concern (run `Graph.read(...).addQuads` offline), keeping the hot
    * path append-only — the same split the reference makes between
    * QuadWriter batches and store compaction.
    */
  def writeQuads(parsed: DataFrame, outDir: String,
                 checkpoint: String): DataStreamWriter[org.apache.spark.sql.Row] = {
    def idOf(c: String) = Values.idCol(col(c))
    parsed.writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val quads = batch.select(
          idOf("sub").as("s"), idOf("pred").as("p"), idOf("obj").as("o"),
          when(col("lbl").isNull, lit(null).cast(LongType))
            .otherwise(idOf("lbl")).as("l"))
        quads.write.mode("append").parquet(s"$outDir/quads")
        val nodes = Seq("sub", "pred", "obj", "lbl")
          .map(c => batch.select(col(c).as("v")))
          .reduce(_ unionAll _).where(col("v").isNotNull)
          .select(Values.idCol(col("v")).as("id"), col("v.*"))
          .withColumn("sk", Values.sortKeyCol(col))
          .dropDuplicates("id")
        nodes.write.mode("append").parquet(s"$outDir/nodes")
        ()
      }
      .option("checkpointLocation", checkpoint)
  }

  /** Streaming exact dedup: fingerprint the canonical text and keep the
    * first arrival per fingerprint. With a watermark the dedup state is
    * bounded (fingerprints older than the horizon age out — the standard
    * trade for unbounded streams: duplicates farther apart than the
    * watermark pass through and are caught by the periodic batch dedup
    * compaction).
    */
  def dedupStream(docs: DataFrame, textCol: String, tsCol: String = null,
                  watermark: String = "1 hour"): DataFrame = {
    val fp = docs.withColumn("fp",
      graft.analytics.TextOps.fingerprint(col(textCol)))
    if (tsCol == null) fp.dropDuplicates("fp")
    else fp.withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark("fp")
  }

  /** Event-stream analytics: watermarked tumbling-window counts — the
    * Structured-Streaming form of the batch `q_window` query.
    */
  def windowedEventCounts(events: DataFrame, windowLen: String = "1 hour",
                          watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowLen), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("total_value"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n"), col("total_value"))
}
