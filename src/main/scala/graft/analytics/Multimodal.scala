package graft.analytics

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal columns: images/audio/video travel as opaque `binary`
  * columns next to typed metadata, and per-item decode/feature work runs
  * partition-at-a-time so decoder state (a codec context, a model handle)
  * is initialized once per partition, not per row — the Scala analog of
  * a Pandas-UDF-over-`mapInPandas` pipeline stage.
  *
  * The decoders themselves are STUBBED (this container ships no image/
  * audio codecs): `stubDecode` derives deterministic fake pixels from the
  * bytes. The Spark-side plumbing — schema, batching, partition-level
  * init, output shape — is real and tested; swapping in a real codec
  * changes only the function body.
  */
object Multimodal {
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("kind", StringType),     // image | audio | video
    StructField("payload", BinaryType),  // opaque encoded bytes
    StructField("meta", StructType(Seq(  // typed metadata, no decode needed
      StructField("width", IntegerType), StructField("height", IntegerType),
      StructField("sample_rate", IntegerType),
      StructField("duration_ms", LongType))))))

  final case class MediaFeatures(media_id: Long, kind: String,
                                 n_bytes: Long, feature: Array[Float])

  /** STUB decode: a real implementation would parse the codec here.
    * Deterministic fake: 8 "features" folded from the payload bytes.
    */
  private def stubDecode(payload: Array[Byte]): Array[Float] = {
    val f = new Array[Float](8)
    var i = 0
    while (i < payload.length) {
      f(i % 8) += (payload(i) & 0xFF) / 255.0f
      i += 1
    }
    f
  }

  /** Partition-at-a-time feature extraction. The `mapPartitions` boundary
    * is where per-partition decoder initialization belongs (expensive
    * setup amortized across the partition — same motivation as batching
    * in `mapInPandas`).
    */
  def extractFeatures(media: DataFrame): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.select("media_id", "kind", "payload").as[(Long, String, Array[Byte])]
      .mapPartitions { rows =>
        // real impl: val decoder = Codec.open(...)  — once per partition
        rows.map { case (id, kind, payload) =>
          val bytes = if (payload == null) Array.empty[Byte] else payload
          MediaFeatures(id, kind, bytes.length.toLong, stubDecode(bytes))
        }
      }
  }

  /** Metadata-only operations stay pure column expressions — filtering by
    * resolution/duration must prune without touching payload bytes
    * (column pruning keeps the binary column out of the scan entirely).
    */
  def filterByResolution(media: DataFrame, minW: Int, minH: Int): DataFrame =
    media.where(col("meta.width") >= minW && col("meta.height") >= minH)

  /** Deterministic frame sampling for video rows: pick every k-th frame
    * index below the (metadata) frame count — planning which frames to
    * decode is metadata math; only the chosen frames would hit the codec.
    */
  def sampleFrameIndexes(media: DataFrame, everyMs: Long): DataFrame =
    media.where(col("kind") === "video")
      .select(col("media_id"),
        sequence(lit(0L), greatest(col("meta.duration_ms") - 1, lit(0L)),
          lit(everyMs)).as("frame_ts_ms"))
}
