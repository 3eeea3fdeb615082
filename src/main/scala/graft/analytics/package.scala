package graft

import org.apache.spark.sql.DataFrame

package object analytics {
  /** Stats hygiene for checkpointed loop frames — see
    * [[org.apache.spark.sql.graftbridge.CheckpointBridge]] for the
    * compounding-size-estimate trap. Applied after every eager
    * `localCheckpoint` in this package; a no-op until the carried-over
    * size estimate exceeds Long.MaxValue (at which point broadcast was
    * already impossible, so clamping changes no join decision).
    */
  implicit final class CappedStatsFrame(private val df: DataFrame)
      extends AnyVal {
    def cappedStats: DataFrame =
      org.apache.spark.sql.graftbridge.CheckpointBridge
        .clampCheckpointStats(df)
  }
}
