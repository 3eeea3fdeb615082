package graft.analytics

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-stream operators for behavioral / telemetry tables — the
  * "activity" side of a training-data pipeline (session construction,
  * per-session features, semi-structured property extraction). All
  * window-function based: one shuffle on the partition key, then
  * codegen'd sorted-window passes — the plan a 1000-executor cluster
  * wants for a keyed event log.
  */
object Events {
  /** Sessionize: split each user's event stream at inactivity gaps longer
    * than `gapMinutes`. Classic lag + conditional cumulative sum — both
    * windows share the same (user_id, ts) shuffle+sort, so sessionization
    * is ONE exchange end-to-end. Session ids number 1..n per user in time
    * order (deterministic given unique (user, ts)).
    */
  def sessionize(events: DataFrame, userCol: String, tsCol: String,
                 gapMinutes: Int = 30): DataFrame = {
    val byUser = Window.partitionBy(userCol).orderBy(col(tsCol))
    val prevTs = lag(col(tsCol), 1).over(byUser)
    val isNew = when(prevTs.isNull ||
      col(tsCol).cast("long") - prevTs.cast("long") > gapMinutes * 60L, 1L)
      .otherwise(0L)
    events.withColumn("session_id",
      sum(isNew).over(byUser.rowsBetween(Window.unboundedPreceding, 0)))
  }

  /** Per-session features: event count, span seconds, total value —
    * the aggregation that turns a raw log into model-ready session rows.
    * Reuses sessionize's single exchange; the groupBy re-shuffles only
    * (user, session) keys.
    */
  def sessionFeatures(events: DataFrame, userCol: String, tsCol: String,
                      valueCol: String, gapMinutes: Int = 30): DataFrame =
    sessionize(events, userCol, tsCol, gapMinutes)
      .groupBy(col(userCol), col("session_id"))
      .agg(count(lit(1)).as("n_events"),
        (max(col(tsCol)).cast("long") - min(col(tsCol)).cast("long"))
          .as("span_sec"),
        sum(col(valueCol)).as("total_value"))
}
