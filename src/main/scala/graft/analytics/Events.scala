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
  /** Epoch seconds for any timestamp flavor. Parquet timestamps without
    * isAdjustedToUTC read back as TIMESTAMP_NTZ in Spark 4, which ANSI
    * refuses to cast straight to BIGINT — route through TIMESTAMP first
    * (the session zone is pinned to UTC project-wide, so NTZ is
    * interpreted as UTC, matching DuckDB's epoch(ts); a no-op for LTZ
    * and for columns that are already numeric).
    */
  private def epochSecs(c: org.apache.spark.sql.Column) =
    c.cast("timestamp").cast("long")

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
      epochSecs(col(tsCol)) - epochSecs(prevTs) > gapMinutes * 60L, 1L)
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
        (epochSecs(max(col(tsCol))) - epochSecs(min(col(tsCol))))
          .as("span_sec"),
        sum(col(valueCol)).as("total_value"))

  /** As-of join: attach to each left row the newest right row for the same
    * key with `rightTs <= leftTs` (ties at equal rightTs resolved to the
    * largest `tieCol`, so the result is fully deterministic). Left rows
    * with no qualifying right row are dropped (inner as-of semantics).
    *
    * Spark has no native as-of operator; the naive encodings are a range
    * join (explodes to every (left, earlier-right) candidate pair — the
    * 95 k-candidate blow-up even at toy scale) or a per-row subquery
    * (driver-bound). This is the union-and-window plan instead: both
    * sides shuffle ONCE on the key into the same exchange, one sort by
    * (ts, side, tie) places every right row before the left rows it may
    * serve, and `last(payload, ignoreNulls=true)` carries the newest
    * right payload forward within the key partition. Cost at any scale =
    * 1 shuffle + 1 sort-based window over |L|+|R| rows — never a pair
    * blow-up; skew is governed by the key distribution alone (salt-split
    * a pathological key upstream if needed, as capPerKey does).
    *
    * Right rows with null `rightTs` are ignored (no "as of never").
    */
  def asofJoin(left: DataFrame, right: DataFrame,
               leftKey: String, rightKey: String,
               leftTs: String, rightTs: String, tieCol: String,
               payloadCols: Seq[String]): DataFrame = {
    val payload = struct(payloadCols.map(col): _*)
    val rSide = right.where(col(rightTs).isNotNull).select(
      col(rightKey).as("__k"), col(rightTs).cast("timestamp").as("__ts"),
      lit(0).as("__side"), col(tieCol).cast("long").as("__tie"),
      payload.as("__p"), lit(null).cast(structTypeOf(left)).as("__l"))
    val lSide = left.select(
      col(leftKey).as("__k"), col(leftTs).cast("timestamp").as("__ts"),
      lit(1).as("__side"), lit(null).cast("long").as("__tie"),
      lit(null).cast(rSide.schema("__p").dataType).as("__p"),
      struct(left.columns.map(col): _*).as("__l"))
    val w = Window.partitionBy("__k")
      .orderBy(col("__ts"), col("__side"), col("__tie"))
      .rowsBetween(Window.unboundedPreceding, 0)
    rSide.unionByName(lSide)
      .withColumn("__last", last(col("__p"), ignoreNulls = true).over(w))
      .where(col("__side") === 1 && col("__last").isNotNull)
      .select(col("__l.*") +: payloadCols.map(c => col(s"__last.$c")): _*)
  }

  /** Funnel analysis: per user, the earliest completion time of an
    * ordered step sequence (strictly increasing timestamps; event k
    * counts only if the k-1 prefix completed strictly before it).
    * Single (user, ts) exchange: one shuffle + one sort, then one chained
    * window column per step over the SAME frame (unboundedPreceding, -1)
    * — `__p_k` = earliest prefix-k completion before the current row, so
    * step-k rows qualify iff `__p_k` is set. The naive encoding is a
    * k-way self-join (cubic candidate blow-up for 3 steps — exactly what
    * the DuckDB oracle does at toy scale); this plan is linear in events
    * per user regardless of k. Returns (user, completed_us) for users
    * who complete the funnel, in epoch microseconds (NTZ-safe via the
    * same UTC routing as [[sessionize]]).
    */
  def funnel(events: DataFrame, userCol: String, tsCol: String,
             typeCol: String, steps: Seq[String]): DataFrame = {
    require(steps.nonEmpty, "funnel: empty step list")
    val w = Window.partitionBy(userCol).orderBy(col("__ts"))
      .rowsBetween(Window.unboundedPreceding, -1)
    var df = events.select(col(userCol),
      col(tsCol).cast("timestamp").as("__ts"), col(typeCol).as("__t"))
    var completion: org.apache.spark.sql.Column =
      when(col("__t") === steps.head, col("__ts"))
    for (i <- 1 until steps.length) {
      df = df.withColumn(s"__p$i", min(completion).over(w))
      completion = when(col("__t") === steps(i) &&
        col(s"__p$i").isNotNull, col("__ts"))
    }
    df.withColumn("__c", completion)
      .groupBy(col(userCol))
      .agg(min(unix_micros(col("__c"))).as("completed_us"))
      .where(col("completed_us").isNotNull)
  }

  /** Keyed interval-containment join: match each left row `(key, ts)` to
    * every right row `(key, [start, end))` whose half-open interval
    * contains `ts`. The third temporal primitive next to [[sessionize]]
    * and [[asofJoin]] — and one Spark's equi-join machinery cannot
    * express directly: a raw `ts BETWEEN start AND end` condition joins
    * only on the key and degenerates into a per-key cartesian filter
    * (every event × every interval of that key), exactly the blow-up the
    * 95 k-candidate as-of oracle shows at toy scale.
    *
    * Plan: quantize time into `bucketSeconds` buckets. The left side maps
    * each row to the single bucket containing its ts; the right side
    * explodes each interval into the buckets it covers (`sequence()` —
    * span/bucketSeconds + 1 rows, codegen'd). An equi-join on
    * (key, bucket) then bounds candidates to rows that genuinely overlap
    * in time, and the exact containment filter runs on those candidates
    * only. Every matching pair shares exactly ONE bucket — the bucket of
    * the left ts — so the join produces no duplicates and needs no
    * dedup/distinct after the filter. Cost: one shuffle per side on
    * (key, bucket); hot keys with time-spread activity land in different
    * buckets instead of one reduce task. Choose `bucketSeconds` near the
    * typical interval span: much smaller multiplies the right-side
    * explode, much larger degrades toward the per-key cartesian.
    *
    * Timestamps go through the same NTZ-safe epoch conversion as
    * [[sessionize]]; intervals with `end <= start` match nothing.
    */
  /** Cohort retention: users grouped by first-activity week (UTC,
    * Monday-truncated); output = distinct users from each cohort active
    * `week_offset` weeks later — the product-analytics matrix every
    * event warehouse reports. Plan: one (user) aggregate for cohorts,
    * one broadcast-or-shuffle join back, one distinct + one aggregate
    * on (cohort, offset) — all hash exchanges on keys that shrink fast;
    * offsets are exact integer arithmetic on week-truncated epochs
    * (both engines' `date_trunc('week')` is ISO Monday, so the oracle
    * matches value-for-value).
    */
  def retention(events: DataFrame, userCol: String,
                tsCol: String): DataFrame = {
    val weeks = events.select(col(userCol).as("user"),
      date_trunc("week", col(tsCol)).as("wk"))
    val cohorts = weeks.groupBy("user").agg(min("wk").as("cohort_week"))
    weeks.join(cohorts, "user")
      .select(col("cohort_week"),
        floor((epochSecs(col("wk")) - epochSecs(col("cohort_week"))) /
          604800L).cast("long").as("week_offset"), col("user"))
      .distinct()
      .groupBy("cohort_week", "week_offset")
      .agg(count(lit(1)).as("n_users"))
  }

  /** First-order transition counts of a per-key event sequence
    * (the Markov-chain model of user behavior a recommender or
    * anomaly detector trains on): for each key's events in (ts, tie)
    * order, count (state → next state) transitions. ONE (key, ts)
    * exchange — the lag window reuses the sessionize layout — then a
    * tiny aggregate on (from, to). Deterministic under ts ties via the
    * tie column.
    */
  def transitions(events: DataFrame, keyCol: String, tsCol: String,
                  stateCol: String, tieCol: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(keyCol).orderBy(col(tsCol), col(tieCol))
    events.withColumn("__next", lead(col(stateCol), 1).over(w))
      .where(col("__next").isNotNull)
      .groupBy(col(stateCol).as("from_state"),
        col("__next").as("to_state"))
      .agg(count(lit(1)).as("n"))
  }

  def intervalJoin(left: DataFrame, right: DataFrame,
                   leftKey: String, rightKey: String, tsCol: String,
                   startCol: String, endCol: String,
                   rightCols: Seq[String],
                   bucketSeconds: Long = 86400L): DataFrame = {
    require(bucketSeconds > 0, "intervalJoin: bucketSeconds must be > 0")
    val ts = epochSecs(col(tsCol))
    val lhs = left.withColumn("__b", floor(ts / bucketSeconds))
      .withColumn("__ts", ts)
    val s0 = epochSecs(col(startCol)); val e0 = epochSecs(col(endCol))
    val rhs = right
      .where(s0.isNotNull && e0.isNotNull && e0 > s0)
      .select(col(rightKey).as("__rk"), s0.as("__s"), e0.as("__e"),
        struct(rightCols.map(col): _*).as("__p"))
      // end is exclusive: a touching interval [s, e) never covers bucket
      // floor(e/b) unless e is strictly inside it
      .withColumn("__b", explode(sequence(
        floor(col("__s") / bucketSeconds),
        floor((col("__e") - 1) / bucketSeconds))))
    lhs.join(rhs, lhs("__b") === rhs("__b") &&
        col(leftKey) === col("__rk") &&
        col("__ts") >= col("__s") && col("__ts") < col("__e"))
      .select(left.columns.map(lhs(_)) ++ rightCols.map(c => col(s"__p.$c")): _*)
  }

  private def structTypeOf(df: DataFrame): org.apache.spark.sql.types.StructType =
    org.apache.spark.sql.types.StructType(df.schema.fields)
}
