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

  /** Streaming Turtle/TriG source → (sub, pred, obj, lbl) struct rows.
    * The streaming unit is the FILE (wholetext — Turtle statements span
    * lines, so a document is not line-splittable; each arriving .ttl
    * file is one parse task in its micro-batch), mirroring
    * [[graft.core.Turtle.read]]'s batch shape. Blank-node labels are
    * salted per file so document scoping survives the stream.
    */
  def readTurtleStream(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    spark.readStream
      .schema(StructType(Seq(StructField("value", StringType))))
      .option("wholetext", "true")
      .text(dir)
      .select(input_file_name().as("f"), col("value"))
      .as[(String, String)]
      .flatMap { case (f, doc) =>
        val salt = java.lang.Long.toHexString(
          scala.util.hashing.MurmurHash3.stringHash(f).toLong & 0xFFFFFFFFL)
        graft.core.Turtle.parse(doc, salt).map(Graph.QuadRow(_))
      }
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

  /** Streaming NEAR-duplicate detection on ingest — the Structured-
    * Streaming form of [[graft.analytics.Dedup.minhashPairs]]' candidate
    * stage. Each arriving document gets its k-band MinHash signature
    * per-row (codegen [[graft.functions.MinHashSig]], bit-identical to
    * the batch signature family, so stream and batch candidates agree);
    * state holds the FIRST arrival per (band, minhash) bucket and later
    * arrivals emit a hit with the signature-estimated Jaccard (fraction
    * of agreeing positions). Approximate by contract: the estimate is the
    * unbiased k-sample Jaccard estimator, and a true near-dup pair is
    * missed only if it agrees on no band (prob (1−j)^k). A doc colliding
    * in several bands emits one hit per band — consumers dedup by id
    * (kept as-is because a second stateful op in the same query is not
    * allowed). State is O(distinct buckets) — for bounded state over
    * endless streams, window the corpus upstream and restart per epoch.
    */
  def nearDupStream(docs: DataFrame, idCol: String, textCol: String,
                    k: Int = 16, shingleN: Int = 3,
                    minEstJaccard: Double = 0.5)
      : org.apache.spark.sql.Dataset[NearDupHit] = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val spark = docs.sparkSession
    import spark.implicits._
    // same shingle construction as Dedup.wordShingleRows, as one array
    // column (the short-doc fallback keeps every doc ≥1 shingle); the
    // transform lambda is interpreted but runs once per row
    val toks = split(graft.analytics.TextOps.normalize(col(textCol)), " ")
    val shArr = when(size(toks) < shingleN, array(array_join(toks, " ")))
      .otherwise(transform(sequence(lit(0), size(toks) - shingleN),
        i => concat_ws(" ", slice(toks, i + lit(1), lit(shingleN)))))
    val banded = docs
      .select(col(idCol).cast("long").as("id"),
        graft.functions.MinHashSig(shArr, k).as("sig"))
      .select(col("id"), col("sig"),
        posexplode(col("sig")).as(Seq("band", "mh")))
      .as[BandedDoc]
    banded.groupByKey(d => (d.band, d.mh))
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.NoTimeout) {
        (_: (Int, Long), batch: Iterator[BandedDoc],
         state: GroupState[BucketState]) =>
          // micro-batch arrivals are unordered — earliest id claims the
          // bucket deterministically
          val arrivals = batch.toSeq.sortBy(_.id)
          var st = state.getOption
          val hits = Seq.newBuilder[NearDupHit]
          for (d <- arrivals) st match {
            case None => st = Some(BucketState(d.id, d.sig))
            case Some(s) if s.firstId == d.id => () // re-ingest of the owner
            case Some(s) =>
              val est = graft.functions.MinHashSig.estJaccard(s.sig, d.sig)
              if (est >= minEstJaccard)
                hits += NearDupHit(d.id, s.firstId, d.band, est)
          }
          st.foreach(state.update)
          hits.result().iterator
      }
  }

  /** Streaming decontamination flag — the Structured-Streaming form of
    * [[graft.analytics.Dedup.decontaminate]]: the benchmark's n-gram
    * hash set (small by definition — it is an eval set) rides as a plan
    * literal, and each arriving document gets a row-local
    * `arrays_overlap` test against its own n-gram hashes. Entirely
    * STATELESS — no aggregation, no watermark, composes with any other
    * single stateful op in the same query — which is why the batch
    * shape (semi-join + groupBy) is restructured rather than reused.
    */
  def contaminationFlags(docs: DataFrame, idCol: String, textCol: String,
                         benchHashes: Seq[Long], n: Int = 8): DataFrame = {
    val toks = split(graft.analytics.TextOps.normalize(col(textCol)), " ")
    val shArr = when(size(toks) < n, array(array_join(toks, " ")))
      .otherwise(transform(sequence(lit(0), size(toks) - n),
        i => concat_ws(" ", slice(toks, i + lit(1), lit(n)))))
    docs.select(col(idCol).as("id"),
      arrays_overlap(transform(shArr, s => xxhash64(s)),
        typedLit(benchHashes)).as("contaminated"))
  }

  /** Collect a benchmark's n-gram hashes for [[contaminationFlags]]
    * (driver-side; run once per eval set, reuse across streams). Eval
    * sets are small BY DEFINITION — the collect is guarded so a misuse
    * ("bench = the whole corpus") fails loudly instead of OOMing the
    * driver; raise `maxHashes` deliberately if an eval set really is
    * that large.
    */
  def benchNgramHashes(bench: DataFrame, idCol: String, textCol: String,
                       n: Int = 8, maxHashes: Long = 50_000_000L): Seq[Long] = {
    import bench.sparkSession.implicits._
    // single evaluation: collect once, check the collected size — a
    // count() guard before collect() would run the shingle/distinct
    // pipeline twice. Eval sets are small by definition, so collecting
    // first is safe; toLocalIterator caps driver exposure at maxHashes
    // even when the guard is about to fire.
    val it = graft.analytics.Dedup
      .wordShingleRows(bench, idCol, textCol, n)
      .select(col("h")).distinct().as[Long].toLocalIterator()
    val buf = scala.collection.mutable.ArrayBuffer.empty[Long]
    while (it.hasNext) {
      require(buf.length < maxHashes,
        s"benchNgramHashes: over $maxHashes distinct n-gram hashes — " +
          "this collects to the driver and is meant for EVAL sets, not " +
          "corpora; raise maxHashes only if that is intentional")
      buf += it.next()
    }
    buf.toSeq
  }

  /** Streaming count-min sketch: the same depth×width counter grid as
    * [[graft.analytics.TextOps.countMinSketch]], maintained as a
    * Structured-Streaming aggregation — the sketch state is exactly
    * depth×width long counters regardless of stream length, and because
    * the cells are EXACT sums the streamed sketch equals the batch
    * sketch over the same documents row-for-row (the `stream_cms`
    * contract), not approximately. Run with `outputMode("complete")`:
    * the sink always holds the current whole sketch.
    */
  def cmsStream(docs: DataFrame, textCol: String, depth: Int = 4,
                width: Int = 2048): DataFrame =
    docs.select(explode(split(
        graft.analytics.TextOps.normalize(col(textCol)), " ")).as("term"))
      .where(length(col("term")) > 0)
      .select(posexplode(array((0 until depth).map(j =>
        pmod(xxhash64(col("term"), lit(j)), lit(width.toLong))): _*))
        .as(Seq("j", "c")))
      .groupBy("j", "c").agg(count(lit(1)).as("cnt"))

  /** Streaming HyperLogLog: the same 64 (bucket, max-ρ) register cells
    * as the batch [[graft.analytics.TextOps.hllRegisters]], maintained
    * as a complete-mode max aggregation — register max is mergeable, so
    * the streamed sketch equals the batch sketch over the same corpus
    * cell-for-cell (the `stream_cms` hard-equality pattern; state is 64
    * longs regardless of stream length). Only touched buckets appear
    * (every touched bucket has ρ ≥ 1; the batch form's range(64) join
    * fills the rest with 0).
    */
  def hllStream(docs: DataFrame, textCol: String): DataFrame =
    graft.analytics.TextOps.hllBucketRho(docs, textCol)
      .groupBy("bucket").agg(max("rho").as("register"))

  /** Streaming quantile sketch: the (token-count value → count)
    * histogram of the SAME deterministic md5-hash document sample as
    * [[graft.analytics.TextOps.hashSampleQuantiles]], maintained as a
    * complete-mode streaming aggregation. The histogram determines the
    * batch deciles exactly (decile d = min value whose cumulative count
    * reaches ⌈d·n/10⌉), and because the sample filter is row-local and
    * the counts exact longs, the streamed histogram equals the batch
    * histogram over the same documents cell-for-cell — the `stream_cms`
    * equality pattern, giving a hard streaming contract rather than a
    * recall-style one. State is O(distinct sampled values), independent
    * of stream length.
    */
  def quantileSampleStream(docs: DataFrame, idCol: String,
                           textCol: String, denom: Int = 16): DataFrame =
    docs.select(
        graft.analytics.TextOps.tokenCount(col(textCol))
          .cast("long").as("v"),
        col(idCol).cast("long").as("doc_id"))
      .where(pmod(graft.analytics.Dedup.tokenHash(
        col("doc_id").cast("string")), lit(denom.toLong)) === 0)
      .groupBy("v").agg(count(lit(1)).as("cnt"))

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

  /** Streaming sessionization — the Structured-Streaming form of the batch
    * [[graft.analytics.Events.sessionize]]: per-user custom state via
    * flatMapGroupsWithState (the lag+cumsum window trick needs the whole
    * history; streams keep only (lastTs, sessionSeq) per user). Emits one
    * row per closed session when the inactivity gap passes or the
    * watermark times the user out. State is O(active users), the
    * partitioning is the same user-key shuffle as the batch form.
    */
  def sessionizeStream(events: org.apache.spark.sql.Dataset[SessionEvent],
                       gapMinutes: Int = 30)
      : org.apache.spark.sql.Dataset[SessionRow] = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val spark = events.sparkSession
    import spark.implicits._
    val gapMs = gapMinutes * 60000L
    events
      .withWatermark("ts", s"$gapMinutes minutes")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout) {
        (user: Long, batch: Iterator[SessionEvent],
         state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator(SessionRow(user, s.seq, s.n,
              (s.lastMs - s.firstMs) / 1000, s.firstMs))
          } else {
            // events within a micro-batch arrive unordered — sort by time
            // (driver never sees them; this is per-group, executor-side)
            val evs = batch.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
            var st = state.getOption.getOrElse(SessionState(0L, -1L, -1L, 0L))
            val closed = Seq.newBuilder[SessionRow]
            for (e <- evs) {
              val t = e.ts.getTime
              if (st.n == 0L) st = SessionState(st.seq + 1, t, t, 1L)
              else if (t - st.lastMs > gapMs) {
                closed += SessionRow(user, st.seq, st.n,
                  (st.lastMs - st.firstMs) / 1000, st.firstMs)
                st = SessionState(st.seq + 1, t, t, 1L)
              } else st = st.copy(lastMs = t, n = st.n + 1)
            }
            state.update(st)
            state.setTimeoutTimestamp(st.lastMs + gapMs)
            closed.result().iterator
          }
      }
  }

  /** Streaming as-of enrichment — the stream form of the batch
    * [[graft.analytics.Events.asofJoin]]: a keyed stream of reference
    * updates (side 0) and events (side 1) in one union; each event emits
    * with the newest reference payload whose ts <= the event's ts among
    * rows SEEN SO FAR. State per key is a single (rts, rid, payload)
    * triple — O(active keys), not O(history) — and the shuffle is the
    * same one-key exchange as the batch plan.
    *
    * Semantics note (documented divergence from batch): a reference row
    * arriving after an event has already been emitted does NOT
    * retroactively re-enrich it — exact-as-of only holds for arrivals
    * that are in event-time order per key ACROSS micro-batches (within a
    * batch, rows are applied in (ts, side, tie) order, references before
    * events at equal ts, so in-batch disorder is absorbed). The batch
    * asofJoin is the exact backfill for late data; this operator is the
    * low-latency head of that lambda pair. Events with no qualifying
    * reference yet emit ref_id = -1 (left-outer flavor: dropping them
    * would silently hide cold-start keys).
    */
  def enrichAsofStream(rows: org.apache.spark.sql.Dataset[EnrichInput])
      : org.apache.spark.sql.Dataset[EnrichedRow] = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val spark = rows.sparkSession
    import spark.implicits._
    rows
      .groupByKey(_.key)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.NoTimeout) {
        (key: Long, batch: Iterator[EnrichInput],
         state: GroupState[EnrichState]) =>
          val evs = batch.toSeq
            .sortBy(e => (e.ts.getTime, e.side, e.row_id))
          var st = state.getOption.orNull
          val out = Seq.newBuilder[EnrichedRow]
          for (e <- evs) {
            if (e.side == 0) {
              // newest-wins on (ts, row_id): deterministic under equal ts
              if (st == null || e.ts.getTime > st.rts ||
                (e.ts.getTime == st.rts && e.row_id > st.rid))
                st = EnrichState(e.ts.getTime, e.row_id, e.payload)
            } else {
              if (st != null && st.rts <= e.ts.getTime)
                out += EnrichedRow(e.row_id, key, st.rid, st.payload)
              else out += EnrichedRow(e.row_id, key, -1L, 0.0)
            }
          }
          if (st != null) state.update(st)
          out.result().iterator
      }
  }
}

/** One banded signature row for [[QuadStream.nearDupStream]]. */
final case class BandedDoc(id: Long, sig: Seq[Long], band: Int, mh: Long)

/** First-arrival owner of an LSH bucket. */
final case class BucketState(firstId: Long, sig: Seq[Long])

/** A streaming near-dup candidate: `id` matched `dup_of` in `band`. */
final case class NearDupHit(id: Long, dup_of: Long, band: Int,
                            est_jaccard: Double)

/** Input row for [[QuadStream.sessionizeStream]]. */
final case class SessionEvent(event_id: Long, user_id: Long,
                              ts: java.sql.Timestamp)

/** Per-user session progress: monotone session seq, first/last event
  * millis, event count.
  */
final case class SessionState(seq: Long, firstMs: Long, lastMs: Long, n: Long)

/** One closed session. `session_id` numbers sessions per user within
  * one LIFETIME of the user's state: an event-time timeout removes the
  * state (keeping it would make state O(every user ever seen) instead
  * of O(active)), so the counter restarts at 1 if the user returns
  * later. `first_ms` — the session's first-event time — is the durable
  * session identity; (user_id, first_ms) is unique and is what the
  * batch-equality contract joins on.
  */
final case class SessionRow(user_id: Long, session_id: Long, n_events: Long,
                            span_sec: Long, first_ms: Long)

/** Input row for [[QuadStream.enrichAsofStream]]: side 0 = reference
  * update, side 1 = event to enrich; `row_id` is the reference id or
  * event id respectively (also the equal-ts tie-break).
  */
final case class EnrichInput(key: Long, ts: java.sql.Timestamp, side: Int,
                             row_id: Long, payload: Double)

/** Newest reference row seen so far for one key. */
final case class EnrichState(rts: Long, rid: Long, payload: Double)

/** One enriched event; `ref_id` = -1 when no reference qualified yet. */
final case class EnrichedRow(event_id: Long, key: Long, ref_id: Long,
                             payload: Double)
