package graft.streaming

import graft.TestSpark
import graft.analytics.Multimodal
import graft.core.{Graph, QValue}
import graft.exec.Exec
import graft.path.Path
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

class StreamingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("streaming N-Quads ingest lands queryable dictionary-encoded quads") {
    val tmp = Files.createTempDirectory("graft-stream").toString
    val inDir = s"$tmp/in"; val outDir = s"$tmp/out"; val ckpt = s"$tmp/ckpt"
    new java.io.File(inDir).mkdirs()
    Files.writeString(java.nio.file.Paths.get(s"$inDir/batch1.nq"),
      "<a> <knows> <b> .\n<b> <knows> <c> .\n")

    val parsed = QuadStream.readNQuadsStream(spark, inDir)
    val q = QuadStream.writeQuads(parsed, outDir, ckpt).start()
    q.processAllAvailable()

    // second batch arrives
    Files.writeString(java.nio.file.Paths.get(s"$inDir/batch2.nq"),
      "<c> <knows> <d> .\n")
    q.processAllAvailable()
    q.stop()

    val g = Graph(spark.read.parquet(s"$outDir/nodes").dropDuplicates("id"),
      spark.read.parquet(s"$outDir/quads"))
    val got = Exec.run(g,
      Path.start(QValue.Iri("a")).followRecursive(QValue.Iri("knows")))
      .values().map(_.sortKey).sorted
    assert(got === Seq("<b>", "<c>", "<d>"))
  }

  test("streaming Turtle ingest: per-file micro-batches, scoped bnodes") {
    val tmp = Files.createTempDirectory("graft-ttlstream").toString
    val inDir = s"$tmp/in"; val outDir = s"$tmp/out"; val ckpt = s"$tmp/ckpt"
    new java.io.File(inDir).mkdirs()
    Files.writeString(java.nio.file.Paths.get(s"$inDir/doc1.ttl"),
      "@prefix ex: <http://e/> .\nex:a ex:knows ex:b , _:h .\n" +
        "_:h ex:name \"anon one\" .\n")

    val parsed = QuadStream.readTurtleStream(spark, inDir)
    val q = QuadStream.writeQuads(parsed, outDir, ckpt).start()
    q.processAllAvailable()
    // second file reuses the label _:h — document scoping must keep it
    // a DISTINCT node (per-file salt), exactly like the batch reader
    Files.writeString(java.nio.file.Paths.get(s"$inDir/doc2.ttl"),
      "@prefix ex: <http://e/> .\nex:b ex:knows _:h .\n" +
        "_:h ex:name \"anon two\" .\n")
    q.processAllAvailable()
    q.stop()

    val g = Graph(spark.read.parquet(s"$outDir/nodes").dropDuplicates("id"),
      spark.read.parquet(s"$outDir/quads"))
    val got = Exec.run(g,
      Path.start(QValue.Iri("http://e/a"))
        .followRecursive(QValue.Iri("http://e/knows"))
        .out(QValue.Iri("http://e/name")))
      .values().map(_.sortKey).sorted
    assert(got === Seq("anon one", "anon two"))
    assert(g.quads.count() === 5)
  }

  test("windowed event counts run as a structured stream") {
    import spark.implicits._
    val tmp = Files.createTempDirectory("graft-events").toString
    val data = Seq(
      ("2026-01-01 10:05:00", "click", 1.0),
      ("2026-01-01 10:25:00", "click", 2.0),
      ("2026-01-01 11:10:00", "view", 3.0))
      .toDF("ts_s", "event_type", "value")
      .select(col("ts_s").cast("timestamp").as("ts"), col("event_type"),
        col("value"))
    data.write.mode("overwrite").parquet(s"$tmp/in")

    val stream = spark.readStream.schema(data.schema).parquet(s"$tmp/in")
    val agg = QuadStream.windowedEventCounts(stream, "1 hour", "2 hours")
    val q = agg.writeStream.outputMode("complete")
      .format("memory").queryName("win_counts").start()
    q.processAllAvailable()
    q.stop()
    val rows = spark.sql("SELECT event_type, n FROM win_counts ORDER BY 1")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(rows === Seq(("click", 2L), ("view", 1L)))
  }

  test("streaming CMS equals the batch sketch cell-for-cell") {
    import spark.implicits._
    import graft.analytics.TextOps
    val tmp = Files.createTempDirectory("graft-scms").toString
    val docs = Seq((1L, "aa bb aa"), (2L, "bb cc dd"), (3L, "aa dd ee"))
      .toDF("doc_id", "text")
    docs.where(col("doc_id") <= 2).write.mode("overwrite")
      .parquet(s"$tmp/in")
    val stream = spark.readStream.schema("doc_id bigint, text string")
      .parquet(s"$tmp/in")
    val q = QuadStream.cmsStream(stream, "text", depth = 3, width = 16)
      .writeStream.outputMode("complete").format("memory")
      .queryName("scms").start()
    q.processAllAvailable()
    docs.where(col("doc_id") === 3).write.mode("append").parquet(s"$tmp/in")
    q.processAllAvailable(); q.stop()
    val streamed = spark.sql("SELECT j, c, cnt FROM scms")
      .as[(Int, Long, Long)].collect().toSet
    val batch = TextOps.countMinSketch(TextOps.wordCounts(docs, "text"),
      depth = 3, width = 16).as[(Int, Long, Long)].collect().toSet
    assert(streamed === batch && batch.nonEmpty)
  }

  test("streaming quantile histogram equals the batch sample cell-for-cell") {
    import spark.implicits._
    import graft.analytics.{Dedup, TextOps}
    val tmp = Files.createTempDirectory("graft-squant").toString
    val docs = (1L to 120L).map(i =>
      (i, (0 until (i % 7).toInt + 1).map(_ => "w").mkString(" ")))
      .toDF("doc_id", "text")
    docs.where(col("doc_id") <= 60).write.mode("overwrite")
      .parquet(s"$tmp/in")
    val stream = spark.readStream.schema("doc_id bigint, text string")
      .parquet(s"$tmp/in")
    val q = QuadStream.quantileSampleStream(stream, "doc_id", "text",
        denom = 4)
      .writeStream.outputMode("complete").format("memory")
      .queryName("squant").start()
    q.processAllAvailable()
    docs.where(col("doc_id") > 60).write.mode("append").parquet(s"$tmp/in")
    q.processAllAvailable(); q.stop()
    val streamed = spark.sql("SELECT v, cnt FROM squant")
      .as[(Long, Long)].collect().toSet
    val batch = docs
      .select(col("doc_id"), TextOps.tokenCount(col("text"))
        .cast("long").as("v"))
      .where(pmod(Dedup.tokenHash(col("doc_id").cast("string")),
        lit(4L)) === 0)
      .groupBy("v").agg(count(lit(1)).as("cnt"))
      .as[(Long, Long)].collect().toSet
    assert(streamed === batch && batch.nonEmpty)
  }

  test("streaming sessionization closes sessions at the inactivity gap") {
    import spark.implicits._
    val tmp = Files.createTempDirectory("graft-sess").toString
    def ts(min: Int) = new java.sql.Timestamp(1700000000000L + min * 60000L)
    val data = Seq(
      SessionEvent(1L, 10L, ts(0)), SessionEvent(2L, 10L, ts(10)),
      SessionEvent(3L, 10L, ts(50)),  // closes session 1 (gap 40)
      SessionEvent(4L, 10L, ts(300)), // closes session 2 (gap 250)
      SessionEvent(5L, 20L, ts(0))    // user 20: stays open
    ).toDS()
    data.write.mode("overwrite").parquet(s"$tmp/in")
    val stream = spark.readStream.schema(data.schema).parquet(s"$tmp/in")
      .as[SessionEvent]
    val q = QuadStream.sessionizeStream(stream, gapMinutes = 30)
      .writeStream.outputMode("append").format("memory")
      .queryName("sessions").start()
    q.processAllAvailable()
    q.stop()
    val rows = spark.sql(
        "SELECT user_id, session_id, n_events, span_sec FROM sessions")
      .as[(Long, Long, Long, Long)].collect().toSet
    // sessions 1 and 2 of user 10 close on in-batch gaps; user 20's lone
    // session closes via EVENT-TIME TIMEOUT (watermark = maxTs − gap =
    // t270 passes its t30 deadline); user 10 session 3 (t300, deadline
    // t330) is still open and stays in state
    assert(rows === Set((10L, 1L, 2L, 600L), (10L, 2L, 1L, 0L),
      (20L, 1L, 1L, 0L)))
  }

  test("streaming as-of enrich applies newest-at-or-before reference") {
    import spark.implicits._
    val tmp = Files.createTempDirectory("graft-enrich").toString
    def ts(min: Int) = new java.sql.Timestamp(1700000000000L + min * 60000L)
    // one micro-batch, deliberately out of order: in-batch rows must be
    // applied in (ts, side, tie) order — references before events
    val data = Seq(
      EnrichInput(10L, ts(20), 1, 101L, 0.0),  // event after ref@10 -> 1.0
      EnrichInput(10L, ts(10), 0, 1L, 1.0),
      EnrichInput(10L, ts(30), 0, 2L, 2.0),
      EnrichInput(10L, ts(30), 0, 3L, 3.0),    // equal ts: larger id wins
      EnrichInput(10L, ts(40), 1, 102L, 0.0),  // -> ref 3
      EnrichInput(10L, ts(5), 1, 100L, 0.0),   // before any ref -> -1
      EnrichInput(20L, ts(50), 1, 200L, 0.0)   // key with no refs -> -1
    ).toDS()
    data.write.mode("overwrite").parquet(s"$tmp/in")
    val stream = spark.readStream.schema(data.schema).parquet(s"$tmp/in")
      .as[EnrichInput]
    val q = QuadStream.enrichAsofStream(stream)
      .writeStream.outputMode("append").format("memory")
      .queryName("enriched").start()
    q.processAllAvailable()
    // second micro-batch: state carries the newest reference across
    // batches; a late event before the held ref still enriches with it
    Seq(EnrichInput(10L, ts(60), 1, 103L, 0.0),
      EnrichInput(10L, ts(35), 1, 104L, 0.0)).toDS()
      .write.mode("append").parquet(s"$tmp/in")
    q.processAllAvailable()
    q.stop()
    val rows = spark.sql(
        "SELECT event_id, key, ref_id, payload FROM enriched")
      .as[(Long, Long, Long, Double)].collect().toSet
    assert(rows === Set(
      (100L, 10L, -1L, 0.0), (101L, 10L, 1L, 1.0), (102L, 10L, 3L, 3.0),
      (200L, 20L, -1L, 0.0), (103L, 10L, 3L, 3.0), (104L, 10L, 3L, 3.0)))
  }

  test("streaming dedup keeps first arrival per fingerprint") {
    import spark.implicits._
    val tmp = Files.createTempDirectory("graft-sdedup").toString
    Seq(
      ("2026-01-01 10:00:00", 1L, "the same doc"),
      ("2026-01-01 10:01:00", 2L, "The  Same doc"), // same canonical form
      ("2026-01-01 10:02:00", 3L, "a different doc"))
      .toDF("ts_s", "doc_id", "text")
      .select(col("ts_s").cast("timestamp").as("ts"), col("doc_id"), col("text"))
      .write.mode("overwrite").parquet(s"$tmp/in")
    val stream = spark.readStream
      .schema("ts timestamp, doc_id bigint, text string").parquet(s"$tmp/in")
    val q = QuadStream.dedupStream(stream, "text", "ts")
      .writeStream.outputMode("append").format("memory")
      .queryName("sdedup").start()
    q.processAllAvailable()
    q.stop()
    val kept = spark.sql("SELECT doc_id FROM sdedup")
      .collect().map(_.getLong(0)).toSet
    assert(kept.size === 2)
    assert(kept.contains(3L))
    assert(kept.intersect(Set(1L, 2L)).size === 1)
  }

  test("streaming near-dup: stateful LSH flags the dup, spares the rest") {
    import spark.implicits._
    val tmp = Files.createTempDirectory("graft-sneardup").toString
    val base = "the quick brown fox jumps over the lazy dog near the river bank"
    Seq(
      (0L, s"$base today and every day"),
      (1L, s"$base today and every night"), // near-dup of 0
      (2L, "completely unrelated content about database query engines"),
      (3L, s"$base today and every day")) // exact dup of 0
      .toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$tmp/in")
    val stream = spark.readStream
      .schema("doc_id bigint, text string").parquet(s"$tmp/in")
    val q = QuadStream.nearDupStream(stream, "doc_id", "text",
        k = 16, minEstJaccard = 0.5)
      .writeStream.outputMode("append").format("memory")
      .queryName("sneardup").start()
    q.processAllAvailable()
    q.stop()
    val hits = spark.sql("SELECT id, dup_of, est_jaccard FROM sneardup")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    // each flagged doc resolves to one earliest owner; 2 never appears
    val byId = hits.groupBy(_._1)
    assert(byId.keySet.subsetOf(Set(1L, 3L)))
    assert(byId.contains(3L) && byId(3L).forall(h => h._2 === 0L && h._3 === 1.0))
    assert(byId.contains(1L) && byId(1L).forall(_._2 === 0L))
    assert(!hits.exists(h => h._1 === 2L || h._2 === 2L))
  }

  test("streaming decontamination: stateless flag matches the batch op") {
    import spark.implicits._
    val tmp = Files.createTempDirectory("graft-sdecon").toString
    val leak = "alpha bravo charlie delta echo foxtrot golf hotel india juliet"
    Seq(
      (0L, s"prefix words then $leak and a suffix"),
      (1L, "totally clean document with none of the benchmark grams at all"))
      .toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$tmp/in")
    val bench = Seq((100L, leak)).toDF("doc_id", "text")
    val hashes = QuadStream.benchNgramHashes(bench, "doc_id", "text", n = 8)
    assert(hashes.nonEmpty)
    val stream = spark.readStream
      .schema("doc_id bigint, text string").parquet(s"$tmp/in")
    val q = QuadStream.contaminationFlags(stream, "doc_id", "text", hashes)
      .writeStream.outputMode("append").format("memory")
      .queryName("sdecon").start()
    q.processAllAvailable()
    q.stop()
    val flags = spark.sql("SELECT id, contaminated FROM sdecon")
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(flags === Map(0L -> true, 1L -> false))
  }

  test("streaming MinHashSig equals the batch signature aggregate") {
    import spark.implicits._
    val docs = Seq(
      (0L, "the quick brown fox jumps over the lazy dog"),
      (1L, "tiny"), // short-doc fallback path
      (2L, "a different longer document about engines and queries today"))
      .toDF("doc_id", "text")
    val n = 3
    val toks = split(graft.analytics.TextOps.normalize(col("text")), " ")
    val shArr = when(size(toks) < n, array(array_join(toks, " ")))
      .otherwise(transform(sequence(lit(0), size(toks) - n),
        i => concat_ws(" ", slice(toks, i + lit(1), lit(n)))))
    val perRow = docs.select(col("doc_id").as("id"),
        graft.functions.MinHashSig(shArr, 16).as("sig"))
      .as[(Long, Seq[Long])].collect().toMap
    val batch = graft.analytics.Dedup
      .minhashSignatures(docs, "doc_id", "text", k = 16, shingleN = n)
      .as[(Long, Seq[Long])].collect().toMap
    assert(perRow === batch)
  }

  test("multimodal: stubbed decode via mapPartitions, metadata pruning") {
    import spark.implicits._
    val rows = Seq(
      (1L, "image", Array[Byte](10, 20, 30), (640, 480, 0, 0L)),
      (2L, "image", Array[Byte](1, 2), (100, 100, 0, 0L)),
      (3L, "video", Array[Byte](5, 5, 5, 5), (1920, 1080, 0, 2500L)))
      .toDF("media_id", "kind", "payload", "meta")
      .select(col("media_id"), col("kind"), col("payload"),
        col("meta").cast("struct<width:int,height:int,sample_rate:int,duration_ms:bigint>").as("meta"))

    val feats = Multimodal.extractFeatures(rows).collect()
      .map(f => f.media_id -> f).toMap
    assert(feats(1L).n_bytes === 3 && feats(1L).feature.length === 8)
    assert(feats(1L).codec === "stub")
    assert(math.abs(feats(1L).feature(0) - 10 / 255.0f) < 1e-6)

    val hd = Multimodal.filterByResolution(rows, 600, 400)
      .select("media_id").as[Long].collect().toSet
    assert(hd === Set(1L, 3L))

    val frames = Multimodal.sampleFrameIndexes(rows, 1000L)
      .select("frame_ts_ms").as[Seq[Long]].head()
    assert(frames === Seq(0L, 1000L, 2000L))
  }

  test("multimodal: real WAV and BMP decodes (no codec library)") {
    import spark.implicits._
    // PCM16 mono 8kHz WAV: a full-scale square wave of 8 samples
    val samples = Seq[Short](32767, 32767, -32768, -32768, 32767, 32767,
      -32768, -32768)
    val bb = java.nio.ByteBuffer.allocate(44 + samples.size * 2)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes); bb.putInt(36 + samples.size * 2)
    bb.put("WAVE".getBytes); bb.put("fmt ".getBytes); bb.putInt(16)
    bb.putShort(1); bb.putShort(1); bb.putInt(8000); bb.putInt(16000)
    bb.putShort(2); bb.putShort(16)
    bb.put("data".getBytes); bb.putInt(samples.size * 2)
    samples.foreach(bb.putShort(_))
    val wav = bb.array()

    // 2x2 24-bit BMP, all pure red (BGR order, rows padded to 4 bytes)
    val rowBytes = (2 * 3 + 3) & ~3
    val ib = java.nio.ByteBuffer.allocate(54 + rowBytes * 2)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    ib.put('B'.toByte); ib.put('M'.toByte); ib.putInt(54 + rowBytes * 2)
    ib.putInt(0); ib.putInt(54) // pixel offset
    ib.putInt(40); ib.putInt(2); ib.putInt(2) // header size, w, h
    ib.putShort(1); ib.putShort(24); ib.putInt(0) // planes, bpp, compression
    ib.putInt(rowBytes * 2); ib.putInt(0); ib.putInt(0); ib.putInt(0); ib.putInt(0)
    for (_ <- 0 until 2) {
      for (_ <- 0 until 2) { ib.put(0.toByte); ib.put(0.toByte); ib.put(255.toByte) }
      ib.put(0.toByte); ib.put(0.toByte) // row padding
    }
    val bmp = ib.array()

    val rows = Seq((1L, "audio", wav), (2L, "image", bmp))
      .toDF("media_id", "kind", "payload")
    val feats = Multimodal.extractFeatures(rows).collect()
      .map(f => f.media_id -> f).toMap

    val a = feats(1L)
    assert(a.codec === "wav")
    assert(math.abs(a.feature(0) - 8000 / 48000.0f) < 1e-6) // rate
    assert(math.abs(a.feature(2) - 1.0f) < 1e-3)            // RMS (full scale)
    assert(math.abs(a.feature(3) - 3.0f / 8) < 1e-6)        // 3 crossings / 8
    assert(math.abs(a.feature(4) - 1.0f) < 1e-3)            // peak

    // encodeWav is the exact inverse of the hand-built container above
    assert(Multimodal.encodeWav(8000, samples.toArray).sameElements(wav))

    val i = feats(2L)
    assert(i.codec === "bmp")
    assert(math.abs(i.feature(0) - 2 / 4096.0f) < 1e-7) // width
    assert(math.abs(i.feature(2) - 1.0f) < 1e-6)        // mean R
    assert(math.abs(i.feature(3)) < 1e-6)               // mean G
    assert(math.abs(i.feature(4)) < 1e-6)               // mean B
  }

  test("multimodal: real BMP resize (decode -> resample -> re-encode)") {
    import spark.implicits._
    // encode/decode round-trip on a 5x3 gradient (exercises row padding)
    val px = Array.tabulate(5 * 3 * 3)(i => (i * 7 % 251).toByte)
    val bmp = Multimodal.encodeBmp(5, 3, px)
    assert(Multimodal.decodeBmpPixels(bmp).exists {
      case (w, h, p) => w == 5 && h == 3 && p.sameElements(px)
    })

    // a constant-color image resized keeps exact channel means at any size
    val green = Multimodal.encodeBmp(6, 4,
      Array.tabulate(6 * 4 * 3)(i => if (i % 3 == 1) 200.toByte else 0.toByte))
    for ((w, h) <- Seq((8, 8), (2, 2), (13, 1))) {
      val out = Multimodal.resizeBmp(green, w, h).get
      val feat = Multimodal.decodeBmp(out).get
      assert(math.abs(feat(0) - w / 4096.0f) < 1e-7)
      assert(math.abs(feat(1) - h / 4096.0f) < 1e-7)
      assert(math.abs(feat(3) - 200 / 255.0f) < 1e-6) // mean G preserved
      assert(feat(2) === 0.0f && feat(4) === 0.0f)
    }
    // nearest-neighbor identity: resizing to the same dims is lossless
    assert(Multimodal.resizeBmp(bmp, 5, 3).flatMap(Multimodal.decodeBmpPixels)
      .exists { case (w, h, p) => w == 5 && h == 3 && p.sameElements(px) })
    // non-BMP payloads are not resizable
    assert(Multimodal.resizeBmp(Array[Byte](1, 2, 3), 2, 2).isEmpty)

    // the DataFrame op: BMPs resampled + meta updated, stubs pass through
    val rows = Seq(
      (1L, "image", bmp, (5, 3, 0, 0L)),
      (2L, "image", Array[Byte](9, 9), (100, 100, 0, 0L)))
      .toDF("media_id", "kind", "payload", "meta")
      .select(col("media_id"), col("kind"), col("payload"),
        col("meta").cast("struct<width:int,height:int,sample_rate:int,duration_ms:bigint>").as("meta"))
    val resized = Multimodal.resizeImages(rows, 4, 4)
    val metas = resized.select("media_id", "meta.width", "meta.height")
      .as[(Long, Int, Int)].collect()
      .map { case (k, w, h) => k -> ((w, h)) }.toMap
    assert(metas(1L) === ((4, 4)) && metas(2L) === ((100, 100)))
    val outPayload = resized.where(col("media_id") === 1L)
      .select("payload").as[Array[Byte]].head()
    assert(Multimodal.decodeBmpPixels(outPayload).exists {
      case (w, h, _) => w == 4 && h == 4
    })
  }
}
