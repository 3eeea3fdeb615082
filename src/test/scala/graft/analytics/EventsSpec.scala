package graft.analytics

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.sql.Timestamp

class EventsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(min: Int): Timestamp =
    new Timestamp(1700000000000L + min * 60000L)

  test("sessionize splits at gaps > 30 min, numbers sessions per user") {
    val ev = Seq(
      (1L, 10L, ts(0)), (2L, 10L, ts(10)), (3L, 10L, ts(50)), // gap 40 -> new
      (4L, 10L, ts(60)),
      (5L, 20L, ts(0)), (6L, 20L, ts(200))
    ).toDF("event_id", "user_id", "ts")
    val got = Events.sessionize(ev, "user_id", "ts")
      .select("event_id", "session_id").as[(Long, Long)].collect().toMap
    assert(got === Map(1L -> 1L, 2L -> 1L, 3L -> 2L, 4L -> 2L,
      5L -> 1L, 6L -> 2L))
  }

  test("sessionFeatures aggregates count, span, value per session") {
    val ev = Seq(
      (1L, 10L, ts(0), 5L), (2L, 10L, ts(10), 7L), (3L, 10L, ts(50), 1L)
    ).toDF("event_id", "user_id", "ts", "v")
    val got = Events.sessionFeatures(ev, "user_id", "ts", "v")
      .select("session_id", "n_events", "span_sec", "total_value")
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(got === Set((1L, 2L, 600L, 12L), (2L, 1L, 0L, 1L)))
  }

  test("decontaminate flags only docs sharing a benchmark shingle") {
    val train = Seq(
      (1L, "the quick brown fox jumps over the lazy dog today"),
      (2L, "completely unrelated content with different words entirely here now")
    ).toDF("doc_id", "text")
    val bench = Seq(
      (100L, "prefix words the quick brown fox jumps over the lazy dog")
    ).toDF("doc_id", "text")
    val got = Dedup.decontaminate(train, bench, "doc_id", "text", n = 8)
      .as[(Long, Long)].collect().toMap
    assert(got.contains(1L) && got(1L) >= 1L)
    assert(!got.contains(2L))
  }

  test("repetitionRatio: looped text high, varied text 0, short text 0") {
    val df = Seq(
      (1L, "a b c a b c a b c a b c"),   // 10 grams, 3 distinct -> 0.7
      (2L, "one two three four five"),   // all distinct -> 0.0
      (3L, "hi there")                   // < 3 words -> 0.0
    ).toDF("doc_id", "text")
    val got = TextOps.repetitionRatios(df, "doc_id", "text", 3)
      .as[(Long, Double)].collect().toMap
    assert(math.abs(got(1L) - 0.7) < 1e-12)
    assert(got(2L) === 0.0 && got(3L) === 0.0)
  }

  test("stratifiedSample is deterministic and respects per-stratum rates") {
    val df = (0L until 1000L).map(i => (i, if (i % 2 == 0) "en" else "de"))
      .toDF("doc_id", "lang")
    val s1 = TextOps.stratifiedSample(df, "doc_id", "lang",
      Map("en" -> 0.1), defaultRate = 0.9)
    val s2 = TextOps.stratifiedSample(df, "doc_id", "lang",
      Map("en" -> 0.1), defaultRate = 0.9)
    val r1 = s1.select("doc_id").as[Long].collect().toSet
    assert(r1 === s2.select("doc_id").as[Long].collect().toSet)
    val en = s1.where(col("lang") === "en").count()
    val de = s1.where(col("lang") === "de").count()
    assert(en > 20 && en < 90)   // ~50 of 500
    assert(de > 400 && de < 490) // ~450 of 500
  }

  test("redact replaces emails, IPs and phone-like runs, leaves prose") {
    val got = Seq((1L, "mail a.b+c@foo.org or call +1 (555) 123-4567 from 192.168.0.1 ok"))
      .toDF("doc_id", "text")
      .select(TextOps.redact(col("text"))).as[String].head
    assert(got === "mail <EMAIL> or call <PHONE> from <IP> ok")
  }

  test("packSequences: contiguous per-shard offsets, exact split points") {
    val df = (0L until 50L).map(i => (i, ("w " * 10).trim)).toDF("doc_id", "text")
    val packed = TextOps.packSequences(df, "doc_id", "text",
      seqLen = 25, nShards = 4)
      .as[(Long, Long, Long, Long)].collect()
    assert(packed.length === 50)
    // within a shard, docs are 10 tokens each: offsets must cycle
    // 0,10,20,5,15,0,… (mod 25) in md5-key order — verify via cum math
    for ((_, _, seq, off) <- packed) {
      assert(off >= 0 && off < 25)
      assert(seq >= 0)
    }
    // total tokens = sum over shards of (last seq*25 + last offset + 10)
    val byShard = packed.groupBy(_._2)
    val total = byShard.values.map { rows =>
      val last = rows.maxBy(r => r._3 * 25 + r._4)
      last._3 * 25 + last._4 + 10
    }.sum
    assert(total === 500L)
  }

  test("chunkRows: overlap windows cover the text, short text one chunk") {
    val df = Seq((1L, "abcdefghij"), (2L, "xy")).toDF("doc_id", "text")
    val got = TextOps.chunkRows(df, "doc_id", "text", size = 4, overlap = 2)
      .as[(Long, Long, String)].collect().toSet
    // stride 2: ceil((10-4)/2)+1 = 4 chunks
    assert(got === Set((1L, 0L, "abcd"), (1L, 1L, "cdef"), (1L, 2L, "efgh"),
      (1L, 3L, "ghij"), (2L, 0L, "xy")))
  }

  test("topTfidfTerms ranks rare terms over common ones") {
    val df = Seq(
      (1L, "common rare1 rare1 common"),
      (2L, "common other other common"),
      (3L, "common thing thing common")).toDF("doc_id", "text")
    val top = TextOps.topTfidfTerms(df, "doc_id", "text", k = 1)
      .select("doc_id", "term").as[(Long, String)].collect().toMap
    // "common" appears in all 3 docs (df=3); each doc's unique term wins
    assert(top === Map(1L -> "rare1", 2L -> "other", 3L -> "thing"))
  }

  test("corpusStats: exact per-stratum counts and interpolated quantiles") {
    val df = Seq(
      (1L, "en", "a b c d"), (2L, "en", "a b"), (3L, "en", "a b c d e f"),
      (4L, "de", "x y z")).toDF("doc_id", "lang", "text")
    val got = TextOps.corpusStats(df, "text", "lang")
      .as[(String, Long, Long, Double, Double, Double)].collect()
      .map(r => r._1 -> r).toMap
    val en = got("en")
    assert(en._2 === 3L && en._3 === 12L)
    assert(math.abs(en._4 - 4.0) < 1e-12)     // mean of 4,2,6
    assert(math.abs(en._5 - 4.0) < 1e-12)     // p50 of {2,4,6}
    assert(math.abs(en._6 - 5.6) < 1e-12)     // p90 interpolated 4+0.8*2
    assert(got("de")._2 === 1L)
  }

  test("connectedComponents: chain merges, isolated id keeps own label") {
    val pairs = Seq((1L, 2L), (2L, 3L), (7L, 8L)).toDF("id_a", "id_b")
    val ids = Seq(1L, 2L, 3L, 7L, 8L, 99L).toDF("id")
    val got = Dedup.connectedComponents(pairs, ids)
      .as[(Long, Long)].collect().toMap
    assert(got === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 7L -> 7L, 8L -> 7L,
      99L -> 99L))
  }

  test("asofJoin picks the newest right row at-or-before each left ts") {
    val left = Seq(
      (1L, 10L, ts(5)),  // after r1, before r2 -> r1
      (2L, 10L, ts(10)), // equal to r2's ts -> r2 (<= semantics)
      (3L, 10L, ts(99)), // after everything -> r3 (newest)
      (4L, 20L, ts(0)),  // no right row for user 20 at all -> dropped
      (5L, 30L, ts(1))   // right rows exist but all later -> dropped
    ).toDF("event_id", "user_id", "ts")
    val right = Seq(
      (101L, 10L, ts(0), 1.0), (102L, 10L, ts(10), 2.0),
      (103L, 10L, ts(20), 3.0), (104L, 30L, ts(50), 4.0)
    ).toDF("rid", "key", "rts", "v")
    val got = Events.asofJoin(left, right, "user_id", "key", "ts", "rts",
        "rid", Seq("rid", "v"))
      .select("event_id", "rid", "v").as[(Long, Long, Double)]
      .collect().toSet
    assert(got === Set((1L, 101L, 1.0), (2L, 102L, 2.0), (3L, 103L, 3.0)))
  }

  test("asofJoin breaks equal-ts ties to the largest tie column") {
    val left = Seq((1L, 10L, ts(10))).toDF("event_id", "user_id", "ts")
    val right = Seq(
      (7L, 10L, ts(3), "a"), (9L, 10L, ts(3), "b"), (8L, 10L, ts(3), "c")
    ).toDF("rid", "key", "rts", "tag")
    val got = Events.asofJoin(left, right, "user_id", "key", "ts", "rts",
        "rid", Seq("rid", "tag"))
      .select("rid", "tag").as[(Long, String)].collect().toSeq
    assert(got === Seq((9L, "b")))
  }

  test("asofJoin matches a brute-force evaluation on random data") {
    val rnd = new scala.util.Random(7)
    val left = (1 to 300).map(i =>
      (i.toLong, (rnd.nextInt(8) + 1).toLong, ts(rnd.nextInt(100))))
    val right = (1 to 120).map(i =>
      (1000L + i, (rnd.nextInt(10) + 1).toLong, ts(rnd.nextInt(100)),
        rnd.nextDouble()))
    val expected = left.flatMap { case (eid, k, lts) =>
      val cands = right.filter(r => r._2 == k && !r._3.after(lts))
      if (cands.isEmpty) None
      else {
        val best = cands.maxBy(r => (r._3.getTime, r._1))
        Some((eid, best._1, best._4))
      }
    }.toSet
    val got = Events.asofJoin(
        left.toDF("event_id", "user_id", "ts"),
        right.toDF("rid", "key", "rts", "v"),
        "user_id", "key", "ts", "rts", "rid", Seq("rid", "v"))
      .select("event_id", "rid", "v").as[(Long, Long, Double)]
      .collect().toSet
    assert(got === expected)
  }

  test("funnel: ordered completion, strict ordering, earliest result") {
    val ev = Seq(
      // user 10 completes A->B->C at t30 (the later C at t40 is ignored)
      (10L, ts(0), "A"), (10L, ts(10), "B"), (10L, ts(30), "C"),
      (10L, ts(40), "C"),
      // user 20: B before A -> never completes
      (20L, ts(0), "B"), (20L, ts(10), "A"), (20L, ts(20), "C"),
      // user 30: A->C without B -> no
      (30L, ts(0), "A"), (30L, ts(5), "C"),
      // user 40: out-of-order arrivals still complete (C after B after A)
      (40L, ts(50), "C"), (40L, ts(10), "A"), (40L, ts(30), "B")
    ).toDF("user_id", "ts", "event_type")
    val got = Events.funnel(ev, "user_id", "ts", "event_type",
        Seq("A", "B", "C"))
      .as[(Long, Long)].collect().toMap
    assert(got === Map(10L -> ts(30).getTime * 1000,
      40L -> ts(50).getTime * 1000))
  }

  test("funnel with one step is first-occurrence per user") {
    val ev = Seq((1L, ts(5), "A"), (1L, ts(2), "A"), (2L, ts(9), "B"))
      .toDF("user_id", "ts", "event_type")
    val got = Events.funnel(ev, "user_id", "ts", "event_type", Seq("A"))
      .as[(Long, Long)].collect().toMap
    assert(got === Map(1L -> ts(2).getTime * 1000))
  }

  test("funnel wave: C between B and the later A does not count") {
    // A@0, C@5, B@10, (no C after B) -> incomplete
    val ev = Seq((1L, ts(0), "A"), (1L, ts(5), "C"), (1L, ts(10), "B"))
      .toDF("user_id", "ts", "event_type")
    assert(Events.funnel(ev, "user_id", "ts", "event_type",
      Seq("A", "B", "C")).count() === 0L)
  }

  test("intervalJoin: half-open containment, no duplicate pairs") {
    val left = Seq(
      (1L, 10L, ts(0)),   // == start -> included
      (2L, 10L, ts(30)),  // inside -> included
      (3L, 10L, ts(60)),  // == end -> excluded (half-open)
      (4L, 10L, ts(61)),  // after -> excluded
      (5L, 20L, ts(30))   // wrong key -> excluded
    ).toDF("event_id", "user_id", "ts")
    val right = Seq((100L, 10L, ts(0), ts(60)))
      .toDF("iid", "key", "start_ts", "end_ts")
    val got = Events.intervalJoin(left, right, "user_id", "key", "ts",
        "start_ts", "end_ts", Seq("iid"))
      .select("event_id", "iid").as[(Long, Long)].collect().toSeq
    assert(got.sorted === Seq((1L, 100L), (2L, 100L)))
  }

  test("intervalJoin spans bucket boundaries and overlapping intervals") {
    // bucket = 1h; the interval crosses two bucket edges, and two
    // intervals overlap the same event -> one row per (event, interval)
    val left = Seq((1L, 10L, ts(90))).toDF("event_id", "user_id", "ts")
    val right = Seq(
      (100L, 10L, ts(0), ts(150)),   // covers buckets 0,1,2
      (101L, 10L, ts(85), ts(95)),   // covers bucket 1 only
      (102L, 10L, ts(91), ts(200))   // starts after the event
    ).toDF("iid", "key", "start_ts", "end_ts")
    val got = Events.intervalJoin(left, right, "user_id", "key", "ts",
        "start_ts", "end_ts", Seq("iid"), bucketSeconds = 3600L)
      .select("iid").as[Long].collect().toSeq.sorted
    assert(got === Seq(100L, 101L))
  }

  test("intervalJoin matches a brute-force evaluation on random data") {
    val rnd = new scala.util.Random(11)
    val left = (1 to 300).map(i =>
      (i.toLong, (rnd.nextInt(6) + 1).toLong, ts(rnd.nextInt(300))))
    val right = (1 to 150).map { i =>
      val s = rnd.nextInt(300)
      (1000L + i, (rnd.nextInt(8) + 1).toLong, ts(s),
        ts(s + rnd.nextInt(40)))  // zero-length intervals included
    }
    val expected = (for {
      (eid, k, lts) <- left
      (iid, rk, s, e) <- right
      if rk == k && !lts.before(s) && lts.before(e)
    } yield (eid, iid)).toSet
    val got = Events.intervalJoin(
        left.toDF("event_id", "user_id", "ts"),
        right.toDF("iid", "key", "start_ts", "end_ts"),
        "user_id", "key", "ts", "start_ts", "end_ts", Seq("iid"),
        bucketSeconds = 600L)
      .select("event_id", "iid").as[(Long, Long)].collect().toSet
    assert(got === expected)
  }

  test("transitions: per-key ordered next-state counts") {
    import org.apache.spark.sql.functions._
    // u1: a->b->a ; u2: a->b ; last events emit no transition
    val ev = Seq(
      ("u1", 1L, "a", 10L), ("u1", 2L, "b", 11L), ("u1", 3L, "a", 12L),
      ("u2", 1L, "a", 20L), ("u2", 2L, "b", 21L))
      .toDF("user_id", "t", "event_type", "event_id")
      .select(col("user_id"), timestamp_seconds(col("t")).as("ts"),
        col("event_type"), col("event_id"))
    val got = Events.transitions(ev, "user_id", "ts", "event_type",
      "event_id").as[(String, String, Long)].collect().toSet
    assert(got === Set(("a", "b", 2L), ("b", "a", 1L)))
  }

  test("retention: cohort by first week, distinct users per offset") {
    import org.apache.spark.sql.functions._
    // 2026-01-05 is a Monday. u1: weeks 0,1,3 (two events in week 1 —
    // distinct); u2: weeks 0,1; u3 joins in week 1 only
    val ev = Seq(
      ("u1", "2026-01-05 10:00:00"), ("u1", "2026-01-13 09:00:00"),
      ("u1", "2026-01-14 09:00:00"), ("u1", "2026-01-26 23:00:00"),
      ("u2", "2026-01-07 00:00:00"), ("u2", "2026-01-12 00:00:00"),
      ("u3", "2026-01-15 12:00:00"))
      .toDF("user_id", "ts_s")
      .select(col("user_id"), col("ts_s").cast("timestamp").as("ts"))
    val got = Events.retention(ev, "user_id", "ts")
      .select(date_format(col("cohort_week"), "yyyy-MM-dd"),
        col("week_offset"), col("n_users"))
      .as[(String, Long, Long)].collect().toSet
    assert(got === Set(
      ("2026-01-05", 0L, 2L), // u1, u2 in their first week
      ("2026-01-05", 1L, 2L), // u1, u2 active the next week
      ("2026-01-05", 3L, 1L), // u1 returns in week 3
      ("2026-01-12", 0L, 1L))) // u3's own cohort
  }
}
