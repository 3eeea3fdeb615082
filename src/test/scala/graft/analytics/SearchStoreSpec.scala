package graft.analytics

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Persisted BM25 search store: the probe must be VALUE-IDENTICAL to an
  * independent full-corpus computation (store = serving layout, never a
  * different answer), appends must equal a fresh write of the union, and
  * the probe scan must prune partitions/row groups.
  */
class SearchStoreSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val docs = Seq(
    (0L, "spark joins hash tables and spark scans parquet files"),
    (1L, "the query engine scans parquet and prunes row groups"),
    (2L, "hash join broadcast join and sort merge join strategies"),
    (3L, "spark spark spark nothing but spark here"),
    (4L, "completely unrelated prose about rivers and forests"),
    (5L, ""),
    (6L, "parquet scans with predicate pushdown beat full scans"),
    (7L, "broadcast hash join wins for small dimension tables")
  ).toDF("doc_id", "text")

  /** Independent driver-side BM25 reference: plain Scala over collected
    * rows, same tokenizer, rational idf, term-ascending left-to-right
    * score sum with a 0.0 accumulator — mirrors the operator's float
    * contract without sharing any of its Spark expressions.
    */
  private def reference(corpus: Seq[(Long, String)],
                        queries: Seq[(Long, String)], k: Int,
                        k1: Double = 1.2,
                        b: Double = 0.75): Set[(Long, Long, Long, Double, Long)] = {
    def toks(t: String): Seq[String] =
      t.toLowerCase.trim.split("\\s+").filter(_.nonEmpty).toSeq
    val dls = corpus.map { case (id, t) => id -> toks(t).size.toLong }.toMap
    val n = corpus.size.toLong
    val avgdl = dls.values.sum.toDouble / n.toDouble
    val tf: Map[(Long, String), Long] = corpus
      .flatMap { case (id, t) => toks(t).map(w => (id, w)) }
      .groupBy(identity).map { case (key, v) => key -> v.size.toLong }
    val dfreq: Map[String, Long] =
      tf.keys.toSeq.groupBy(_._2).map { case (w, v) => w -> v.size.toLong }
    def score(id: Long, w: String): Option[Double] =
      tf.get((id, w)).map { f =>
        val dfD = dfreq(w).toDouble; val tfD = f.toDouble
        ((n.toDouble - dfD + 0.5) / (dfD + 0.5)) *
          (tfD * (k1 + 1.0)) /
          (tfD + k1 * (1.0 - b + b * (dls(id).toDouble / avgdl)))
      }
    queries.flatMap { case (qid, qt) =>
      val qws = toks(qt).distinct.sorted
      val perDoc = corpus.flatMap { case (id, _) =>
        val ss = qws.flatMap(w => score(id, w))
        if (ss.isEmpty) None
        else Some((id, ss.foldLeft(0.0)(_ + _), ss.size.toLong))
      }
      perDoc.sortBy { case (id, s, _) => (-s, id) }.take(k).zipWithIndex
        .map { case ((id, s, nt), i) => (qid, id, (i + 1).toLong, s, nt) }
    }.toSet
  }

  private val queries = Seq(
    (1L, "spark parquet"),
    (2L, "hash join"),
    (3L, "Broadcast  JOIN join"), // case/whitespace/dup normalization
    (4L, "rivers"),
    (5L, "zzz-not-in-corpus"))

  test("probe equals independent full-corpus BM25 (multi-term)") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft-searchstore").toString
    TextOps.searchStoreWrite(docs, dir, "doc_id", "text", buckets = 8)
    val got = TextOps.searchStoreProbe(spark, dir, queries, k = 3)
      .as[(Long, Long, Long, Double, Long)].collect().toSet
    val want = reference(docs.as[(Long, String)].collect().toSeq,
      queries, k = 3)
    assert(got === want)
    assert(!got.exists(_._1 == 5L)) // no-match query yields no rows
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
  }

  test("single-term probe matches bm25TopK value for value") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft-searchstore").toString
    TextOps.searchStoreWrite(docs, dir, "doc_id", "text")
    val got = TextOps.searchStoreProbe(spark, dir, Seq((9L, "join")), k = 5)
      .select("doc_id", "rank", "score")
      .as[(Long, Long, Double)].collect().toSet
    val want = TextOps.bm25TopK(docs, "doc_id", "text", Seq("join"), k = 5)
      .select("doc_id", "rank", "score")
      .as[(Long, Long, Double)].collect().toSet
    assert(got === want)
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
  }

  test("append equals a fresh write of the union (exact, incl. df/avgdl)") {
    val dirA = java.nio.file.Files
      .createTempDirectory("graft-searchstore").toString
    val dirB = java.nio.file.Files
      .createTempDirectory("graft-searchstore").toString
    val half1 = docs.where(col("doc_id") < 4)
    val half2 = docs.where(col("doc_id") >= 4)
    TextOps.searchStoreWrite(half1, dirA, "doc_id", "text", buckets = 4)
    TextOps.searchStoreAppend(half2, dirA, "doc_id", "text")
    TextOps.searchStoreWrite(docs, dirB, "doc_id", "text", buckets = 4)
    val a = TextOps.searchStoreProbe(spark, dirA, queries, k = 5)
      .as[(Long, Long, Long, Double, Long)].collect().toSet
    val b = TextOps.searchStoreProbe(spark, dirB, queries, k = 5)
      .as[(Long, Long, Long, Double, Long)].collect().toSet
    assert(a === b)
    Seq(dirA, dirB).foreach(d =>
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(d)))
  }

  test("a half-applied append fails probes loudly (dirty marker)") {
    // postings land before meta: a crash between the two leaves a store
    // whose probes would silently score with stale (n, sumdl). The
    // append_in_progress marker turns that silence into an error; a
    // completed append removes it.
    val dir = java.nio.file.Files
      .createTempDirectory("graft-searchstore").toString
    try {
      TextOps.searchStoreWrite(docs.where(col("doc_id") < 4), dir,
        "doc_id", "text", buckets = 4)
      TextOps.searchStoreAppend(docs.where(col("doc_id") >= 4), dir,
        "doc_id", "text")
      val marker = java.nio.file.Paths.get(s"$dir/append_in_progress")
      assert(!java.nio.file.Files.exists(marker),
        "completed append must clear the marker")
      // simulate the crash window: marker present, meta stale
      java.nio.file.Files.write(marker, Array.emptyByteArray)
      val e = intercept[IllegalArgumentException] {
        TextOps.searchStoreProbe(spark, dir, queries, k = 5)
      }
      assert(e.getMessage.contains("half-applied append"))
      // the documented recovery: a full rebuild overwrites postings,
      // writes fresh meta, clears the marker, and probes work again
      TextOps.searchStoreWrite(docs, dir, "doc_id", "text", buckets = 4)
      assert(!java.nio.file.Files.exists(marker),
        "a full write must clear the marker")
      assert(TextOps.searchStoreProbe(spark, dir, queries, k = 5)
        .count() > 0)
    } finally org.apache.commons.io.FileUtils.deleteQuietly(
      new java.io.File(dir))
  }

  test("rrfFuse collapses duplicate (query,id) rows within one source") {
    // a source frame carrying the same (q, id) at ranks 1 and 3 must
    // contribute ONE reciprocal (the best rank) and count as ONE source
    val a = Seq((1L, 10L, 1L), (1L, 10L, 3L), (1L, 11L, 2L))
      .toDF("q", "id", "r")
    val b = Seq((1L, 10L, 2L)).toDF("q", "id", "r")
    val got = Similarity.rrfFuse(Seq(a, b), "q", "id", "r")
      .select("id", "score", "n_sources")
      .as[(Long, Double, Long)].collect()
      .map(t => t._1 -> ((t._2, t._3))).toMap
    val lcm = (61L to 70L).foldLeft(BigInt(1))((x, y) =>
      x / x.gcd(BigInt(y)) * y)
    def frac(rs: Seq[Long]): Double =
      (BigDecimal(rs.map(r => (lcm / BigInt(60 + r)).toLong).sum) /
        BigDecimal(lcm)).toDouble
    assert(got(10L) === ((frac(Seq(1L, 2L)), 2L)))
    assert(got(11L) === ((frac(Seq(2L)), 1L)))
  }

  test("probe scan prunes pb partitions and pushes term literals") {
    // the probe's returned frame is a materialized checkpoint, so pin the
    // scan construct the probe builds internally (pb literals via the
    // same one-row-per-term job, then partition + term predicates)
    val dir = java.nio.file.Files
      .createTempDirectory("graft-searchstore").toString
    TextOps.searchStoreWrite(docs, dir, "doc_id", "text", buckets = 8)
    val terms = Seq("spark", "join")
    val pbs = terms.toDS().select(
      pmod(xxhash64(col("value")), lit(8L)).cast("int"))
      .distinct().collect().map(_.getInt(0)).toSeq
    val scan = spark.read.parquet(s"$dir/postings")
      .where(col("pb").isin(pbs: _*) && col("term").isin(terms: _*))
      .select("term", "id", "tf", "dl")
    val plan = scan.queryExecution.executedPlan.toString
    assert("PartitionFilters: \\[[^\\]]*pb".r.findFirstIn(plan).nonEmpty,
      s"expected pb partition pruning in:\n$plan")
    assert(plan.contains("PushedFilters") && plan.contains("In(term"),
      s"expected term IN pushdown in:\n$plan")
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
  }

  test("rrfFuse matches an exact-fraction driver reference") {
    // two rankings over shared queries; reference computes Σ 1/(60+r) as
    // exact BigInt fractions over lcm(61..70), one double division at end
    val lex = Seq((1L, 10L, 1L), (1L, 11L, 2L), (1L, 12L, 3L),
      (2L, 20L, 1L), (2L, 21L, 2L)).toDF("q", "id", "r")
    val den = Seq((1L, 11L, 1L), (1L, 13L, 2L),
      (2L, 20L, 2L), (2L, 22L, 1L)).toDF("q", "id", "r")
    val got = Similarity.rrfFuse(Seq(lex, den), "q", "id", "r", k = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getLong(4))).toSet
    val lcm = (61 to 70).foldLeft(BigInt(1))((a, b) =>
      a / a.gcd(BigInt(b)) * b)
    val rows = Seq((1L, 10L, 1L), (1L, 11L, 2L), (1L, 12L, 3L),
      (2L, 20L, 1L), (2L, 21L, 2L), (1L, 11L, 1L), (1L, 13L, 2L),
      (2L, 20L, 2L), (2L, 22L, 1L))
    val nums = rows.groupBy(t => (t._1, t._2)).map { case (k2, g) =>
      (k2, g.map(t => lcm / BigInt(60 + t._3)).sum, g.size.toLong)
    }.toSeq
    val want = nums.groupBy(_._1._1).flatMap { case (q, g) =>
      g.sortBy { case ((_, id), num, _) => (-num, id) }.zipWithIndex.map {
        case (((qq, id), num, ns), i) =>
          (qq, id, i + 1L, (BigDecimal(num) / BigDecimal(lcm)).toDouble, ns)
      }
    }.toSet
    assert(got == want)
    // doc 11 appears in both rankings for q=1 → n_sources=2, and its
    // fused score (1/62 + 1/61) beats lex-rank-1 doc 10 (1/61 alone)
    val q1 = got.filter(_._1 == 1L).toSeq.sortBy(_._3)
    assert(q1.head._2 == 11L && q1.head._5 == 2L)
  }

  test("rrfFuse is union-order-independent and filters rank > maxRank") {
    val a = Seq((1L, 1L, 1L), (1L, 2L, 2L), (1L, 9L, 11L)).toDF("q", "id", "r")
    val b = Seq((1L, 2L, 1L), (1L, 3L, 2L)).toDF("q", "id", "r")
    val ab = Similarity.rrfFuse(Seq(a, b), "q", "id", "r").collect()
      .map(_.toSeq).toSet
    val ba = Similarity.rrfFuse(Seq(b, a), "q", "id", "r").collect()
      .map(_.toSeq).toSet
    assert(ab == ba)
    // rank-11 row ignored (maxRank=10): id 9 absent
    assert(!ab.exists(_(1) == 9L))
    // deep lists must be rejected, not silently wrong: lcm overflow guard
    val e = intercept[IllegalArgumentException] {
      Similarity.rrfFuse(Seq(a), "q", "id", "r", maxRank = 50)
    }
    assert(e.getMessage.contains("overflows"))
  }
}
