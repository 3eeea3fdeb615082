package graft.analytics

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Property checks for the EXACTNESS claims of the near-dup operators:
  * the distributed LSH/banding/prefix pipelines must equal the brute-force
  * driver-side answer on random corpora (the oracle contract, as laws).
  */
class DedupPropertySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val vocab = Seq("alpha", "beta", "gamma", "delta", "eps",
    "zeta", "eta", "theta")

  private val genDocs: Gen[Seq[(Long, String)]] = for {
    n <- Gen.choose(6, 14)
    docs <- Gen.listOfN(n, for {
      len <- Gen.choose(2, 10)
      ws <- Gen.listOfN(len, Gen.oneOf(vocab))
    } yield ws.mkString(" "))
  } yield docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }

  private def forAllSampled(f: Seq[(Long, String)] => Unit): Unit =
    (1 to 6).foreach { i =>
      genDocs(Gen.Parameters.default, Seed(i.toLong)).foreach { docs =>
        withClue(s"seed=$i docs=$docs: ")(f(docs))
      }
    }

  private def normalize(t: String): String =
    t.toLowerCase.replaceAll("\\s+", " ").trim

  private def wordShingles(t: String, n: Int = 3): Set[String] = {
    val toks = normalize(t).split(" ", -1).toSeq
    if (toks.size < n) Set(toks.mkString(" "))
    else toks.sliding(n).map(_.mkString(" ")).toSet
  }

  private def charShingles(t: String, n: Int = 5): Set[String] = {
    val s = normalize(t)
    if (s.length <= n) Set(s.take(n))
    else (0 to s.length - n).map(i => s.substring(i, i + n)).toSet ++
      (if (s.length >= n) Set.empty[String] else Set(s))
  }

  private def jac(a: Set[String], b: Set[String]): Double =
    a.intersect(b).size.toDouble / a.union(b).size

  private def brutePairs(docs: Seq[(Long, String)], t: Double,
                         sh: String => Set[String]): Set[(Long, Long)] =
    (for {
      (a, ta) <- docs; (b, tb) <- docs if a < b
      if jac(sh(ta), sh(tb)) >= t
    } yield (a, b)).toSet

  test("law: minhashPairs equals brute-force word-shingle Jaccard") {
    forAllSampled { docs =>
      val df = docs.toDF("doc_id", "text")
      val got = Dedup.minhashPairs(df, "doc_id", "text", threshold = 0.5)
        .select("id_a", "id_b").as[(Long, Long)].collect().toSet
      assert(got === brutePairs(docs, 0.5, wordShingles(_)))
    }
  }

  test("law: jaccardJoin (prefix filter) equals brute-force char-gram Jaccard") {
    forAllSampled { docs =>
      val df = docs.toDF("doc_id", "text")
      val got = Dedup.jaccardJoin(df, "doc_id", "text", threshold = 0.6)
        .select("id_a", "id_b").as[(Long, Long)].collect().toSet
      assert(got === brutePairs(docs, 0.6, charShingles(_)))
    }
  }

  private def simhash60(t: String): Long = {
    val toks = normalize(t).split(" ", -1).distinct
    val md = java.security.MessageDigest.getInstance("MD5")
    val hs = toks.map { w =>
      val hex = md.digest(w.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(15)
      java.lang.Long.parseLong(hex, 16)
    }
    (0 until 60).map { b =>
      val s = hs.map(h => if (((h >> b) & 1L) == 1L) 1 else -1).sum
      if (s > 0) 1L << b else 0L
    }.reduce(_ | _)
  }

  test("law: simhashPairs equals brute-force Hamming over the 60-bit hash") {
    forAllSampled { docs =>
      val df = docs.toDF("doc_id", "text")
      val got = Dedup.simhashPairs(df, "doc_id", "text", maxHamming = 3)
        .select("id_a", "id_b").as[(Long, Long)].collect().toSet
      val sims = docs.map { case (id, t) => id -> simhash60(t) }.toMap
      val expect = (for {
        (a, _) <- docs; (b, _) <- docs if a < b
        if java.lang.Long.bitCount(sims(a) ^ sims(b)) <= 3
      } yield (a, b)).toSet
      assert(got === expect)
    }
  }

  test("law: clusters equal union-find over brute-force pairs") {
    forAllSampled { docs =>
      val df = docs.toDF("doc_id", "text")
      val got = Dedup.clusters(df, "doc_id", "text", threshold = 0.5)
        .as[(Long, Long)].collect().toMap
      // union-find
      val parent = scala.collection.mutable.Map(docs.map(d => d._1 -> d._1): _*)
      def find(x: Long): Long =
        if (parent(x) == x) x else { parent(x) = find(parent(x)); parent(x) }
      brutePairs(docs, 0.5, wordShingles(_)).foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val expect = docs.map(d => d._1 -> find(d._1)).toMap
      assert(got === expect)
    }
  }

  test("law: distributed CC tier (shortcutting) equals the driver tier") {
    // force the distributed branch with maxDriverEdges = -1; include a
    // long path (deep component — exercises pointer doubling), a clique,
    // and singletons
    val pairs = ((0L until 40L).map(i => (i, i + 1)) ++ // path 0..40
      Seq((100L, 101L), (100L, 102L), (101L, 102L)) ++  // triangle
      Seq((200L, 201L))).toDF("id_a", "id_b")
    val ids = ((0L to 40L) ++ (100L to 102L) ++
      (200L to 202L)).toDF("id")
    val dist = Dedup.connectedComponents(pairs, ids, maxDriverEdges = -1)
      .as[(Long, Long)].collect().toMap
    val drv = Dedup.connectedComponents(pairs, ids)
      .as[(Long, Long)].collect().toMap
    assert(dist === drv)
    assert((0L to 40L).forall(i => dist(i) == 0L))
    assert((100L to 102L).forall(i => dist(i) == 100L))
    assert(dist(200L) == 200L && dist(201L) == 200L && dist(202L) == 202L)
  }
}
