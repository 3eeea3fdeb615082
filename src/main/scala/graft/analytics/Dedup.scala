package graft.analytics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication for large text corpora. Four tiers, cheapest first:
  * exact (hash group-by), SimHash (bitwise near-dup), MinHash+LSH
  * (Jaccard near-dup), embedding-cosine (semantic near-dup in
  * Similarity.scala). All signature computation is per-row column
  * expressions (codegen'd, embarrassingly parallel); only the final
  * bucket join shuffles — and it shuffles signatures (bytes), never
  * documents. At 100 TB that means one wide scan + a shuffle of
  * ~1% of the input width.
  */
object Dedup {
  /** Exact dedup: canonical-form fingerprint, keep lowest id per group.
    * One hash-aggregate shuffle; with AQE skew handling for pathological
    * duplicate counts.
    */
  def exact(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol), TextOps.fingerprint(col(textCol)).as("fp"))
      .groupBy("fp").agg(min(idCol).as(idCol))

  /** Character n-gram shingles of the canonical text. */
  def shingles(text: Column, n: Int = 5): Column = {
    val t = TextOps.normalize(text)
    array_distinct(transform(
      sequence(lit(1), greatest(length(t) - (n - 1), lit(1))),
      i => t.substr(i, lit(n))))
  }

  private val P31 = 2147483647L // Mersenne prime 2^31-1
  private def permA(i: Int): Long = (2654435761L * (i + 1)) % P31
  private def permB(i: Int): Long = (40503L * (i * 2 + 7)) % P31

  /** MinHash signatures via explode + group-by: each shingle is hashed
    * exactly once, the k permutations are cheap arithmetic inside k `min`
    * aggregates, and the only shuffle is the per-doc group-by. (A nested
    * `transform(seq(k), i -> array_min(transform(shingles...)))` column
    * expression re-inlines the shingle computation into every lambda —
    * Catalyst has no CSE across HOF lambdas — going superlinear in k.)
    * Hashes live in [0, 2^31) so `h*a + b` stays < 2^63: safe under ANSI
    * overflow checking. Returns (id, sig: array<long>[k]).
    */
  def minhashSignatures(df: DataFrame, idCol: String, textCol: String,
                        k: Int = 64, shingleN: Int = 5): DataFrame = {
    val sh = df.select(col(idCol).as("id"),
        explode(shingles(col(textCol), shingleN)).as("shingle"))
      .select(col("id"), pmod(xxhash64(col("shingle")), lit(P31)).as("h"))
    val mins = (0 until k).map(i =>
      min(pmod(col("h") * permA(i) + permB(i), lit(P31))).as(s"m$i"))
    sh.groupBy("id").agg(mins.head, mins.tail: _*)
      .select(col("id"), array((0 until k).map(i => col(s"m$i")): _*).as("sig"))
  }

  /** Single-column signature form (convenience for small inputs/tests). */
  def minhashSignature(text: Column, k: Int = 64, shingleN: Int = 5): Column = {
    val hashes = transform(shingles(text, shingleN),
      s => pmod(xxhash64(s), lit(P31)))
    transform(sequence(lit(0), lit(k - 1)), i => {
      val a = pmod(lit(2654435761L) * (i + 1), lit(P31))
      val b = pmod(lit(40503L) * (i * 2 + 7), lit(P31))
      array_min(transform(hashes, h => pmod(h * a + b, lit(P31))))
    })
  }

  /** LSH banding: split the signature into `bands` bands and hash each;
    * docs sharing any band hash are candidates. Probability of catching a
    * pair with Jaccard j is 1-(1-j^r)^b (r = k/bands).
    */
  def lshBands(sig: Column, k: Int = 64, bands: Int = 16): Column = {
    val r = k / bands
    transform(sequence(lit(0), lit(bands - 1)),
      j => xxhash64(slice(sig, j * r + 1, lit(r))))
  }

  /** Candidate near-dup pairs via MinHash LSH, scored by signature
    * agreement (estimates Jaccard). Returns (id_a, id_b, est_jaccard) with
    * id_a < id_b. The self-join is on (band index, band hash) — a shuffle
    * of signatures only.
    */
  def minhashPairs(df: DataFrame, idCol: String, textCol: String,
                   threshold: Double = 0.7, k: Int = 64, bands: Int = 16,
                   shingleN: Int = 5): DataFrame = {
    val sigs = minhashSignatures(df, idCol, textCol, k, shingleN).cache()
    val buckets = sigs
      .select(col("id"), col("sig"),
        posexplode(lshBands(col("sig"), k, bands)).as(Seq("bandIdx", "bandHash")))
    val l = buckets.alias("l")
    val rr = buckets.alias("r")
    val cand = l.join(rr,
        col("l.bandIdx") === col("r.bandIdx") &&
          col("l.bandHash") === col("r.bandHash") &&
          col("l.id") < col("r.id"))
      .select(col("l.id").as("id_a"), col("r.id").as("id_b"),
        col("l.sig").as("sig_a"), col("r.sig").as("sig_b"))
      .dropDuplicates("id_a", "id_b")
    cand.withColumn("est_jaccard",
        aggregate(zip_with(col("sig_a"), col("sig_b"),
          (a, b) => when(a === b, 1).otherwise(0)),
          lit(0), (acc, x) => acc + x).cast("double") / k)
      .where(col("est_jaccard") >= threshold)
      .select("id_a", "id_b", "est_jaccard")
  }

  /** Exact character-n-gram Jaccard for a set of candidate pairs
    * (verification stage after LSH; exact but O(pairs)).
    */
  def ngramJaccardPairs(df: DataFrame, idCol: String, textCol: String,
                        pairs: DataFrame, shingleN: Int = 3): DataFrame = {
    val sh = df.select(col(idCol).as("id"),
      shingles(col(textCol), shingleN).as("sh"))
    pairs
      .join(sh.select(col("id").as("id_a"), col("sh").as("sh_a")), "id_a")
      .join(sh.select(col("id").as("id_b"), col("sh").as("sh_b")), "id_b")
      .withColumn("inter", size(array_intersect(col("sh_a"), col("sh_b"))))
      .withColumn("uni", size(array_union(col("sh_a"), col("sh_b"))))
      .select(col("id_a"), col("id_b"),
        (col("inter").cast("double") / col("uni")).as("jaccard"))
  }

  /** 64-bit SimHash over token xxhash64s (expr-based: SQL shiftright takes
    * a column bit index, the Scala DSL doesn't).
    */
  def simhash(text: Column): Column = {
    val tokens = split(TextOps.normalize(text), " ")
    val hashes = transform(tokens, t => xxhash64(t))
    val sums = transform(sequence(lit(0), lit(63)), b =>
      aggregate(hashes, lit(0L), (acc, h) =>
        acc + when(expr_bit(h, b) === 1, 1L).otherwise(-1L)))
    aggregate(
      zip_with(sums, sequence(lit(0), lit(63)),
        (s, b) => when(s > 0, shiftLeftC(lit(1L), b)).otherwise(lit(0L))),
      lit(0L), (acc, x) => acc.bitwiseOR(x))
  }

  // SQL-level shift helpers (column bit positions).
  private def expr_bit(h: Column, b: Column): Column =
    call_function("shiftrightunsigned", h, b).bitwiseAND(lit(1L))
  private def shiftLeftC(v: Column, b: Column): Column =
    call_function("shiftleft", v, b)

  /** SimHash per doc via explode + group-by (same CSE rationale as
    * MinHash: each token hashed once; 64 conditional-sum aggregates).
    */
  def simhashes(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val tok = df.select(col(idCol).as("id"),
        explode(split(TextOps.normalize(col(textCol)), " ")).as("tok"))
      .select(col("id"), xxhash64(col("tok")).as("h"))
    val sums = (0 until 64).map(b =>
      sum(when(shiftrightunsigned(col("h"), b).bitwiseAND(lit(1L)) === 1L, 1L)
        .otherwise(-1L)).as(s"b$b"))
    tok.groupBy("id").agg(sums.head, sums.tail: _*)
      .select(col("id"),
        (0 until 64).map(b =>
          when(col(s"b$b") > 0, lit(1L << b)).otherwise(lit(0L)))
          .reduce(_ bitwiseOR _).as("sim"))
  }

  /** SimHash near-dup pairs: band the 64 bits into 4×16-bit keys (a pair
    * within Hamming distance 3 shares at least one band), verify with
    * bit_count(xor) <= maxHamming.
    */
  def simhashPairs(df: DataFrame, idCol: String, textCol: String,
                   maxHamming: Int = 3): DataFrame = {
    val sh = simhashes(df, idCol, textCol)
    val banded = sh.select(col("id"), col("sim"),
      posexplode(transform(sequence(lit(0), lit(3)), j =>
        call_function("shiftrightunsigned", col("sim"), j * 16)
          .bitwiseAND(lit(0xFFFFL)))).as(Seq("bandIdx", "bandKey")))
    val l = banded.alias("l")
    val rr = banded.alias("r")
    l.join(rr, col("l.bandIdx") === col("r.bandIdx") &&
        col("l.bandKey") === col("r.bandKey") && col("l.id") < col("r.id"))
      .select(col("l.id").as("id_a"), col("r.id").as("id_b"),
        bit_count(col("l.sim").bitwiseXOR(col("r.sim"))).as("hamming"))
      .dropDuplicates("id_a", "id_b")
      .where(col("hamming") <= maxHamming)
  }
}
