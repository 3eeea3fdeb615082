package graft.analytics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (`array<float>`).
  * Baseline: brute-force cosine top-k (one scan, map-side only until the
  * final top-k reduce). Scale path: LSH sign-bucketing (random-hyperplane)
  * so each probe touches one bucket — the IVF idea with hash-derived,
  * data-independent "centroids", which keeps bucketing a pure column
  * expression (no training job, deterministic across runs).
  */
object Similarity {
  /** Σ aᵢbᵢ — the native codegen'd [[graft.functions.ArrayDot]] expression
    * (tight loop in whole-stage codegen AND inside join-condition
    * predicates; left-to-right double accumulation, bitwise equal to a
    * sequential SQL dot product).
    */
  def dot(a: Column, b: Column): Column = graft.functions.ArrayDot(a, b)

  def l2norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (l2norm(a) * l2norm(b))

  /** Brute-force cosine top-k for one query id: broadcast the single query
    * row, scan once, global top-k (Spark's TakeOrdered — no full sort).
    */
  def bruteTopK(emb: DataFrame, idCol: String, vecCol: String,
                queryId: Long, k: Int): DataFrame = {
    val q = emb.where(col(idCol) === queryId)
      .select(col(vecCol).as("qvec"))
    emb.where(col(idCol) =!= queryId)
      .crossJoin(broadcast(q))
      .select(col(idCol), cosine(col(vecCol), col("qvec")).as("score"))
      .orderBy(col("score").desc, col(idCol))
      .limit(k)
  }

  /** All-pairs top-k per probe row against a (small, broadcastable) probe
    * set: the batched form used to attach nearest neighbors to a stream of
    * queries. One scan of the corpus per batch.
    */
  def batchTopK(emb: DataFrame, probes: DataFrame, idCol: String,
                vecCol: String, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val joined = emb.alias("c").crossJoin(broadcast(probes.alias("p")))
      .where(col("c." + idCol) =!= col("p." + idCol))
      .select(col("p." + idCol).as("query_id"), col("c." + idCol).as("id"),
        cosine(col("c." + vecCol), col("p." + vecCol)).as("score"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("score").desc, col("id"))
    joined.withColumn("rn", row_number().over(w)).where(col("rn") <= k)
      .drop("rn")
  }

  /** Bits for a target mean bucket occupancy: bits ≈ log2(n/target),
    * clamped to [0, 20]. Derive from a cheap count (or a known corpus
    * size) instead of fixing bits at the call site — a fixed `bits` makes
    * within-bucket work O(n²/2^bits), which silently degrades as the
    * corpus grows.
    */
  def autoBits(n: Long, targetBucket: Int = 256): Int =
    math.max(0, math.min(20,
      math.ceil(math.log(math.max(n, 1).toDouble / targetBucket) /
        math.log(2.0)).toInt))

  /** LSH-bucketed ANN with multi-probe: probe every bucket within Hamming
    * distance `probe` of the query's bucket (probe=1 → bits+1 buckets),
    * trading a small scan multiplier for recall. `bits < 0` derives bits
    * from the corpus size (one count job). Recall < 1 by construction —
    * verify with recall@k against [[bruteTopK]].
    */
  def lshTopK(emb: DataFrame, idCol: String, vecCol: String, dim: Int,
              queryId: Long, k: Int, bits: Int = -1,
              probe: Int = 1): DataFrame = {
    val b = if (bits >= 0) bits else autoBits(emb.count())
    val withBucket = emb.withColumn("bucket",
      signBucketExpr(col(vecCol), dim, b))
    val q = withBucket.where(col(idCol) === queryId)
      .select(col(vecCol).as("qvec"), col("bucket").as("qbucket"))
    // single broadcast row → the non-equi bucket predicate is a cheap
    // broadcast-nested-loop filter, still one scan of the corpus
    withBucket.join(broadcast(q),
        bit_count(col("bucket").bitwiseXOR(col("qbucket"))) <= probe)
      .where(col(idCol) =!= queryId)
      .select(col(idCol), cosine(col(vecCol), col("qvec")).as("score"))
      .orderBy(col("score").desc, col(idCol))
      .limit(k)
  }

  /** Batched LSH ANN for probe sets too large to broadcast-cross-join:
    * both sides bucket with the same hyperplanes, the PROBE side explodes
    * into its own bucket plus every Hamming-1 neighbor bucket (multi-probe
    * as rows, so the candidate join is an EQUI-join on the bucket — never
    * a quadratic non-equi join), then exact cosine + per-probe window
    * top-k. `probe` is the full Hamming radius: every bucket within
    * distance `probe` is visited, Σ_{i≤probe} C(bits,i) equi-lookups of
    * ~n/2^bits rows per probe row.
    */
  def lshBatchTopK(emb: DataFrame, probes: DataFrame, idCol: String,
                   vecCol: String, dim: Int, k: Int,
                   bits: Int = -1, probe: Int = 1): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val b = if (bits >= 0) bits else autoBits(emb.count())
    val corpus = emb.select(col(idCol).as("id"), col(vecCol).as("v"),
      signBucketExpr(col(vecCol), dim, b).as("bucket"))
    // all XOR masks with popcount ≤ probe — the caller's requested radius,
    // not a silent radius-1 fallback
    val flips: Seq[Column] =
      (0 to math.min(math.max(probe, 0), b)).flatMap(d =>
        (0 until b).combinations(d).map(c =>
          lit(c.foldLeft(0L)((m, j) => m | (1L << j)))))
    val probeExp = probes.select(col(idCol).as("query_id"),
        col(vecCol).as("qv"),
        signBucketExpr(col(vecCol), dim, b).as("qbucket"))
      .select(col("query_id"), col("qv"),
        explode(array(flips.map(f => col("qbucket").bitwiseXOR(f)): _*))
          .as("bucket"))
    val cand = corpus.join(probeExp, Seq("bucket"))
      .where(col("id") =!= col("query_id"))
      .select(col("query_id"), col("id"),
        cosine(col("v"), col("qv")).as("score"))
      .dropDuplicates("query_id", "id")
    val w = Window.partitionBy("query_id")
      .orderBy(col("score").desc, col("id"))
    cand.withColumn("rn", row_number().over(w)).where(col("rn") <= k)
      .drop("rn")
  }

  /** Recall@k of the LSH path against the exact brute-force top-k — the
    * verification harness for the approximate operator (its oracle-able
    * contract is `recall ≥ minRecall`, not row equality).
    */
  def lshRecallAtK(emb: DataFrame, idCol: String, vecCol: String, dim: Int,
                   queryId: Long, k: Int, minRecall: Double,
                   bits: Int = -1, probe: Int = 1): DataFrame = {
    val ann = lshTopK(emb, idCol, vecCol, dim, queryId, k, bits, probe)
      .select(col(idCol))
    val exact = bruteTopK(emb, idCol, vecCol, queryId, k).select(col(idCol))
    ann.join(exact, idCol)
      .agg((count(lit(1)).cast("double") / k >= minRecall).as("recall_ok"))
  }

  /** Random-hyperplane sign bucket: bit j = sign(Σᵢ rᵢⱼ·embᵢ) with
    * rᵢⱼ ∈ {−1,+1} derived from a hash of (j,i) — deterministic,
    * data-independent (no training job). The plane matrix is folded into
    * literal coefficient arrays at plan time, so each row costs exactly
    * bits×dim fused multiply-adds inside codegen.
    */
  def signBucketExpr(vec: Column, dim: Int, bits: Int): Column =
    (0 until bits).map { j =>
      val coefs = array((0 until dim).map { i =>
        lit(if ((graft.core.XXH64.hashInt(j * dim + i, 42L) & 1L) == 1L)
          1.0d else -1.0d)
      }: _*)
      val s = aggregate(zip_with(vec, coefs, (x, c) => x.cast("double") * c),
        lit(0.0d), (acc, x) => acc + x)
      when(s > 0, lit(1L << j)).otherwise(lit(0L))
    }.reduce(_ bitwiseOR _)

  /** Embedding-cosine near-duplicate pairs, approximate: bucket, pair
    * within bucket, verify with exact cosine ≥ threshold. `bits < 0`
    * derives bits from the corpus size. Same-bucket blocking has false
    * negatives (a near-dup pair can straddle a hyperplane) — use
    * [[cosineNearDupPairsExact]] when the output must be the exact answer.
    */
  def cosineNearDupPairs(emb: DataFrame, idCol: String, vecCol: String,
                         dim: Int, threshold: Double,
                         bits: Int = -1): DataFrame = {
    val bb = if (bits >= 0) bits else autoBits(emb.count())
    val b = emb.select(col(idCol).as("id"), col(vecCol).as("v"),
      signBucketExpr(col(vecCol), dim, bb).as("bucket"))
    val l = b.alias("l")
    val r = b.alias("r")
    l.join(r, col("l.bucket") === col("r.bucket") && col("l.id") < col("r.id"))
      .select(col("l.id").as("id_a"), col("r.id").as("id_b"),
        cosine(col("l.v"), col("r.v")).as("cos"))
      .where(col("cos") >= threshold)
  }

  /** EXACT embedding-cosine near-duplicate pairs: all-pairs self-join with
    * id_a < id_b. Cosine admits no sound metric blocking (it is norm-
    * invariant), so the exact contract is quadratic by nature; the join is
    * a block-partitioned cartesian (Spark shuffles both sides into block
    * pairs, each task a dense dot-product loop in codegen). For corpora
    * where n² is unpayable, [[cosineNearDupPairs]] is the approximate
    * path. Output: (id_a, id_b) — ids only, so the oracle comparison never
    * rides on float formatting.
    */
  def cosineNearDupPairsExact(emb: DataFrame, idCol: String, vecCol: String,
                              threshold: Double): DataFrame = {
    // norms once per row (cached so the optimizer cannot inline them back
    // into the per-pair join condition); per pair only the codegen'd dot
    // loop + one division — identical arithmetic to dot(a,b)/(‖a‖·‖b‖),
    // the oracle's formula
    val b = emb.select(col(idCol).as("id"), col(vecCol).as("v"),
      l2norm(col(vecCol)).as("n")).cache()
    b.alias("l").join(b.alias("r"), col("l.id") < col("r.id"))
      .where(dot(col("l.v"), col("r.v")) / (col("l.n") * col("r.n"))
        >= threshold)
      .select(col("l.id").as("id_a"), col("r.id").as("id_b"))
  }
}
