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
  /** Σ aᵢbᵢ via zip_with/aggregate — stays in whole-stage codegen. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0d), (acc, v) => acc + v)

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

  /** LSH-bucketed ANN: probe only the query's bucket. Recall < 1 by
    * construction; raise `bits`→lower bucket occupancy, or probe
    * neighboring buckets for higher recall.
    */
  def lshTopK(emb: DataFrame, idCol: String, vecCol: String, dim: Int,
              queryId: Long, k: Int, bits: Int = 12): DataFrame = {
    val withBucket = emb.withColumn("bucket",
      signBucketExpr(col(vecCol), dim, bits))
    val q = withBucket.where(col(idCol) === queryId)
      .select(col(vecCol).as("qvec"), col("bucket").as("qbucket"))
    withBucket.join(broadcast(q), col("bucket") === col("qbucket"))
      .where(col(idCol) =!= queryId)
      .select(col(idCol), cosine(col(vecCol), col("qvec")).as("score"))
      .orderBy(col("score").desc, col(idCol))
      .limit(k)
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

  /** Embedding-cosine near-duplicate pairs: bucket, pair within bucket,
    * verify with exact cosine ≥ threshold.
    */
  def cosineNearDupPairs(emb: DataFrame, idCol: String, vecCol: String,
                         dim: Int, threshold: Double,
                         bits: Int = 8): DataFrame = {
    val b = emb.select(col(idCol).as("id"), col(vecCol).as("v"),
      signBucketExpr(col(vecCol), dim, bits).as("bucket"))
    val l = b.alias("l")
    val r = b.alias("r")
    l.join(r, col("l.bucket") === col("r.bucket") && col("l.id") < col("r.id"))
      .select(col("l.id").as("id_a"), col("r.id").as("id_b"),
        cosine(col("l.v"), col("r.v")).as("cos"))
      .where(col("cos") >= threshold)
  }
}
