package graft.analytics

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Item-based co-occurrence similarity — the collaborative-filtering /
  * related-entity primitive ("customers who bought the same parts",
  * "documents citing the same sources"). The reference engine can
  * traverse 2-hop paths one node at a time; this is the corpus-wide
  * set-oriented form: one self-join on the item key + one pair
  * aggregate.
  *
  * Scale shape: the item self-join fans out quadratically in each
  * item's entity count, so hot items are THE hazard (a part bought by
  * 10 k customers contributes 10⁸ pairs and ~zero signal — the classic
  * frequent-item problem). `maxPerItem` caps each item's entity list
  * in deterministic md5-key order via the skew-safe two-phase
  * [[TextOps.capPerKey]] (bit-identical on any engine, so the capped
  * variant still has an EXACT SQL oracle). Everything downstream is
  * hash aggregates; the per-entity top-k window partitions by entity.
  */
object CoOccur {

  /** Top-k most-similar entities per entity by shared-item count.
    * Input rows `(entityCol, itemCol)` (duplicates collapsed). Pairs
    * below `minShared` are dropped BEFORE the top-k, and the ranking
    * is total (shared desc, then partner id) — deterministic.
    * Returns `(c_a, c_b, shared, rk)`, symmetric (each surviving pair
    * ranks from both sides).
    */
  def topCoOccur(df: DataFrame, entityCol: String, itemCol: String,
                 k: Int, minShared: Long = 2L,
                 maxPerItem: Int = 0): DataFrame = {
    require(k >= 1, "topCoOccur: k must be >= 1")
    val ei = df.select(col(entityCol).as("c"), col(itemCol).as("p"))
      .where(col("c").isNotNull && col("p").isNotNull).distinct()
    val capped =
      if (maxPerItem > 0) TextOps.capPerKey(ei, "c", "p", maxPerItem)
      else ei
    val pairs = capped.alias("a").join(capped.alias("b"),
        col("a.p") === col("b.p") && col("a.c") < col("b.c"))
      .groupBy(col("a.c").as("c_a"), col("b.c").as("c_b"))
      .agg(count(lit(1)).as("shared"))
      .where(col("shared") >= minShared)
    val sym = pairs.unionByName(pairs.select(col("c_b").as("c_a"),
      col("c_a").as("c_b"), col("shared")))
    val w = Window.partitionBy("c_a")
      .orderBy(col("shared").desc, col("c_b"))
    sym.withColumn("rk", row_number().over(w)).where(col("rk") <= k)
  }
}
