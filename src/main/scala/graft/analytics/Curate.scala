package graft.analytics

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** One-call training-data curation: the composition a pretraining data
  * team actually runs, built from the engine's exact, engine-portable
  * stages so the whole pipeline is oracle-checkable end-to-end (every
  * key is md5-derived, every threshold integer — no float normalizers,
  * no ingestion-order dependence).
  *
  * Stage order follows the usual cost gradient — cheap row-local gates
  * before shuffling stages:
  *   1. exact dedup (canonical-form md5 fingerprint, min-id survivor;
  *      one hash-aggregate shuffle),
  *   2. quality gate (token-count bounds + max word length; row-local),
  *   3. per-source cap in deterministic md5-sample order (one window
  *      exchange on source; the Common-Crawl-style per-domain cap).
  *
  * Four shuffles total at any scale: fingerprint aggregate, survivor
  * join (both on doc identity — co-partitioned), and the two-phase
  * source cap (salted pre-cap + exact window — skew-safe: the heaviest
  * task is bounded by max-source/32 even when one source holds half the
  * corpus, see [[TextOps.capPerKey]]). The near-dup stages
  * (minhash/simhash/embedding) are deliberately NOT folded in here:
  * they are candidate-generating and corpus-dependent — chain
  * [[Dedup.minhashPairs]]/[[Dedup.clusters]] on the curated output when
  * wanted.
  */
object Curate {

  /** Returns the curated set as `(doc_id, source, n_tokens)`. */
  def curate(docs: DataFrame, idCol: String, textCol: String,
             sourceCol: String, minTokens: Int = 5,
             maxTokens: Int = 100000, maxWordLen: Int = 40,
             perSourceCap: Int = Int.MaxValue): DataFrame = {
    val base = docs.select(col(idCol).as("doc_id"),
      col(sourceCol).as("source"), col(textCol).as("text"))
    val survivors = Dedup.exact(base, "doc_id", "text").select("doc_id")
    val kept = base.join(survivors, Seq("doc_id"))
      .where(TextOps.qualityOk(col("text"), minTokens, maxTokens, maxWordLen))
      .select(col("doc_id"), col("source"),
        TextOps.tokenCount(col("text")).cast("long").as("n_tokens"))
    if (perSourceCap == Int.MaxValue) kept
    else TextOps.capPerKey(kept, "doc_id", "source", perSourceCap)
  }

  /** Per-source data card for a [[curate]] output: docs kept and token
    * mass per source (the numbers a mixture config is written against).
    */
  def dataCard(curated: DataFrame): DataFrame =
    curated.groupBy("source")
      .agg(count(lit(1)).as("n_docs"), sum("n_tokens").as("total_tokens"))
}
