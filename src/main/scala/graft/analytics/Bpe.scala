package graft.analytics

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** BPE tokenizer training over a corpus (Sennrich et al. 2016 merge
  * rule), architected for scale the way production trainers actually
  * run: the ONLY corpus-sized stage is one distributed word-count
  * aggregate (map-side combined, one shuffle); the merge loop then runs
  * driver-local over the bounded word-frequency table (|unique words|,
  * capped at `maxWords` by frequency — at 100 TB you train on the count
  * table, never re-scan text per merge: a per-merge corpus pass would be
  * `numMerges` full scans).
  *
  * Determinism contract: merge ties break lexicographically on the pair,
  * word ties on frequency then word, so the merge list is identical on
  * any engine, any partitioning, every run — the property the driver
  * contract (`text_bpe`) asserts alongside lossless segmentation.
  */
object Bpe {

  /** End-of-word marker (classic BPE: lets a suffix merge differ from the
    * same pair mid-word). Chosen outside the normalized alphabet.
    */
  val EndOfWord = "</w>"

  /** Train `numMerges` merges; returns them in application order. */
  def train(docs: DataFrame, textCol: String, numMerges: Int,
            maxWords: Int = 100000): Seq[(String, String)] = {
    val counts = wordCounts(docs, textCol)
      .orderBy(col("cnt").desc, col("w"))
      .limit(maxWords)
      .collect().map(r => r.getString(0) -> r.getLong(1))
    trainFromCounts(counts.toSeq, numMerges)
  }

  /** The distributed pass: `(w, cnt)` word frequencies, one aggregate. */
  def wordCounts(docs: DataFrame, textCol: String): DataFrame =
    docs.select(explode(split(TextOps.normalize(col(textCol)), " ")).as("w"))
      .where(length(col("w")) > 0)
      .groupBy("w").agg(count(lit(1)).as("cnt"))

  /** Classic merge loop over a word-frequency table (pure, deterministic;
    * exact pair recount per round — fast because it runs on |vocab|, not
    * the corpus).
    */
  def trainFromCounts(counts: Seq[(String, Long)],
                      numMerges: Int): Seq[(String, String)] = {
    // word -> symbol sequence (chars + end-of-word marker)
    var words: Array[(Array[String], Long)] = counts.map { case (w, c) =>
      (w.map(_.toString).toArray :+ EndOfWord, c)
    }.toArray
    val merges = Seq.newBuilder[(String, String)]
    var m = 0
    var done = false
    while (m < numMerges && !done) {
      val pairCounts = scala.collection.mutable.HashMap.empty[(String, String), Long]
      for ((syms, c) <- words) {
        var i = 0
        while (i < syms.length - 1) {
          val k = (syms(i), syms(i + 1))
          pairCounts(k) = pairCounts.getOrElse(k, 0L) + c
          i += 1
        }
      }
      if (pairCounts.isEmpty) done = true
      else {
        val best = pairCounts.toSeq.minBy { case ((a, b), c) => (-c, a, b) }
        if (best._2 < 2) done = true // no pair worth merging
        else {
          val (a, b) = best._1
          merges += ((a, b))
          val ab = a + b
          words = words.map { case (syms, c) =>
            val out = new scala.collection.mutable.ArrayBuffer[String](syms.length)
            var i = 0
            while (i < syms.length) {
              if (i < syms.length - 1 && syms(i) == a && syms(i + 1) == b) {
                out += ab; i += 2
              } else { out += syms(i); i += 1 }
            }
            (out.toArray, c)
          }
          m += 1
        }
      }
    }
    merges.result()
  }

  /** Segment one (normalized) word with a trained merge list, applying
    * merges in training order — the standard greedy BPE encoder.
    */
  def segmentWord(word: String, merges: Seq[(String, String)]): Seq[String] = {
    var syms: Vector[String] = word.map(_.toString).toVector :+ EndOfWord
    for ((a, b) <- merges) {
      val out = Vector.newBuilder[String]
      var i = 0
      while (i < syms.length) {
        if (i < syms.length - 1 && syms(i) == a && syms(i + 1) == b) {
          out += (a + b); i += 2
        } else { out += syms(i); i += 1 }
      }
      syms = out.result()
    }
    syms
  }

  /** Corpus segmentation: `(doc_id kept as-is, tokens: array<string>)`.
    * The merge list rides to executors as a broadcast-sized plan literal;
    * segmentation is a per-row map (no shuffle).
    */
  def segment(docs: DataFrame, idCol: String, textCol: String,
              merges: Seq[(String, String)]): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(merges)
    docs.select(col(idCol).cast("long").as("id"), col(textCol).as("text"))
      .as[(Long, String)]
      .map { case (id, text) =>
        val words = text.toLowerCase.trim.replaceAll("\\s+", " ")
        val toks =
          if (words.isEmpty) Array.empty[String]
          else words.split(" ").flatMap(w => segmentWord(w, bc.value))
        (id, toks)
      }.toDF("id", "tokens")
  }
}
