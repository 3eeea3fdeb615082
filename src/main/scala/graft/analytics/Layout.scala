package graft.analytics

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.SortedBucket

/** Data-layout maintenance for the Parquet lake: multi-dimensional
  * Z-order clustering, the file-skipping primitive (Parquet footer
  * min/max + Spark's partition pruning) that decides how many of a
  * 100 TB table's files a selective multi-column query has to touch.
  * The reference engine delegates layout to its KV backends' key order
  * (/root/reference/graph/kv/quadstore.go — one fixed index order per
  * direction); a columnar lake gets the same effect, on ANY column
  * combination, from interleaved sort keys.
  */
object Layout {

  /** The Z-value column: each clustering column is discretized into its
    * `bits`-bit quantile bucket (equi-DEPTH, so skewed columns spread
    * over the full bucket range — equi-width buckets would collapse a
    * Zipfian column into one bucket and un-cluster the interleave), and
    * the bucket bits of all columns are interleaved LSB-first into one
    * long. Quantile cutpoints come from one Greenwald-Khanna pass
    * (`approxQuantile`, driver-held at 2^bits−1 doubles per column);
    * the per-row bucket search is the codegen'd [[SortedBucket]]
    * binary search, and the interleave is a constant-folded shift/or
    * tree — the whole pipeline stays inside whole-stage codegen.
    * Nulls land in bucket 0.
    */
  def zvalue(df: DataFrame, cols: Seq[String], bits: Int = 12,
             epsilon: Double = 1e-4): Column = {
    require(cols.nonEmpty, "zvalue: need at least one column")
    require(bits * cols.length <= 60,
      s"zvalue: ${bits}b × ${cols.length} cols exceeds a long")
    val probs = (1 until (1 << bits)).map(_.toDouble / (1 << bits)).toArray
    val buckets = cols.map { c =>
      val casted = df.select(col(c).cast("double").as("__v"))
      val cuts = casted.stat.approxQuantile("__v", probs, epsilon)
        .distinct.sorted
      coalesce(SortedBucket(col(c).cast("double"), cuts), lit(0))
        .cast("long")
    }
    val n = cols.length
    val terms = for {
      i <- 0 until bits
      j <- 0 until n
    } yield shiftleft(shiftright(buckets(j), i) % 2, i * n + j)
    terms.reduce(_ + _) // disjoint bit positions: + == | and cannot overflow
  }

  /** Z-order clustered write: range-partition on the Z-value into
    * `numFiles` files, sort each file by it, write Parquet. Range
    * partitioning (not hash) is what makes file-level min/max fences
    * narrow: each file covers one contiguous Z range = one small
    * hyper-rectangle set in the clustering columns. One extra column +
    * one range exchange + local sort over a plain write — at any
    * scale, the cost profile of a sorted shuffle.
    */
  def zorderWrite(df: DataFrame, cols: Seq[String], outDir: String,
                  numFiles: Int = 64, bits: Int = 12,
                  epsilon: Double = 1e-4): Unit = {
    val z = zvalue(df, cols, bits, epsilon)
    df.withColumn("__graft_z", z)
      .repartitionByRange(numFiles, col("__graft_z"))
      .sortWithinPartitions("__graft_z")
      .drop("__graft_z")
      .write.mode("overwrite").parquet(outDir)
  }

  /** Per-file [min, max] fences for `cols` over a written Parquet dir —
    * the engine-side mirror of what Parquet footers give a scan
    * planner (one pass, grouped by `input_file_name`).
    */
  def fileFences(spark: SparkSession, dir: String,
                 cols: Seq[String]): DataFrame = {
    val aggs = cols.flatMap(c => Seq(
      min(col(c).cast("double")).as(s"min_$c"),
      max(col(c).cast("double")).as(s"max_$c")))
    spark.read.parquet(dir)
      .groupBy(input_file_name().as("file"))
      .agg(aggs.head, aggs.tail: _*)
  }

  /** How many files a conjunctive box predicate has to touch, given the
    * fences: a file is scanned iff its [min,max] overlaps the box on
    * EVERY clustering column — exactly Parquet row-group pruning logic.
    */
  private def filesTouched(fences: Array[org.apache.spark.sql.Row],
                           cols: Seq[String],
                           box: Seq[(Double, Double)]): Int =
    fences.count { r =>
      cols.zip(box).forall { case (c, (lo, hi)) =>
        val mn = r.getAs[Double](s"min_$c"); val mx = r.getAs[Double](s"max_$c")
        mx >= lo && mn <= hi
      }
    }

  /** Contract harness for the driver oracle: Z-order the rows by
    * `cols`, write an UNCLUSTERED baseline of the same rows with the
    * same file count, and sweep a deterministic grid of selective
    * boxes over both layouts' file fences. `zorder_ok` = the clustered
    * layout touches at most half the files the baseline touches,
    * summed over the sweep (in practice the gap is far larger; 2× is
    * the flake-proof floor). The fence collects are the oracle side —
    * file counts are small by construction.
    */
  def zorderContract(df: DataFrame, cols: Seq[String], tmpDir: String,
                     numFiles: Int = 64, boxesPerCol: Int = 8)
      : DataFrame = {
    val spark = df.sparkSession
    val zDir = s"$tmpDir/zorder"
    val bDir = s"$tmpDir/baseline"
    zorderWrite(df, cols, zDir, numFiles)
    // baseline: same rows, same file count, hash-scattered layout
    df.repartition(numFiles).write.mode("overwrite").parquet(bDir)
    val zf = fileFences(spark, zDir, cols).collect()
    val bf = fileFences(spark, bDir, cols).collect()
    // per-column value ranges drive a deterministic grid of narrow boxes
    val ranges = cols.map { c =>
      val r = df.agg(min(col(c).cast("double")),
        max(col(c).cast("double"))).head
      (r.getDouble(0), r.getDouble(1))
    }
    val boxes = (0 until boxesPerCol).map { k =>
      cols.indices.map { j =>
        val (lo, hi) = ranges(j)
        val w = (hi - lo) / boxesPerCol
        // stagger the grid per column so boxes are not all on the
        // diagonal of a correlated dataset
        val off = lo + ((k + j * 3) % boxesPerCol) * w
        (off, off + w)
      }
    }
    val zTouched = boxes.map(b => filesTouched(zf, cols, b)).sum
    val bTouched = boxes.map(b => filesTouched(bf, cols, b)).sum
    spark.range(1).select(
      lit(zTouched * 2 <= bTouched).as("zorder_ok"),
      lit(zTouched.toLong).as("z_files"),
      lit(bTouched.toLong).as("baseline_files"))
  }
}
