package graft.analytics

import graft.TestSpark
import graft.functions.SortedBucket
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class LayoutSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("SortedBucket counts cutpoints <= value; nulls stay null") {
    val cuts = Array(10.0, 20.0, 30.0)
    val df = Seq(Some(5.0), Some(10.0), Some(15.0), Some(30.0), Some(99.0),
      None).toDF("v")
    val got = df.select(SortedBucket(col("v"), cuts).as("b"))
      .collect().map(r => if (r.isNullAt(0)) -1 else r.getInt(0))
    // 5→0 cutpoints ≤, 10→1 (exact hit counts), 15→1, 30→3, 99→3
    assert(got.toSeq === Seq(0, 1, 1, 3, 3, -1))
  }

  test("SortedBucket codegen and interpreted agree on random values") {
    val rnd = new scala.util.Random(7)
    val cuts = (1 to 100).map(_ => rnd.nextDouble() * 100).distinct
      .sorted.toArray
    val vals = (1 to 500).map(_ => rnd.nextDouble() * 120 - 10)
    val df = vals.toDF("v")
    val viaExpr = df.select(SortedBucket(col("v"), cuts).as("b"))
      .as[Int].collect()
    val manual = vals.map(v => cuts.count(_ <= v))
    assert(viaExpr.toSeq === manual)
  }

  test("zvalue on a single column is monotone in that column") {
    val df = (1 to 2000).map(_.toLong).toDF("x")
    val z = df.select(col("x"), Layout.zvalue(df, Seq("x"), bits = 8)
      .as("z")).orderBy("x").as[(Long, Long)].collect()
    assert(z.sliding(2).forall(p => p(0)._2 <= p(1)._2))
    // equi-depth: buckets spread over most of the 8-bit range
    assert(z.map(_._2).distinct.length > 200)
  }

  test("zorderContract: clustered layout skips files the baseline scans") {
    // two independent pseudo-random dimensions — the hard case for any
    // single-column sort, the normal case for Z-order
    val df = spark.range(20000).select(col("id"),
      (col("id") * 7919 % 1000).as("x"),
      (col("id") * 104729 % 1000).as("y"))
    val dir = java.nio.file.Files.createTempDirectory("zorder-spec").toString
    val r = Layout.zorderContract(df, Seq("x", "y"), dir, numFiles = 32)
      .collect()(0)
    assert(r.getBoolean(0),
      s"zorder touched ${r.getLong(1)} vs baseline ${r.getLong(2)}")
    // the win should be large, not marginal
    assert(r.getLong(1) * 3 <= r.getLong(2))
  }
}
