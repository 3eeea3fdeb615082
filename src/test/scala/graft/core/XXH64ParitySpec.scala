package graft.core

import graft.TestSpark
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

/** Pins driver-side node-id hashing to Spark's builtin xxhash64: literal
  * resolution must agree with distributed dictionary builds.
  */
class XXH64ParitySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("QValue.id matches Spark xxhash64 over the flat fields") {
    import spark.implicits._
    val samples: Seq[QValue] = Seq(
      QValue.Iri("alice"), QValue.Iri(""), QValue.BNode("b1"),
      QValue.Str("cool_person"), QValue.Str("x" * 100),
      QValue.Str("héllo wörld ✓"), QValue.LangStr("value", "en"),
      QValue.TypedStr("10", "http://example.com/int"),
      QValue.IntV(-123456789L), QValue.IntV(0L), QValue.IntV(Long.MaxValue),
      QValue.FloatV(-12345e-6), QValue.FloatV(0.0), QValue.FloatV(-0.0),
      QValue.BoolV(true), QValue.BoolV(false), QValue.TimeV(1405974733000000L))
    val df = spark.createDataset(samples.map(QV(_))).toDF()
    val got = df.select(Values.idColOfFields(col)).as[Long].collect().toSeq
    val want = samples.map(QValue.id)
    assert(got === want)
  }

  test("raw byte-level xxh64 sanity on multi-stripe input") {
    import spark.implicits._
    val strs = Seq("", "a", "abcd", "abcdefgh", "0123456789abcdef",
      "x" * 31, "y" * 32, "z" * 33, "w" * 100)
    val df = strs.toDF("v")
    val got = df.select(org.apache.spark.sql.functions.xxhash64(col("v")))
      .as[Long].collect().toSeq
    val want = strs.map(s => XXH64.hashString(s, 42L))
    assert(got === want)
  }
}
