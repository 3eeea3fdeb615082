package graft

import org.scalatest.funsuite.AnyFunSuite

/** Driver-contract smoke: the flagship entry must return rows and every
  * queries-map key must have either an oracle or a documented contract.
  */
class EntrySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("flagship entry returns rows on sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracle references a defined query and vice versa") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert(o.subsetOf(q), s"oracles without queries: ${o -- q}")
    assert(q === o, s"queries without oracles: ${q -- o}")
  }
}
