package graft

import org.apache.spark.sql.SparkSession

object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1 << 20).selectExpr("sum(id)").collect()
    def timed[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"PROBE $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    import org.apache.spark.sql.functions._
    val dir = "/root/testdata/sf0.1"
    def t(n: String) = spark.read.parquet(s"$dir/$n.parquet")
    val customer = t("customer")
    val q1 = graft.core.Graph.quadifyTable(customer, "customer", "c_custkey", Some("tbl:customer"))
    timed("quadify-customer-count")(println("rows=" + q1.count()))
    timed("quadify-customer-count2")(q1.count())
    val q2 = graft.core.Graph.quadifyEdge(t("orders"), "orders", "o_orderkey", "o_cust", "customer", "o_custkey")
    timed("quadify-orders-edge-count")(println("rows=" + q2.count()))
    timed("cache-customer")(q1.cache().count())
    timed("read-cached-customer")(q1.count())
    spark.stop()
  }
}
