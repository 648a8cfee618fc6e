package graft.operators

import graft.SparkSpec

class BucketingSpec extends SparkSpec {

  test("co-bucketed join plans with zero shuffle exchanges and matches the plain join") {
    val orders = spark.read.parquet(sf() + "/orders.parquet")
      .select("o_orderkey", "o_custkey", "o_totalprice")
    val customer = spark.read.parquet(sf() + "/customer.parquet")
      .select("c_custkey", "c_mktsegment")
      .withColumnRenamed("c_custkey", "o_custkey")
    Bucketing.writeBucketed(orders, "b_orders", 4, Seq("o_custkey"))
    Bucketing.writeBucketed(customer, "b_customer", 4, Seq("o_custkey"))
    // force SMJ (customer would broadcast at this SF, hiding the point)
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = Bucketing.cobucketedJoin(spark, "b_orders", "b_customer",
        Seq("o_custkey"))
      val n = joined.count()
      // same rows as the plain (non-bucketed) join
      val plainN = orders.join(customer, Seq("o_custkey")).count()
      assert(n == plainN && n > 0)
      joined.collect() // materialize so AQE finalizes the join's own plan
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), s"expected SMJ, got:\n$plan")
      assert(!plan.contains("Exchange"),
        s"co-bucketed join should not shuffle either side:\n$plan")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_customer")
    }
  }
}
