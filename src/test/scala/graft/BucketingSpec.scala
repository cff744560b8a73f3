package graft

import graft.ops.Bucketing
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class BucketingSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("same-bucketed tables join with no shuffle exchange and identical results") {
    val dir = "/root/testdata/sf0.001"
    val orders = Tables.orders(spark, dir).select("o_orderkey", "o_custkey", "o_totalprice")
    val lineitem = Tables.lineitem(spark, dir).select("l_orderkey", "l_quantity")
      .withColumnRenamed("l_orderkey", "o_orderkey")
    Bucketing.writeBucketed(orders, "b_orders", "o_orderkey", 4)
    Bucketing.writeBucketed(lineitem, "b_lineitem", "o_orderkey", 4)

    // at this toy SF the planner correctly prefers broadcast; disable it
    // so the plan shows what a 100 TB fact-fact join would do
    val thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = Bucketing.bucketedJoin(spark, "b_orders", "b_lineitem", "o_orderkey")
        .groupBy("o_custkey").agg(count(lit(1)).as("n"))

      val joinPlan = Bucketing.bucketedJoin(spark, "b_orders", "b_lineitem", "o_orderkey")
        .queryExecution.executedPlan.toString
      assert(!joinPlan.contains("Exchange hashpartitioning"),
        s"bucketed join must have no shuffle exchange, got:\n$joinPlan")
      assert(joinPlan.contains("SortMergeJoin"), s"expected SMJ:\n$joinPlan")
      assert(joinPlan.contains("Bucketed: true"), s"expected bucketed scans:\n$joinPlan")

      // result parity with the plain (shuffling) join
      val plain = orders.join(lineitem, "o_orderkey")
        .groupBy("o_custkey").agg(count(lit(1)).as("n"))
      assert(joined.collect().toSet == plain.collect().toSet)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thresh)

    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
  }

  test("aggregation on the bucket key is also shuffle-free") {
    val dir = "/root/testdata/sf0.001"
    Bucketing.writeBucketed(
      Tables.orders(spark, dir).select("o_orderkey", "o_totalprice"),
      "b_orders_agg", "o_orderkey", 4)
    val plan = spark.table("b_orders_agg")
      .groupBy("o_orderkey").agg(count(lit(1)).as("n"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"bucket-key aggregation must be shuffle-free, got:\n$plan")
    spark.sql("DROP TABLE IF EXISTS b_orders_agg")
  }
}
