package graft

import org.apache.spark.sql.functions._

/** Demonstrates the co-located-join story: joining two tables bucketed
  * on the join key plans a SortMergeJoin with NO shuffle exchange —
  * the pre-partitioning both sides share replaces it. This is the 100 TB
  * pattern for repeated big-big joins (bucket once, join many times). */
class BucketingSpec extends SparkSpec {

  test("bucketed tables join without a shuffle exchange") {
    val dir = "/root/testdata/sf0.001"
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    val prevBroadcast =
      spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // static plan + no broadcast so the join strategy is visible
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.sql("DROP TABLE IF EXISTS g_orders_bkt")
      spark.sql("DROP TABLE IF EXISTS g_customer_bkt")
      Tables.load(spark, dir, "orders")
        .write.bucketBy(8, "o_custkey").sortBy("o_custkey")
        .saveAsTable("g_orders_bkt")
      Tables.load(spark, dir, "customer")
        .write.bucketBy(8, "c_custkey").sortBy("c_custkey")
        .saveAsTable("g_customer_bkt")
      val joined = spark.table("g_orders_bkt")
        .join(spark.table("g_customer_bkt"),
          col("o_custkey") === col("c_custkey"))
        .groupBy("c_mktsegment").agg(count(lit(1)).as("n"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), plan)
      assert(!plan.contains("Exchange hashpartitioning(o_custkey"),
        "orders side should be pre-partitioned by bucketing:\n" + plan)
      assert(!plan.contains("Exchange hashpartitioning(c_custkey"),
        "customer side should be pre-partitioned by bucketing:\n" + plan)
      // and the result is still correct
      val n = joined.agg(sum("n")).collect()(0).getLong(0)
      assert(n == Tables.load(spark, dir, "orders")
        .join(Tables.load(spark, dir, "customer"),
          col("o_custkey") === col("c_custkey")).count())
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevBroadcast)
      spark.sql("DROP TABLE IF EXISTS g_orders_bkt")
      spark.sql("DROP TABLE IF EXISTS g_customer_bkt")
    }
  }

  test("approx_count_distinct within tolerance of exact") {
    val dir = "/root/testdata/sf0.001"
    val r = operators.Relational.approxUsers(Tables.load(spark, dir, "events"))
      .collect()
    assert(r.nonEmpty)
    r.foreach { row =>
      val exact = row.getLong(1).toDouble
      val approx = row.getLong(2).toDouble
      assert(math.abs(approx - exact) / exact < 0.1,
        s"approx $approx vs exact $exact")
    }
  }
}
