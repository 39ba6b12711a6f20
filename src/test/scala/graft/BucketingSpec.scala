package graft

import graft.operators.Bucketing
import org.apache.spark.sql.execution.ExplainMode

class BucketingSpec extends SparkSpec {

  test("same-bucketed tables join without any shuffle") {
    val li = Tables.lineitem(spark, sf).select("l_orderkey", "l_quantity")
    val ord = Tables.orders(spark, sf).select("o_orderkey", "o_totalprice")
      .withColumnRenamed("o_orderkey", "l_orderkey")

    Bucketing.writeBucketed(li, "b_lineitem", "l_orderkey", 8)
    Bucketing.writeBucketed(ord, "b_orders", "l_orderkey", 8)
    try {
      val joined = Bucketing.colocatedJoin(spark, "b_lineitem", "b_orders", "l_orderkey")
      val plan = joined.queryExecution.explainString(ExplainMode.fromString("simple"))
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join should not shuffle:\n$plan")
      // and it still computes the right thing
      val n = joined.count()
      val expected = li.join(ord, "l_orderkey").count()
      assert(n === expected)
    } finally {
      spark.sql("DROP TABLE IF EXISTS b_lineitem")
      spark.sql("DROP TABLE IF EXISTS b_orders")
    }
  }
}
