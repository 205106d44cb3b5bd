package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Bucketed co-located join must eliminate the shuffle on both join
  * sides (the pre-partitioning scale technique the gate query
  * bucketed_colocated_join demonstrates). */
class BucketedJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("matching bucket counts join without an exchange on the keys") {
    // Force the sort-merge path so the assertion is about bucketing,
    // not a statistics-based broadcast.
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      spark.sql("CREATE DATABASE IF NOT EXISTS graft_db")
      Seq("orders_bt", "lineitem_bt").foreach(t =>
        spark.sql(s"DROP TABLE IF EXISTS graft_db.$t"))
      Tables.load(spark, sf, "orders")
        .select("o_orderkey", "o_orderpriority")
        .write.bucketBy(4, "o_orderkey").sortBy("o_orderkey")
        .format("parquet").saveAsTable("graft_db.orders_bt")
      Tables.load(spark, sf, "lineitem")
        .select("l_orderkey", "l_extendedprice")
        .write.bucketBy(4, "l_orderkey").sortBy("l_orderkey")
        .format("parquet").saveAsTable("graft_db.lineitem_bt")
      val joined = spark.table("graft_db.lineitem_bt")
        .join(spark.table("graft_db.orders_bt"),
          col("l_orderkey") === col("o_orderkey"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"))
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join should not shuffle:\n$plan")
      // and it returns the same rows as the unbucketed join
      val expect = Tables.load(spark, sf, "lineitem")
        .join(Tables.load(spark, sf, "orders"),
          col("l_orderkey") === col("o_orderkey")).count()
      assert(joined.count() == expect)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    }
  }

  test("bucketized range join plans a hash join, never a nested-loop product") {
    // The point of join_range_bucketed: the interval condition becomes an
    // equi-join on the day bucket + residual BETWEEN, so the physical
    // plan must be hash/sort-merge — a raw inequality join would fall
    // back to BroadcastNestedLoopJoin (O(|points|×|intervals|) at scale).
    val df = SparkEntry.queries("join_range_bucketed")(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"),
      s"range join must not plan a nested-loop product:\n$plan")
  }
}
