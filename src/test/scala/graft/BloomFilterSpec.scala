package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Runtime bloom-filter join pruning (Spark-native): a selective filter
  * on the creation side injects a bloom_filter_agg + might_contain
  * pre-filter into the application-side scan, cutting shuffled fact
  * rows before the join — the scan-reduction path a selective dim→fact
  * join takes at 100 TB. The production thresholds
  * (applicationSideScanSizeThreshold, default 10GB) gate it to big
  * scans; the spec zeroes them so the tiny fixtures exercise the same
  * rule, and asserts results are unchanged. */
class BloomFilterSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("selective dim filter injects a bloom pre-filter; results unchanged") {
    val d = "/root/testdata/sf0.01"
    val confs = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    def query() = {
      val li = Tables.load(spark, d, "lineitem")
      val o = Tables.load(spark, d, "orders")
        .filter(col("o_orderpriority") === "1-URGENT")
      li.join(o, col("l_orderkey") === col("o_orderkey"))
        .groupBy("l_returnflag").agg(count(lit(1)).as("n"))
        .orderBy("l_returnflag")
    }
    try {
      confs.foreach { case (k, v) => spark.conf.set(k, v) }
      val q = query()
      val plan = q.queryExecution.optimizedPlan.toString
      assert(plan.contains("bloom_filter_agg"),
        s"expected a runtime bloom filter in:\n$plan")
      assert(plan.contains("might_contain"))
      val withBloom = q.collect().map(r => (r.getString(0), r.getLong(1))).toSeq
      // restore defaults → same query without the runtime filter
      confs.foreach { case (k, _) =>
        saved.toMap.apply(k) match {
          case Some(v) => spark.conf.set(k, v)
          case None => spark.conf.unset(k)
        }
      }
      val without = query()
      assert(!without.queryExecution.optimizedPlan.toString.contains("bloom_filter_agg"))
      assert(without.collect().map(r => (r.getString(0), r.getLong(1))).toSeq == withBloom)
    } finally {
      confs.foreach { case (k, _) =>
        saved.toMap.apply(k) match {
          case Some(v) => spark.conf.set(k, v)
          case None => spark.conf.unset(k)
        }
      }
    }
  }
}
