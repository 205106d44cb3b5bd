package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

object TestSpark {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.extensions", "graft.functions.GraftExtensions")
    .config("spark.sql.warehouse.dir",
      java.nio.file.Files.createTempDirectory("graft_wh").toString)
    .config("spark.ui.enabled", "false")
    .getOrCreate()
}

class SmokeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("entry (flagship) returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every declared query runs at sf0.001 and is non-empty") {
    // All demos are designed non-degenerate at the correctness gate's
    // sf0.01 (verified by dev_check). Two TPC-DS conformance slices are
    // too parameter-narrow for sf0.001's ~6k lineitems: q14b keeps one
    // specific calendar week over a brand-level HAVING > global-average
    // filter, and q64 needs the same item+store pair to survive its
    // 17-table filter chain in two consecutive years.
    val emptyOk = Set("tpcds_q14b", "tpcds_q64")
    for ((name, fn) <- SparkEntry.queries) {
      val n = fn(spark, sf).count()
      assert(n > 0 || emptyOk(name), s"query $name returned $n rows")
    }
  }

  test("oracleSql keys are a subset of queries") {
    val qs = SparkEntry.queries.keySet
    assert(SparkEntry.oracleSql.keySet.subsetOf(qs))
  }
}
