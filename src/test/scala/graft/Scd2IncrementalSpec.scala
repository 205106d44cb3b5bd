package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Invariants of the round-10 view-maintenance additions, run against
  * the real entries at sf0.001: the SCD2 history built from the change
  * feed must chain correctly (per key: versions strictly increase,
  * valid_to links to the next valid_from, exactly one current row), and
  * the incrementally-maintained join view must equal a from-scratch
  * recompute done independently here (not via the oracle). */
class Scd2IncrementalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("cdc_scd2_apply history chains valid_to -> next valid_from") {
    val rows = SparkEntry.queries("cdc_scd2_apply")(spark, sf).collect()
    assert(rows.nonEmpty)
    val byKey = rows.groupBy(r => (r.getLong(0), r.getString(1)))
    byKey.foreach { case (key, hs) =>
      val sorted = hs.sortBy(_.getInt(3)) // valid_from
      // chaining: each non-final row's valid_to is the next valid_from;
      // the final row is open-ended and the only current one
      sorted.init.zip(sorted.tail).foreach { case (a, b) =>
        assert(!a.isNullAt(4) && a.getInt(4) == b.getInt(3), s"broken chain at $key")
        assert(!a.getBoolean(5))
      }
      assert(sorted.last.isNullAt(4) && sorted.last.getBoolean(5))
    }
    // a key updated in BOTH commits carries the two-step price history
    val both = byKey.filter { case ((k, st), hs) =>
      k % 200 == 0 && st != "O" && hs.length == 2 }
    assert(both.nonEmpty, "expected at least one key updated twice")
    both.foreach { case (_, hs) =>
      val s = hs.sortBy(_.getInt(3))
      assert(math.abs(s(1).getDouble(2) - s(0).getDouble(2) - 500.0) < 1e-6)
    }
  }

  test("incremental join-view maintenance equals full recompute") {
    import graft.Cols.{dec, moneyOut}
    val got = SparkEntry.queries("incremental_join_maintenance")(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    val o = Tables.load(spark, sf, "orders")
    val c = Tables.load(spark, sf, "customer")
    val src = o.filter(col("o_orderkey") % 10 === 0)
      .withColumn("o_totalprice", col("o_totalprice") + 1000.0)
      .unionByName(o.filter(col("o_orderkey") % 17 === 0)
        .withColumn("o_orderkey", col("o_orderkey") + 10000000L)
        .withColumn("o_orderstatus", lit("O")))
    val merged = o.join(
        src.select("o_orderkey", "o_orderstatus"),
        Seq("o_orderkey", "o_orderstatus"), "left_anti")
      .unionByName(src)
    val want = merged.join(c, col("o_custkey") === col("c_custkey"))
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("n"),
        moneyOut(sum(dec(col("o_totalprice")))).as("sum_price"))
      .orderBy("c_mktsegment")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    assert(got.toSeq == want.toSeq)
  }
}
