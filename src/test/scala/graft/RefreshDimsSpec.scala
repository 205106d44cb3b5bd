package graft

import org.scalatest.funsuite.AnyFunSuite

/** refresh_pipeline_dims claims the s_* dimension deltas route through
  * the rebuilt ssv/csv/wsv sales views. This spec pins that claim as a
  * mutation test: the price-derived checksums must MOVE when items are
  * resolved against the stale base dimension instead of the merged one,
  * and must move by exactly the delta the s_item source encodes (+1.00
  * on every 7th item's list price × the quantity routed through it).
  * Without this, a rebuild that joins the stale dims but happens to hit
  * the same row counts would be indistinguishable from a correct one.
  */
class RefreshDimsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  private lazy val routed: Map[String, (Long, Double)] = {
    val rows = SparkEntry.queries("refresh_pipeline_dims")(spark, sf).collect()
    rows.map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
  }

  private def staleAndDelta(src: String, lin: String, linKey: String,
      srcKey: String, itemCol: String, qtyCol: String): (Double, Double) = {
    sources.Tpcds.ensureRefresh(spark, sf)
    sources.Tpcds.ensureRefreshDims(spark, sf)
    val base =
      s"""FROM $src JOIN $lin ON ($srcKey = $linKey)
          JOIN item ON ($itemCol = i_item_id AND i_rec_end_date IS NULL)"""
    val stale = spark.sql(
      s"SELECT CAST(SUM(i_current_price * $qtyCol) AS DOUBLE) $base")
      .collect()(0).getDouble(0)
    // the s_item delta raises every 7th item's price by exactly 1.00, so
    // routed − stale must equal the quantity routed through those items
    val delta = spark.sql(
      s"SELECT CAST(SUM($qtyCol) AS DOUBLE) $base WHERE i_item_sk % 7 = 0")
      .collect()(0).getDouble(0)
    (stale, delta)
  }

  test("csv checksum moves by exactly the routed item-price delta") {
    val (stale, delta) = staleAndDelta("s_catalog_order",
      "s_catalog_order_lineitem", "clin_order_id", "cord_order_id",
      "clin_item_id", "clin_quantity")
    val got = routed("csv_dims")._2
    assert(delta > 0, "fixture routes no updated items through csv")
    assert(math.abs(got - (stale + delta)) < 1e-6,
      s"csv_dims=$got stale=$stale delta=$delta")
  }

  test("wsv checksum moves by exactly the routed item-price delta") {
    val (stale, delta) = staleAndDelta("s_web_order",
      "s_web_order_lineitem", "wlin_order_id", "word_order_id",
      "wlin_item_id", "wlin_quantity")
    val got = routed("wsv_dims")._2
    assert(delta > 0, "fixture routes no updated items through wsv")
    assert(math.abs(got - (stale + delta)) < 1e-6,
      s"wsv_dims=$got stale=$stale delta=$delta")
  }

  test("ssv price checksum moves by exactly the routed item-price delta") {
    val (stale, delta) = staleAndDelta("s_purchase",
      "s_purchase_lineitem", "plin_purchase_id", "purc_purchase_id",
      "plin_item_id", "plin_quantity")
    val got = routed("ssv_dims_price")._2
    assert(delta > 0, "fixture routes no updated items through ssv")
    assert(math.abs(got - (stale + delta)) < 1e-6,
      s"ssv_dims_price=$got stale=$stale delta=$delta")
  }
}
