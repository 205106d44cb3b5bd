package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.sql.Timestamp

/** As-of join boundary semantics on literal data: at-or-before matching,
  * the equal-instant tie (order wins), the equal-order-time tie (highest
  * orderkey wins), and no-prior-order → NULL. Mirrors the union+window
  * formulation of operators.Temporal's join_asof. */
class TemporalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def ts(s: String) = Timestamp.valueOf(s)

  test("as-of join picks the latest order at or before each event") {
    import spark.implicits._
    val orders = Seq(
      (1L, ts("2024-01-01 10:00:00"), 100L),
      (1L, ts("2024-01-01 12:00:00"), 200L),
      // two orders at the same instant: highest orderkey must win
      (1L, ts("2024-01-01 14:00:00"), 300L),
      (1L, ts("2024-01-01 14:00:00"), 301L),
      (2L, ts("2024-01-01 11:00:00"), 400L))
      .toDF("k", "t", "o_orderkey")
      .select(col("k"), col("t"), lit(0).as("side"), col("o_orderkey"),
        lit(null).cast("bigint").as("event_id"))
    val events = Seq(
      (1L, ts("2024-01-01 09:00:00"), 10L), // before any order → NULL
      (1L, ts("2024-01-01 12:00:00"), 11L), // exactly at an order → match it
      (1L, ts("2024-01-01 13:59:59"), 12L), // between → latest earlier
      (1L, ts("2024-01-01 15:00:00"), 13L), // after the tied pair → 301
      (3L, ts("2024-01-01 12:00:00"), 14L)) // user with no orders → NULL
      .toDF("k", "t", "event_id")
      .select(col("k"), col("t"), lit(1).as("side"),
        lit(null).cast("bigint").as("o_orderkey"), col("event_id"))
    val win = Window.partitionBy("k")
      .orderBy(col("t"), col("side"), coalesce(col("o_orderkey"), col("event_id")))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val got = orders.unionByName(events)
      .select(col("*"),
        last(col("o_orderkey"), ignoreNulls = true).over(win).as("asof"))
      .filter(col("side") === 1)
      .select("event_id", "asof")
      .collect().map(r => r.getLong(0) -> Option(r.get(1))).toMap
    assert(got(10L) == None)
    assert(got(11L) == Some(200L))
    assert(got(12L) == Some(200L))
    assert(got(13L) == Some(301L))
    assert(got(14L) == None)
  }
}
