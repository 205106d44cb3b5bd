package graft.operators

import graft.{OpQuery, Tables}
import graft.Cols.{dec, moneyOut}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal / time-series operators beyond the reference's surface: as-of
  * join, time-range window frames, and gap-filling resample — the ops an
  * event-stream training pipeline needs (SURVEY.md §2B extension table).
  *
  * Scale designs:
  *   - `join_asof` uses the union+ordered-window formulation (one shuffle
  *     on the join key, running `last(_, ignoreNulls)` state — never the
  *     quadratic inequality-join a naive `t1.ts <= t2.ts` plan degrades
  *     to). This is the same pattern streaming engines use for temporal
  *     joins: co-partition both sides, single ordered pass per key.
  *   - `window_range_frame` orders by epoch seconds so the RANGE frame is
  *     value-based (identical tie semantics on every engine) and stays in
  *     Spark's codegen'd window exec.
  *   - `timeseries_gapfill` builds per-key hour spines with sequence()+
  *     explode (distributed, no driver loop) and left-joins pre-aggregated
  *     counts; both sides are partial-agg reduced before the shuffle.
  */
object Temporal {

  private def t(s: SparkSession, d: String, n: String): DataFrame =
    Tables.load(s, d, n)

  // --------------------------------------------------------- AS-OF JOIN
  // Each event picks the most recent order of the same customer at or
  // before its timestamp (ties: orders sort before events at the same
  // instant; among equal order times the highest orderkey wins — the
  // tie-break is part of the contract so both engines agree).
  private val asofJoin = OpQuery(
    "join_asof",
    Some("""
      WITH u AS (
        SELECT o_custkey AS k, o_orderdate AS t, 0 AS side,
               o_orderkey, o_totalprice,
               CAST(NULL AS BIGINT) AS event_id, CAST(NULL AS VARCHAR) AS event_type
        FROM orders WHERE o_custkey < 25
        UNION ALL
        -- CAST to TIMESTAMP truncates TIMESTAMP_NS to the microsecond
        -- resolution the engine sees, keeping at-or-before ties identical
        SELECT user_id, CAST(ts AS TIMESTAMP), 1,
               CAST(NULL AS BIGINT), CAST(NULL AS DOUBLE),
               event_id, event_type
        FROM events WHERE user_id < 25
      ), w AS (
        SELECT *,
               LAST_VALUE(o_orderkey IGNORE NULLS) OVER win AS asof_orderkey,
               LAST_VALUE(o_totalprice IGNORE NULLS) OVER win AS asof_price
        FROM u
        WINDOW win AS (PARTITION BY k ORDER BY t, side,
                       COALESCE(o_orderkey, event_id)
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      )
      SELECT event_id, k AS user_id, event_type, asof_orderkey, asof_price
      FROM w WHERE side = 1 ORDER BY event_id
    """),
    (s, d) => {
      val orders = t(s, d, "orders").filter(col("o_custkey") < 25)
        .select(col("o_custkey").as("k"), col("o_orderdate").as("t"),
          lit(0).as("side"), col("o_orderkey"), col("o_totalprice"),
          lit(null).cast("bigint").as("event_id"),
          lit(null).cast("string").as("event_type"))
      val events = t(s, d, "events").filter(col("user_id") < 25)
        .select(col("user_id").as("k"), col("ts").as("t"),
          lit(1).as("side"),
          lit(null).cast("bigint").as("o_orderkey"),
          lit(null).cast("double").as("o_totalprice"),
          col("event_id"), col("event_type"))
      val win = Window.partitionBy("k")
        .orderBy(col("t"), col("side"),
          coalesce(col("o_orderkey"), col("event_id")))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      // one select for both picks → a single Window node (one sorted pass)
      orders.unionByName(events)
        .select(col("*"),
          last(col("o_orderkey"), ignoreNulls = true).over(win)
            .as("asof_orderkey"),
          last(col("o_totalprice"), ignoreNulls = true).over(win)
            .as("asof_price"))
        .filter(col("side") === 1)
        .select(col("event_id"), col("k").as("user_id"), col("event_type"),
          col("asof_orderkey"), col("asof_price"))
        .orderBy("event_id")
    })

  // ----------------------------------------- TIME-RANGE WINDOW FRAME
  // Running 30-day spend per customer: RANGE frame keyed on epoch
  // seconds, so all rows within the trailing window contribute
  // regardless of row count (vs the ROWS frames elsewhere in the corpus).
  private val rangeFrame = OpQuery(
    "window_range_frame",
    Some("""
      SELECT o_orderkey, o_custkey,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
               PARTITION BY o_custkey
               ORDER BY CAST(FLOOR(EPOCH(o_orderdate)) AS BIGINT)
               RANGE BETWEEN 2592000 PRECEDING AND CURRENT ROW) AS DOUBLE)
               AS sum_30d
      FROM orders ORDER BY o_orderkey
    """),
    (s, d) => {
      val win = Window.partitionBy("o_custkey").orderBy("epoch_s")
        .rangeBetween(-2592000L, 0L)
      t(s, d, "orders")
        // parquet timestamps surface as NTZ, which cannot cast to long
        // directly; the session runs UTC, so NTZ→LTZ→seconds matches the
        // oracle's floor(epoch(...)) exactly.
        .withColumn("epoch_s",
          col("o_orderdate").cast("timestamp").cast("long"))
        .select(col("o_orderkey"), col("o_custkey"),
          moneyOut(sum(dec(col("o_totalprice"))).over(win)).as("sum_30d"))
        .orderBy("o_orderkey")
    })

  // ------------------------------------------------ GAP-FILL RESAMPLE
  // Hourly activity spine per user between their first and last event,
  // zero-filled where no events landed (the resample/interpolate step of
  // a time-series feature pipeline).
  private val gapfill = OpQuery(
    "timeseries_gapfill",
    Some("""
      WITH ev AS (
        SELECT user_id, ts FROM events WHERE user_id < 5
      ), span AS (
        SELECT user_id, date_trunc('hour', MIN(ts)) AS h0,
               date_trunc('hour', MAX(ts)) AS h1
        FROM ev GROUP BY user_id
      ), hours AS (
        SELECT user_id,
               UNNEST(generate_series(h0, h1, INTERVAL 1 HOUR)) AS hour
        FROM span
      ), counts AS (
        SELECT user_id, date_trunc('hour', ts) AS hour, COUNT(*) AS n_events
        FROM ev GROUP BY 1, 2
      )
      SELECT h.user_id, h.hour, COALESCE(c.n_events, 0) AS n_events
      FROM hours h LEFT JOIN counts c
        ON h.user_id = c.user_id AND h.hour = c.hour
      ORDER BY h.user_id, h.hour
    """),
    (s, d) => {
      val ev = t(s, d, "events").filter(col("user_id") < 5)
        .select(col("user_id"), col("ts"))
      val span = ev.groupBy("user_id").agg(
        date_trunc("hour", min(col("ts"))).as("h0"),
        date_trunc("hour", max(col("ts"))).as("h1"))
      val hours = span.select(col("user_id"),
        explode(expr("sequence(h0, h1, INTERVAL 1 HOUR)")).as("hour"))
      val counts = ev
        .groupBy(col("user_id"), date_trunc("hour", col("ts")).as("hour"))
        .agg(count(lit(1)).as("n_events"))
      hours.join(counts, Seq("user_id", "hour"), "left_outer")
        .select(col("user_id"), col("hour"),
          coalesce(col("n_events"), lit(0L)).as("n_events"))
        .orderBy("user_id", "hour")
    })

  // ------------------------------------- YEAR-OVER-YEAR SELF-COMPARE
  // The q2/q11/q74 shape (reference: TPCDSBenchmarkQueries.scala:45/625/
  // 3713 — an aggregated CTE self-joined year vs year+1). The self-join
  // runs on the aggregated relation (|nations|×|years| rows), so the
  // comparison is dimension-sized regardless of fact scale; Catalyst
  // reuses the aggregate exchange for both sides.
  private val yoyGrowth = OpQuery(
    "join_yoy_growth",
    Some("""
      WITH rev AS (
        SELECT n_name, EXTRACT(year FROM o_orderdate) AS yr,
               SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS rev
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
          JOIN customer ON o_custkey = c_custkey
          JOIN nation ON c_nationkey = n_nationkey
        GROUP BY 1, 2)
      SELECT a.n_name, CAST(a.yr AS INT) AS yr,
             CAST(a.rev AS DOUBLE) AS rev,
             CAST(b.rev AS DOUBLE) AS prev_rev,
             ROUND(CAST(a.rev AS DOUBLE) / CAST(b.rev AS DOUBLE), 6) AS growth
      FROM rev a JOIN rev b ON a.n_name = b.n_name AND a.yr = b.yr + 1
      ORDER BY a.n_name, yr
    """),
    (s, d) => {
      val rev = t(s, d, "lineitem")
        .join(t(s, d, "orders"), col("l_orderkey") === col("o_orderkey"))
        .join(t(s, d, "customer"), col("o_custkey") === col("c_custkey"))
        .join(broadcast(t(s, d, "nation")),
          col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name"), year(col("o_orderdate")).as("yr"))
        .agg(sum(dec(col("l_extendedprice"))).as("rev_exact"))
      val a = rev.as("a")
      val b = rev.as("b")
      a.join(b, col("a.n_name") === col("b.n_name") &&
          col("a.yr") === col("b.yr") + 1)
        .select(col("a.n_name").as("n_name"), col("a.yr").as("yr"),
          moneyOut(col("a.rev_exact")).as("rev"),
          moneyOut(col("b.rev_exact")).as("prev_rev"),
          round(moneyOut(col("a.rev_exact")) / moneyOut(col("b.rev_exact")), 6)
            .as("growth"))
        .orderBy("n_name", "yr")
    })

  val defs: Seq[OpQuery] = Seq(asofJoin, rangeFrame, gapfill, yoyGrowth)
}
