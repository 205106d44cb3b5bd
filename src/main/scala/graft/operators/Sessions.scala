package graft.operators

import graft.{OpQuery, Tables}
import graft.Cols.{dec, money, moneyOut}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, LongType}

/** Event-stream batch analytics over the `events` table: gap-based
  * sessionization (the batch analog of streaming session windows),
  * event-type/hour pivots, and dimension enrichment.
  *
  * Scale notes: sessionization is one shuffle on user_id (the window
  * partition key) followed by one partial-agg groupBy on the same key —
  * at 1000 executors this partitions cleanly by user; skewed users would
  * be handled by AQE skew-split since the window is per-user bounded.
  */
object Sessions {

  private val GapUs: Long = 1800L * 1000000 // 30 min session gap

  private val sessionize = OpQuery(
    "sessionize_gap",
    Some(s"""
      WITH e AS (SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts, value FROM events),
      g AS (SELECT *, CASE WHEN lag(ts) OVER w IS NULL
                             OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > $GapUs
                           THEN 1 ELSE 0 END AS new_s
            FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      s AS (SELECT *, CAST(SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                            ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_seq
            FROM g)
      SELECT user_id, session_seq,
             MIN(ts) AS session_start, MAX(ts) AS session_end,
             COUNT(*) AS n_events,
             CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
      FROM s
      GROUP BY user_id, session_seq
      ORDER BY user_id, session_seq
    """),
    (s, d) => {
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      val run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.load(s, d, "events")
        .withColumn("prev_us", unix_micros(lag(col("ts"), 1).over(w)))
        .withColumn("new_s",
          when(col("prev_us").isNull || unix_micros(col("ts")) - col("prev_us") > GapUs, 1)
            .otherwise(0))
        .withColumn("session_seq", sum(col("new_s")).over(run).cast(LongType))
        .groupBy("user_id", "session_seq")
        .agg(
          min(col("ts")).as("session_start"),
          max(col("ts")).as("session_end"),
          count(lit(1)).as("n_events"),
          moneyOut(sum(dec(col("value")))).as("sum_value"))
        .orderBy("user_id", "session_seq")
    })

  // Hour-of-day × event-type conditional-agg pivot (reference analog:
  // q88's 8 time buckets — TPCDSBenchmarkQueries.scala:4407).
  private val pivot = OpQuery(
    "events_hour_pivot",
    Some("""
      SELECT CAST(hour(CAST(ts AS TIMESTAMP)) AS INT) AS hr,
             COUNT(*) AS n_events,
             CAST(SUM(CASE WHEN event_type = 'click' THEN 1 END) AS BIGINT) AS n_clicks,
             CAST(SUM(CASE WHEN event_type = 'view' THEN 1 END) AS BIGINT) AS n_views,
             CAST(SUM(CASE WHEN event_type = 'purchase' THEN CAST(value AS DECIMAL(18,2)) END) AS DOUBLE) AS purchase_value
      FROM events
      GROUP BY 1
      ORDER BY hr
    """),
    (s, d) =>
      Tables.load(s, d, "events")
        .groupBy(hour(col("ts")).cast(IntegerType).as("hr"))
        .agg(
          count(lit(1)).as("n_events"),
          sum(when(col("event_type") === "click", 1)).cast(LongType).as("n_clicks"),
          sum(when(col("event_type") === "view", 1)).cast(LongType).as("n_views"),
          moneyOut(sum(when(col("event_type") === "purchase", dec(col("value")))))
            .as("purchase_value"))
        .orderBy("hr"))

  // Enrichment join: fact stream × customer. Customer is itself
  // fact-sized at 100 TB, so this is a shuffle join on the key — no
  // broadcast hint (AQE may still broadcast at small SF).
  private val enrich = OpQuery(
    "events_enrich_join",
    Some("""
      SELECT c_mktsegment, event_type, COUNT(*) AS n,
             CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
      FROM events JOIN customer ON user_id = c_custkey
      GROUP BY 1, 2
      ORDER BY c_mktsegment, event_type
    """),
    (s, d) =>
      Tables.load(s, d, "events")
        .join(Tables.load(s, d, "customer"),
          col("user_id") === col("c_custkey"))
        .groupBy("c_mktsegment", "event_type")
        .agg(count(lit(1)).as("n"), moneyOut(sum(dec(col("value")))).as("sum_value"))
        .orderBy("c_mktsegment", "event_type"))

  // Semi-structured column handling: events.props is a JSON string;
  // parse it with a declared schema (from_json — the typed, codegen'd
  // route; get_json_object would re-parse per field). Row-local parse,
  // then a standard partial-agg rollup.
  private val jsonExtract = OpQuery(
    "events_json_extract",
    Some("""
      SELECT event_type, COUNT(*) AS n,
             CAST(SUM(CAST(json_extract_string(props, '$.k') AS INT)) AS BIGINT) AS sum_k,
             CAST(MIN(CAST(json_extract_string(props, '$.k') AS INT)) AS INT) AS min_k,
             CAST(MAX(CAST(json_extract_string(props, '$.k') AS INT)) AS INT) AS max_k
      FROM events
      GROUP BY event_type
      ORDER BY event_type
    """),
    (s, d) =>
      Tables.load(s, d, "events")
        .withColumn("k",
          from_json(col("props"),
            org.apache.spark.sql.types.StructType.fromDDL("k INT")).getField("k"))
        .groupBy("event_type")
        .agg(
          count(lit(1)).as("n"),
          sum(col("k")).cast(LongType).as("sum_k"),
          min(col("k")).as("min_k"),
          max(col("k")).as("max_k"))
        .orderBy("event_type"))

  // Spark 4 VARIANT path for the same semi-structured column: parse the
  // JSON ONCE into the binary variant encoding (parse_json), then typed
  // extractions (variant_get) read the encoded value without re-parsing
  // text per field — the open-format answer to repeated get_json_object
  // scans at 100 TB. Values must equal the from_json route above.
  private val variantExtract = OpQuery(
    "events_variant_extract",
    Some("""
      SELECT CAST(CAST(json_extract_string(props, '$.k') AS INT) // 10 AS INT) AS k_bucket,
             COUNT(*) AS n,
             CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
      FROM events
      GROUP BY k_bucket
      ORDER BY k_bucket
    """),
    (s, d) =>
      Tables.load(s, d, "events")
        .withColumn("v", expr("parse_json(props)"))
        .withColumn("k", expr("variant_get(v, '$.k', 'int')"))
        .groupBy(floor(col("k") / 10).cast(IntegerType).as("k_bucket"))
        .agg(count(lit(1)).as("n"),
          moneyOut(sum(dec(col("value")))).as("sum_value"))
        .orderBy("k_bucket"))

  val defs: Seq[OpQuery] = Seq(sessionize, pivot, enrich, jsonExtract,
    variantExtract)
}
