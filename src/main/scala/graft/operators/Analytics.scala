package graft.operators

import graft.{OpQuery, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.IntegerType

/** Product-analytics operators over the `events` stream table plus
  * deterministic stratified sampling — the reporting layer a training-
  * data pipeline sits next to.
  *
  * Scale designs: funnel and retention reduce to per-user partial
  * aggregates before any join (shuffle carries one row per user, never
  * raw events); the histogram is a row-local bucket expression feeding
  * one partial-agg count; stratified sampling ranks inside each stratum
  * with a multiplicative hash (no rand(), reproducible under retries —
  * the only safe kind of sampling on a distributed engine).
  */
object Analytics {

  private def t(s: SparkSession, d: String, n: String): DataFrame =
    Tables.load(s, d, n)

  // ------------------------------------------------- FUNNEL ANALYSIS
  // view → click → purchase completion counts, strictly ordered by each
  // user's first event of each stage.
  private val funnel = OpQuery(
    "events_funnel",
    Some("""
      WITH stages AS (
        SELECT user_id,
               MIN(CASE WHEN event_type = 'view' THEN ts END) AS t_view,
               MIN(CASE WHEN event_type = 'click' THEN ts END) AS t_click,
               MIN(CASE WHEN event_type = 'purchase' THEN ts END) AS t_buy
        FROM events GROUP BY user_id)
      SELECT COUNT(*) AS n_users,
             CAST(SUM(CASE WHEN t_view IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS viewed,
             CAST(SUM(CASE WHEN t_view IS NOT NULL AND t_click > t_view THEN 1 ELSE 0 END) AS BIGINT) AS clicked_after_view,
             CAST(SUM(CASE WHEN t_view IS NOT NULL AND t_click > t_view AND t_buy > t_click THEN 1 ELSE 0 END) AS BIGINT) AS bought_after_click
      FROM stages
    """),
    (s, d) => {
      val stages = t(s, d, "events").groupBy("user_id")
        .agg(
          min(when(col("event_type") === "view", col("ts"))).as("t_view"),
          min(when(col("event_type") === "click", col("ts"))).as("t_click"),
          min(when(col("event_type") === "purchase", col("ts"))).as("t_buy"))
      stages.agg(
        count(lit(1)).as("n_users"),
        sum(when(col("t_view").isNotNull, 1).otherwise(0)).cast("long")
          .as("viewed"),
        sum(when(col("t_view").isNotNull && col("t_click") > col("t_view"), 1)
          .otherwise(0)).cast("long").as("clicked_after_view"),
        sum(when(col("t_view").isNotNull && col("t_click") > col("t_view") &&
            col("t_buy") > col("t_click"), 1)
          .otherwise(0)).cast("long").as("bought_after_click"))
    })

  // ------------------------------------------------ COHORT RETENTION
  // Users grouped by first-activity day; per (cohort, day-offset) active
  // counts for the first week. Both sides of the join are per-user /
  // per-(user, day) partial aggregates.
  private val retention = OpQuery(
    "events_retention_cohort",
    Some("""
      WITH firsts AS (
        SELECT user_id, MIN(CAST(ts AS DATE)) AS cohort_day
        FROM events GROUP BY user_id),
      activity AS (
        SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events)
      SELECT cohort_day, CAST(day - cohort_day AS INT) AS day_offset,
             COUNT(*) AS n_active
      FROM firsts JOIN activity USING (user_id)
      WHERE day - cohort_day <= 7
      GROUP BY 1, 2 ORDER BY 1, 2
    """),
    (s, d) => {
      val ev = t(s, d, "events")
      val firsts = ev.groupBy("user_id")
        .agg(min(to_date(col("ts"))).as("cohort_day"))
      val activity = ev.select(col("user_id"), to_date(col("ts")).as("day"))
        .distinct()
      firsts.join(activity, "user_id")
        .withColumn("day_offset", datediff(col("day"), col("cohort_day")))
        .filter(col("day_offset") <= 7)
        .groupBy("cohort_day", "day_offset")
        .agg(count(lit(1)).as("n_active"))
        .orderBy("cohort_day", "day_offset")
    })

  // ------------------------------------------------- VALUE HISTOGRAM
  // Fixed-width bucketing as a row-local floor expression — identical
  // IEEE division then floor on both engines.
  private val histogram = OpQuery(
    "agg_histogram",
    Some("""
      SELECT CAST(FLOOR(o_totalprice / 50000.0) AS INT) AS bucket,
             COUNT(*) AS n
      FROM orders GROUP BY 1 ORDER BY 1
    """),
    (s, d) => t(s, d, "orders")
      .groupBy(floor(col("o_totalprice") / 50000.0).cast(IntegerType)
        .as("bucket"))
      .agg(count(lit(1)).as("n"))
      .orderBy("bucket"))

  // --------------------------------------------- STRATIFIED SAMPLING
  // Exactly k rows per stratum, chosen by multiplicative-hash rank (no
  // rand(): retries and stragglers reproduce the same sample).
  private val stratified = OpQuery(
    "sample_stratified",
    Some("""
      SELECT label, vec_id FROM (
        SELECT label, vec_id,
               ROW_NUMBER() OVER (PARTITION BY label
                 ORDER BY (vec_id * 2654435761) % 1000000007, vec_id) AS rn
        FROM embeddings) WHERE rn <= 10 ORDER BY label, vec_id
    """),
    (s, d) => {
      val win = Window.partitionBy("label")
        .orderBy((col("vec_id") * 2654435761L) % 1000000007L, col("vec_id"))
      t(s, d, "embeddings")
        .select(col("label"), col("vec_id"),
          row_number().over(win).as("rn"))
        .filter(col("rn") <= 10)
        .select("label", "vec_id")
        .orderBy("label", "vec_id")
    })

  val defs: Seq[OpQuery] = Seq(funnel, retention, histogram, stratified)
}
