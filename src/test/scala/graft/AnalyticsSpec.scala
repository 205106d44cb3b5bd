package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.sql.Timestamp

/** Edge-case semantics of the analytics operators on literal data:
  * funnel ordering (a click BEFORE the first view must not count),
  * retention day-offsets, and z-score's degenerate-stratum exclusion. */
class AnalyticsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def ts(s: String) = Timestamp.valueOf(s)

  test("funnel counts only strictly-ordered stage completions") {
    import spark.implicits._
    val events = Seq(
      // user 1: view -> click -> purchase, fully ordered
      (1L, ts("2024-01-01 10:00:00"), "view"),
      (1L, ts("2024-01-01 11:00:00"), "click"),
      (1L, ts("2024-01-01 12:00:00"), "purchase"),
      // user 2: click BEFORE first view — click must not count
      (2L, ts("2024-01-01 09:00:00"), "click"),
      (2L, ts("2024-01-01 10:00:00"), "view"),
      // user 3: view only
      (3L, ts("2024-01-01 10:00:00"), "view"))
      .toDF("user_id", "ts", "event_type")
    val stages = events.groupBy("user_id").agg(
      min(when(col("event_type") === "view", col("ts"))).as("t_view"),
      min(when(col("event_type") === "click", col("ts"))).as("t_click"),
      min(when(col("event_type") === "purchase", col("ts"))).as("t_buy"))
    val row = stages.agg(
      count(lit(1)).as("n_users"),
      sum(when(col("t_view").isNotNull, 1).otherwise(0)).as("viewed"),
      sum(when(col("t_view").isNotNull && col("t_click") > col("t_view"), 1)
        .otherwise(0)).as("clicked"),
      sum(when(col("t_view").isNotNull && col("t_click") > col("t_view") &&
          col("t_buy") > col("t_click"), 1).otherwise(0)).as("bought"))
      .head()
    assert(row.getLong(0) == 3)
    assert(row.getLong(1) == 3) // all three viewed
    assert(row.getLong(2) == 1) // only user 1's click is after their view
    assert(row.getLong(3) == 1)
  }

  test("retention offsets count distinct active days from the cohort day") {
    import spark.implicits._
    val events = Seq(
      (1L, ts("2024-01-01 10:00:00")), (1L, ts("2024-01-01 23:00:00")),
      (1L, ts("2024-01-03 09:00:00")),
      (2L, ts("2024-01-02 08:00:00")), (2L, ts("2024-01-02 09:00:00")))
      .toDF("user_id", "ts")
    val firsts = events.groupBy("user_id")
      .agg(min(to_date(col("ts"))).as("cohort_day"))
    val activity = events.select(col("user_id"), to_date(col("ts")).as("day"))
      .distinct()
    val got = firsts.join(activity, "user_id")
      .withColumn("off", datediff(col("day"), col("cohort_day")))
      .groupBy("cohort_day", "off").agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getDate(0).toString, r.getInt(1), r.getLong(2)))
      .toSet
    // user 1: day 0 (two events, one day) and day 2; user 2: day 0 only
    assert(got == Set(("2024-01-01", 0, 1L), ("2024-01-01", 2, 1L),
      ("2024-01-02", 0, 1L)))
  }

  test("z-score path excludes constant-value users instead of dividing by zero") {
    import spark.implicits._
    val events = Seq(
      (1L, 10L, 5.0), (2L, 10L, 5.0),          // user 10: zero variance
      (3L, 20L, 1.0), (4L, 20L, 1.0), (5L, 20L, 100.0)) // user 20: outlier
      .toDF("event_id", "user_id", "value")
    val x = col("value").cast("decimal(18,2)")
    val stats = events.groupBy("user_id").agg(
      count(lit(1)).as("n"), sum(x).as("sx"), sum(x * x).as("sxx"))
    val ss = col("sxx").cast("double") -
      col("sx").cast("double") * col("sx").cast("double") / col("n")
    val std = sqrt(ss / (col("n") - 1))
    val z = (col("value") - col("sx").cast("double") / col("n")) / std
    val got = events.join(stats, "user_id")
      .filter(col("n") > 1 && ss > 0 && abs(z) > 1.0)
      .select("event_id").collect().map(_.getLong(0)).toSet
    // user 10 contributes nothing (zero variance, excluded, no NULL/inf);
    // user 20's outlier row crosses |z| > 1
    assert(got == Set(5L))
  }

  test("graph_pagerank: symmetric 2-cycle gives equal ranks; mass is conserved-ish") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_pr").toString
    // one user alternating a->b->a->b: transition graph is the symmetric
    // 2-cycle, whose PageRank fixpoint (and every iterate from a uniform
    // start) is exactly uniform
    Seq(
      (1L, ts("2024-01-01 10:00:00"), 7L, "a", 1.0, "{}"),
      (2L, ts("2024-01-01 10:01:00"), 7L, "b", 1.0, "{}"),
      (3L, ts("2024-01-01 10:02:00"), 7L, "a", 1.0, "{}"),
      (4L, ts("2024-01-01 10:03:00"), 7L, "b", 1.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val rows = SparkEntry.queries("graph_pagerank")(spark, dir).collect()
    assert(rows.length == 2)
    val micro = rows.map(_.getLong(1))
    assert(micro(0) == micro(1), "symmetric cycle must rank uniformly")
    // no source of mass beyond teleport: each rank stays at ~1/2 (minus
    // integer-truncation dust, bounded by iterations * div steps)
    assert(math.abs(micro(0) - 500000000000L) < 100L)
  }
}
