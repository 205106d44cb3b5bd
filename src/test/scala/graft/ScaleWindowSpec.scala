package graft

import graft.operators.ScaleWindow
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.window.WindowExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** ScaleWindow must (a) reproduce the single-task window semantics
  * exactly and (b) never plan a WindowExec without a partition spec —
  * the "No Partition Defined" shape that funnels the whole relation
  * through one task at cluster scale. */
class ScaleWindowSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  private def emptyPartWindows(plan: SparkPlan): Seq[WindowExec] = {
    val expanded = plan.collect {
      case a: AdaptiveSparkPlanExec => a.executedPlan
    }
    (plan +: expanded).flatMap(_.collect {
      case w: WindowExec if w.partitionSpec.isEmpty => w
    })
  }

  test("orderStats matches the global window semantics") {
    import spark.implicits._
    val df = Seq((5, "a"), (3, "b"), (9, "c"), (1, "d"), (7, "e"), (3, "a"))
      .toDF("v", "k")
    val got = ScaleWindow.orderStats(df, Seq.empty,
      Seq(col("v"), col("k")), "rn", "n",
      Some((col("v"), "cum", "tot")))
      .select("k", "v", "rn", "n", "cum", "tot")
      .orderBy("rn").collect()
    // order: (1,d) (3,a) (3,b) (5,a) (7,e) (9,c); total 28
    assert(got.map(_.getLong(2)).toSeq == Seq(1L, 2L, 3L, 4L, 5L, 6L))
    assert(got.map(_.getLong(4)).toSeq == Seq(1L, 4L, 7L, 12L, 19L, 28L))
    assert(got.forall(_.getLong(3) == 6L))
    assert(got.forall(_.getLong(5) == 28L))
  }

  test("ntileOf splits like SQL NTILE (first n%k buckets get the extra)") {
    import spark.implicits._
    val df = (1L to 10L).toDF("rn").withColumn("n", lit(10L))
    val got = df.select(ScaleWindow.ntileOf(4, col("rn"), col("n")).as("b"))
      .collect().map(_.getInt(0)).toSeq
    assert(got == Seq(1, 1, 1, 2, 2, 2, 3, 3, 4, 4))
  }

  test("rewritten customer-dimension windows plan no unpartitioned sort") {
    for (name <- Seq("customers_rfm", "agg_pareto_cumshare", "window_ntile_dist")) {
      val df = SparkEntry.queries(name)(spark, sf)
      df.collect() // finalize AQE so the executed plan is inspectable
      val bad = emptyPartWindows(df.queryExecution.executedPlan)
      assert(bad.isEmpty,
        s"$name plans ${bad.size} WindowExec(s) with no partition spec")
    }
  }
}
