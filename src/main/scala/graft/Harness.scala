package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Measurement harness — the engine-side analog of the reference's
  * benchmark core (reference: benchmark/Benchmark.scala:129-192 runQuery/
  * runFunc timing, :267-273 median, :208-258 JSON report).
  */
object Harness {

  final case class QueryResult(
      name: String,
      iterationSecs: Seq[Double],
      errorOpt: Option[String]) {
    def medianSec: Double = Harness.median(iterationSecs)
    def ok: Boolean = errorOpt.isEmpty
  }

  /** Upper median, exactly as the reference computes it
    * (Benchmark.scala:267-273): sort, drop n/2, head —
    * median(1,2,3,4) = 3. */
  def median(xs: Seq[Double]): Double = {
    require(xs.nonEmpty)
    xs.sorted.drop(xs.length / 2).head
  }

  /** Time one full materialization of a DataFrame (build + execute). */
  def timeOnce(thunk: => Unit): Double = {
    val t0 = System.nanoTime()
    thunk
    (System.nanoTime() - t0) / 1e9
  }

  /** Reference query protocol (TPCDSBenchmark.scala:94-108): run each
    * query `iterations` times, keep per-iteration seconds, median each,
    * report the sum of medians. Errors are captured, not thrown
    * (Benchmark.scala:155-161). */
  def runQueries(
      spark: SparkSession,
      sfDir: String,
      queries: Seq[(String, (SparkSession, String) => DataFrame)],
      iterations: Int): Seq[QueryResult] =
    queries.map { case (name, fn) =>
      try {
        val secs = (1 to iterations).map { _ =>
          timeOnce(fn(spark, sfDir).write.format("noop").mode("overwrite").save())
        }
        QueryResult(name, secs, None)
      } catch {
        case e: Throwable =>
          QueryResult(name, Seq.empty, Some(e.getMessage))
      }
    }

  /** Warm the JVM/codegen paths before measuring
    * (reference: MergeMicroBenchmark.scala:284-301). */
  def warmup(spark: SparkSession): Unit = {
    import spark.implicits._
    spark.range(0, 10000000L, 1, 8)
      .selectExpr("id", "id % 97 AS k", "CAST(id AS DOUBLE) AS v")
      .groupBy($"k").count().write.format("noop").mode("overwrite").save()
  }

  /** One-line JSON report (driver contract). */
  def reportJson(results: Seq[QueryResult], sfDir: String): String = {
    val qs = results.map(r => "\"" + r.name + "\":" +
      (if (r.ok) r.medianSec.toString else "-1")).mkString("{", ",", "}")
    val total = results.filter(_.ok).map(_.medianSec).sum
    s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}"""
  }
}
