package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: print the formatted physical plan of named queries
  * (`runMain graft.Explain <sfDir> <name>[,<name>…]`) — the per-operator
  * scale audit (broadcast sides, shuffle counts, pushed filters,
  * whole-stage codegen spans) without running the query. */
object Explain {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, names) = args
    val builder = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.ui.enabled", "false")
    // same dev-loop override hook as Bench: SPARK_GRAFT_CONF="k=v;k=v"
    sys.env.get("SPARK_GRAFT_CONF").foreach(_.split(";").filter(_.nonEmpty)
      .foreach { kv =>
        val Array(k, v) = kv.split("=", 2)
        builder.config(k, v)
      })
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // SPARK_GRAFT_EXPLAIN_RUN=1 materializes each query first, so the
    // printed plan is AQE's FINAL plan (runtime join-strategy changes,
    // coalesced reads) instead of the pre-execution estimate — the form
    // the audit checks against the measured session. The execution MUST
    // run through the SAME QueryExecution that is printed: a noop-sink
    // write plans a SEPARATE QueryExecution and leaves `df.queryExecution`
    // unexecuted (isFinalPlan=false — the r18 dumps proved it), so the
    // materialization here is collect() on the df itself. Declared
    // queries are result-sized (LIMIT/agg outputs), so the driver
    // transfer is metadata-sized.
    val run = sys.env.get("SPARK_GRAFT_EXPLAIN_RUN").contains("1")
    names.split(',').foreach { n =>
      println(s"\n=== $n ===")
      val df = SparkEntry.queries(n)(spark, sfDir)
      if (run) df.collect()
      println(df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
    }
    spark.stop()
  }
}
