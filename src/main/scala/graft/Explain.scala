package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: print the formatted physical plan of named queries
  * (`runMain graft.Explain <sfDir> <name>[,<name>…]`) — the per-operator
  * scale audit (broadcast sides, shuffle counts, pushed filters,
  * whole-stage codegen spans) without running the query. */
object Explain {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, names) = args
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.split(',').foreach { n =>
      println(s"\n=== $n ===")
      println(SparkEntry.queries(n)(spark, sfDir).queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
    }
    spark.stop()
  }
}
