package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Aggregates every operator demo (one per SURVEY.md §2 line) from the
  * operator modules; each [[OpQuery]] optionally carries DuckDB oracle SQL
  * for the driver's differential-correctness gate.
  */
object SparkEntry {

  def all: Seq[OpQuery] = Seq(
    operators.Relational.defs,
    operators.Advanced.defs,
    operators.QueryShapes.defs,
    operators.TpcdsQueries.defs,
    operators.TpcdsQueries2.defs,
    operators.TpcdsQueries3.defs,
    operators.TpcdsQueries4.defs,
    operators.TpcdsQueries5.defs,
    operators.TpcdsQueries6.defs,
    operators.TpcdsQueries7.defs,
    operators.TpcdsQueries8.defs,
    operators.TpcdsQueries9.defs,
    operators.Temporal.defs,
    operators.Collections.defs,
    operators.Analytics.defs,
    operators.TextAnalysis.defs,
    operators.Pipeline.defs,
    operators.Sessions.defs,
    operators.Dedup.defs,
    operators.CorpusOps.defs,
    operators.MlPipeline.defs,
    operators.Similarity.defs,
    operators.Lakehouse.defs,
    operators.Governance.defs,
    operators.Refresh.defs,
    operators.Multimodal.defs,
    streaming.Streams.defs
  ).flatten

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q3_star_topk")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map(q => q.name -> q.build).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    all.flatMap(q => q.oracle.map(o => q.name -> o.trim)).toMap
}
