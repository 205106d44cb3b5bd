package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.UnresolvedRelation
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.functions.lit

import graft.sources.SnapshotTable

/** Path-addressed batch SQL reads: `` SELECT … FROM graft.`/abs/path` ``
  * — the reference's own Delta spelling for scanning a table by
  * location without registering it (FileCountBenchmark.scala:149
  * `` spark.sql(s"select … from delta.`$path`") ``). Spark's built-in
  * `ResolveSQLOnFile` covers only FileFormat sources, so (exactly like
  * Delta's `ResolveDeltaPathTable`) a resolution rule turns the
  * two-part `graft`.`/path` relation into the engine's manifest-planned
  * scan — same pushdown, stats, and time-travel machinery as the
  * catalog route, because it IS the same [[SnapshotTable.read]] plan. */
class GraftPathTableResolution(spark: SparkSession) extends Rule[LogicalPlan] {

  private def pathOf(parts: Seq[String]): Option[String] = parts match {
    case Seq(ds, p)
        if (ds.equalsIgnoreCase("graft") ||
          ds.equalsIgnoreCase("graft-snapshot")) &&
          (p.startsWith("/") || p.contains(":/")) => Some(p)
    case _ => None
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.resolveOperatorsUp {
      case u: UnresolvedRelation =>
        pathOf(u.multipartIdentifier) match {
          case Some(p) if new SnapshotTable(spark, p).exists =>
            // the analyzed child plan of a normal engine read — embeds
            // the PrunedFilteredScan relation, so filter/column
            // pushdown and manifest stats apply as on any other scan
            new SnapshotTable(spark, p).read()
              .queryExecution.analyzed
          case _ => u
        }
    }
}

/** `SELECT * FROM table_changes('cat.ns.t' | '/abs/path', start[, end])`
  * — Delta's change-data-feed TVF spelling over the engine's
  * commit-captured CDC files ([[SnapshotTable.changes]]): each version
  * in the range contributes its captured rows tagged with
  * `_commit_version` / `_commit_timestamp`; CDC-less commits (OPTIMIZE,
  * plain appends) are skipped, exactly Delta's range semantics. Cost is
  * O(changed rows of the range) — the changes were captured at commit
  * time, never recomputed by diffing versions. */
object GraftTableChanges {

  private[graft] def build(exprs: Seq[Expression]): LogicalPlan = {
    require(exprs.size == 2 || exprs.size == 3,
      s"table_changes(table, startVersion[, endVersion]) takes 2 or 3 " +
        s"arguments, got ${exprs.size}")
    val spark = SparkSession.active
    def str(e: Expression): String = String.valueOf(e.eval())
    def ver(e: Expression): Int = e.eval() match {
      case n: Number => n.intValue()
      case other => throw new IllegalArgumentException(
        s"table_changes: version must be an integer literal, got $other")
    }
    val name = str(exprs.head)
    val start = ver(exprs(1))
    val end = if (exprs.size == 3) ver(exprs(2)) else start
    require(start >= 0 && end >= start,
      s"table_changes: bad version range [$start, $end]")
    val t =
      if (name.startsWith("/") || name.contains(":/"))
        new SnapshotTable(spark, name)
      else GraftMaintenance.snapshotOf(spark,
        name.split('.').toIndexedSeq)
    val hi = math.min(end, t.currentVersion)
    val frames = (start to hi).filter(t.hasChanges).map { v =>
      t.changes(v)
        .withColumn("_commit_version", lit(v))
        .withColumn("_commit_timestamp",
          lit(new java.sql.Timestamp(t.commitTimestamp(v))))
    }
    require(frames.nonEmpty,
      s"table_changes: no change-data-feed commits in [$start, $end] of " +
        s"$name (commit DML with trackChanges = true)")
    frames.reduce(_.unionByName(_)).queryExecution.analyzed
  }
}
