package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.connector.read.V1Scan
import org.apache.spark.sql.execution.datasources.LogicalRelation
import org.apache.spark.sql.execution.datasources.v2.{DataSourceV2ScanRelation, V1ScanWrapper}
import org.apache.spark.sql.sources.{BaseRelation, TableScan}

/** Marker for graft V1-fallback scans whose relations carry a
  * manifest-derived `sizeInBytes`. [[V1StatsFallback]] lowers marked
  * scans to [[LogicalRelation]] during optimization so join planning
  * sees those stats. */
trait GraftV1StatsScan extends V1Scan

/** Restores metadata-driven join planning on the DSv2→V1 fallback path.
  *
  * Spark's `V2ScanRelationPushDown` wraps a [[V1Scan]] in a
  * `V1ScanWrapper` that implements only `Scan` — it drops the scan's
  * `SupportsReportStatistics` — so `DataSourceV2ScanRelation.computeStats`
  * falls back to `spark.sql.defaultSizeInBytes` (Long.MaxValue) for every
  * V1-fallback table. Join selection then plans SortMergeJoin for
  * dimension-sized catalog tables and AQE has to rescue at runtime,
  * AFTER materializing the fact side's full shuffle — a real regression
  * at scale.
  *
  * This rule performs the exact lowering `DataSourceV2Strategy` would do
  * at physical planning (`scan.toV1TableScan` → `RowDataSourceScanExec`),
  * but one phase earlier and only for graft's own scans (marked
  * [[GraftV1StatsScan]]): the resulting [[LogicalRelation]] reports the
  * relation's manifest-derived `sizeInBytes`, so `JoinSelection`
  * broadcasts dimension tables up front. Semantics are unchanged — the
  * graft relations bake their pushed filters and projection into
  * `buildScan`, and residual filters remain above the relation either
  * way. Registered idempotently in the session's last optimizer batch
  * ("User Provided Optimizers"), which runs after pushdown; the rule
  * removes every node it matches, so it converges in one pass.
  */
object V1StatsFallback extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan = rewrite(plan)

  /** Top-down, skipping DML subtrees whole: `DataSourceV2Strategy`
    * requires DELETE/row-level commands to keep their v2 relation. */
  private def rewrite(plan: LogicalPlan): LogicalPlan = plan match {
    case d: org.apache.spark.sql.catalyst.plans.logical.DeleteFromTable => d
    case r: DataSourceV2ScanRelation =>
      graftV1Of(r).map { scan =>
        val rel = scan.toV1TableScan[BaseRelation with TableScan](
          SparkSession.active.sqlContext)
        LogicalRelation(rel, r.output, None, isStreaming = false, stream = None)
      }.getOrElse(r)
    case other => other.mapChildren(rewrite)
  }

  /** The marked graft V1 scan, whether push-down wrapped it (normal
    * reads) or left it raw (the row-level-operation scan, which Spark
    * would otherwise plan as an unsupported `BatchScanExec`). */
  private def graftV1Of(r: DataSourceV2ScanRelation): Option[V1Scan] =
    r.scan match {
      case w: V1ScanWrapper if w.v1Scan.isInstanceOf[GraftV1StatsScan] =>
        Some(w.v1Scan)
      case s: GraftV1StatsScan => Some(s)
      case _ => None
    }

  /** Append this rule to `spark.experimental.extraOptimizations` once per
    * session — the only extension point that runs after
    * `V2ScanRelationPushDown` has produced the wrapped scans. */
  def register(spark: SparkSession): Unit = synchronized {
    val cur = spark.experimental.extraOptimizations
    if (!cur.contains(this))
      spark.experimental.extraOptimizations = cur :+ this
  }
}
