package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.{RelationTimeTravel, UnresolvedRelation}
import org.apache.spark.sql.catalyst.expressions.{Cast, Expression}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.functions.lit
import org.apache.spark.sql.types.{DateType, IntegerType, LongType, ShortType, StringType, TimestampType}

import graft.sources.SnapshotTable

/** Path-addressed batch SQL reads: `` SELECT … FROM graft.`/abs/path` ``
  * — the reference's own Delta spelling for scanning a table by
  * location without registering it (FileCountBenchmark.scala:149
  * `` spark.sql(s"select … from delta.`$path`") ``). Spark's built-in
  * `ResolveSQLOnFile` covers only FileFormat sources, so (exactly like
  * Delta's `ResolveDeltaPathTable`) a resolution rule turns the
  * two-part `graft`.`/path` relation into the engine's manifest-planned
  * scan — same pushdown, stats, and time-travel machinery as the
  * catalog route, because it IS the same [[SnapshotTable.read]] plan.
  * `VERSION AS OF n` / `TIMESTAMP AS OF ts` wrap the relation in
  * Spark's `RelationTimeTravel`, handled here too (top-down, so the
  * travel spec is seen before the bare relation underneath it). */
class GraftPathTableResolution(spark: SparkSession) extends Rule[LogicalPlan] {

  private def pathOf(parts: Seq[String]): Option[String] = parts match {
    case Seq(ds, p)
        if (ds.equalsIgnoreCase("graft") ||
          ds.equalsIgnoreCase("graft-snapshot")) &&
          (p.startsWith("/") || p.contains(":/")) => Some(p)
    case _ => None
  }

  // Positive-probe cache: the analyzer runs resolution rules to a fixed
  // point, and every existence probe is a filesystem LIST on object
  // storage — a path that resolved once stays resolved for the session
  // (a table dropped from under it fails loudly at scan planning, same
  // as any external-location table). Negative probes are NOT cached:
  // the table may be created later in the session.
  private val known =
    new java.util.concurrent.ConcurrentHashMap[String, SnapshotTable]()

  private def tableAt(p: String): Option[SnapshotTable] = {
    val cached = known.get(p)
    if (cached != null) Some(cached)
    else {
      val t = new SnapshotTable(spark, p)
      if (t.exists) { known.putIfAbsent(p, t); Some(t) } else None
    }
  }

  /** `TIMESTAMP AS OF` operand → epoch millis: Spark hands the parsed
    * expression through (a string/date/timestamp literal); casting to
    * TimestampType applies the session time zone, exactly how the
    * catalog time-travel route resolves the same clause. */
  private def tsMillis(e: Expression): Long = {
    val micros = Cast(e, TimestampType,
      Some(spark.sessionState.conf.sessionLocalTimeZone)).eval()
    require(micros != null, s"TIMESTAMP AS OF: cannot interpret $e")
    micros.asInstanceOf[Long] / 1000L
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.resolveOperatorsDown {
      // SQL time travel on a path read — `` graft.`/p` VERSION AS OF 3 ``
      // (matched before the bare relation: top-down traversal, so the
      // child UnresolvedRelation is never resolved to "latest" first)
      case tt @ RelationTimeTravel(u: UnresolvedRelation, ts, ver) =>
        pathOf(u.multipartIdentifier).flatMap(tableAt) match {
          case Some(t) =>
            val df = (ver, ts) match {
              case (Some(v), _) => t.read(v.toInt)
              case (_, Some(e)) => t.readAsOf(tsMillis(e))
              case _            => t.read()
            }
            df.queryExecution.analyzed
          case None => tt
        }
      case u: UnresolvedRelation =>
        pathOf(u.multipartIdentifier).flatMap(tableAt) match {
          case Some(t) =>
            // the analyzed child plan of a normal engine read — embeds
            // the PrunedFilteredScan relation, so filter/column
            // pushdown and manifest stats apply as on any other scan
            t.read().queryExecution.analyzed
          case None => u
        }
    }
}

/** `SELECT * FROM table_row_ids('cat.ns.t' | '/abs/path')` — SQL face
  * of [[SnapshotTable.readWithRowIds]]: the current rows plus each
  * row's stable id (`__graft_rid`). Same name-or-path addressing as
  * `table_changes`. */
object GraftTableRowIds {

  private[graft] def build(exprs: Seq[Expression]): LogicalPlan = {
    require(exprs.size == 1,
      s"table_row_ids(table) takes 1 argument, got ${exprs.size}")
    val spark = SparkSession.active
    val name = String.valueOf(exprs.head.eval())
    val t =
      if (name.startsWith("/") || name.contains(":/"))
        new SnapshotTable(spark, name)
      else GraftMaintenance.snapshotOf(spark,
        GraftSqlParser.splitName(name))
    t.readWithRowIds().queryExecution.analyzed
  }
}

/** `SELECT * FROM table_changes('cat.ns.t' | '/abs/path', start[, end])`
  * — Delta's change-data-feed TVF spelling over the engine's
  * commit-captured CDC files ([[SnapshotTable.changes]]): each version
  * in the range contributes its captured rows tagged with
  * `_commit_version` / `_commit_timestamp`. Delta's range semantics:
  *
  *   - `start`/`end` are versions (integer, or all-digit string) OR
  *     timestamps (string / TIMESTAMP literal) — a start timestamp
  *     resolves to the FIRST commit at or after it, an end timestamp to
  *     the LAST commit at or before it.
  *   - an omitted `end` means the table's CURRENT version.
  *   - CDC-less commits inside the range (OPTIMIZE, plain appends)
  *     contribute nothing; a range with NO change-tracking commits
  *     yields an EMPTY result with the CDF schema, not an error.
  *   - an end version beyond the table's history is an error (Delta
  *     rejects out-of-range versions rather than clamping).
  *
  * Cost is O(changed rows of the range) — the changes were captured at
  * commit time, never recomputed by diffing versions. */
object GraftTableChanges {

  private[graft] def build(exprs: Seq[Expression]): LogicalPlan = {
    require(exprs.size == 2 || exprs.size == 3,
      s"table_changes(table, start[, end]) takes 2 or 3 " +
        s"arguments, got ${exprs.size}")
    val spark = SparkSession.active
    val name = String.valueOf(exprs.head.eval())
    val t =
      if (name.startsWith("/") || name.contains(":/"))
        new SnapshotTable(spark, name)
      // dot-split OUTSIDE backquotes (`my.db`.t) — the parser's own
      // name tokenizer, so TVF addressing matches statement addressing
      else GraftMaintenance.snapshotOf(spark,
        GraftSqlParser.splitName(name))
    val cur = t.currentVersion

    // version-or-timestamp operand (Delta accepts either, in either
    // position): integers and all-digit strings are versions; strings,
    // DATE and TIMESTAMP literals are instants — all resolved in the
    // SESSION time zone, exactly like the time-travel clauses
    val zone = spark.sessionState.conf.sessionLocalTimeZone
    sealed trait Bound
    case class Ver(v: Int) extends Bound
    case class Ts(ms: Long) extends Bound
    def bound(e: Expression): Bound = e.dataType match {
      case ShortType | IntegerType | LongType =>
        Ver(e.eval().asInstanceOf[Number].intValue())
      case StringType =>
        val s = String.valueOf(e.eval())
        if (s.matches("\\d+")) Ver(s.toInt)
        else Ts(GraftMaintenance.parseTs(s, zone))
      case TimestampType => Ts(e.eval().asInstanceOf[Long] / 1000L)
      case DateType => Ts(java.time.LocalDate
        .ofEpochDay(e.eval().asInstanceOf[Number].longValue())
        .atStartOfDay(java.time.ZoneId.of(zone))
        .toInstant.toEpochMilli)
      case other => throw new IllegalArgumentException(
        s"table_changes: version/timestamp operand expected, got $other")
    }

    val startBound = bound(exprs(1))
    val start = startBound match {
      case Ver(v) => v
      // first commit AT OR AFTER the instant (manifest timestamps are
      // STRICTLY monotonic across versions — writeManifest stamps each
      // commit above its predecessor — so the at-or-before neighbor +1
      // is exact: no two versions can tie on the instant). Same rule as
      // the streaming source's startingTimestamp.
      case Ts(ms) => t.versionAtOrBefore(ms) match {
        case None                                   => 0
        case Some(v) if t.commitTimestamp(v) == ms  => v
        case Some(v)                                => v + 1
      }
    }
    val endBound = exprs.lift(2).map(bound)
    val end = endBound match {
      case None          => cur // Delta: omitted end = latest version
      case Some(Ver(v))  => v
      // last commit at or before the instant; an instant preceding the
      // first commit makes the range empty (start > end below)
      case Some(Ts(ms))  => t.versionAtOrBefore(ms).getOrElse(-1)
    }
    require(start >= 0 && (start <= cur || startBound.isInstanceOf[Ts]),
      s"table_changes: start version $start outside [0, $cur] of $name")
    require(end <= cur,
      s"table_changes: end version $end exceeds the latest version $cur " +
        s"of $name")
    // the silent-empty carve-out is for TIMESTAMP bounds preceding the
    // first commit — an explicitly inverted VERSION range is a caller
    // typo and fails loudly (the pre-round-15 contract)
    require(end >= start || startBound.isInstanceOf[Ts] ||
        !endBound.exists(_.isInstanceOf[Ver]),
      s"table_changes: bad version range [$start, $end]")
    feed(t, start, end).queryExecution.analyzed
  }

  /** The CDF frame for version range `[start, end]` — each
    * change-tracking commit's captured rows tagged with
    * `_commit_version`/`_commit_timestamp`; CDC-less commits contribute
    * nothing, and a range with NO tracked commits is an EMPTY feed with
    * the CDF schema, not an error (Delta parity — mid-pipeline OPTIMIZE
    * and append-only stretches read as zero changes). */
  private[graft] def feed(t: SnapshotTable, start: Int, end: Int)
      : org.apache.spark.sql.DataFrame = {
    val frames = (start to end).filter(t.hasChanges).map { v =>
      t.changes(v)
        .withColumn("_commit_version", lit(v))
        .withColumn("_commit_timestamp",
          lit(new java.sql.Timestamp(t.commitTimestamp(v))))
    }
    if (frames.isEmpty)
      t.read().limit(0)
        .withColumn("_change_type", lit(null).cast("string"))
        .withColumn("_commit_version", lit(null).cast("int"))
        .withColumn("_commit_timestamp", lit(null).cast("timestamp"))
    else frames.reduce(_.unionByName(_))
  }

  /** Batch CDF read from reader OPTIONS (Delta's
    * `spark.read.format(…).option("readChangeFeed", true)` spelling):
    * `startingVersion` or `startingTimestamp` (required — Delta also
    * refuses an unbounded CDF scan), optional `endingVersion` /
    * `endingTimestamp` (omitted = latest). Timestamps resolve in the
    * session time zone with the same at-or-after / at-or-before rules
    * as the `table_changes` TVF. */
  private[graft] def fromOptions(spark: SparkSession, t: SnapshotTable,
      parameters: Map[String, String]): org.apache.spark.sql.DataFrame = {
    val zone = spark.sessionState.conf.sessionLocalTimeZone
    require(!(parameters.contains("startingVersion") &&
        parameters.contains("startingTimestamp")),
      "specify startingVersion or startingTimestamp, not both")
    require(!(parameters.contains("endingVersion") &&
        parameters.contains("endingTimestamp")),
      "specify endingVersion or endingTimestamp, not both")
    val cur = t.currentVersion
    val start = parameters.get("startingVersion").map(_.trim.toInt)
      .orElse(parameters.get("startingTimestamp").map { s =>
        val ms = GraftMaintenance.parseTs(s.trim, zone)
        t.versionAtOrBefore(ms) match {
          case None                                  => 0
          case Some(v) if t.commitTimestamp(v) == ms => v
          case Some(v)                               => v + 1
        }
      })
      .getOrElse(throw new IllegalArgumentException(
        "readChangeFeed requires startingVersion or startingTimestamp"))
    val end = parameters.get("endingVersion").map(_.trim.toInt)
      .orElse(parameters.get("endingTimestamp").map(s =>
        t.versionAtOrBefore(GraftMaintenance.parseTs(s.trim, zone))
          .getOrElse(-1)))
      .getOrElse(cur)
    // range validation mirrors the table_changes TVF (and Delta): an
    // out-of-range or inverted EXPLICIT VERSION range is a caller typo
    // and fails loudly — a misconfigured CDC consumer must not read a
    // silently empty feed and believe it is caught up. Only
    // timestamp-derived emptiness (an instant preceding the first
    // commit / past the latest) reads as zero changes.
    val startIsTs = parameters.contains("startingTimestamp")
    val endIsTs = parameters.contains("endingTimestamp")
    require(start >= 0 && (start <= cur || startIsTs),
      s"readChangeFeed: start version $start outside [0, $cur]")
    require(end <= cur,
      s"readChangeFeed: end version $end exceeds the latest version $cur")
    require(end >= start || startIsTs || endIsTs,
      s"readChangeFeed: bad version range [$start, $end]")
    feed(t, start, end)
  }
}
