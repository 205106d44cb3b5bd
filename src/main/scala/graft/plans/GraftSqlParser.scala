package graft.plans

import org.apache.spark.sql.catalyst.{FunctionIdentifier, TableIdentifier}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.parser.ParserInterface
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.types.{DataType, StructType}

/** Delegating SQL parser adding the engine's maintenance verbs
  * (injected via `spark.sql.extensions` — GraftExtensions):
  *
  *   {{{
  *   OPTIMIZE cat.ns.t
  *   OPTIMIZE cat.ns.t WHERE pc = 'v'             -- partition-scoped
  *   OPTIMIZE cat.ns.t WHERE pc IN ('a', 'b')     -- many partitions
  *   OPTIMIZE cat.ns.t ZORDER BY (a, b[, c, d])   -- 1..4 dimensions
  *   REORG TABLE cat.ns.t [WHERE pc = 'v'] APPLY (PURGE)
  *   GENERATE symlink_format_manifest FOR TABLE cat.ns.t
  *   VACUUM cat.ns.t [RETAIN 3 VERSIONS | RETAIN 168 HOURS] [DRY RUN]
  *   VACUUM DATABASE cat.ns [RETAIN 2 SNAPSHOTS]
  *   DESCRIBE HISTORY cat.ns.t      -- DESC HISTORY also accepted
  *   DESCRIBE DETAIL cat.ns.t
  *   RESTORE TABLE cat.ns.t [TO] VERSION AS OF 3
  *   RESTORE TABLE cat.ns.t [TO] TIMESTAMP AS OF '2026-01-01'
  *   CREATE TABLE cat.ns.t2 SHALLOW|DEEP CLONE cat.ns.t [VERSION AS OF 3]
  *   CALL cat.system.rewrite_data_files(table => 'ns.t')
  *   CALL cat.system.expire_snapshots(table => 'ns.t', retain_last => 3)
  *   CALL cat.system.rollback_to_snapshot('ns.t', 3)
  *   CALL cat.system.rollback_to_timestamp('ns.t', '2026-01-01')
  *   CALL cat.system.remove_orphan_files('ns.t' [, older_than => 'ts'])
  *   CALL cat.system.run_compaction('run', 'ns.t')   -- Hudi spelling
  *   }}}
  *
  * Every table name position also accepts the path-addressed spelling
  * the reference drives its own housekeeping with
  * (`` OPTIMIZE delta.`/abs/path` ``, IncrementalTPCDSBenchmark
  * .scala:192; `` DESCRIBE HISTORY delta.`path` `` :213):
  * `` graft.`/abs/path` `` resolves the backquoted absolute path as a
  * snapshot-table root directly, no catalog required — the `$P` name
  * part already admits any backquoted string, so the grammar is
  * unchanged and only resolution ([[GraftMaintenance.snapshotOf]])
  * looks at the shape.
  *
  * Anything else falls through to the built-in parser untouched. The
  * statement grammar is deliberately tiny (fixed shapes with a
  * multipart name), so a compiled-regex match is the whole front end —
  * the same extension shape Delta ships, minus the ANTLR dependency.
  * Backquoted name parts are supported; names resolve later, at
  * execution, against the session catalog manager. */
class GraftSqlParser(delegate: ParserInterface) extends ParserInterface {

  import GraftSqlParser._

  override def parsePlan(sqlText: String): LogicalPlan = sqlText match {
    case OptimizeRe(name, full, whereCond, zcols) =>
      GraftOptimizeCommand(parts(name),
        Option(zcols).toSeq.flatMap(splitCols),
        Option(whereCond).map(parseWhere),
        zorderWritten = zcols != null,
        full = full != null)
    case VacuumDbRe(name, n) =>
      GraftVacuumDatabaseCommand(parts(name), Option(n).map(_.toInt))
    case VacuumRetainRe(name, n, dry) =>
      GraftVacuumCommand(parts(name), Some(n.toInt), dryRun = dry != null)
    case VacuumHoursRe(name, h, dry) =>
      GraftVacuumCommand(parts(name), None, retainHours = Some(h.toInt),
        dryRun = dry != null)
    case VacuumRe(name, dry) =>
      GraftVacuumCommand(parts(name), None, dryRun = dry != null)
    case SyncIdentityRe(name) =>
      GraftSyncIdentityCommand(parts(name))
    case SetNotNullRe(name, c) =>
      GraftSetNotNullCommand(parts(name), strip(c))
    case ReorgRe(name, whereCond) =>
      GraftReorgCommand(parts(name), Option(whereCond).map(parseWhere))
    case GenerateRe(name) =>
      GraftGenerateManifestCommand(parts(name))
    case ConvertRe(path, pc, pcType) =>
      GraftConvertCommand(path,
        Option(pc).map(c => (strip(c), pcType.trim)))
    case DescribeHistoryRe(name) =>
      GraftDescribeHistoryCommand(parts(name))
    case DescribeDetailRe(name) =>
      GraftDescribeDetailCommand(parts(name))
    case RestoreVersionRe(name, v) =>
      GraftRestoreCommand(parts(name), Some(v.toInt), None)
    case RestoreTimestampRe(name, ts) =>
      GraftRestoreCommand(parts(name), None, Some(ts))
    case ShallowCloneRe(orReplace, tgt, src, v) =>
      GraftCloneCommand(parts(tgt), parts(src), Option(v).map(_.toInt),
        orReplace = orReplace != null)
    case DeepCloneRe(orReplace, tgt, src, v) =>
      GraftCloneCommand(parts(tgt), parts(src), Option(v).map(_.toInt),
        deep = true, orReplace = orReplace != null)
    // Iceberg-procedure spellings of the same maintenance ops — the
    // reference's Iceberg path compacts via CALL
    // (IncrementalTPCDSBenchmark.scala:186-204)
    case CallRewriteRe(cat, tbl) =>
      GraftOptimizeCommand(strip(cat) +: parts(tbl), Seq.empty, None)
    case CallExpireRe(cat, tbl, n) =>
      GraftVacuumCommand(strip(cat) +: parts(tbl),
        Option(n).map(_.toInt))
    // Hudi's compaction procedure (the reference's Hudi path:
    // IncrementalTPCDSBenchmark.scala:200) — 'run'/'schedule' both map
    // to the eager OPTIMIZE (there is no deferred scheduler here)
    case CallRunCompactionRe(cat, tbl) =>
      GraftOptimizeCommand(strip(cat) +: parts(tbl), Seq.empty, None)
    // Iceberg's RESTORE spellings: rollback_to_snapshot takes a version
    // (snapshot ids ARE versions here), rollback_to_timestamp an instant
    case CallRollbackSnapRe(cat, tbl, v) =>
      GraftRestoreCommand(strip(cat) +: parts(tbl), Some(v.toInt), None)
    case CallRollbackTsRe(cat, tbl, ts) =>
      GraftRestoreCommand(strip(cat) +: parts(tbl), None, Some(ts))
    // Iceberg's orphan cleaner — losing-OCC attempt output + crash
    // leftovers, guarded by the older_than horizon
    case CallRemoveOrphansRe(cat, tbl, ts) =>
      GraftRemoveOrphansCommand(strip(cat) +: parts(tbl), Option(ts))
    // delegate-parsed UPDATE/MERGE pass the identity/generated-column
    // assignment guard (see [[GraftDmlChecks]]) — parse is the one hook
    // that still sees the user's raw SET lists
    case _ => GraftDmlChecks.validated(delegate.parsePlan(sqlText))
  }

  // tokenize on dots OUTSIDE backquotes only (a backquoted part may
  // itself contain dots: OPTIMIZE cat.ns.`my.table`)
  private def parts(name: String): Seq[String] =
    PartRe.findAllIn(name).toIndexedSeq.map(strip)
  private def strip(s: String): String = s.stripPrefix("`").stripSuffix("`")
  private def splitCols(s: String): Seq[String] =
    s.split(',').toIndexedSeq.map(_.trim).filter(_.nonEmpty).map(strip)
  private def parseWhere(cond: String): (String, Seq[String]) = cond.trim match {
    case WhereEqRe(c, sq, dq, bare) =>
      (strip(c), Seq(Seq(sq, dq, bare).find(_ != null).get))
    // pc IN ('a', 'b', …) — a maintenance sweep names many partitions
    // per statement at scale. Tokenized as quoted-or-bare VALUES, never
    // split on raw commas (a quoted value may itself contain one)
    case WhereInRe(c, list) =>
      val vals = InValRe.findAllMatchIn(list).map(m =>
        Seq(m.group(1), m.group(2), m.group(3)).find(_ != null).get)
        .toIndexedSeq
      require(vals.nonEmpty, s"OPTIMIZE … WHERE $c IN (): empty value list")
      (strip(c), vals)
    case other => throw new UnsupportedOperationException(
      s"OPTIMIZE/REORG … WHERE supports a partition-column equality or IN " +
        s"list (pc = 'value' | pc IN ('a', 'b')), got: $other")
  }

  override def parseExpression(sqlText: String): Expression =
    delegate.parseExpression(sqlText)
  override def parseTableIdentifier(sqlText: String): TableIdentifier =
    delegate.parseTableIdentifier(sqlText)
  override def parseFunctionIdentifier(sqlText: String): FunctionIdentifier =
    delegate.parseFunctionIdentifier(sqlText)
  override def parseMultipartIdentifier(sqlText: String): Seq[String] =
    delegate.parseMultipartIdentifier(sqlText)
  override def parseQuery(sqlText: String): LogicalPlan =
    delegate.parseQuery(sqlText)
  override def parseRoutineParam(sqlText: String): StructType =
    delegate.parseRoutineParam(sqlText)
  override def parseTableSchema(sqlText: String): StructType =
    delegate.parseTableSchema(sqlText)
  override def parseDataType(sqlText: String): DataType =
    delegate.parseDataType(sqlText)
}

object GraftSqlParser {
  // one name part: backquoted (anything but a backquote) or bare word
  private val P = "(?:`[^`]+`|\\w+)"
  private val PartRe = P.r

  /** Tokenize a dotted name on dots OUTSIDE backquotes (a backquoted
    * part may itself contain dots: `my.db`.t) — shared with the
    * `table_changes` TVF so string-argument addressing splits exactly
    * like statement addressing. */
  private[plans] def splitName(name: String): Seq[String] =
    PartRe.findAllIn(name).toIndexedSeq
      .map(_.stripPrefix("`").stripSuffix("`"))
  private val Name = s"($P(?:\\.$P){0,2})"

  // OPTIMIZE name [FULL] [WHERE cond] [ZORDER BY (cols)] — one regex,
  // three optional clauses; FULL (Delta's liquid-clustering spelling)
  // reclusters everything on a clustered table; a written-but-empty/
  // overlong ZORDER list is caught at command construction with the
  // graft arity message, not a generic fall-through parse error
  private val OptimizeRe =
    (s"(?is)\\s*OPTIMIZE\\s+$Name" +
      "(?:\\s+(FULL))?" +
      "(?:\\s+WHERE\\s+(.+?))?" +
      "(?:\\s+ZORDER\\s+BY\\s*\\(([^)]*)\\))?\\s*;?\\s*").r
  // pc = 'v' | pc = "v" | pc = v (single equality on one column)
  private val WhereEqRe =
    (s"($P)\\s*=\\s*(?:'([^']*)'|\"([^\"]*)\"|([^\\s'\"]+))\\s*").r
  // pc IN ('a', 'b', …)
  private val WhereInRe = s"(?i)($P)\\s+IN\\s*\\(([^)]*)\\)\\s*".r
  // one IN-list value: single-quoted, double-quoted, or bare
  private val InValRe = "'([^']*)'|\"([^\"]*)\"|([^\\s,'\"]+)".r
  // ALTER TABLE name SYNC IDENTITY — Delta's verb to realign identity
  // high-water marks with stored values (explicit BY DEFAULT inserts
  // never advance the mark)
  private val SyncIdentityRe =
    s"(?is)\\s*ALTER\\s+TABLE\\s+$Name\\s+SYNC\\s+IDENTITY\\s*;?\\s*".r
  // ALTER TABLE name ALTER|CHANGE COLUMN col SET NOT NULL — Spark's v2
  // ALTER path refuses nullable→non-nullable at analysis, so the verb
  // ships through the extension (Delta does the same)
  private val SetNotNullRe =
    (s"(?is)\\s*ALTER\\s+TABLE\\s+$Name\\s+(?:ALTER|CHANGE)\\s+COLUMN\\s+" +
      s"($P)\\s+SET\\s+NOT\\s+NULL\\s*;?\\s*").r
  // REORG TABLE name [WHERE cond] APPLY (PURGE) — Delta's
  // deletion-vector purge verb
  private val ReorgRe =
    (s"(?is)\\s*REORG\\s+TABLE\\s+$Name" +
      "(?:\\s+WHERE\\s+(.+?))?" +
      "\\s+APPLY\\s*\\(\\s*PURGE\\s*\\)\\s*;?\\s*").r
  // GENERATE symlink_format_manifest FOR TABLE name (Delta's verb)
  private val GenerateRe =
    (s"(?is)\\s*GENERATE\\s+symlink_format_manifest\\s+FOR\\s+TABLE\\s+" +
      s"$Name\\s*;?\\s*").r
  // CONVERT TO GRAFT parquet.`/abs/path` [PARTITIONED BY (pc TYPE)] —
  // Delta's CONVERT TO DELTA spelling; the partition clause is
  // MANDATORY for Hive-layout sources (validated at execution, where
  // the layout is visible)
  private val ConvertRe =
    // the type may itself carry parens (DECIMAL(10,2)) — one nesting
    // level of balanced parens in the type group
    ("(?is)\\s*CONVERT\\s+TO\\s+GRAFT\\s+parquet\\s*\\.\\s*`([^`]+)`" +
      s"(?:\\s+PARTITIONED\\s+BY\\s*\\(\\s*($P)\\s+" +
      "((?:[^()]|\\([^()]*\\))+?)\\s*\\))?" +
      "\\s*;?\\s*").r
  private val VacuumRe =
    s"(?is)\\s*VACUUM\\s+$Name(\\s+DRY\\s+RUN)?\\s*;?\\s*".r
  private val VacuumRetainRe =
    (s"(?is)\\s*VACUUM\\s+$Name\\s+RETAIN\\s+(\\d+)\\s+VERSIONS" +
      "(\\s+DRY\\s+RUN)?\\s*;?\\s*").r
  private val VacuumHoursRe =
    (s"(?is)\\s*VACUUM\\s+$Name\\s+RETAIN\\s+(\\d+)\\s+HOURS" +
      "(\\s+DRY\\s+RUN)?\\s*;?\\s*").r
  // VACUUM DATABASE cat.ns [RETAIN n SNAPSHOTS] — the transaction-db
  // retention path (1- or 2-part namespace name)
  private val VacuumDbRe =
    (s"(?is)\\s*VACUUM\\s+DATABASE\\s+($P(?:\\.$P)?)\\s*" +
      "(?:RETAIN\\s+(\\d+)\\s+SNAPSHOTS\\s*)?;?\\s*").r
  private val DescribeHistoryRe =
    s"(?is)\\s*DESC(?:RIBE)?\\s+HISTORY\\s+$Name\\s*;?\\s*".r
  private val DescribeDetailRe =
    s"(?is)\\s*DESC(?:RIBE)?\\s+DETAIL\\s+$Name\\s*;?\\s*".r
  // RESTORE [TABLE] name [TO] VERSION AS OF n (Delta accepts both the
  // TO and the bare spelling)
  private val RestoreVersionRe =
    (s"(?is)\\s*RESTORE\\s+(?:TABLE\\s+)?$Name\\s+(?:TO\\s+)?VERSION\\s+AS" +
      "\\s+OF\\s+(\\d+)\\s*;?\\s*").r
  private val RestoreTimestampRe =
    (s"(?is)\\s*RESTORE\\s+(?:TABLE\\s+)?$Name\\s+(?:TO\\s+)?TIMESTAMP\\s+AS" +
      "\\s+OF\\s+'([^']+)'\\s*;?\\s*").r
  // CREATE [OR REPLACE] TABLE tgt SHALLOW|DEEP CLONE src [VERSION AS OF n]
  private val ShallowCloneRe =
    (s"(?is)\\s*CREATE\\s+(OR\\s+REPLACE\\s+)?TABLE\\s+$Name" +
      s"\\s+SHALLOW\\s+CLONE\\s+$Name" +
      "(?:\\s+VERSION\\s+AS\\s+OF\\s+(\\d+))?\\s*;?\\s*").r
  private val DeepCloneRe =
    (s"(?is)\\s*CREATE\\s+(OR\\s+REPLACE\\s+)?TABLE\\s+$Name" +
      s"\\s+DEEP\\s+CLONE\\s+$Name" +
      "(?:\\s+VERSION\\s+AS\\s+OF\\s+(\\d+))?\\s*;?\\s*").r
  // CALL cat.system.rewrite_data_files([table =>] 'ns.t')
  private val CallRewriteRe =
    (s"(?is)\\s*CALL\\s+($P)\\.system\\.rewrite_data_files\\s*\\(\\s*" +
      "(?:table\\s*=>\\s*)?'([^']+)'\\s*\\)\\s*;?\\s*").r
  // CALL cat.system.expire_snapshots([table =>] 'ns.t'
  //                                  [, retain_last => n])
  private val CallExpireRe =
    (s"(?is)\\s*CALL\\s+($P)\\.system\\.expire_snapshots\\s*\\(\\s*" +
      "(?:table\\s*=>\\s*)?'([^']+)'\\s*" +
      "(?:,\\s*retain_last\\s*=>\\s*(\\d+)\\s*)?\\)\\s*;?\\s*").r
  // CALL cat.system.run_compaction('run'|'schedule'[, ]'ns.t') — Hudi's
  // procedure name; op and table accepted positionally or named
  private val CallRunCompactionRe =
    (s"(?is)\\s*CALL\\s+($P)\\.system\\.run_compaction\\s*\\(\\s*" +
      "(?:op\\s*=>\\s*)?'(?:run|schedule|scheduleandexecute)'\\s*,\\s*" +
      "(?:table\\s*=>\\s*)?'([^']+)'\\s*\\)\\s*;?\\s*").r
  // CALL cat.system.rollback_to_snapshot([table =>] 'ns.t',
  //                                      [snapshot_id =>] n)
  private val CallRollbackSnapRe =
    (s"(?is)\\s*CALL\\s+($P)\\.system\\.rollback_to_snapshot\\s*\\(\\s*" +
      "(?:table\\s*=>\\s*)?'([^']+)'\\s*,\\s*" +
      "(?:snapshot_id\\s*=>\\s*)?(\\d+)\\s*\\)\\s*;?\\s*").r
  // CALL cat.system.rollback_to_timestamp([table =>] 'ns.t',
  //                                       [timestamp =>] 'ts')
  private val CallRollbackTsRe =
    (s"(?is)\\s*CALL\\s+($P)\\.system\\.rollback_to_timestamp\\s*\\(\\s*" +
      "(?:table\\s*=>\\s*)?'([^']+)'\\s*,\\s*" +
      "(?:timestamp\\s*=>\\s*)?'([^']+)'\\s*\\)\\s*;?\\s*").r
  // CALL cat.system.remove_orphan_files([table =>] 'ns.t'
  //                                     [, older_than => 'ts'])
  private val CallRemoveOrphansRe =
    (s"(?is)\\s*CALL\\s+($P)\\.system\\.remove_orphan_files\\s*\\(\\s*" +
      "(?:table\\s*=>\\s*)?'([^']+)'\\s*" +
      "(?:,\\s*older_than\\s*=>\\s*'([^']+)'\\s*)?\\)\\s*;?\\s*").r
}
