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
  *   OPTIMIZE cat.ns.t ZORDER BY (o_custkey, o_orderkey)
  *   VACUUM cat.ns.t [RETAIN 3 VERSIONS | RETAIN 168 HOURS]
  *   VACUUM DATABASE cat.ns [RETAIN 2 SNAPSHOTS]
  *   DESCRIBE HISTORY cat.ns.t      -- DESC HISTORY also accepted
  *   DESCRIBE DETAIL cat.ns.t
  *   CALL cat.system.rewrite_data_files(table => 'ns.t')
  *   CALL cat.system.expire_snapshots(table => 'ns.t', retain_last => 3)
  *   }}}
  *
  * Anything else falls through to the built-in parser untouched. The
  * statement grammar is deliberately tiny (three fixed shapes with a
  * multipart name), so a compiled-regex match is the whole front end —
  * the same extension shape Delta ships, minus the ANTLR dependency.
  * Backquoted name parts are supported; names resolve later, at
  * execution, against the session catalog manager. */
class GraftSqlParser(delegate: ParserInterface) extends ParserInterface {

  import GraftSqlParser._

  override def parsePlan(sqlText: String): LogicalPlan = sqlText match {
    case OptimizeZOrderRe(name, c1, c2) =>
      GraftOptimizeCommand(parts(name), Seq(strip(c1), strip(c2)))
    case OptimizeRe(name) =>
      GraftOptimizeCommand(parts(name), Seq.empty)
    case VacuumDbRe(name, n) =>
      GraftVacuumDatabaseCommand(parts(name), Option(n).map(_.toInt))
    case VacuumRetainRe(name, n) =>
      GraftVacuumCommand(parts(name), Some(n.toInt))
    case VacuumHoursRe(name, h) =>
      GraftVacuumCommand(parts(name), None, retainHours = Some(h.toInt))
    case VacuumRe(name) =>
      GraftVacuumCommand(parts(name), None)
    case DescribeHistoryRe(name) =>
      GraftDescribeHistoryCommand(parts(name))
    case DescribeDetailRe(name) =>
      GraftDescribeDetailCommand(parts(name))
    // Iceberg-procedure spellings of the same maintenance ops — the
    // reference's Iceberg path compacts via CALL
    // (IncrementalTPCDSBenchmark.scala:186-204)
    case CallRewriteRe(cat, tbl) =>
      GraftOptimizeCommand(strip(cat) +: parts(tbl), Seq.empty)
    case CallExpireRe(cat, tbl, n) =>
      GraftVacuumCommand(strip(cat) +: parts(tbl),
        Option(n).map(_.toInt))
    case _ => delegate.parsePlan(sqlText)
  }

  // tokenize on dots OUTSIDE backquotes only (a backquoted part may
  // itself contain dots: OPTIMIZE cat.ns.`my.table`)
  private def parts(name: String): Seq[String] =
    PartRe.findAllIn(name).toIndexedSeq.map(strip)
  private def strip(s: String): String = s.stripPrefix("`").stripSuffix("`")

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
  private val Name = s"($P(?:\\.$P){0,2})"

  private val OptimizeRe =
    s"(?is)\\s*OPTIMIZE\\s+$Name\\s*;?\\s*".r
  private val OptimizeZOrderRe =
    s"(?is)\\s*OPTIMIZE\\s+$Name\\s+ZORDER\\s+BY\\s*\\(\\s*($P)\\s*,\\s*($P)\\s*\\)\\s*;?\\s*".r
  private val VacuumRe =
    s"(?is)\\s*VACUUM\\s+$Name\\s*;?\\s*".r
  private val VacuumRetainRe =
    s"(?is)\\s*VACUUM\\s+$Name\\s+RETAIN\\s+(\\d+)\\s+VERSIONS\\s*;?\\s*".r
  private val VacuumHoursRe =
    s"(?is)\\s*VACUUM\\s+$Name\\s+RETAIN\\s+(\\d+)\\s+HOURS\\s*;?\\s*".r
  // VACUUM DATABASE cat.ns [RETAIN n SNAPSHOTS] — the transaction-db
  // retention path (1- or 2-part namespace name)
  private val VacuumDbRe =
    (s"(?is)\\s*VACUUM\\s+DATABASE\\s+($P(?:\\.$P)?)\\s*" +
      "(?:RETAIN\\s+(\\d+)\\s+SNAPSHOTS\\s*)?;?\\s*").r
  private val DescribeHistoryRe =
    s"(?is)\\s*DESC(?:RIBE)?\\s+HISTORY\\s+$Name\\s*;?\\s*".r
  private val DescribeDetailRe =
    s"(?is)\\s*DESC(?:RIBE)?\\s+DETAIL\\s+$Name\\s*;?\\s*".r
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
}
