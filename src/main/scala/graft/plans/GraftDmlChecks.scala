package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.UnresolvedRelation
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal}
import org.apache.spark.sql.catalyst.plans.logical.{
  Assignment, InsertAction, LogicalPlan, MergeIntoTable, SubqueryAlias,
  UpdateAction, UpdateTable}
import org.apache.spark.sql.types.StructType

/** Analysis-surface guard for SQL UPDATE / MERGE INTO against graft
  * catalog tables, run at PARSE time (the analyzer's row-level rewrites
  * fire inside the same fixed-point batch as any injected resolution
  * rule, so the parser is the one hook that reliably sees the user's
  * raw assignment lists): refuses explicit assignments to identity and
  * generated columns — Delta's analysis-time contract — BEFORE the
  * ReplaceData rewrite erases the carried-vs-assigned distinction.
  * The rewrite frame must keep `validateExplicit = false` for carried
  * rows, so a runtime check cannot tell `SET id = 5` from a carried
  * `id = 5`; without this guard a SQL UPDATE could silently break the
  * advertised identity-uniqueness / generated-value invariants.
  *
  * Scope (matching Delta):
  *   - UPDATE / MERGE-UPDATE assignment to ANY identity column → refuse
  *     (stored identity values are immutable).
  *   - UPDATE / MERGE-UPDATE assignment to a generated column → refuse
  *     (the recomputation would silently overwrite the SET value).
  *   - MERGE-INSERT explicit non-NULL value for a `GENERATED ALWAYS AS
  *     IDENTITY` column (without ALLOW EXPLICIT INSERT) → refuse — the
  *     same rule the INSERT path enforces row-locally; an explicit NULL
  *     means "fill" (the engine's pinned semantics) and passes.
  *   - Star actions (`UPDATE SET *` / `INSERT *`) pass through: their
  *     assignment lists are machine-generated, not user SETs.
  *
  * Resolution is best-effort by name against the session catalog
  * manager: unknown tables, non-graft catalogs, and path-addressed
  * targets fall through untouched (the analyzer raises its own errors
  * there). A false skip degrades to round-16 behavior; a refusal is
  * always a genuine constraint violation. */
object GraftDmlChecks {

  def validated(plan: LogicalPlan): LogicalPlan = {
    plan match {
      case u: UpdateTable =>
        graftTarget(u.table).foreach { case (schema, quals) =>
          refuseUpdateAssignments(schema, quals, u.assignments, "UPDATE")
        }
      case m: MergeIntoTable =>
        graftTarget(m.targetTable).foreach { case (schema, quals) =>
          val updates = (m.matchedActions ++ m.notMatchedBySourceActions)
            .collect { case ua: UpdateAction => ua.assignments }.flatten
          refuseUpdateAssignments(schema, quals, updates,
            "MERGE … UPDATE SET")
          val inserts = m.notMatchedActions
            .collect { case ia: InsertAction => ia.assignments }.flatten
          refuseAlwaysIdentityInserts(schema, quals, inserts)
          // star actions (`UPDATE SET *` / `INSERT *`) expand into
          // assignments FROM THE SOURCE for every target column — on a
          // table with a GENERATED ALWAYS identity column that always
          // assigns the engine-owned id, so the star itself refuses
          // (Delta does the same; spell the columns out instead)
          val hasStar = m.matchedActions.exists(
              _.isInstanceOf[org.apache.spark.sql.catalyst.plans.logical
                .UpdateStarAction]) ||
            m.notMatchedActions.exists(
              _.isInstanceOf[org.apache.spark.sql.catalyst.plans.logical
                .InsertStarAction])
          if (hasStar)
            schema.fields.find(f =>
                org.apache.spark.sql.catalyst.util.IdentityColumn
                  .getIdentityInfo(f).exists(!_.isAllowExplicitInsert))
              .foreach { f =>
                throw new org.apache.spark.sql.AnalysisException(
                  errorClass = "_LEGACY_ERROR_TEMP_3105",
                  messageParameters = Map("message" ->
                    (s"MERGE … SET * / INSERT * would assign GENERATED " +
                      s"ALWAYS AS IDENTITY column ${f.name} from the " +
                      "source — list the columns explicitly and omit it")))
              }
        }
      case _ => ()
    }
    plan
  }

  /** The target's schema (identity/generated metadata included) plus the
    * qualifier spellings an assignment key may legitimately carry
    * (alias, table name) — None when the target isn't a graft catalog
    * table or can't be resolved yet. */
  private def graftTarget(
      target: LogicalPlan): Option[(StructType, Set[String])] = {
    var quals = Set.empty[String]
    var ident: Option[Seq[String]] = None
    var node = target
    var done = false
    while (!done) node match {
      case SubqueryAlias(id, child) =>
        quals += id.name.toLowerCase; node = child
      case r: UnresolvedRelation =>
        ident = Some(r.multipartIdentifier); done = true
      case _ => done = true
    }
    ident.flatMap { parts =>
      quals ++= parts.map(_.toLowerCase)
      val spark = SparkSession.active
      scala.util.Try {
        val (plugin, id) = org.apache.spark.sql.GraftStreamShim
          .resolveCatalogTable(spark, parts)
        plugin match {
          case g: graft.sources.GraftSqlCatalog =>
            g.loadTable(id) match {
              case t: graft.sources.GraftV2Table => Some((t.schema, quals))
              case _ => None // metadata tables — never an UPDATE target
            }
          case _ => None
        }
      }.toOption.flatten
    }
  }

  /** The top-level target column an assignment key names, if the key's
    * qualifier (when present) plausibly names the target. */
  private def keyColumn(key: Expression, quals: Set[String],
      schema: StructType): Option[org.apache.spark.sql.types.StructField] = {
    val parts: Seq[String] = key match {
      case a: org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute =>
        a.nameParts
      case a: org.apache.spark.sql.catalyst.expressions.AttributeReference =>
        Seq(a.name)
      case _ => Seq.empty
    }
    val name = parts match {
      case Seq(one) => Some(one)
      case Seq(q, f) if quals.contains(q.toLowerCase) => Some(f)
      case _ => None
    }
    name.flatMap(n =>
      schema.fields.find(_.name.equalsIgnoreCase(n)))
  }

  private def refuseUpdateAssignments(schema: StructType,
      quals: Set[String], assignments: Seq[Assignment],
      verb: String): Unit =
    assignments.foreach { a =>
      keyColumn(a.key, quals, schema).foreach { f =>
        if (org.apache.spark.sql.catalyst.util.IdentityColumn
            .isIdentityColumn(f))
          throw new org.apache.spark.sql.AnalysisException(
            errorClass = "_LEGACY_ERROR_TEMP_3105",
            messageParameters = Map("message" ->
              (s"$verb on IDENTITY column ${f.name} is not supported — " +
                "identity values are engine-assigned and immutable")))
        if (org.apache.spark.sql.catalyst.util.GeneratedColumn
            .getGenerationExpression(f).isDefined)
          throw new org.apache.spark.sql.AnalysisException(
            errorClass = "_LEGACY_ERROR_TEMP_3105",
            messageParameters = Map("message" ->
              (s"$verb on GENERATED ALWAYS column ${f.name} is not " +
                "supported — the value recomputes from its source " +
                "columns; assign those instead")))
      }
    }

  private def refuseAlwaysIdentityInserts(schema: StructType,
      quals: Set[String], assignments: Seq[Assignment]): Unit =
    assignments.foreach { a =>
      keyColumn(a.key, quals, schema).foreach { f =>
        val explicitNull = a.value match {
          case Literal(null, _) => true
          case _ => false
        }
        val refuse = org.apache.spark.sql.catalyst.util.IdentityColumn
          .getIdentityInfo(f).exists(spec =>
            !spec.isAllowExplicitInsert && !explicitNull)
        if (refuse)
          throw new org.apache.spark.sql.AnalysisException(
            errorClass = "_LEGACY_ERROR_TEMP_3105",
            messageParameters = Map("message" ->
              (s"MERGE … INSERT provides a value for GENERATED ALWAYS " +
                s"AS IDENTITY column ${f.name} — omit it (or insert " +
                "NULL) to allocate, or declare BY DEFAULT")))
      }
    }
}
