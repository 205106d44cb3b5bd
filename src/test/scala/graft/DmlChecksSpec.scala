package graft

import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** Parse-time guard for SQL UPDATE / MERGE against identity and
  * generated columns ([[graft.plans.GraftDmlChecks]]): explicit
  * assignments refuse at analysis — Delta's contract — because the
  * row-level rewrite cannot distinguish a SET value from a carried one
  * at runtime. */
class DmlChecksSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def tmp(p: String) = Files.createTempDirectory(s"graft_$p").toString

  private def session(cat: String, root: String) = {
    val s = spark.newSession()
    s.conf.set(s"spark.sql.catalog.$cat", "graft.sources.GraftSqlCatalog")
    s.conf.set(s"spark.sql.catalog.$cat.root", root)
    graft.plans.GraftRowLevelOps.register(s)
    s
  }

  private def msgs(x: Throwable): Seq[String] =
    if (x == null) Seq.empty
    else Option(x.getMessage).toSeq ++ msgs(x.getCause)

  test("UPDATE SET on identity / generated columns refuses at analysis") {
    val s = session("dmlchk", tmp("dmlchk_cat"))
    s.sql("CREATE NAMESPACE dmlchk.ns")
    s.sql("CREATE TABLE dmlchk.ns.t (id BIGINT GENERATED ALWAYS AS IDENTITY, " +
      "k BIGINT, v DOUBLE, d BIGINT GENERATED ALWAYS AS (k * 2))")
    s.sql("INSERT INTO dmlchk.ns.t (k, v) VALUES (1, 1.0), (2, 2.0)")
    val before = s.sql("SELECT id, k, v, d FROM dmlchk.ns.t ORDER BY k")
      .collect().map(_.toSeq)
    // identity: immutable, refuse the SET outright
    val e1 = intercept[Exception](
      s.sql("UPDATE dmlchk.ns.t SET id = 99 WHERE k = 1"))
    assert(msgs(e1).exists(_.contains("IDENTITY")), e1.toString)
    // generated: the recomputation would silently overwrite the SET
    val e2 = intercept[Exception](
      s.sql("UPDATE dmlchk.ns.t SET d = 99 WHERE k = 1"))
    assert(msgs(e2).exists(_.contains("GENERATED")), e2.toString)
    // alias-qualified spelling refuses too
    val e3 = intercept[Exception](
      s.sql("UPDATE dmlchk.ns.t AS x SET x.id = 99 WHERE x.k = 1"))
    assert(msgs(e3).exists(_.contains("IDENTITY")), e3.toString)
    // nothing committed by any refusal
    val after = s.sql("SELECT id, k, v, d FROM dmlchk.ns.t ORDER BY k")
      .collect().map(_.toSeq)
    assert(after.toSeq == before.toSeq)
    // assigning a SOURCE column is fine and the generated value tracks
    s.sql("UPDATE dmlchk.ns.t SET k = 10 WHERE k = 1")
    val got = s.sql("SELECT k, d FROM dmlchk.ns.t WHERE k = 10").head
    assert(got.getLong(1) == 20L)
  }

  test("MERGE UPDATE/INSERT on identity columns refuses; NULL insert still allocates") {
    val s = session("dmlmg", tmp("dmlmg_cat"))
    s.sql("CREATE NAMESPACE dmlmg.ns")
    s.sql("CREATE TABLE dmlmg.ns.t (id BIGINT GENERATED ALWAYS AS IDENTITY, " +
      "k BIGINT, v DOUBLE)")
    s.sql("INSERT INTO dmlmg.ns.t (k, v) VALUES (1, 1.0)")
    // MERGE … UPDATE SET id refuses
    val e1 = intercept[Exception](s.sql(
      """MERGE INTO dmlmg.ns.t t USING (SELECT 1 AS k, 9.0 AS v) s ON t.k = s.k
         WHEN MATCHED THEN UPDATE SET t.id = 99, t.v = s.v"""))
    assert(msgs(e1).exists(_.contains("IDENTITY")), e1.toString)
    // MERGE … INSERT providing a non-NULL identity value refuses
    val e2 = intercept[Exception](s.sql(
      """MERGE INTO dmlmg.ns.t t USING (SELECT 2 AS k, 9.0 AS v) s ON t.k = s.k
         WHEN NOT MATCHED THEN INSERT (id, k, v) VALUES (77, s.k, s.v)"""))
    assert(msgs(e2).exists(_.contains("IDENTITY")), e2.toString)
    assert(s.sql("SELECT count(*) FROM dmlmg.ns.t").head.getLong(0) == 1)
    // explicit NULL means "allocate" (pinned semantics) and passes
    s.sql(
      """MERGE INTO dmlmg.ns.t t USING (SELECT 2 AS k, 2.0 AS v) s ON t.k = s.k
         WHEN NOT MATCHED THEN INSERT (id, k, v) VALUES (NULL, s.k, s.v)""")
    val ids = s.sql("SELECT id FROM dmlmg.ns.t").collect().map(_.getLong(0))
    assert(ids.length == 2 && ids.distinct.length == 2)
  }

  test("SET * / INSERT * refuse on GENERATED ALWAYS identity tables") {
    val s = session("dmlst", tmp("dmlst_cat"))
    s.sql("CREATE NAMESPACE dmlst.ns")
    s.sql("CREATE TABLE dmlst.ns.t (id BIGINT GENERATED ALWAYS AS IDENTITY, " +
      "k BIGINT, v DOUBLE)")
    s.sql("INSERT INTO dmlst.ns.t (k, v) VALUES (1, 1.0)")
    // star expansion assigns EVERY target column from the source —
    // including the engine-owned identity column — so the star refuses
    val e1 = intercept[Exception](s.sql(
      """MERGE INTO dmlst.ns.t t
         USING (SELECT 99 AS id, 1 AS k, 9.0 AS v) s ON t.k = s.k
         WHEN MATCHED THEN UPDATE SET *"""))
    assert(msgs(e1).exists(_.contains("IDENTITY")), e1.toString)
    val e2 = intercept[Exception](s.sql(
      """MERGE INTO dmlst.ns.t t
         USING (SELECT 99 AS id, 2 AS k, 9.0 AS v) s ON t.k = s.k
         WHEN NOT MATCHED THEN INSERT *"""))
    assert(msgs(e2).exists(_.contains("IDENTITY")), e2.toString)
    assert(s.sql("SELECT count(*) FROM dmlst.ns.t").head.getLong(0) == 1)
    // BY DEFAULT tables keep their star ergonomics
    s.sql("CREATE TABLE dmlst.ns.b (id BIGINT GENERATED BY DEFAULT AS " +
      "IDENTITY, k BIGINT, v DOUBLE)")
    s.sql("INSERT INTO dmlst.ns.b (k, v) VALUES (1, 1.0)")
    s.sql("""MERGE INTO dmlst.ns.b t
             USING (SELECT 500 AS id, 2 AS k, 2.0 AS v) s ON t.k = s.k
             WHEN NOT MATCHED THEN INSERT *""")
    assert(s.sql("SELECT count(*) FROM dmlst.ns.b").head.getLong(0) == 2)
  }

  test("BY DEFAULT identity permits MERGE INSERT values; non-graft statements untouched") {
    val s = session("dmlbd", tmp("dmlbd_cat"))
    s.sql("CREATE NAMESPACE dmlbd.ns")
    s.sql("CREATE TABLE dmlbd.ns.t (id BIGINT GENERATED BY DEFAULT AS IDENTITY, " +
      "k BIGINT, v DOUBLE)")
    s.sql("INSERT INTO dmlbd.ns.t (k, v) VALUES (1, 1.0)")
    s.sql(
      """MERGE INTO dmlbd.ns.t t USING (SELECT 2 AS k, 2.0 AS v) s ON t.k = s.k
         WHEN NOT MATCHED THEN INSERT (id, k, v) VALUES (500, s.k, s.v)""")
    val ids = s.sql("SELECT id FROM dmlbd.ns.t").collect().map(_.getLong(0))
    assert(ids.length == 2 && ids.contains(500L))
    // BY DEFAULT columns still refuse UPDATE (stored identity immutable)
    val e = intercept[Exception](
      s.sql("UPDATE dmlbd.ns.t SET id = 1 WHERE k = 1"))
    assert(msgs(e).exists(_.contains("IDENTITY")), e.toString)
  }
}
