package graft

import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** Generated columns (Delta GENERATED ALWAYS AS analog): the generation
  * expression lives in the field metadata; omitted/NULL slots compute it
  * on INSERT and provided values must match — enforced row-locally
  * inside the write job, nothing committed on a mismatch. */
class GeneratedColumnSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def tmp(p: String) = Files.createTempDirectory(s"graft_$p").toString

  test("GENERATED ALWAYS AS computes omitted values and refuses mismatches") {
    val cat = tmp("gen_cat")
    val s = spark.newSession()
    s.conf.set("spark.sql.catalog.gencat", "graft.sources.GraftSqlCatalog")
    s.conf.set("spark.sql.catalog.gencat.root", cat)
    s.sql("CREATE NAMESPACE gencat.ns")
    s.sql("CREATE TABLE gencat.ns.t (k BIGINT, v DOUBLE, " +
      "doubled DOUBLE GENERATED ALWAYS AS (v * 2))")
    // omitted via column list → computed
    s.sql("INSERT INTO gencat.ns.t (k, v) VALUES (1, 10.0)")
    // provided-and-matching → accepted
    s.sql("INSERT INTO gencat.ns.t VALUES (2, 5.0, 10.0)")
    val got = s.sql("SELECT k, doubled FROM gencat.ns.t ORDER BY k")
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(got == Seq((1L, 20.0), (2L, 10.0)))
    // provided-and-WRONG → the write fails, nothing commits
    val t = new graft.sources.SnapshotTable(s, s"$cat/ns/t")
    val vBefore = t.currentVersion
    val e = intercept[Exception] {
      s.sql("INSERT INTO gencat.ns.t VALUES (3, 5.0, 11.0)")
    }
    assert(e.getMessage.contains("GENERATED ALWAYS") ||
      Option(e.getCause).exists(_.getMessage.contains("GENERATED ALWAYS")),
      e.getMessage)
    assert(t.currentVersion == vBefore)
    assert(s.sql("SELECT count(*) FROM gencat.ns.t").head.getLong(0) == 2)
  }

  test("UPDATE / MERGE recompute generated columns from their sources") {
    val cat = tmp("gen_dml_cat")
    val s = spark.newSession()
    s.conf.set("spark.sql.catalog.gdml", "graft.sources.GraftSqlCatalog")
    s.conf.set("spark.sql.catalog.gdml.root", cat)
    graft.plans.GraftRowLevelOps.register(s)
    s.sql("CREATE NAMESPACE gdml.ns")
    s.sql("CREATE TABLE gdml.ns.t (k BIGINT, v DOUBLE, " +
      "doubled DOUBLE GENERATED ALWAYS AS (v * 2))")
    s.sql("INSERT INTO gdml.ns.t (k, v) VALUES (1, 10.0), (2, 20.0)")
    // UPDATE assigns the generation-SOURCE column: the generated column
    // must recompute, not stay stale (Delta recomputes on this path)
    s.sql("UPDATE gdml.ns.t SET v = 50.0 WHERE k = 1")
    val got = s.sql("SELECT k, v, doubled FROM gdml.ns.t ORDER BY k")
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2)))
    assert(got.toSeq == Seq((1L, 50.0, 100.0), (2L, 20.0, 40.0)))
    // MERGE: both the updated and the inserted rows satisfy the invariant
    s.sql("""MERGE INTO gdml.ns.t t USING
      (SELECT 2 AS k, 30.0 AS v UNION ALL SELECT 3, 40.0) src ON t.k = src.k
      WHEN MATCHED THEN UPDATE SET t.v = src.v
      WHEN NOT MATCHED THEN INSERT (k, v) VALUES (src.k, src.v)""")
    val got2 = s.sql("SELECT k, doubled FROM gdml.ns.t ORDER BY k")
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(got2.toSeq == Seq((1L, 100.0), (2L, 60.0), (3L, 80.0)))
  }

  test("explicit NULL computes the expression (pinned omitted-vs-NULL equivalence)") {
    val cat = tmp("gen_null_cat")
    val s = spark.newSession()
    s.conf.set("spark.sql.catalog.gnull", "graft.sources.GraftSqlCatalog")
    s.conf.set("spark.sql.catalog.gnull.root", cat)
    s.sql("CREATE NAMESPACE gnull.ns")
    s.sql("CREATE TABLE gnull.ns.t (k BIGINT, v DOUBLE, " +
      "doubled DOUBLE GENERATED ALWAYS AS (v * 2))")
    // an explicit NULL is indistinguishable from an omitted slot at the
    // write plan (Spark null-fills omitted columns) — both FILL, so the
    // stored invariant value = expr holds on every committed row
    s.sql("INSERT INTO gnull.ns.t VALUES (1, 3.0, NULL)")
    assert(s.sql("SELECT doubled FROM gnull.ns.t").head.getDouble(0) == 6.0)
    // where the expression itself is NULL, explicit NULL matches it
    s.sql("INSERT INTO gnull.ns.t VALUES (2, NULL, NULL)")
    assert(s.sql("SELECT doubled FROM gnull.ns.t WHERE k = 2")
      .head.isNullAt(0))
  }
}
