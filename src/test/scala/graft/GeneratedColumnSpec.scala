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
}
