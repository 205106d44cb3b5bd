package graft

import graft.sources.SnapshotTable
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** ANSI CHECK constraints through SQL (`ALTER TABLE … ADD CONSTRAINT nm
  * CHECK (expr)`): stored as sidecar properties, reported through the
  * DSv2 constraints API, enforced on every write by Spark's own
  * CheckInvariant — row-local inside the write job, zero extra passes. */
class CheckConstraintSqlSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def tmp(p: String) = Files.createTempDirectory(s"graft_$p").toString

  test("ADD CONSTRAINT validates existing rows, enforces on INSERT, DROP lifts it") {
    val cat = tmp("ck_cat")
    val s = spark.newSession()
    s.conf.set("spark.sql.catalog.ckcat", "graft.sources.GraftSqlCatalog")
    s.conf.set("spark.sql.catalog.ckcat.root", cat)
    s.sql("CREATE NAMESPACE ckcat.ns")
    s.sql("CREATE TABLE ckcat.ns.t (k BIGINT, v DOUBLE)")
    s.sql("INSERT INTO ckcat.ns.t VALUES (1, 10.0), (2, 20.0)")
    // existing rows satisfy → the constraint lands
    s.sql("ALTER TABLE ckcat.ns.t ADD CONSTRAINT v_pos CHECK (v > 0)")
    val t = new SnapshotTable(s, s"$cat/ns/t")
    assert(t.propertiesMap.get("constraint.check.v_pos").contains("v > 0"))
    // a violating INSERT fails inside the write; nothing commits
    val vBefore = t.currentVersion
    val e = intercept[Exception] {
      s.sql("INSERT INTO ckcat.ns.t VALUES (3, -5.0)")
    }
    assert(e.getMessage.toLowerCase.contains("check") ||
      e.getMessage.contains("v_pos") || e.getMessage.contains("v > 0"),
      e.getMessage)
    assert(t.currentVersion == vBefore, "violating INSERT must not commit")
    // NULLs pass a CHECK (SQL semantics); valid rows pass
    s.sql("INSERT INTO ckcat.ns.t VALUES (4, 40.0), (5, NULL)")
    assert(s.sql("SELECT count(*) FROM ckcat.ns.t").head.getLong(0) == 4)
    // a constraint existing rows VIOLATE refuses to land
    intercept[Exception] {
      s.sql("ALTER TABLE ckcat.ns.t ADD CONSTRAINT k_small CHECK (k < 3)")
    }
    assert(!t.propertiesMap.contains("constraint.check.k_small"))
    // DROP CONSTRAINT lifts enforcement
    s.sql("ALTER TABLE ckcat.ns.t DROP CONSTRAINT v_pos")
    s.sql("INSERT INTO ckcat.ns.t VALUES (6, -1.0)")
    assert(s.sql("SELECT count(*) FROM ckcat.ns.t").head.getLong(0) == 5)
    // dropping a missing constraint refuses without IF EXISTS
    intercept[Exception] {
      s.sql("ALTER TABLE ckcat.ns.t DROP CONSTRAINT nope")
    }
  }

  test("informational PK/UNIQUE/FK persist NOT ENFORCED with RELY; enforced ones refuse") {
    val cat = tmp("pk_cat")
    val s = spark.newSession()
    s.conf.set("spark.sql.catalog.pkcat", "graft.sources.GraftSqlCatalog")
    s.conf.set("spark.sql.catalog.pkcat.root", cat)
    s.sql("CREATE NAMESPACE pkcat.ns")
    s.sql("CREATE TABLE pkcat.ns.dim (k BIGINT, v DOUBLE)")
    s.sql("CREATE TABLE pkcat.ns.fact (fk BIGINT, amt DOUBLE)")
    s.sql("ALTER TABLE pkcat.ns.dim ADD CONSTRAINT pk_k " +
      "PRIMARY KEY (k) NOT ENFORCED RELY")
    s.sql("ALTER TABLE pkcat.ns.fact ADD CONSTRAINT fk_dim " +
      "FOREIGN KEY (fk) REFERENCES pkcat.ns.dim (k) NOT ENFORCED")
    // persisted structurally and REBUILT through a fresh table handle
    import org.apache.spark.sql.connector.catalog.{Identifier, TableCatalog}
    val plugin = s.sessionState.catalogManager.catalog("pkcat")
      .asInstanceOf[TableCatalog]
    val dim = plugin.loadTable(Identifier.of(Array("ns"), "dim"))
    val pk = dim.constraints().find(_.name == "pk_k").get
    assert(!pk.enforced() && pk.rely())
    assert(pk.toDDL.toUpperCase.contains("PRIMARY KEY"))
    val fact = plugin.loadTable(Identifier.of(Array("ns"), "fact"))
    val fk = fact.constraints().find(_.name == "fk_dim").get
    assert(!fk.enforced())
    assert(fk.toDDL.toUpperCase.contains("FOREIGN KEY"))
    // DROP CONSTRAINT removes informational constraints too
    s.sql("ALTER TABLE pkcat.ns.dim DROP CONSTRAINT pk_k")
    assert(plugin.loadTable(Identifier.of(Array("ns"), "dim"))
      .constraints().isEmpty)
  }
}
