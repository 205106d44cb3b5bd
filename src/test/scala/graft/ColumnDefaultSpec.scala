package graft

import graft.sources.SnapshotTable
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** Column DEFAULT values (ANSI `DEFAULT expr`): the default SQL lives in
  * the schema field metadata, persisted by the zero-row schema-carrier
  * footers; Spark's own analysis fills omitted columns on INSERT. */
class ColumnDefaultSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def tmp(p: String) = Files.createTempDirectory(s"graft_$p").toString

  test("CREATE-time defaults fill omitted INSERT columns; ALTER COLUMN SET/DROP DEFAULT") {
    val cat = tmp("dflt_cat")
    val s = spark.newSession()
    s.conf.set("spark.sql.catalog.dfcat", "graft.sources.GraftSqlCatalog")
    s.conf.set("spark.sql.catalog.dfcat.root", cat)
    s.sql("CREATE NAMESPACE dfcat.ns")
    s.sql("CREATE TABLE dfcat.ns.t (k BIGINT, v DOUBLE DEFAULT 7.5, " +
      "tag STRING DEFAULT 'unset')")
    // column-list INSERT omitting defaulted columns → defaults fill
    s.sql("INSERT INTO dfcat.ns.t (k) VALUES (1)")
    s.sql("INSERT INTO dfcat.ns.t (k, v) VALUES (2, 20.0)")
    // the DEFAULT keyword form too
    s.sql("INSERT INTO dfcat.ns.t VALUES (3, DEFAULT, 'explicit')")
    val got = s.sql("SELECT k, v, tag FROM dfcat.ns.t ORDER BY k").collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getString(2))).toSeq
    assert(got == Seq((1L, 7.5, "unset"), (2L, 20.0, "unset"),
      (3L, 7.5, "explicit")))
    // ALTER COLUMN SET DEFAULT changes FUTURE inserts only
    s.sql("ALTER TABLE dfcat.ns.t ALTER COLUMN v SET DEFAULT 99.0")
    s.sql("INSERT INTO dfcat.ns.t (k) VALUES (4)")
    assert(s.sql("SELECT v FROM dfcat.ns.t WHERE k = 4")
      .head.getDouble(0) == 99.0)
    // earlier rows untouched
    assert(s.sql("SELECT v FROM dfcat.ns.t WHERE k = 1")
      .head.getDouble(0) == 7.5)
    // DROP DEFAULT → omitted column reads NULL afterwards
    s.sql("ALTER TABLE dfcat.ns.t ALTER COLUMN v DROP DEFAULT")
    s.sql("INSERT INTO dfcat.ns.t (k) VALUES (5)")
    assert(s.sql("SELECT v FROM dfcat.ns.t WHERE k = 5").head.isNullAt(0))
    // column comments land in the same versioned overlay and survive
    // later writes (footer metadata churn cannot erase them)
    s.sql("ALTER TABLE dfcat.ns.t ALTER COLUMN v COMMENT 'money'")
    s.sql("INSERT INTO dfcat.ns.t VALUES (7, 1.0, 'x')")
    val comment = s.table("dfcat.ns.t").schema("v")
      .metadata.getString("comment")
    assert(comment == "money")
    val shown = s.sql("DESCRIBE TABLE dfcat.ns.t").collect()
      .find(_.getString(0) == "v").get
    assert(shown.getString(2) == "money")
  }

  test("ADD COLUMNS with DEFAULT serves the exists-default to pre-existing rows, zero rewrite") {
    val cat = tmp("dflt_add_cat")
    val s = spark.newSession()
    s.conf.set("spark.sql.catalog.dfadd", "graft.sources.GraftSqlCatalog")
    s.conf.set("spark.sql.catalog.dfadd.root", cat)
    s.sql("CREATE NAMESPACE dfadd.ns")
    s.sql("CREATE TABLE dfadd.ns.t (k BIGINT, v DOUBLE)")
    s.sql("INSERT INTO dfadd.ns.t VALUES (1, 1.0), (2, 2.0)")
    val t = new SnapshotTable(s, s"$cat/ns/t")
    val before = t.files.map(_.path).toSet
    val addVersion = t.currentVersion + 1
    s.sql("ALTER TABLE dfadd.ns.t ADD COLUMNS (bonus DOUBLE DEFAULT 1.25)")
    // metadata-plus-carrier commit: the original data files are untouched
    assert(before.subsetOf(t.files.map(_.path).toSet))
    // ANSI EXISTS_DEFAULT: pre-existing rows read 1.25, not NULL
    assert(s.sql("SELECT bonus FROM dfadd.ns.t WHERE k = 1")
      .head.getDouble(0) == 1.25)
    // omitted on a new insert → CURRENT_DEFAULT fills
    s.sql("INSERT INTO dfadd.ns.t (k, v) VALUES (3, 3.0)")
    assert(s.sql("SELECT bonus FROM dfadd.ns.t WHERE k = 3")
      .head.getDouble(0) == 1.25)
    // an EXPLICIT NULL written after the add stays NULL (stored value
    // wins over the exists-default — the fill is per missing FILE column)
    s.sql("INSERT INTO dfadd.ns.t VALUES (4, 4.0, NULL)")
    assert(s.sql("SELECT bonus FROM dfadd.ns.t WHERE k = 4").head.isNullAt(0))
    // re-pointing the CURRENT default governs future inserts only;
    // pre-add rows keep reading the exists-default
    s.sql("ALTER TABLE dfadd.ns.t ALTER COLUMN bonus SET DEFAULT 9.0")
    s.sql("INSERT INTO dfadd.ns.t (k, v) VALUES (5, 5.0)")
    assert(s.sql("SELECT bonus FROM dfadd.ns.t WHERE k = 5")
      .head.getDouble(0) == 9.0)
    assert(s.sql("SELECT bonus FROM dfadd.ns.t WHERE k = 2")
      .head.getDouble(0) == 1.25)
    // time travel below the add sees neither column nor defaults
    assert(!t.read(addVersion - 1).columns.contains("bonus"))
    // a rewrite (OPTIMIZE) materializes the fills; values are unchanged
    t.compact(1)
    val got = s.sql("SELECT k, bonus FROM dfadd.ns.t ORDER BY k").collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) null else r.getDouble(1)))
    assert(got.toSeq == Seq((1L, 1.25), (2L, 1.25), (3L, 1.25),
      (4L, null), (5L, 9.0)))
  }
}
