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
    // ADD COLUMNS with a DEFAULT refuses (existing rows would owe the
    // default, which the null-filling scan does not serve)
    intercept[Exception] {
      s.sql("ALTER TABLE dfcat.ns.t ADD COLUMNS (w DOUBLE DEFAULT 1.0)")
    }
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
}
