package graft

import graft.sources.SnapshotTable
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** NOT NULL constraints (Delta parity): the flag rides the versioned
  * fieldMeta overlay (parquet reads force nullable=true, so the
  * StructField flag alone cannot survive a file round-trip); the scan
  * re-flips nullability and Spark's output resolver enforces the
  * constraint on every SQL write. */
class NotNullSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def tmp(p: String) = Files.createTempDirectory(s"graft_$p").toString

  test("CREATE-time NOT NULL survives round trips and refuses NULL writes") {
    val cat = tmp("nn_cat")
    val s = spark.newSession()
    s.conf.set("spark.sql.catalog.nncat", "graft.sources.GraftSqlCatalog")
    s.conf.set("spark.sql.catalog.nncat.root", cat)
    s.sql("CREATE NAMESPACE nncat.ns")
    s.sql("CREATE TABLE nncat.ns.t (k BIGINT NOT NULL, v DOUBLE)")
    s.sql("INSERT INTO nncat.ns.t VALUES (1, 1.0), (2, NULL)")
    // the declared nullability survives the parquet round trip
    assert(!s.table("nncat.ns.t").schema("k").nullable)
    assert(s.table("nncat.ns.t").schema("v").nullable)
    // a NULL into the NOT NULL column refuses; nothing commits
    val t = new SnapshotTable(s, s"$cat/ns/t")
    val vBefore = t.currentVersion
    intercept[Exception](s.sql("INSERT INTO nncat.ns.t VALUES (NULL, 3.0)"))
    assert(t.currentVersion == vBefore)
    assert(s.sql("SELECT count(*) FROM nncat.ns.t").head.getLong(0) == 2)
    // rewrites (which strip footer metadata) cannot erase the flag —
    // the overlay is authoritative
    t.compact(1)
    assert(!s.table("nncat.ns.t").schema("k").nullable)
    intercept[Exception](s.sql("INSERT INTO nncat.ns.t VALUES (NULL, 4.0)"))
  }

  test("ALTER COLUMN SET NOT NULL validates existing rows; DROP NOT NULL lifts it") {
    val cat = tmp("nn_alter_cat")
    val s = spark.newSession()
    s.conf.set("spark.sql.catalog.nnalt", "graft.sources.GraftSqlCatalog")
    s.conf.set("spark.sql.catalog.nnalt.root", cat)
    s.sql("CREATE NAMESPACE nnalt.ns")
    s.sql("CREATE TABLE nnalt.ns.t (k BIGINT, v DOUBLE)")
    s.sql("INSERT INTO nnalt.ns.t VALUES (1, 1.0), (NULL, 2.0)")
    // stored NULLs block SET NOT NULL (the scan must never claim
    // non-nullable over data that violates it)
    intercept[Exception](
      s.sql("ALTER TABLE nnalt.ns.t ALTER COLUMN k SET NOT NULL"))
    assert(s.table("nnalt.ns.t").schema("k").nullable)
    // clean the violation, then the constraint lands and enforces
    s.sql("DELETE FROM nnalt.ns.t WHERE v = 2.0")
    s.sql("ALTER TABLE nnalt.ns.t ALTER COLUMN k SET NOT NULL")
    assert(!s.table("nnalt.ns.t").schema("k").nullable)
    intercept[Exception](s.sql("INSERT INTO nnalt.ns.t VALUES (NULL, 3.0)"))
    // DROP NOT NULL lifts it again
    s.sql("ALTER TABLE nnalt.ns.t ALTER COLUMN k DROP NOT NULL")
    assert(s.table("nnalt.ns.t").schema("k").nullable)
    s.sql("INSERT INTO nnalt.ns.t VALUES (NULL, 4.0)")
    assert(s.sql("SELECT count(*) FROM nnalt.ns.t").head.getLong(0) == 2)
  }

  test("engine-API writes enforce NOT NULL too (writer-side invariant)") {
    val cat = tmp("nn_api_cat")
    val s = spark.newSession()
    import s.implicits._
    s.conf.set("spark.sql.catalog.nnapi", "graft.sources.GraftSqlCatalog")
    s.conf.set("spark.sql.catalog.nnapi.root", cat)
    s.sql("CREATE NAMESPACE nnapi.ns")
    s.sql("CREATE TABLE nnapi.ns.t (k BIGINT NOT NULL, v DOUBLE)")
    s.sql("INSERT INTO nnapi.ns.t VALUES (1, 1.0)")
    // the engine append bypasses Spark's SQL output resolver — the
    // writer-side check must refuse anyway, else the non-nullable scan
    // schema would LIE to the optimizer over a committed NULL
    val t = new SnapshotTable(s, s"$cat/ns/t")
    val vBefore = t.currentVersion
    val bad = Seq((Some(2L), 2.0), (None, 3.0))
      .toDF("k", "v").selectExpr("k", "v")
    val e = intercept[Exception](t.append(bad))
    def msgs(x: Throwable): Seq[String] =
      if (x == null) Seq.empty
      else Option(x.getMessage).toSeq ++ msgs(x.getCause)
    assert(msgs(e).exists(m => m.contains("NOT NULL") || m.contains("null")),
      e.toString)
    assert(t.currentVersion == vBefore, "a refused write must commit nothing")
    assert(s.sql("SELECT count(*) FROM nnapi.ns.t").head.getLong(0) == 1)
    // MERGE through the engine API enforces it too
    val e2 = intercept[Exception](
      t.merge(Seq((Option.empty[Long], 9.0)).toDF("k", "v"), Seq("k")))
    assert(msgs(e2).exists(m => m.contains("NOT NULL") || m.contains("null")),
      e2.toString)
    // and a clean engine append still lands
    t.append(Seq((5L, 5.0)).toDF("k", "v")): Unit
    assert(s.sql("SELECT count(*) FROM nnapi.ns.t").head.getLong(0) == 2)
  }
}
