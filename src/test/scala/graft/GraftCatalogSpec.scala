package graft

import graft.sources.GraftCatalog
import org.scalatest.funsuite.AnyFunSuite

/** Catalog-persistence manifest (GraftCatalog): external-table metadata
  * survives losing the in-memory ExternalCatalog — the sandbox stand-in
  * for a metastore-backed `USE db` in a later session. */
class GraftCatalogSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("save → catalog wipe → restore reattaches external tables") {
    import spark.implicits._
    val loc = Scratch.dir("catspec")
    spark.sql("CREATE DATABASE IF NOT EXISTS graft_cat_spec")
    Seq((1L, "a"), (2L, "b")).toDF("id", "s").createOrReplaceTempView("cat_src")
    spark.sql("DROP TABLE IF EXISTS graft_cat_spec.t1")
    spark.sql(s"CREATE TABLE graft_cat_spec.t1 USING PARQUET " +
      s"LOCATION '$loc/t1' AS SELECT * FROM cat_src")
    val manifest = s"$loc/catalog.json"
    GraftCatalog.save(spark, "graft_cat_spec", manifest)
    spark.sql("DROP DATABASE graft_cat_spec CASCADE")
    assert(!spark.catalog.databaseExists("graft_cat_spec"))
    // external data survived the drop (the manifest is metadata-only)
    assert(java.nio.file.Files.list(java.nio.file.Paths.get(s"$loc/t1"))
      .findFirst().isPresent)
    assert(GraftCatalog.restore(spark, manifest) == 1)
    // the reference's USE-db flow: unqualified resolution in the restored db
    spark.sql("USE graft_cat_spec")
    try {
      val got = spark.sql("SELECT id, s FROM t1 ORDER BY id").collect()
      assert(got.map(r => (r.getLong(0), r.getString(1))).toSeq
        == Seq((1L, "a"), (2L, "b")))
    } finally spark.sql("USE default")
    // idempotent: a second restore replaces, not duplicates
    assert(GraftCatalog.restore(spark, manifest) == 1)
    assert(GraftCatalog.tableExists(spark, "graft_cat_spec", "t1"))
    spark.sql("DROP DATABASE graft_cat_spec CASCADE")
  }
}
