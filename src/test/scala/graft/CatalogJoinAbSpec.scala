package graft

import graft.sources.GraftSqlCatalog
import org.scalatest.funsuite.AnyFunSuite

/** A/B evidence for the V1-fallback statistics fix (round 11): the same
  * catalog fact⋈dim join measured with the stats rule active (manifest
  * sizeInBytes → BroadcastHashJoin planned up front) vs deregistered
  * (defaultSizeInBytes → SortMergeJoin, AQE left to rescue after the
  * fact side's full shuffle materializes). Numbers are printed for the
  * measurement record; assertions pin plan shape + row counts only —
  * wall-clock is environment-dependent. */
class CatalogJoinAbSpec extends AnyFunSuite {
  private lazy val spark = {
    val s = TestSpark.spark
    s.conf.set("spark.sql.catalog.gjab", classOf[GraftSqlCatalog].getName)
    s.conf.set("spark.sql.catalog.gjab.root",
      java.nio.file.Files.createTempDirectory("graft_jab").toString)
    s
  }

  test("manifest stats plan the broadcast up front; without them AQE pays a fact shuffle first") {
    val s = spark
    s.sql("CREATE NAMESPACE gjab.ab")
    s.sql("CREATE TABLE gjab.ab.dim AS SELECT id AS k, concat('d', id) AS name FROM range(1000)")
    s.sql("""CREATE TABLE gjab.ab.fact AS
             SELECT id % 1000 AS k, id AS x, id * 2 AS y, id * 3 AS z
             FROM range(3000000)""")
    // unfiltered fact side: the join input is the full 3M rows, so a
    // stats-blind SortMergeJoin must shuffle+sort the whole fact table
    // before AQE can do anything, while the broadcast plan streams it
    val q = """SELECT d.name, SUM(f.x) AS sx FROM gjab.ab.fact f
               JOIN gjab.ab.dim d ON f.k = d.k GROUP BY d.name"""
    def time(tag: String): Double = {
      val t0 = System.nanoTime()
      val n = s.sql(q).count()
      assert(n == 1000)
      val sec = (System.nanoTime() - t0) / 1e9
      info(f"$tag%-18s $sec%.3f s")
      sec
    }
    // warm both paths' codegen once
    s.sql(q).count()

    // A: stats rule active (the session default once any graft catalog
    // has initialized) — broadcast planned before execution
    val planA = s.sql(q).queryExecution.executedPlan.toString
    assert(planA.contains("BroadcastHashJoin"), s"expected broadcast:\n$planA")
    val a = (1 to 3).map(_ => time("with stats")).min

    // B: deregister the rule — the planner sees defaultSizeInBytes
    val saved = s.experimental.extraOptimizations
    try {
      s.experimental.extraOptimizations =
        saved.filterNot(_ eq graft.plans.V1StatsFallback)
      val planB = s.sql(q).queryExecution.executedPlan.toString
      assert(planB.contains("SortMergeJoin"),
        s"expected the stats-blind plan to sort-merge:\n$planB")
      val b = (1 to 3).map(_ => time("stats-blind")).min
      info(f"stats-blind / with-stats ratio: ${b / a}%.2fx")
    } finally s.experimental.extraOptimizations = saved
  }
}
