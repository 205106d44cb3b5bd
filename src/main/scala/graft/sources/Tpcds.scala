package graft.sources

import graft.Tables
import org.apache.spark.sql.SparkSession
import java.nio.file.Files

/** TPC-DS staging + oracle assembly around [[TpcdsSchema]].
  *
  * Spark side — the reference's load-then-query protocol
  * (TPCDSDataLoad.scala:95-129 loads once, TPCDSBenchmark.scala:84-108
  * then times queries): all 24 tables are generated ONCE per sf dir,
  * written to parquet, and served as temp views; every tpcds_q* query is
  * a pure read over the staged parquet, so Bench times the query, not
  * the generator, and Catalyst sees ordinary scans it can prune/broadcast.
  *
  * Oracle side — the same generator text is assembled as a DuckDB WITH
  * prelude in front of the same query body, so the driver's DuckDB run
  * computes from bit-identical inputs.
  *
  * At 100 TB the staging step IS the bulk-load benchmark (CTAS per table,
  * partitioned writes); queries then scan columnar storage with stats.
  */
object Tpcds {

  /** Staged roots keyed by sf dir — paths, not sessions (rebind-safe). */
  private val stagedRoots =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** Resolved-DataFrame cache for staged parquet, keyed by path. Every
    * tpcds_q* build re-registers the 24 staged views (another operator
    * may have re-pointed a same-named view between queries), and a bare
    * `spark.read.parquet` pays directory listing + footer schema
    * inference EACH time — ~24 small I/O round-trips per query build,
    * the bulk of the corpus sweep's fixed per-query floor. The staged
    * dirs are write-once, so the resolved relation is reusable;
    * re-registration becomes a pure catalog operation. Value carries the
    * owning session: a rebind (tests + bench in one JVM) recomputes. */
  private val dfCache = new java.util.concurrent.ConcurrentHashMap[
    String, (SparkSession, org.apache.spark.sql.DataFrame)]()

  private def stagedDf(
      spark: SparkSession, path: String): org.apache.spark.sql.DataFrame = {
    val cached = dfCache.get(path)
    if (cached != null && (cached._1 eq spark)) cached._2
    else {
      val df = spark.read.parquet(path)
      dfCache.put(path, (spark, df))
      df
    }
  }

  private val baseTables =
    Seq("region", "nation", "customer", "supplier", "part", "orders", "lineitem")

  /** Stage a generated table WRITE-PARALLEL (guide §2.5 input skew —
    * "one huge unsplittable file: fix at the source"): the generators
    * run over single-split fixture scans, so their natural output is
    * ONE parquet file per table — `inventory` lands 5.3M rows in one
    * file that every downstream query then scans single-task (parquet
    * splits by compressed file bytes; a 2.7 MB file is one split no
    * matter how many row groups). REBALANCE before the write makes AQE
    * size the output into advisory-sized pieces — a distributed bulk
    * load's shape (the reference's TPCDSDataLoad writes cluster-
    * parallel). The staging advisory is parameterised
    * (`spark.graft.stage.advisoryBytes`, default 8m of in-memory
    * shuffle bytes — at sf0.1 that yields ~dozens of files for the
    * fact-sized sources and one file for dims; production raises it to
    * 64-256m for object-store-friendly files). Round-robin rebalance is
    * deterministic under Spark's sort-before-repartition default, and
    * every consumer is order-independent (aggregates / totally-ordered
    * selects; the DuckDB oracle computes from the generator SQL
    * directly). A/B arm: `spark.graft.stage.rebalance=false` restores
    * the one-file staging. Staging runs once per sf dir OUTSIDE the
    * timed loop. */
  private def stageParquet(spark: SparkSession,
      df: org.apache.spark.sql.DataFrame, path: String): Unit = {
    val rebalance = spark.conf.getOption("spark.graft.stage.rebalance")
      .forall(_.toBoolean)
    if (!rebalance) df.write.mode("overwrite").parquet(path)
    else {
      // parallelismFirst must be OFF inside the bracket: with the
      // default (true) AQE coalesces rebalance output only down to
      // defaultParallelism using minPartitionSize (1 MB), so every
      // small staged table sprays into ~core-count tiny files and each
      // downstream scan pays per-file overhead (measured: q14a/b +30%
      // from 9 fact scans × tiny files). With it off, the advisory
      // genuinely sizes the output — small dims/facts stay at 1-2
      // files, only the truly large sources (inventory-class) fan out.
      val adv = "spark.sql.adaptive.advisoryPartitionSizeInBytes"
      val pf = "spark.sql.adaptive.coalescePartitions.parallelismFirst"
      val priorAdv = spark.conf.get(adv)
      val priorPf = spark.conf.get(pf)
      spark.conf.set(adv, spark.conf
        .getOption("spark.graft.stage.advisoryBytes").getOrElse("8m"))
      spark.conf.set(pf, "false")
      try df.hint("rebalance").write.mode("overwrite").parquet(path)
      finally { spark.conf.set(adv, priorAdv); spark.conf.set(pf, priorPf) }
    }
  }

  /** View names other operators re-point between query builds and the
    * fast path below must therefore re-register on EVERY call: the
    * fixture `customer` (TPC-H schema, Tables.registerViews) shadows
    * the staged TPC-DS `customer`; `store_sales` is re-pointed by the
    * refresh-protocol sweep, which hands it back via `force = true`. */
  private val contested = Set("customer")

  /** (session, sf dir) pairs whose staged views are registered. The 24
    * generator registrations used to run on every tq build — ~72 ms of
    * pure catalog work per TPC-DS query × 103 queries × iterations; the
    * staged dirs are write-once and nothing but the contested names
    * above re-points them, so once per session is enough. */
  private val registeredFor = java.util.concurrent.ConcurrentHashMap
    .newKeySet[(SparkSession, String)]()

  /** Raw temp-view object recorded at registration, keyed by (session,
    * view name). The fast paths compare the CURRENT raw view by identity
    * and self-heal (re-register) any name some operator re-pointed since
    * — correctness no longer rests on the unenforced invariant that only
    * `customer` / `store_sales` are ever re-pointed; a future operator
    * re-pointing any staged name is detected at the next ensure() for
    * the cost of one catalog map lookup, not a catalog registration. */
  private val registeredViews = new java.util.concurrent.ConcurrentHashMap[
    (SparkSession, String), AnyRef]()

  /** Register `path`'s staged parquet as temp view `name` and record the
    * raw catalog object for re-point detection. */
  private def registerStaged(
      spark: SparkSession, name: String, path: String): Unit = {
    stagedDf(spark, path).createOrReplaceTempView(name)
    spark.sessionState.catalog.getRawTempView(name).foreach(v =>
      registeredViews.put((spark, name), v.asInstanceOf[AnyRef]))
  }

  /** True while the temp view `name` still points at the exact object
    * [[registerStaged]] installed (identity compare — any
    * createOrReplaceTempView since produces a fresh relation object). */
  private def stillRegistered(spark: SparkSession, name: String): Boolean = {
    val expect = registeredViews.get((spark, name))
    expect != null && spark.sessionState.catalog.getRawTempView(name)
      .exists(v => v.asInstanceOf[AnyRef] eq expect)
  }

  /** Stage (first use) and register the TPC-DS views for this sf dir.
    *
    * Generator SQL resolves table names through temp views, so base views
    * are (re-)registered first; after staging, the TPC-DS views overwrite
    * same-named base views (`customer`) — safe because every other
    * SQL-based operator re-registers its base views at build time.
    * `force` re-registers everything (a sweep that re-pointed a staged
    * view hands it back through this). */
  def ensure(spark: SparkSession, sfDir: String,
      force: Boolean = false): Unit = synchronized {
    val root = stagedRoots.computeIfAbsent(sfDir, { _ =>
      val r = graft.Scratch.atExit(
        Files.createTempDirectory("graft_stage_tpcds").toString)
      registerBase(spark, sfDir)
      TpcdsSchema.generators.foreach { case (name, sql) =>
        stageParquet(spark, spark.sql(sql), s"$r/$name")
        // facts reference the date_dim VIEW while generating; later
        // generators must see the staged (identical) data
        spark.read.parquet(s"$r/$name").createOrReplaceTempView(name)
      }
      r
    })
    val key = (spark, sfDir)
    if (force) registeredFor.remove(key)
    val firstTime = registeredFor.add(key)
    TpcdsSchema.generators.foreach { case (name, _) =>
      if (firstTime || contested(name) || !stillRegistered(spark, name))
        registerStaged(spark, name, s"$root/$name")
    }
  }

  private def registerBase(spark: SparkSession, sfDir: String): Unit = {
    baseTables.foreach(n =>
      Tables.load(spark, sfDir, n).createOrReplaceTempView(n))
    // a CTE named `customer` cannot reference the base `customer` in
    // DuckDB (circular-reference rule); both engines alias it instead
    Tables.load(spark, sfDir, "customer").createOrReplaceTempView("customer_src")
  }

  /** Staged refresh-source roots keyed by sf dir. */
  private val refreshRoots =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** Stage (first use) and register the flat s_* refresh sources on top
    * of [[ensure]]'s dimensions — the reference's staged-CSV load phase
    * (IncrementalTPCDSBenchmark.scala:383-420). */
  def ensureRefresh(spark: SparkSession, sfDir: String): Unit = synchronized {
    ensure(spark, sfDir) // sources generate against the date_dim view
    val root = refreshRoots.computeIfAbsent(sfDir, { _ =>
      val r = graft.Scratch.atExit(
        Files.createTempDirectory("graft_stage_refresh").toString)
      registerBase(spark, sfDir)
      TpcdsSchema.generators.foreach { case (name, _) =>
        spark.read.parquet(s"${stagedRoots.get(sfDir)}/$name")
          .createOrReplaceTempView(name)
      }
      TpcdsSchema.refreshSources.foreach { case (name, sql) =>
        stageParquet(spark, spark.sql(sql), s"$r/$name")
      }
      r
    })
    // same per-session fast path as [[ensure]], with the same re-point
    // self-heal (the s_* names are not KNOWN to be re-pointed by other
    // operators, but the invariant is now checked, not assumed)
    val firstTime = registeredRefreshFor.add((spark, sfDir))
    TpcdsSchema.refreshSources.foreach { case (name, _) =>
      if (firstTime || !stillRegistered(spark, name))
        registerStaged(spark, name, s"$root/$name")
    }
  }

  private val registeredRefreshFor = java.util.concurrent.ConcurrentHashMap
    .newKeySet[(SparkSession, String)]()

  private val registeredDimsFor = java.util.concurrent.ConcurrentHashMap
    .newKeySet[(SparkSession, String)]()

  /** Staged dimension-delta roots keyed by sf dir. */
  private val refreshDimRoots =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** Stage (first use) and register the dimension-side s_* refresh
    * sources (TPCDSRefreshSchema.scala:28-562 dimension tables) on top
    * of [[ensure]]'s dimensions. */
  def ensureRefreshDims(spark: SparkSession, sfDir: String): Unit = synchronized {
    ensure(spark, sfDir)
    val root = refreshDimRoots.computeIfAbsent(sfDir, { _ =>
      val r = graft.Scratch.atExit(
        Files.createTempDirectory("graft_stage_refdims").toString)
      TpcdsSchema.refreshDimSources.foreach { case (name, sql) =>
        stageParquet(spark, spark.sql(sql), s"$r/$name")
      }
      r
    })
    val firstTime = registeredDimsFor.add((spark, sfDir))
    TpcdsSchema.refreshDimSources.foreach { case (name, _) =>
      if (firstTime || !stillRegistered(spark, name))
        registerStaged(spark, name, s"$root/$name")
    }
  }

  /** The correctness gate always runs DuckDB at this sf (TESTDATA.md). */
  private val OracleSfDir = "/root/testdata/sf0.01"

  private def allGens: Seq[(String, String)] =
    TpcdsSchema.generators ++ TpcdsSchema.refreshSources ++
      TpcdsSchema.refreshDimSources

  private def depsOf(t: String): Seq[String] =
    TpcdsSchema.deps.getOrElse(t,
      TpcdsSchema.refreshDeps.getOrElse(t, TpcdsSchema.refreshDimDeps(t)))

  /** Assemble the DuckDB oracle: generator CTEs (transitive deps, in
    * declaration order) + the identical query body. */
  def oracle(tables: Seq[String], body: String): String = {
    val gen = allGens.toMap
    val need = scala.collection.mutable.LinkedHashSet[String]()
    def add(t: String): Unit = if (!need.contains(t)) {
      depsOf(t).foreach(add)
      need += t
    }
    // keep generator declaration order for the closure
    val closure = {
      tables.foreach(add)
      allGens.map(_._1).filter(need.contains)
    }
    val shim =
      if (closure.exists(TpcdsSchema.needsCustomerSrc.contains))
        Seq("customer_src AS (SELECT * FROM read_parquet('" +
          s"$OracleSfDir/customer.parquet'))")
      else Seq.empty
    val ctes = shim ++ closure.map(t => s"$t AS (${gen(t)})")
    val prelude = ctes.mkString(",\n")
    val b = body.trim
    if (b.regionMatches(true, 0, "WITH", 0, 4))
      s"WITH $prelude,\n${b.substring(4)}"
    else
      s"WITH $prelude\n$b"
  }
}
