package graft.operators

import graft.{OpQuery, Tables}
import graft.Cols.{dec, moneyOut}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Multi-view refresh pipeline — the engine's analog of the reference's
  * incremental refresh round (IncrementalTPCDSBenchmark.scala:383-420:
  * stage source deltas → MERGE into the base tables → rebuild the
  * denormalizing views → serve queries from the staged view cache;
  * view shapes after TPCDSRefreshSchema.scala:579-613).
  *
  * One gate entry drives the whole round end-to-end:
  *   1. a deterministic source delta (reproducible arithmetic — updates
  *      every 10th order, inserts every 17th with a key offset);
  *   2. copy-on-write MERGE into a SnapshotTable (partition-pruned);
  *   3. three denormalizing views over the merged state, each STAGED
  *      through parquet (the reference's view-results-as-parquet cache);
  *   4. a summary relation over the staged copies (view, rows, checksum).
  *
  * Scale notes: the MERGE rewrites only partitions present in the delta;
  * each view is one join pipeline staged once and served many times (the
  * whole point of the refresh cache); summaries aggregate the staged
  * parquet, so nothing is recomputed. Dimension joins broadcast
  * (nation/region/supplier); orders↔customer and lineitem↔orders are
  * shuffle joins on their keys.
  */
object Refresh {

  /** Per-run scratch dir — swept by the harness after materialization. */
  private def tmp(prefix: String): String = graft.Scratch.dir(prefix)

  /** Same delta arithmetic as Lakehouse.mergeSource (kept in sync with
    * the oracle's src CTE). */
  private def delta(o: DataFrame): DataFrame =
    o.filter(col("o_orderkey") % 10 === 0)
      .withColumn("o_totalprice", col("o_totalprice") + 1000.0)
      .unionByName(
        o.filter(col("o_orderkey") % 17 === 0)
          .withColumn("o_orderkey", col("o_orderkey") + 10000000L)
          .withColumn("o_orderstatus", lit("O")))

  private val pipeline = OpQuery(
    "refresh_pipeline",
    Some("""
      WITH src AS (
        SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice + 1000.0 AS o_totalprice,
               o_orderdate, o_orderpriority
        FROM orders WHERE o_orderkey % 10 = 0
        UNION ALL
        SELECT o_orderkey + 10000000, o_custkey, 'O', o_totalprice, o_orderdate, o_orderpriority
        FROM orders WHERE o_orderkey % 17 = 0),
      merged AS (
        SELECT * FROM orders t
        WHERE NOT EXISTS (SELECT 1 FROM src s
                          WHERE s.o_orderkey = t.o_orderkey
                            AND s.o_orderstatus = t.o_orderstatus)
        UNION ALL
        SELECT * FROM src),
      v_order_flat AS (
        SELECT o_orderkey, o_totalprice, c_mktsegment, n_name
        FROM merged JOIN customer ON o_custkey = c_custkey
                    JOIN nation ON c_nationkey = n_nationkey),
      v_lineitem_flat AS (
        SELECT l_orderkey, l_linenumber, l_extendedprice, o_orderpriority
        FROM lineitem JOIN merged ON l_orderkey = o_orderkey
        WHERE l_quantity >= 48.0),
      v_supplier_flat AS (
        SELECT l_orderkey, l_suppkey, l_extendedprice, r_name
        FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
                      JOIN nation ON s_nationkey = n_nationkey
                      JOIN region ON n_regionkey = r_regionkey),
      v_customer_flat AS (
        SELECT c_custkey, c_acctbal, n_name, r_name
        FROM customer JOIN nation ON c_nationkey = n_nationkey
                      JOIN region ON n_regionkey = r_regionkey),
      v_part_flat AS (
        SELECT l_orderkey, l_partkey, l_extendedprice, p_type
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE l_discount >= 0.05)
      SELECT * FROM (
        SELECT 'order_flat' AS view_name, COUNT(*) AS n_rows,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS checksum
        FROM v_order_flat
        UNION ALL
        SELECT 'lineitem_flat', COUNT(*),
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
        FROM v_lineitem_flat
        UNION ALL
        SELECT 'supplier_flat', COUNT(*),
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
        FROM v_supplier_flat
        UNION ALL
        SELECT 'customer_flat', COUNT(*),
               CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
        FROM v_customer_flat
        UNION ALL
        SELECT 'part_flat', COUNT(*),
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
        FROM v_part_flat)
      ORDER BY view_name
    """),
    (s, d) => {
      val root = tmp("refresh_round")
      val o = Tables.load(s, d, "orders")
      // clone-from-staged: the refresh round starts from the loaded base
      // (load phase is staged once, like the reference's cacheBaseTables)
      val merged = Lakehouse.stagedOrders(s, d)
        .shallowCloneTo(s"$root/orders")
        .merge(delta(o), keys = Seq("o_orderkey", "o_orderstatus"),
          partitionBy = Some("o_orderstatus"))
        .read()

      val orderFlat = merged
        .join(Tables.load(s, d, "customer"), col("o_custkey") === col("c_custkey"))
        .join(broadcast(Tables.load(s, d, "nation")), col("c_nationkey") === col("n_nationkey"))
        .select("o_orderkey", "o_totalprice", "c_mktsegment", "n_name")
      val lineitemFlat = Tables.load(s, d, "lineitem")
        .filter(col("l_quantity") >= 48.0)
        .join(merged, col("l_orderkey") === col("o_orderkey"))
        .select("l_orderkey", "l_linenumber", "l_extendedprice", "o_orderpriority")
      // supplier scales with the facts at 100 TB — no broadcast hint
      // (AQE broadcasts it at small scale on runtime size).
      val supplierFlat = Tables.load(s, d, "lineitem")
        .join(Tables.load(s, d, "supplier"), col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(Tables.load(s, d, "nation")), col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(Tables.load(s, d, "region")), col("n_regionkey") === col("r_regionkey"))
        .select("l_orderkey", "l_suppkey", "l_extendedprice", "r_name")
      val customerFlat = Tables.load(s, d, "customer")
        .join(broadcast(Tables.load(s, d, "nation")), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(Tables.load(s, d, "region")), col("n_regionkey") === col("r_regionkey"))
        .select("c_custkey", "c_acctbal", "n_name", "r_name")
      // part scales with the facts (like supplier) — shuffle join, no hint
      val partFlat = Tables.load(s, d, "lineitem")
        .filter(col("l_discount") >= 0.05)
        .join(Tables.load(s, d, "part"), col("l_partkey") === col("p_partkey"))
        .select("l_orderkey", "l_partkey", "l_extendedprice", "p_type")

      // Stage every view as parquet (the refresh cache), then summarize
      // the STAGED copies — proving the cache serves the right data.
      val views = Seq(
        ("order_flat", orderFlat, "o_totalprice"),
        ("lineitem_flat", lineitemFlat, "l_extendedprice"),
        ("supplier_flat", supplierFlat, "l_extendedprice"),
        ("customer_flat", customerFlat, "c_acctbal"),
        ("part_flat", partFlat, "l_extendedprice"))
      views.foreach { case (name, df, _) =>
        df.write.mode("overwrite").parquet(s"$root/views/$name")
      }
      views.map { case (name, _, moneyCol) =>
        s.read.parquet(s"$root/views/$name")
          .agg(count(lit(1)).as("n_rows"),
            moneyOut(sum(dec(col(moneyCol)))).as("checksum"))
          .select(lit(name).as("view_name"), col("n_rows"), col("checksum"))
      }.reduce(_.unionByName(_)).orderBy("view_name")
    })

  /** The reference's FULL refresh-view round (TPCDSRefreshSchema
    * ssv/srv/csv/crv/wsv/wrv/iv over the flat s_* staged sources,
    * view SQL :579-844): each view resolves ID-keyed source rows
    * against the dimensions via LEFT OUTER JOINs into fact-shaped rows,
    * is staged to parquet (the view cache), and the summary aggregates
    * the STAGED copies. The DuckDB oracle assembles the identical
    * generator + view SQL as one WITH chain.
    *
    * Scale notes: each view is one join pipeline — the flat source is
    * the fact-sized side; every dimension join is broadcast-sized
    * (item/customer scale with dims, not facts). Staging writes are
    * partition-parallel; the summary reads the staged parquet once.
    */
  private val pipelineFull = OpQuery(
    "refresh_pipeline_full",
    Some(graft.sources.Tpcds.oracle(
      graft.sources.TpcdsSchema.refreshViewSources.values.flatten.toSeq.distinct,
      "WITH " + graft.sources.TpcdsSchema.refreshViews
        .map { case (n, sql) => s"$n AS ($sql)" }.mkString(",\n") + "\n" +
        graft.sources.TpcdsSchema.refreshSummary)),
    (s, d) => {
      graft.sources.Tpcds.ensureRefresh(s, d)
      val cache = tmp("refresh_views")
      // The 7 staging writes are independent jobs — submit them
      // concurrently and let Spark's scheduler interleave their stages
      // (on a cluster this overlaps shuffle/write waves; serially each
      // write's tail tasks would idle the executors).
      import scala.concurrent.{Await, Future}
      import scala.concurrent.duration._
      import scala.concurrent.ExecutionContext.Implicits.global
      val trace = sys.env.contains("SPARK_GRAFT_TRACE")
      val writes = graft.sources.TpcdsSchema.refreshViews.map {
        case (name, sql) => name -> Future {
          val t0 = System.nanoTime()
          s.sql(sql).write.mode("overwrite").parquet(s"$cache/$name")
          if (trace) System.err.println(
            f"[trace] rpf view $name staged in ${(System.nanoTime() - t0) / 1e9}%.3f s")
        }
      }
      // generous shared deadline (each view is seconds of work even at
      // sf0.1): a hung write fails LOUD naming the stuck view instead of
      // stalling the bench forever
      val deadline = System.nanoTime() + 30.minutes.toNanos
      writes.foreach { case (name, f) =>
        try Await.result(f,
          math.max(1L, deadline - System.nanoTime()).nanos)
        catch {
          case _: java.util.concurrent.TimeoutException =>
            throw new IllegalStateException(
              s"refresh view staging timed out (30 min budget) waiting on '$name'")
        }
      }
      graft.sources.TpcdsSchema.refreshViews.foreach { case (name, _) =>
        s.read.parquet(s"$cache/$name").createOrReplaceTempView(name)
        // staged views die with the scratch dir — register them for the
        // same sweep so the catalog never holds views over deleted paths
        graft.Scratch.view(name)
      }
      s.sql(graft.sources.TpcdsSchema.refreshSummary)
    })

  /** Dimension-side refresh round (TPCDSRefreshSchema.scala:28-562 dim
    * sources + the protocol's dim maintenance): the s_* dimension deltas
    * are MERGEd into item/customer/store — type-1 updates on the
    * business key plus inserts under fresh keys — and the store, catalog
    * and web sales views (ssv/csv/wsv) are rebuilt against the REFRESHED
    * dimensions, so the deltas' price/tax changes flow into the
    * fact-shaped rows. The summary covers all 10 staged dim sources, the
    * three merged dims, and the rebuilt views (the *_price/csv/wsv
    * checksums sum i_current_price-derived columns, which only match if
    * the item delta actually routed through the views).
    * Both engines run the identical text (merge = anti-join + union —
    * the same semantics SnapshotTable.merge implements natively).
    */
  private val dimsBody = """WITH merged_item AS (
 SELECT i.i_item_sk, i.i_item_id, i.i_rec_end_date,
        s.item_list_price i_current_price,
        s.item_wholesale_cost i_wholesale_cost
 FROM item i JOIN s_item s ON i.i_item_id = s.item_item_id
 UNION ALL
 SELECT i_item_sk, i_item_id, i_rec_end_date, i_current_price,
        i_wholesale_cost
 FROM item
 WHERE NOT EXISTS (SELECT 1 FROM s_item WHERE item_item_id = i_item_id)
 UNION ALL
 SELECT CAST(SUBSTR(s.item_item_id, 6) AS BIGINT)
          + (SELECT MAX(i_item_sk) FROM item),
        s.item_item_id, CAST(NULL AS DATE), s.item_list_price,
        s.item_wholesale_cost
 FROM s_item s WHERE s.item_item_id LIKE 'ITEMN%'),
merged_customer AS (
 SELECT c.c_customer_sk, c.c_customer_id, c.c_current_cdemo_sk,
        c.c_current_hdemo_sk, c.c_current_addr_sk,
        s.cust_email_address c_email_address
 FROM customer c JOIN s_customer s ON c.c_customer_id = s.cust_customer_id
 UNION ALL
 SELECT c_customer_sk, c_customer_id, c_current_cdemo_sk,
        c_current_hdemo_sk, c_current_addr_sk, c_email_address
 FROM customer
 WHERE NOT EXISTS (SELECT 1 FROM s_customer
                   WHERE cust_customer_id = c_customer_id)
 UNION ALL
 SELECT CAST(SUBSTR(s.cust_customer_id, 6) AS BIGINT)
          + (SELECT MAX(c_customer_sk) FROM customer),
        s.cust_customer_id, CAST(NULL AS BIGINT), CAST(NULL AS BIGINT),
        CAST(NULL AS BIGINT), s.cust_email_address
 FROM s_customer s WHERE s.cust_customer_id LIKE 'CUSTN%'),
merged_store AS (
 SELECT st.s_store_sk, st.s_store_id, s.stor_name s_store_name,
        s.stor_employees s_number_employees,
        s.stor_tax_percentage s_tax_percentage
 FROM store st JOIN s_store s ON st.s_store_id = s.stor_store_id
 UNION ALL
 SELECT s_store_sk, s_store_id, s_store_name, s_number_employees,
        s_tax_percentage
 FROM store
 WHERE NOT EXISTS (SELECT 1 FROM s_store WHERE stor_store_id = s_store_id)),
ssv_d AS (
 SELECT d_date_sk ss_sold_date_sk, t_time_sk ss_sold_time_sk,
        i_item_sk ss_item_sk, c_customer_sk ss_customer_sk,
        c_current_cdemo_sk ss_cdemo_sk, c_current_hdemo_sk ss_hdemo_sk,
        c_current_addr_sk ss_addr_sk, s_store_sk ss_store_sk,
        p_promo_sk ss_promo_sk, purc_purchase_id ss_ticket_number,
        plin_quantity ss_quantity, i_wholesale_cost ss_wholesale_cost,
        i_current_price ss_list_price, plin_sale_price ss_sales_price,
        (i_current_price - plin_sale_price) * plin_quantity ss_ext_discount_amt,
        plin_sale_price * plin_quantity ss_ext_sales_price,
        i_wholesale_cost * plin_quantity ss_ext_wholesale_cost,
        i_current_price * plin_quantity ss_ext_list_price,
        i_current_price * s_tax_percentage ss_ext_tax,
        plin_coupon_amt ss_coupon_amt,
        (plin_sale_price * plin_quantity) - plin_coupon_amt ss_net_paid,
        ((plin_sale_price * plin_quantity) - plin_coupon_amt)
          * (1 + s_tax_percentage) ss_net_paid_inc_tax,
        ((plin_sale_price * plin_quantity) - plin_coupon_amt)
          - (plin_quantity * i_wholesale_cost) ss_net_profit
 FROM s_purchase
 LEFT OUTER JOIN merged_customer ON (purc_customer_id = c_customer_id)
 LEFT OUTER JOIN merged_store ON (purc_store_id = s_store_id)
 LEFT OUTER JOIN date_dim ON (CAST(purc_purchase_date AS DATE) = d_date)
 LEFT OUTER JOIN time_dim ON (purc_purchase_time = t_time)
 JOIN s_purchase_lineitem ON (purc_purchase_id = plin_purchase_id)
 LEFT OUTER JOIN promotion ON (plin_promotion_id = p_promo_id)
 LEFT OUTER JOIN merged_item ON (plin_item_id = i_item_id
                                 AND i_rec_end_date IS NULL)),
csv_d AS (
 SELECT i_item_sk cs_item_sk, c1.c_customer_sk cs_bill_customer_sk,
        clin_quantity cs_quantity,
        i_current_price * clin_quantity cs_ext_list_price,
        (clin_sale_price * clin_quantity) - clin_coupon_amt cs_net_paid
 FROM s_catalog_order
 JOIN s_catalog_order_lineitem ON (cord_order_id = clin_order_id)
 LEFT OUTER JOIN merged_customer c1
   ON (cord_bill_customer_id = c1.c_customer_id)
 LEFT OUTER JOIN merged_item ON (clin_item_id = i_item_id
                                 AND i_rec_end_date IS NULL)),
wsv_d AS (
 SELECT i_item_sk ws_item_sk, c1.c_customer_sk ws_bill_customer_sk,
        wlin_quantity ws_quantity,
        i_current_price * wlin_quantity ws_ext_list_price,
        (wlin_sale_price * wlin_quantity) - wlin_coupon_amt ws_net_paid
 FROM s_web_order
 JOIN s_web_order_lineitem ON (word_order_id = wlin_order_id)
 LEFT OUTER JOIN merged_customer c1
   ON (word_bill_customer_id = c1.c_customer_id)
 LEFT OUTER JOIN merged_item ON (wlin_item_id = i_item_id
                                 AND i_rec_end_date IS NULL))
SELECT * FROM (
 SELECT 's_item' part, COUNT(*) n_rows,
        CAST(SUM(item_list_price) AS DOUBLE) checksum FROM s_item
 UNION ALL SELECT 's_customer', COUNT(*),
        CAST(SUM(LENGTH(cust_email_address)) AS DOUBLE) FROM s_customer
 UNION ALL SELECT 's_store', COUNT(*),
        CAST(SUM(stor_employees) AS DOUBLE) FROM s_store
 UNION ALL SELECT 's_call_center', COUNT(*),
        CAST(SUM(call_center_employees) AS DOUBLE) FROM s_call_center
 UNION ALL SELECT 's_web_site', COUNT(*),
        CAST(SUM(LENGTH(wsit_site_name)) AS DOUBLE) FROM s_web_site
 UNION ALL SELECT 's_warehouse', COUNT(*),
        CAST(SUM(wrhs_warehouse_sq_ft) AS DOUBLE) FROM s_warehouse
 UNION ALL SELECT 's_web_page', COUNT(*),
        CAST(SUM(wpag_char_cnt) AS DOUBLE) FROM s_web_page
 UNION ALL SELECT 's_promotion', COUNT(*),
        CAST(SUM(prom_cost) AS DOUBLE) FROM s_promotion
 UNION ALL SELECT 's_catalog_page', COUNT(*),
        CAST(SUM(cpag_catalog_number) AS DOUBLE) FROM s_catalog_page
 UNION ALL SELECT 's_zip_to_gmt', COUNT(*),
        CAST(SUM(zipg_gmt_offset) AS DOUBLE) FROM s_zip_to_gmt
 UNION ALL SELECT 'item_merged', COUNT(*),
        CAST(SUM(i_current_price) AS DOUBLE) FROM merged_item
 UNION ALL SELECT 'customer_merged', COUNT(*),
        CAST(SUM(LENGTH(c_email_address)) AS DOUBLE) FROM merged_customer
 UNION ALL SELECT 'store_merged', COUNT(*),
        CAST(SUM(s_number_employees) AS DOUBLE) FROM merged_store
 UNION ALL SELECT 'ssv_dims', COUNT(*),
        CAST(SUM(ss_net_paid) AS DOUBLE) FROM ssv_d
 UNION ALL SELECT 'ssv_dims_price', COUNT(ss_item_sk),
        CAST(SUM(ss_ext_list_price) AS DOUBLE) FROM ssv_d
 UNION ALL SELECT 'csv_dims', COUNT(cs_item_sk),
        CAST(SUM(cs_ext_list_price) AS DOUBLE) FROM csv_d
 UNION ALL SELECT 'wsv_dims', COUNT(ws_item_sk),
        CAST(SUM(ws_ext_list_price) AS DOUBLE) FROM wsv_d) x
ORDER BY part"""

  private val pipelineDims = OpQuery(
    "refresh_pipeline_dims",
    Some(graft.sources.Tpcds.oracle(
      Seq("s_purchase", "s_purchase_lineitem", "s_catalog_order",
        "s_catalog_order_lineitem", "s_web_order", "s_web_order_lineitem",
        "item", "customer", "store", "date_dim", "time_dim", "promotion",
        "s_item", "s_customer", "s_store", "s_call_center", "s_web_site",
        "s_warehouse", "s_web_page", "s_promotion", "s_catalog_page",
        "s_zip_to_gmt"),
      dimsBody)),
    (s, d) => {
      graft.sources.Tpcds.ensureRefresh(s, d)
      graft.sources.Tpcds.ensureRefreshDims(s, d)
      s.sql(dimsBody)
    })

  val defs: Seq[OpQuery] = Seq(pipeline, pipelineFull, pipelineDims)
}
