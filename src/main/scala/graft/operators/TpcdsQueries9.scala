package graft.operators

import graft.OpQuery
import graft.sources.Tpcds

/** TPC-DS conformance sweep, part 9 — the final corpus tier (reference
  * TPCDSBenchmarkQueries.scala:4547-4787): call-center return losses,
  * excess-discount scalars, reason-coded net sales, the q94 ship-window
  * semi/anti pair, time-slot counts, cross-channel customer overlap and
  * ship-lag pivots. With these, all 99 queries (103 with a/b variants)
  * of the corpus have graft ports.
  */
object TpcdsQueries9 {

  private def tq(name: String, tables: Seq[String], body: String): OpQuery =
    OpQuery(name, Some(Tpcds.oracle(tables, body)),
      (s, d) => { Tpcds.ensure(s, d); s.sql(body) })

  private val q91 = tq("tpcds_q91",
    Seq("call_center", "catalog_returns", "date_dim", "customer",
      "customer_address", "customer_demographics", "household_demographics"),
    """SELECT cc_call_center_id call_center, cc_name call_center_name,
       cc_manager manager, CAST(SUM(cr_net_loss) AS DOUBLE) returns_loss
FROM call_center, catalog_returns, date_dim, customer, customer_address,
     customer_demographics, household_demographics
WHERE cr_call_center_sk = cc_call_center_sk
  AND cr_returned_date_sk = d_date_sk
  AND cr_returning_customer_sk = c_customer_sk
  AND cd_demo_sk = c_current_cdemo_sk
  AND hd_demo_sk = c_current_hdemo_sk
  AND ca_address_sk = c_current_addr_sk
  AND d_year = 2000
  AND ((cd_marital_status = 'U' AND cd_education_status = '4 yr Degree')
       OR (cd_marital_status = 'W' AND cd_education_status = 'Advanced Degree'))
  AND hd_buy_potential LIKE '5001-10000%'
  AND ca_gmt_offset IN (-6, -7)
GROUP BY cc_call_center_id, cc_name, cc_manager, cd_marital_status,
         cd_education_status
ORDER BY returns_loss DESC NULLS LAST, call_center ASC NULLS FIRST,
         call_center_name ASC NULLS FIRST, manager ASC NULLS FIRST""")

  private val q92 = tq("tpcds_q92",
    Seq("web_sales", "item", "date_dim"),
    """SELECT CAST(SUM(ws_ext_discount_amt) AS DOUBLE) excess_discount_amount
FROM web_sales, item, date_dim
WHERE i_manufact_id = 561
  AND i_item_sk = ws_item_sk
  AND d_date BETWEEN DATE '2000-03-13' AND DATE '2000-03-13' + 90
  AND d_date_sk = ws_sold_date_sk
  AND ws_ext_discount_amt >
      (SELECT 1.3 * CAST(SUM(ws_ext_discount_amt) AS DOUBLE) / COUNT(*)
       FROM web_sales, date_dim
       WHERE ws_item_sk = i_item_sk
         AND d_date BETWEEN DATE '2000-03-13' AND DATE '2000-03-13' + 90
         AND d_date_sk = ws_sold_date_sk)""")

  private val q93 = tq("tpcds_q93",
    Seq("store_sales", "store_returns", "reason"),
    """SELECT ss_customer_sk, CAST(SUM(act_sales) AS DOUBLE) sumsales
FROM (SELECT ss_item_sk, ss_ticket_number, ss_customer_sk,
             CASE WHEN sr_return_quantity IS NOT NULL
                  THEN (ss_quantity - sr_return_quantity) * ss_sales_price
                  ELSE ss_quantity * ss_sales_price END act_sales
      FROM store_sales
      LEFT OUTER JOIN store_returns ON (sr_item_sk = ss_item_sk
                                        AND sr_ticket_number = ss_ticket_number),
           reason
      WHERE sr_reason_sk = r_reason_sk
        AND r_reason_desc = 'reason 6') t
GROUP BY ss_customer_sk
ORDER BY sumsales ASC NULLS FIRST, ss_customer_sk ASC NULLS FIRST
LIMIT 100""")

  private val q94 = tq("tpcds_q94",
    Seq("web_sales", "date_dim", "customer_address", "web_site", "web_returns"),
    """SELECT COUNT(DISTINCT ws_order_number) order_count,
       CAST(SUM(ws_ext_ship_cost) AS DOUBLE) total_shipping_cost,
       CAST(SUM(ws_net_profit) AS DOUBLE) total_net_profit
FROM web_sales ws1, date_dim, customer_address, web_site
WHERE d_date BETWEEN DATE '2000-05-01' AND DATE '2000-05-01' + 60
  AND ws1.ws_ship_date_sk = d_date_sk
  AND ws1.ws_ship_addr_sk = ca_address_sk
  AND ca_state = 'TX'
  AND ws1.ws_web_site_sk = web_site_sk
  AND web_name = 'Site1'
  AND EXISTS (SELECT * FROM web_sales ws2
              WHERE ws1.ws_order_number = ws2.ws_order_number
                AND ws1.ws_warehouse_sk <> ws2.ws_warehouse_sk)
  AND NOT EXISTS (SELECT * FROM web_returns wr1
                  WHERE ws1.ws_order_number = wr1.wr_order_number)""")

  private val q96 = tq("tpcds_q96",
    Seq("store_sales", "household_demographics", "time_dim", "store"),
    """SELECT COUNT(*) cnt
FROM store_sales, household_demographics, time_dim, store
WHERE ss_sold_time_sk = time_dim.t_time_sk
  AND ss_hdemo_sk = household_demographics.hd_demo_sk
  AND ss_store_sk = s_store_sk
  AND time_dim.t_hour = 16
  AND time_dim.t_minute >= 30
  AND household_demographics.hd_dep_count = 4
  AND store.s_store_name = 'Store1'
ORDER BY cnt ASC NULLS FIRST
LIMIT 100""")

  private val q97 = tq("tpcds_q97",
    Seq("store_sales", "catalog_sales", "date_dim"),
    """WITH ssci AS (
 SELECT ss_customer_sk customer_sk, ss_item_sk item_sk
 FROM store_sales, date_dim
 WHERE ss_sold_date_sk = d_date_sk
   AND d_month_seq BETWEEN 120 AND 120 + 11
 GROUP BY ss_customer_sk, ss_item_sk),
csci AS (
 SELECT cs_bill_customer_sk customer_sk, cs_item_sk item_sk
 FROM catalog_sales, date_dim
 WHERE cs_sold_date_sk = d_date_sk
   AND d_month_seq BETWEEN 120 AND 120 + 11
 GROUP BY cs_bill_customer_sk, cs_item_sk)
SELECT CAST(SUM(CASE WHEN ssci.customer_sk IS NOT NULL
                      AND csci.customer_sk IS NULL
               THEN 1 ELSE 0 END) AS BIGINT) store_only,
       CAST(SUM(CASE WHEN ssci.customer_sk IS NULL
                      AND csci.customer_sk IS NOT NULL
               THEN 1 ELSE 0 END) AS BIGINT) catalog_only,
       CAST(SUM(CASE WHEN ssci.customer_sk IS NOT NULL
                      AND csci.customer_sk IS NOT NULL
               THEN 1 ELSE 0 END) AS BIGINT) store_and_catalog
FROM ssci FULL OUTER JOIN csci ON (ssci.customer_sk = csci.customer_sk
                                   AND ssci.item_sk = csci.item_sk)
LIMIT 100""")

  private val q98 = tq("tpcds_q98",
    Seq("store_sales", "item", "date_dim"),
    """SELECT i_item_id, i_item_desc, i_category, i_class,
       CAST(i_current_price AS DOUBLE) i_current_price,
       CAST(SUM(ss_ext_sales_price) AS DOUBLE) itemrevenue,
       CAST(SUM(ss_ext_sales_price) AS DOUBLE) * 100
         / CAST(SUM(SUM(ss_ext_sales_price)) OVER (PARTITION BY i_class)
                AS DOUBLE) revenueratio
FROM store_sales, item, date_dim
WHERE ss_item_sk = i_item_sk
  AND i_category IN ('Jewelry', 'Home', 'Shoes')
  AND ss_sold_date_sk = d_date_sk
  AND d_date BETWEEN DATE '2000-04-12' AND DATE '2000-04-12' + 30
GROUP BY i_item_id, i_item_desc, i_category, i_class, i_current_price
ORDER BY i_category ASC NULLS FIRST, i_class ASC NULLS FIRST,
         i_item_id ASC NULLS FIRST, i_item_desc ASC NULLS FIRST,
         revenueratio ASC NULLS FIRST""")

  private val q99 = tq("tpcds_q99",
    Seq("catalog_sales", "warehouse", "ship_mode", "call_center", "date_dim"),
    """SELECT SUBSTR(w_warehouse_name, 1, 20) wh_name, sm_type, cc_name,
       CAST(SUM(CASE WHEN (cs_ship_date_sk - cs_sold_date_sk <= 30)
                THEN 1 ELSE 0 END) AS BIGINT) d30_days,
       CAST(SUM(CASE WHEN (cs_ship_date_sk - cs_sold_date_sk > 30)
                      AND (cs_ship_date_sk - cs_sold_date_sk <= 60)
                THEN 1 ELSE 0 END) AS BIGINT) d31_60_days,
       CAST(SUM(CASE WHEN (cs_ship_date_sk - cs_sold_date_sk > 60)
                      AND (cs_ship_date_sk - cs_sold_date_sk <= 90)
                THEN 1 ELSE 0 END) AS BIGINT) d61_90_days,
       CAST(SUM(CASE WHEN (cs_ship_date_sk - cs_sold_date_sk > 90)
                      AND (cs_ship_date_sk - cs_sold_date_sk <= 120)
                THEN 1 ELSE 0 END) AS BIGINT) d91_120_days,
       CAST(SUM(CASE WHEN (cs_ship_date_sk - cs_sold_date_sk > 120)
                THEN 1 ELSE 0 END) AS BIGINT) d_over_120_days
FROM catalog_sales, warehouse, ship_mode, call_center, date_dim
WHERE d_month_seq BETWEEN 120 AND 120 + 11
  AND cs_ship_date_sk = d_date_sk
  AND cs_warehouse_sk = w_warehouse_sk
  AND cs_ship_mode_sk = sm_ship_mode_sk
  AND cs_call_center_sk = cc_call_center_sk
GROUP BY SUBSTR(w_warehouse_name, 1, 20), sm_type, cc_name
ORDER BY wh_name ASC NULLS FIRST, sm_type ASC NULLS FIRST,
         cc_name ASC NULLS FIRST
LIMIT 100""")

  val defs: Seq[OpQuery] =
    Seq(q91, q92, q93, q94, q96, q97, q98, q99)
}
