package graft.operators

import graft.OpQuery
import graft.sources.Tpcds

/** TPC-DS conformance sweep, part 7 (reference corpus
  * TPCDSBenchmarkQueries.scala:3233-4051): warehouse month pivots,
  * city-mismatch and ticket rollups, NOT-EXISTS demographics, state
  * hierarchy ranks, hourly brand reports and channel P&L rollups.
  * Generator fits: carriers are 'CarrierN', cities 'CityN', the only
  * nullable fact FK is the promo key (q76's null-column probes use it).
  */
object TpcdsQueries7 {

  private def tq(name: String, tables: Seq[String], body: String): OpQuery =
    OpQuery(name, Some(Tpcds.oracle(tables, body)),
      (s, d) => { Tpcds.ensure(s, d); s.sql(body) })

  /** q66's 12 monthly pivot columns for one source column, as exact
    * decimal sums surfaced per-warehouse as DOUBLE (sq-ft ratios divide
    * the exact sum once — no per-row double accumulation). */
  private def months(expr: String, suffix: String): String =
    (1 to 12).map { m =>
      val name = Seq("jan", "feb", "mar", "apr", "may", "jun", "jul", "aug",
        "sep", "oct", "nov", "dec")(m - 1)
      s"""SUM(CASE WHEN d_moy = $m THEN $expr
         ELSE CAST(0 AS DECIMAL(16,2)) END) ${name}_$suffix"""
    }.mkString(",\n ")

  private val q66 = tq("tpcds_q66",
    Seq("web_sales", "catalog_sales", "warehouse", "date_dim", "time_dim", "ship_mode"),
    s"""SELECT w_warehouse_name, w_warehouse_sq_ft, w_city, w_county, w_state,
       w_country, ship_carriers, year_,
       ${(1 to 12).map { m => val n = Seq("jan","feb","mar","apr","may","jun","jul","aug","sep","oct","nov","dec")(m-1); s"CAST(SUM(${n}_sales) AS DOUBLE) ${n}_sales" }.mkString(",\n       ")},
       ${(1 to 12).map { m => val n = Seq("jan","feb","mar","apr","may","jun","jul","aug","sep","oct","nov","dec")(m-1); s"CAST(SUM(${n}_sales) AS DOUBLE) / w_warehouse_sq_ft ${n}_sales_per_sq_foot" }.mkString(",\n       ")},
       ${(1 to 12).map { m => val n = Seq("jan","feb","mar","apr","may","jun","jul","aug","sep","oct","nov","dec")(m-1); s"CAST(SUM(${n}_net) AS DOUBLE) ${n}_net" }.mkString(",\n       ")}
FROM (
 SELECT w_warehouse_name, w_warehouse_sq_ft, w_city, w_county, w_state,
        w_country, 'Carrier1' || ',' || 'Carrier2' ship_carriers,
        d_year year_,
        ${months("ws_sales_price * ws_quantity", "sales")},
        ${months("ws_net_paid_inc_tax * ws_quantity", "net")}
 FROM web_sales, warehouse, date_dim, time_dim, ship_mode
 WHERE ws_warehouse_sk = w_warehouse_sk
   AND ws_sold_date_sk = d_date_sk
   AND ws_sold_time_sk = t_time_sk
   AND ws_ship_mode_sk = sm_ship_mode_sk
   AND d_year = 2000
   AND t_time BETWEEN 24285 AND 24285 + 28800
   AND sm_carrier IN ('Carrier1', 'Carrier2')
 GROUP BY w_warehouse_name, w_warehouse_sq_ft, w_city, w_county, w_state,
          w_country, d_year
 UNION ALL
 SELECT w_warehouse_name, w_warehouse_sq_ft, w_city, w_county, w_state,
        w_country, 'Carrier1' || ',' || 'Carrier2' ship_carriers,
        d_year year_,
        ${months("cs_ext_list_price * cs_quantity", "sales")},
        ${months("cs_net_paid * cs_quantity", "net")}
 FROM catalog_sales, warehouse, date_dim, time_dim, ship_mode
 WHERE cs_warehouse_sk = w_warehouse_sk
   AND cs_sold_date_sk = d_date_sk
   AND cs_sold_time_sk = t_time_sk
   AND cs_ship_mode_sk = sm_ship_mode_sk
   AND d_year = 2000
   AND t_time BETWEEN 24285 AND 24285 + 28800
   AND sm_carrier IN ('Carrier1', 'Carrier2')
 GROUP BY w_warehouse_name, w_warehouse_sq_ft, w_city, w_county, w_state,
          w_country, d_year) x
GROUP BY w_warehouse_name, w_warehouse_sq_ft, w_city, w_county, w_state,
         w_country, ship_carriers, year_
ORDER BY w_warehouse_name ASC NULLS FIRST
LIMIT 100""")

  private val q68 = tq("tpcds_q68",
    Seq("store_sales", "date_dim", "store", "household_demographics",
      "customer_address", "customer"),
    """SELECT c_last_name, c_first_name, ca_city, bought_city,
       ss_ticket_number, extended_price, extended_tax, list_price
FROM (SELECT ss_ticket_number, ss_customer_sk, ca_city bought_city,
             CAST(SUM(ss_ext_sales_price) AS DOUBLE) extended_price,
             CAST(SUM(ss_ext_list_price) AS DOUBLE) list_price,
             CAST(SUM(ss_ext_tax) AS DOUBLE) extended_tax
      FROM store_sales, date_dim, store, household_demographics,
           customer_address
      WHERE store_sales.ss_sold_date_sk = date_dim.d_date_sk
        AND store_sales.ss_store_sk = store.s_store_sk
        AND store_sales.ss_hdemo_sk = household_demographics.hd_demo_sk
        AND store_sales.ss_addr_sk = customer_address.ca_address_sk
        AND date_dim.d_dom BETWEEN 1 AND 2
        AND (household_demographics.hd_dep_count = 1
             OR household_demographics.hd_vehicle_count = -1)
        AND date_dim.d_year IN (1999, 1999 + 1, 1999 + 2)
        AND store.s_city IN ('City4', 'City17')
      GROUP BY ss_ticket_number, ss_customer_sk, ss_addr_sk, ca_city) dn,
     customer, customer_address current_addr
WHERE ss_customer_sk = c_customer_sk
  AND customer.c_current_addr_sk = current_addr.ca_address_sk
  AND current_addr.ca_city <> bought_city
ORDER BY c_last_name ASC NULLS FIRST, ss_ticket_number ASC NULLS FIRST,
         c_first_name ASC NULLS FIRST, ca_city ASC NULLS FIRST,
         bought_city ASC NULLS FIRST
LIMIT 100""")

  private val q69 = tq("tpcds_q69",
    Seq("customer", "customer_address", "customer_demographics",
      "store_sales", "web_sales", "catalog_sales", "date_dim"),
    """SELECT cd_gender, cd_marital_status, cd_education_status, COUNT(*) cnt1,
       cd_purchase_estimate, COUNT(*) cnt2, cd_credit_rating, COUNT(*) cnt3
FROM customer c, customer_address ca, customer_demographics
WHERE c.c_current_addr_sk = ca.ca_address_sk
  AND ca_state IN ('OK', 'GA', 'VA')
  AND cd_demo_sk = c.c_current_cdemo_sk
  AND EXISTS (SELECT * FROM store_sales, date_dim
              WHERE c.c_customer_sk = ss_customer_sk
                AND ss_sold_date_sk = d_date_sk
                AND d_year = 2000 AND d_moy BETWEEN 4 AND 4 + 2)
  AND (NOT EXISTS (SELECT * FROM web_sales, date_dim
                   WHERE c.c_customer_sk = ws_bill_customer_sk
                     AND ws_sold_date_sk = d_date_sk
                     AND d_year = 2000 AND d_moy BETWEEN 4 AND 4 + 2)
       AND NOT EXISTS (SELECT * FROM catalog_sales, date_dim
                       WHERE c.c_customer_sk = cs_ship_customer_sk
                         AND cs_sold_date_sk = d_date_sk
                         AND d_year = 2000 AND d_moy BETWEEN 4 AND 4 + 2))
GROUP BY cd_gender, cd_marital_status, cd_education_status,
         cd_purchase_estimate, cd_credit_rating
ORDER BY cd_gender ASC NULLS FIRST, cd_marital_status ASC NULLS FIRST,
         cd_education_status ASC NULLS FIRST,
         cd_purchase_estimate ASC NULLS FIRST, cd_credit_rating ASC NULLS FIRST
LIMIT 100""")

  private val q70 = tq("tpcds_q70",
    Seq("store_sales", "date_dim", "store"),
    """SELECT CAST(SUM(ss_net_profit) AS DOUBLE) total_sum, s_state, s_county,
       CAST(GROUPING(s_state) + GROUPING(s_county) AS INT) lochierarchy,
       CAST(RANK() OVER (
         PARTITION BY GROUPING(s_state) + GROUPING(s_county),
                      CASE WHEN GROUPING(s_county) = 0 THEN s_state END
         ORDER BY CAST(SUM(ss_net_profit) AS DOUBLE) DESC) AS BIGINT)
         rank_within_parent
FROM store_sales, date_dim d1, store
WHERE d1.d_month_seq BETWEEN 120 AND 120 + 11
  AND d1.d_date_sk = ss_sold_date_sk
  AND s_store_sk = ss_store_sk
  AND s_state IN (SELECT s_state
                  FROM (SELECT s_state s_state,
                               CAST(RANK() OVER (PARTITION BY s_state
                                 ORDER BY CAST(SUM(ss_net_profit) AS DOUBLE)
                                          DESC) AS BIGINT) ranking
                        FROM store_sales, store, date_dim
                        WHERE d_month_seq BETWEEN 120 AND 120 + 11
                          AND d_date_sk = ss_sold_date_sk
                          AND s_store_sk = ss_store_sk
                        GROUP BY s_state) tmp1
                  WHERE ranking <= 5)
GROUP BY ROLLUP (s_state, s_county)
ORDER BY lochierarchy DESC NULLS LAST,
         CASE WHEN lochierarchy = 0 THEN s_state END ASC NULLS FIRST,
         rank_within_parent ASC NULLS FIRST, s_state ASC NULLS FIRST,
         s_county ASC NULLS FIRST
LIMIT 100""")

  private val q71 = tq("tpcds_q71",
    Seq("item", "web_sales", "catalog_sales", "store_sales", "date_dim", "time_dim"),
    """SELECT i_brand_id brand_id, i_brand brand, t_hour, t_minute,
       CAST(SUM(ext_price) AS DOUBLE) ext_price
FROM item,
     (SELECT ws_ext_sales_price ext_price, ws_sold_date_sk sold_date_sk,
             ws_item_sk sold_item_sk, ws_sold_time_sk time_sk
      FROM web_sales, date_dim
      WHERE d_date_sk = ws_sold_date_sk AND d_moy = 12 AND d_year = 1999
      UNION ALL
      SELECT cs_ext_sales_price ext_price, cs_sold_date_sk sold_date_sk,
             cs_item_sk sold_item_sk, cs_sold_time_sk time_sk
      FROM catalog_sales, date_dim
      WHERE d_date_sk = cs_sold_date_sk AND d_moy = 12 AND d_year = 1999
      UNION ALL
      SELECT ss_ext_sales_price ext_price, ss_sold_date_sk sold_date_sk,
             ss_item_sk sold_item_sk, ss_sold_time_sk time_sk
      FROM store_sales, date_dim
      WHERE d_date_sk = ss_sold_date_sk AND d_moy = 12 AND d_year = 1999) tmp,
     time_dim
WHERE sold_item_sk = i_item_sk
  AND i_manager_id = 1
  AND time_sk = t_time_sk
  AND (t_meal_time = 'breakfast' OR t_meal_time = 'dinner')
GROUP BY i_brand, i_brand_id, t_hour, t_minute
ORDER BY ext_price DESC NULLS LAST, brand_id ASC NULLS FIRST,
         brand ASC NULLS FIRST, t_hour ASC NULLS FIRST,
         t_minute ASC NULLS FIRST""")

  private val q73 = tq("tpcds_q73",
    Seq("store_sales", "date_dim", "store", "household_demographics", "customer"),
    """SELECT c_last_name, c_first_name, c_salutation, c_preferred_cust_flag,
       ss_ticket_number, cnt
FROM (SELECT ss_ticket_number, ss_customer_sk, COUNT(*) cnt
      FROM store_sales, date_dim, store, household_demographics
      WHERE store_sales.ss_sold_date_sk = date_dim.d_date_sk
        AND store_sales.ss_store_sk = store.s_store_sk
        AND store_sales.ss_hdemo_sk = household_demographics.hd_demo_sk
        AND date_dim.d_dom BETWEEN 1 AND 2
        AND (household_demographics.hd_buy_potential = '501-1000'
             OR household_demographics.hd_buy_potential = 'Unknown')
        AND household_demographics.hd_vehicle_count > 0
        AND CASE WHEN household_demographics.hd_vehicle_count > 0
                 THEN CAST(household_demographics.hd_dep_count AS DOUBLE)
                      / household_demographics.hd_vehicle_count
                 ELSE NULL END > 1
        AND date_dim.d_year IN (1999, 1999 + 1, 1999 + 2)
        AND store.s_county IN ('County5', 'County24', 'County13', 'County2')
      GROUP BY ss_ticket_number, ss_customer_sk) dj, customer
WHERE ss_customer_sk = c_customer_sk
  AND cnt BETWEEN 1 AND 5
ORDER BY cnt DESC NULLS LAST, c_last_name ASC NULLS FIRST,
         ss_ticket_number ASC NULLS FIRST""")

  private val q76 = tq("tpcds_q76",
    Seq("store_sales", "web_sales", "catalog_sales", "item", "date_dim"),
    """SELECT channel, col_name, d_year, d_qoy, i_category, COUNT(*) sales_cnt,
       CAST(SUM(ext_sales_price) AS DOUBLE) sales_amt
FROM (SELECT 'store' channel, 'ss_promo_sk' col_name, d_year, d_qoy,
             i_category, ss_ext_sales_price ext_sales_price
      FROM store_sales, item, date_dim
      WHERE ss_promo_sk IS NULL
        AND ss_sold_date_sk = d_date_sk AND ss_item_sk = i_item_sk
      UNION ALL
      SELECT 'web' channel, 'ws_promo_sk' col_name, d_year, d_qoy,
             i_category, ws_ext_sales_price ext_sales_price
      FROM web_sales, item, date_dim
      WHERE ws_promo_sk IS NULL
        AND ws_sold_date_sk = d_date_sk AND ws_item_sk = i_item_sk
      UNION ALL
      SELECT 'catalog' channel, 'cs_promo_sk' col_name, d_year, d_qoy,
             i_category, cs_ext_sales_price ext_sales_price
      FROM catalog_sales, item, date_dim
      WHERE cs_promo_sk IS NULL
        AND cs_sold_date_sk = d_date_sk AND cs_item_sk = i_item_sk) foo
GROUP BY channel, col_name, d_year, d_qoy, i_category
ORDER BY channel ASC NULLS FIRST, col_name ASC NULLS FIRST,
         d_year ASC NULLS FIRST, d_qoy ASC NULLS FIRST,
         i_category ASC NULLS FIRST
LIMIT 100""")

  private val q77 = tq("tpcds_q77",
    Seq("store_sales", "store_returns", "catalog_sales", "catalog_returns",
      "web_sales", "web_returns", "date_dim", "store", "web_page"),
    """WITH ss AS (
 SELECT s_store_sk, SUM(ss_ext_sales_price) sales, SUM(ss_net_profit) profit
 FROM store_sales, date_dim, store
 WHERE ss_sold_date_sk = d_date_sk
   AND d_date BETWEEN DATE '2000-08-01' AND DATE '2000-08-01' + 30
   AND ss_store_sk = s_store_sk
 GROUP BY s_store_sk),
sr AS (
 SELECT s_store_sk, SUM(sr_return_amt) returns_amt, SUM(sr_net_loss) profit_loss
 FROM store_returns, date_dim, store
 WHERE sr_returned_date_sk = d_date_sk
   AND d_date BETWEEN DATE '2000-08-01' AND DATE '2000-08-01' + 30
   AND sr_store_sk = s_store_sk
 GROUP BY s_store_sk),
cs AS (
 SELECT cs_call_center_sk, SUM(cs_ext_sales_price) sales,
        SUM(cs_net_profit) profit
 FROM catalog_sales, date_dim
 WHERE cs_sold_date_sk = d_date_sk
   AND d_date BETWEEN DATE '2000-08-01' AND DATE '2000-08-01' + 30
 GROUP BY cs_call_center_sk),
cr AS (
 SELECT cr_call_center_sk, SUM(cr_return_amount) returns_amt,
        SUM(cr_net_loss) profit_loss
 FROM catalog_returns, date_dim
 WHERE cr_returned_date_sk = d_date_sk
   AND d_date BETWEEN DATE '2000-08-01' AND DATE '2000-08-01' + 30
 GROUP BY cr_call_center_sk),
ws AS (
 SELECT wp_web_page_sk, SUM(ws_ext_sales_price) sales,
        SUM(ws_net_profit) profit
 FROM web_sales, date_dim, web_page
 WHERE ws_sold_date_sk = d_date_sk
   AND d_date BETWEEN DATE '2000-08-01' AND DATE '2000-08-01' + 30
   AND ws_web_page_sk = wp_web_page_sk
 GROUP BY wp_web_page_sk),
wr AS (
 SELECT wp_web_page_sk, SUM(wr_return_amt) returns_amt,
        SUM(wr_net_loss) profit_loss
 FROM web_returns, date_dim, web_page
 WHERE wr_returned_date_sk = d_date_sk
   AND d_date BETWEEN DATE '2000-08-01' AND DATE '2000-08-01' + 30
   AND wr_web_page_sk = wp_web_page_sk
 GROUP BY wp_web_page_sk)
SELECT channel, id, CAST(SUM(sales) AS DOUBLE) sales,
       CAST(SUM(returns_amt) AS DOUBLE) returns_amt,
       CAST(SUM(profit) AS DOUBLE) profit
FROM (SELECT 'store channel' channel, ss.s_store_sk id, sales,
             COALESCE(returns_amt, CAST(0 AS DECIMAL(12,2))) returns_amt,
             profit - COALESCE(profit_loss, CAST(0 AS DECIMAL(12,2))) profit
      FROM ss LEFT JOIN sr ON ss.s_store_sk = sr.s_store_sk
      UNION ALL
      SELECT 'catalog channel' channel, cs_call_center_sk id, sales,
             returns_amt, profit - profit_loss profit
      FROM cs, cr
      UNION ALL
      SELECT 'web channel' channel, ws.wp_web_page_sk id, sales,
             COALESCE(returns_amt, CAST(0 AS DECIMAL(12,2))) returns_amt,
             profit - COALESCE(profit_loss, CAST(0 AS DECIMAL(12,2))) profit
      FROM ws LEFT JOIN wr ON ws.wp_web_page_sk = wr.wp_web_page_sk) x
GROUP BY ROLLUP (channel, id)
ORDER BY channel ASC NULLS FIRST, id ASC NULLS FIRST,
         sales ASC NULLS FIRST, returns_amt ASC NULLS FIRST,
         profit ASC NULLS FIRST
LIMIT 100""")

  private val q79 = tq("tpcds_q79",
    Seq("store_sales", "date_dim", "store", "household_demographics", "customer"),
    """SELECT c_last_name, c_first_name, SUBSTR(s_city, 1, 30) s_city,
       ss_ticket_number, amt, profit
FROM (SELECT ss_ticket_number, ss_customer_sk, store.s_city,
             CAST(SUM(ss_coupon_amt) AS DOUBLE) amt,
             CAST(SUM(ss_net_profit) AS DOUBLE) profit
      FROM store_sales, date_dim, store, household_demographics
      WHERE store_sales.ss_sold_date_sk = date_dim.d_date_sk
        AND store_sales.ss_store_sk = store.s_store_sk
        AND store_sales.ss_hdemo_sk = household_demographics.hd_demo_sk
        AND (household_demographics.hd_dep_count = 0
             OR household_demographics.hd_vehicle_count > 0)
        AND date_dim.d_dow = 1
        AND date_dim.d_year IN (1999, 1999 + 1, 1999 + 2)
        AND store.s_number_employees BETWEEN 200 AND 295
      GROUP BY ss_ticket_number, ss_customer_sk, ss_addr_sk, store.s_city) ms,
     customer
WHERE ss_customer_sk = c_customer_sk
ORDER BY c_last_name ASC NULLS FIRST, c_first_name ASC NULLS FIRST,
         s_city ASC NULLS FIRST, profit ASC NULLS FIRST,
         ss_ticket_number ASC NULLS FIRST
LIMIT 100""")

  val defs: Seq[OpQuery] =
    Seq(q66, q68, q69, q70, q71, q73, q76, q77, q79)
}
