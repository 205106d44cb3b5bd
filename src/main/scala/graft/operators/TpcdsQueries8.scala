package graft.operators

import graft.OpQuery
import graft.sources.Tpcds

/** TPC-DS conformance sweep, part 8 (reference corpus
  * TPCDSBenchmarkQueries.scala:4051-4547): channel P&L with promo
  * filters, state return outliers, inventory/price probes, tri-channel
  * return quantities, income-band customer lookups, reason-coded return
  * averages and hierarchy ranks. Generator fits: web_returns carries
  * returning-side demo/addr keys only (the refunded-side joins use
  * them), wp_char_count is 100-800, income bands are 10000-wide.
  */
object TpcdsQueries8 {

  private def tq(name: String, tables: Seq[String], body: String): OpQuery =
    OpQuery(name, Some(Tpcds.oracle(tables, body)),
      (s, d) => { Tpcds.ensure(s, d); s.sql(body) })

  private val q80 = tq("tpcds_q80",
    Seq("store_sales", "store_returns", "catalog_sales", "catalog_returns",
      "web_sales", "web_returns", "date_dim", "store", "catalog_page",
      "web_site", "item", "promotion"),
    """WITH ssr AS (
 SELECT s_store_id store_id, SUM(ss_ext_sales_price) sales,
        SUM(COALESCE(sr_return_amt, CAST(0 AS DECIMAL(12,2)))) returns_amt,
        SUM(ss_net_profit - COALESCE(sr_net_loss, CAST(0 AS DECIMAL(12,2)))) profit
 FROM store_sales
 LEFT OUTER JOIN store_returns ON (ss_item_sk = sr_item_sk
                                   AND ss_ticket_number = sr_ticket_number),
      date_dim, store, item, promotion
 WHERE ss_sold_date_sk = d_date_sk
   AND d_date BETWEEN DATE '2000-08-12' AND DATE '2000-08-12' + 60
   AND ss_store_sk = s_store_sk
   AND ss_item_sk = i_item_sk
   AND i_current_price > 950
   AND ss_promo_sk = p_promo_sk
   AND p_channel_tv = 'N'
 GROUP BY s_store_id),
csr AS (
 SELECT cp_catalog_page_id catalog_page_id, SUM(cs_ext_sales_price) sales,
        SUM(COALESCE(cr_return_amount, CAST(0 AS DECIMAL(12,2)))) returns_amt,
        SUM(cs_net_profit - COALESCE(cr_net_loss, CAST(0 AS DECIMAL(12,2)))) profit
 FROM catalog_sales
 LEFT OUTER JOIN catalog_returns ON (cs_item_sk = cr_item_sk
                                     AND cs_order_number = cr_order_number),
      date_dim, catalog_page, item, promotion
 WHERE cs_sold_date_sk = d_date_sk
   AND d_date BETWEEN DATE '2000-08-12' AND DATE '2000-08-12' + 60
   AND cs_catalog_page_sk = cp_catalog_page_sk
   AND cs_item_sk = i_item_sk
   AND i_current_price > 950
   AND cs_promo_sk = p_promo_sk
   AND p_channel_tv = 'N'
 GROUP BY cp_catalog_page_id),
wsr AS (
 SELECT web_site_id, SUM(ws_ext_sales_price) sales,
        SUM(COALESCE(wr_return_amt, CAST(0 AS DECIMAL(12,2)))) returns_amt,
        SUM(ws_net_profit - COALESCE(wr_net_loss, CAST(0 AS DECIMAL(12,2)))) profit
 FROM web_sales
 LEFT OUTER JOIN web_returns ON (ws_item_sk = wr_item_sk
                                 AND ws_order_number = wr_order_number),
      date_dim, web_site, item, promotion
 WHERE ws_sold_date_sk = d_date_sk
   AND d_date BETWEEN DATE '2000-08-12' AND DATE '2000-08-12' + 60
   AND ws_web_site_sk = web_site_sk
   AND ws_item_sk = i_item_sk
   AND i_current_price > 950
   AND ws_promo_sk = p_promo_sk
   AND p_channel_tv = 'N'
 GROUP BY web_site_id)
SELECT channel, id, CAST(SUM(sales) AS DOUBLE) sales,
       CAST(SUM(returns_amt) AS DOUBLE) returns_amt,
       CAST(SUM(profit) AS DOUBLE) profit
FROM (SELECT 'store channel' channel, 'store' || store_id id, sales,
             returns_amt, profit
      FROM ssr
      UNION ALL
      SELECT 'catalog channel' channel, 'catalog_page' || catalog_page_id id,
             sales, returns_amt, profit
      FROM csr
      UNION ALL
      SELECT 'web channel' channel, 'web_site' || web_site_id id, sales,
             returns_amt, profit
      FROM wsr) x
GROUP BY ROLLUP (channel, id)
ORDER BY channel ASC NULLS FIRST, id ASC NULLS FIRST,
         sales ASC NULLS FIRST, returns_amt ASC NULLS FIRST,
         profit ASC NULLS FIRST
LIMIT 100""")

  private val q81 = tq("tpcds_q81",
    Seq("catalog_returns", "date_dim", "customer_address", "customer"),
    """WITH customer_total_return AS (
 SELECT cr_returning_customer_sk ctr_customer_sk, ca_state ctr_state,
        SUM(cr_return_amt_inc_tax) ctr_total_return
 FROM catalog_returns, date_dim, customer_address
 WHERE cr_returned_date_sk = d_date_sk AND d_year = 2000
   AND cr_returning_addr_sk = ca_address_sk
 GROUP BY cr_returning_customer_sk, ca_state)
SELECT c_customer_id, c_salutation, c_first_name, c_last_name,
       ca_street_number, ca_street_name, ca_street_type, ca_suite_number,
       ca_city, ca_county, ca_state, ca_zip, ca_country,
       CAST(ca_gmt_offset AS DOUBLE) ca_gmt_offset, ca_location_type,
       CAST(ctr_total_return AS DOUBLE) ctr_total_return
FROM customer_total_return ctr1, customer_address, customer
WHERE ctr1.ctr_total_return >
      (SELECT CAST(SUM(ctr_total_return) AS DOUBLE) / COUNT(*) * 1.2
       FROM customer_total_return ctr2
       WHERE ctr1.ctr_state = ctr2.ctr_state)
  AND ca_address_sk = c_current_addr_sk
  AND ca_state = 'NC'
  AND ctr1.ctr_customer_sk = c_customer_sk
ORDER BY c_customer_id ASC NULLS FIRST, c_salutation ASC NULLS FIRST,
         c_first_name ASC NULLS FIRST, c_last_name ASC NULLS FIRST,
         ca_street_number ASC NULLS FIRST, ca_street_name ASC NULLS FIRST,
         ca_street_type ASC NULLS FIRST, ca_suite_number ASC NULLS FIRST,
         ca_city ASC NULLS FIRST, ca_county ASC NULLS FIRST,
         ca_state ASC NULLS FIRST, ca_zip ASC NULLS FIRST,
         ca_country ASC NULLS FIRST, ca_gmt_offset ASC NULLS FIRST,
         ca_location_type ASC NULLS FIRST, ctr_total_return ASC NULLS FIRST
LIMIT 100""")

  private val q82 = tq("tpcds_q82",
    Seq("item", "inventory", "date_dim", "store_sales"),
    """SELECT i_item_id, i_item_desc, CAST(i_current_price AS DOUBLE) i_current_price
FROM item, inventory, date_dim, store_sales
WHERE i_current_price BETWEEN 920 AND 920 + 60
  AND inv_item_sk = i_item_sk
  AND d_date_sk = inv_date_sk
  AND d_date BETWEEN DATE '2000-03-10' AND DATE '2000-03-10' + 60
  AND i_manufact_id IN (112, 812, 512, 212)
  AND inv_quantity_on_hand BETWEEN 100 AND 500
  AND ss_item_sk = i_item_sk
GROUP BY i_item_id, i_item_desc, i_current_price
ORDER BY i_item_id ASC NULLS FIRST, i_item_desc ASC NULLS FIRST,
         i_current_price ASC NULLS FIRST
LIMIT 100""")

  private val q83 = tq("tpcds_q83",
    Seq("store_returns", "catalog_returns", "web_returns", "item", "date_dim"),
    """WITH sr_items AS (
 SELECT i_item_id item_id, SUM(CAST(sr_return_quantity AS BIGINT)) sr_item_qty
 FROM store_returns, item, date_dim
 WHERE sr_item_sk = i_item_sk
   AND d_date IN (SELECT d_date FROM date_dim
                  WHERE d_month_seq IN (SELECT d_month_seq FROM date_dim
                                       WHERE d_date IN (DATE '2000-04-14',
                                                        DATE '2000-09-28',
                                                        DATE '2000-11-12')))
   AND sr_returned_date_sk = d_date_sk
 GROUP BY i_item_id),
cr_items AS (
 SELECT i_item_id item_id, SUM(CAST(cr_return_quantity AS BIGINT)) cr_item_qty
 FROM catalog_returns, item, date_dim
 WHERE cr_item_sk = i_item_sk
   AND d_date IN (SELECT d_date FROM date_dim
                  WHERE d_month_seq IN (SELECT d_month_seq FROM date_dim
                                       WHERE d_date IN (DATE '2000-04-14',
                                                        DATE '2000-09-28',
                                                        DATE '2000-11-12')))
   AND cr_returned_date_sk = d_date_sk
 GROUP BY i_item_id),
wr_items AS (
 SELECT i_item_id item_id, SUM(CAST(wr_return_quantity AS BIGINT)) wr_item_qty
 FROM web_returns, item, date_dim
 WHERE wr_item_sk = i_item_sk
   AND d_date IN (SELECT d_date FROM date_dim
                  WHERE d_month_seq IN (SELECT d_month_seq FROM date_dim
                                       WHERE d_date IN (DATE '2000-04-14',
                                                        DATE '2000-09-28',
                                                        DATE '2000-11-12')))
   AND wr_returned_date_sk = d_date_sk
 GROUP BY i_item_id)
SELECT sr_items.item_id, CAST(sr_item_qty AS BIGINT) sr_item_qty,
       CAST(sr_item_qty AS DOUBLE)
         / CAST(sr_item_qty + cr_item_qty + wr_item_qty AS DOUBLE)
         / 3.0 * 100 sr_dev,
       CAST(cr_item_qty AS BIGINT) cr_item_qty,
       CAST(cr_item_qty AS DOUBLE)
         / CAST(sr_item_qty + cr_item_qty + wr_item_qty AS DOUBLE)
         / 3.0 * 100 cr_dev,
       CAST(wr_item_qty AS BIGINT) wr_item_qty,
       CAST(wr_item_qty AS DOUBLE)
         / CAST(sr_item_qty + cr_item_qty + wr_item_qty AS DOUBLE)
         / 3.0 * 100 wr_dev,
       CAST(sr_item_qty + cr_item_qty + wr_item_qty AS DOUBLE) / 3.0 average
FROM sr_items, cr_items, wr_items
WHERE sr_items.item_id = cr_items.item_id
  AND sr_items.item_id = wr_items.item_id
ORDER BY sr_items.item_id ASC NULLS FIRST, sr_item_qty ASC NULLS FIRST
LIMIT 100""")

  private val q84 = tq("tpcds_q84",
    Seq("customer", "customer_address", "customer_demographics",
      "household_demographics", "income_band", "store_returns"),
    """SELECT c_customer_id customer_id,
       COALESCE(c_last_name, '') || ', ' || COALESCE(c_first_name, '')
         customername
FROM customer, customer_address, customer_demographics,
     household_demographics, income_band, store_returns
WHERE ca_city = 'City4'
  AND c_current_addr_sk = ca_address_sk
  AND ib_lower_bound >= 5019
  AND ib_upper_bound <= 5019 + 150000
  AND ib_income_band_sk = hd_income_band_sk
  AND cd_demo_sk = c_current_cdemo_sk
  AND hd_demo_sk = c_current_hdemo_sk
  AND sr_cdemo_sk = cd_demo_sk
ORDER BY c_customer_id ASC NULLS FIRST, customername ASC NULLS FIRST
LIMIT 100""")

  private val q85 = tq("tpcds_q85",
    Seq("web_sales", "web_returns", "web_page", "customer_demographics",
      "customer_address", "date_dim", "reason"),
    """SELECT SUBSTR(r_reason_desc, 1, 20) reason_desc,
       CAST(SUM(CAST(ws_quantity AS BIGINT)) AS DOUBLE) / COUNT(*) avg_qty,
       CAST(SUM(wr_refunded_cash) AS DOUBLE) / COUNT(*) avg_refunded,
       CAST(SUM(wr_fee) AS DOUBLE) / COUNT(*) avg_fee
FROM web_sales, web_returns, web_page, customer_demographics cd1,
     customer_demographics cd2, customer_address, date_dim, reason
WHERE ws_web_page_sk = wp_web_page_sk
  AND ws_item_sk = wr_item_sk
  AND ws_order_number = wr_order_number
  AND ws_sold_date_sk = d_date_sk AND d_year = 2000
  AND cd1.cd_demo_sk = wr_returning_cdemo_sk
  AND cd2.cd_demo_sk = ws_bill_cdemo_sk
  AND ca_address_sk = wr_returning_addr_sk
  AND r_reason_sk = wr_reason_sk
  AND ((cd1.cd_marital_status = 'S'
        AND cd1.cd_marital_status = cd2.cd_marital_status
        AND cd1.cd_education_status = '2 yr Degree'
        AND cd1.cd_education_status = cd2.cd_education_status
        AND ws_sales_price BETWEEN 50.00 AND 2000.00)
       OR (cd1.cd_marital_status = 'D'
           AND cd1.cd_marital_status = cd2.cd_marital_status
           AND cd1.cd_education_status = 'Advanced Degree'
           AND cd1.cd_education_status = cd2.cd_education_status
           AND ws_sales_price BETWEEN 100.00 AND 5000.00)
       OR (cd1.cd_marital_status = 'W'
           AND cd1.cd_marital_status = cd2.cd_marital_status
           AND cd1.cd_education_status = '4 yr Degree'
           AND cd1.cd_education_status = cd2.cd_education_status
           AND ws_sales_price BETWEEN 150.00 AND 30000.00))
  AND ((ca_country = 'United States' AND ca_state IN ('OK', 'TX', 'MO', 'CA')
        AND ws_net_profit BETWEEN 0 AND 10000)
       OR (ca_country = 'United States' AND ca_state IN ('GA', 'KS', 'NC', 'NY')
           AND ws_net_profit BETWEEN 50 AND 20000)
       OR (ca_country = 'United States' AND ca_state IN ('VA', 'MI', 'MN', 'OH')
           AND ws_net_profit BETWEEN 100 AND 40000))
GROUP BY r_reason_desc
ORDER BY reason_desc ASC NULLS FIRST, avg_qty ASC NULLS FIRST,
         avg_refunded ASC NULLS FIRST, avg_fee ASC NULLS FIRST
LIMIT 100""")

  private val q86 = tq("tpcds_q86",
    Seq("web_sales", "date_dim", "item"),
    """SELECT CAST(SUM(ws_net_paid) AS DOUBLE) total_sum, i_category, i_class,
       CAST(GROUPING(i_category) + GROUPING(i_class) AS INT) lochierarchy,
       CAST(RANK() OVER (
         PARTITION BY GROUPING(i_category) + GROUPING(i_class),
                      CASE WHEN GROUPING(i_class) = 0 THEN i_category END
         ORDER BY CAST(SUM(ws_net_paid) AS DOUBLE) DESC) AS BIGINT)
         rank_within_parent
FROM web_sales, date_dim d1, item
WHERE d1.d_month_seq BETWEEN 120 AND 120 + 11
  AND d1.d_date_sk = ws_sold_date_sk
  AND i_item_sk = ws_item_sk
GROUP BY ROLLUP (i_category, i_class)
ORDER BY lochierarchy DESC NULLS LAST,
         CASE WHEN lochierarchy = 0 THEN i_category END ASC NULLS FIRST,
         rank_within_parent ASC NULLS FIRST, i_category ASC NULLS FIRST,
         i_class ASC NULLS FIRST
LIMIT 100""")

  private val q87 = tq("tpcds_q87",
    Seq("store_sales", "catalog_sales", "web_sales", "date_dim", "customer"),
    """SELECT COUNT(*) cnt
FROM ((SELECT DISTINCT c_last_name, c_first_name, d_date
       FROM store_sales, date_dim, customer
       WHERE store_sales.ss_sold_date_sk = date_dim.d_date_sk
         AND store_sales.ss_customer_sk = customer.c_customer_sk
         AND d_month_seq BETWEEN 120 AND 120 + 11)
      EXCEPT
      (SELECT DISTINCT c_last_name, c_first_name, d_date
       FROM catalog_sales, date_dim, customer
       WHERE catalog_sales.cs_sold_date_sk = date_dim.d_date_sk
         AND catalog_sales.cs_bill_customer_sk = customer.c_customer_sk
         AND d_month_seq BETWEEN 120 AND 120 + 11)
      EXCEPT
      (SELECT DISTINCT c_last_name, c_first_name, d_date
       FROM web_sales, date_dim, customer
       WHERE web_sales.ws_sold_date_sk = date_dim.d_date_sk
         AND web_sales.ws_bill_customer_sk = customer.c_customer_sk
         AND d_month_seq BETWEEN 120 AND 120 + 11)) cool_cust""")

  private val q89 = tq("tpcds_q89",
    Seq("item", "store_sales", "date_dim", "store"),
    """SELECT * FROM (
 SELECT i_category, i_class, i_brand, s_store_name, s_company_name, d_moy,
        CAST(SUM(ss_sales_price) AS DOUBLE) sum_sales,
        CAST(SUM(SUM(ss_sales_price)) OVER (PARTITION BY i_category, i_brand,
             s_store_name, s_company_name) AS DOUBLE)
          / COUNT(*) OVER (PARTITION BY i_category, i_brand, s_store_name,
             s_company_name) avg_monthly_sales
 FROM item, store_sales, date_dim, store
 WHERE ss_item_sk = i_item_sk AND ss_sold_date_sk = d_date_sk
   AND ss_store_sk = s_store_sk
   AND d_year IN (2000)
   AND ((i_category IN ('Women', 'Music', 'Home')
         AND i_class IN ('STANDARD', 'SMALL', 'ECONOMY'))
        OR (i_category IN ('Books', 'Men', 'Children')
            AND i_class IN ('PROMO', 'MEDIUM', 'LARGE')))
 GROUP BY i_category, i_class, i_brand, s_store_name, s_company_name,
          d_moy) tmp1
WHERE CASE WHEN avg_monthly_sales <> 0
           THEN ABS(sum_sales - avg_monthly_sales) / avg_monthly_sales
           ELSE NULL END > 0.1
ORDER BY sum_sales - avg_monthly_sales ASC NULLS FIRST,
         s_store_name ASC NULLS FIRST, i_category ASC NULLS FIRST,
         i_class ASC NULLS FIRST, i_brand ASC NULLS FIRST,
         s_company_name ASC NULLS FIRST, d_moy ASC NULLS FIRST,
         sum_sales ASC NULLS FIRST
LIMIT 100""")

  private val q90 = tq("tpcds_q90",
    Seq("web_sales", "household_demographics", "time_dim", "web_page"),
    """SELECT CAST(amc AS DOUBLE) / CAST(pmc AS DOUBLE) am_pm_ratio
FROM (SELECT COUNT(*) amc
      FROM web_sales, household_demographics, time_dim, web_page
      WHERE ws_sold_time_sk = time_dim.t_time_sk
        AND ws_ship_hdemo_sk = household_demographics.hd_demo_sk
        AND ws_web_page_sk = web_page.wp_web_page_sk
        AND time_dim.t_hour BETWEEN 8 AND 8 + 1
        AND household_demographics.hd_dep_count = 4
        AND web_page.wp_char_count BETWEEN 300 AND 500) at_,
     (SELECT COUNT(*) pmc
      FROM web_sales, household_demographics, time_dim, web_page
      WHERE ws_sold_time_sk = time_dim.t_time_sk
        AND ws_ship_hdemo_sk = household_demographics.hd_demo_sk
        AND ws_web_page_sk = web_page.wp_web_page_sk
        AND time_dim.t_hour BETWEEN 19 AND 19 + 1
        AND household_demographics.hd_dep_count = 4
        AND web_page.wp_char_count BETWEEN 300 AND 500) pt
ORDER BY am_pm_ratio ASC NULLS FIRST
LIMIT 100""")

  val defs: Seq[OpQuery] =
    Seq(q80, q81, q82, q83, q84, q85, q86, q87, q89, q90)
}
