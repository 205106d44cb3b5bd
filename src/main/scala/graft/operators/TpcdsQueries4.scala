package graft.operators

import graft.OpQuery
import graft.sources.Tpcds

/** TPC-DS conformance sweep, part 4: returns-chain / multi-channel-ratio
  * tier (reference corpus TPCDSBenchmarkQueries.scala:1334-1735), same
  * conventions as [[TpcdsQueries]]. Generator-domain fits: store colors
  * are the 8-value i_color set ('navy'/'beige' have no counterpart),
  * s_market_id spans 1-6, the ss→sr→cs cross-channel chain is sparse at
  * small sf so the three date windows are year-wide.
  */
object TpcdsQueries4 {

  private def tq(name: String, tables: Seq[String], body: String): OpQuery =
    OpQuery(name, Some(Tpcds.oracle(tables, body)),
      (s, d) => { Tpcds.ensure(s, d); s.sql(body) })

  private def stddevExact(c: String): String =
    s"""CASE WHEN COUNT($c) > 1 THEN SQRT(GREATEST(
       (CAST(SUM(CAST($c AS BIGINT) * $c) AS DOUBLE)
        - CAST(SUM(CAST($c AS BIGINT)) AS DOUBLE) / COUNT($c)
          * CAST(SUM(CAST($c AS BIGINT)) AS DOUBLE))
       / (COUNT($c) - 1), CAST(0 AS DOUBLE))) ELSE CAST(NULL AS DOUBLE) END"""

  /** q24 body parameterized by color (the a/b variants differ only there,
    * exactly like the reference corpus). */
  private def q24body(color: String): String =
    s"""WITH ssales AS (
 SELECT c_last_name, c_first_name, s_store_name, ca_state, s_state, i_color,
        i_current_price, i_manager_id, i_units, i_size,
        SUM(ss_net_paid_inc_tax) netpaid
 FROM store_sales, store_returns, store, item, customer, customer_address
 WHERE ss_ticket_number = sr_ticket_number
   AND ss_item_sk = sr_item_sk
   AND ss_customer_sk = c_customer_sk
   AND ss_item_sk = i_item_sk
   AND ss_store_sk = s_store_sk
   AND c_current_addr_sk = ca_address_sk
   AND c_birth_country <> UPPER(ca_country)
   AND s_zip = ca_zip
   AND s_market_id = 5
 GROUP BY c_last_name, c_first_name, s_store_name, ca_state, s_state,
          i_color, i_current_price, i_manager_id, i_units, i_size)
SELECT c_last_name, c_first_name, s_store_name,
       CAST(SUM(netpaid) AS DOUBLE) paid
FROM ssales
WHERE i_color = '$color'
GROUP BY c_last_name, c_first_name, s_store_name
HAVING CAST(SUM(netpaid) AS DOUBLE) >
       (SELECT 0.05 * CAST(SUM(netpaid) AS DOUBLE) / COUNT(*) FROM ssales)
ORDER BY c_last_name ASC NULLS FIRST, c_first_name ASC NULLS FIRST,
         s_store_name ASC NULLS FIRST, paid ASC NULLS FIRST"""

  private val q24a = tq("tpcds_q24a",
    Seq("store_sales", "store_returns", "store", "item", "customer", "customer_address"),
    q24body("yellow"))

  private val q24b = tq("tpcds_q24b",
    Seq("store_sales", "store_returns", "store", "item", "customer", "customer_address"),
    q24body("blue"))

  private val q25 = tq("tpcds_q25",
    Seq("store_sales", "store_returns", "catalog_sales", "date_dim", "store", "item"),
    """SELECT i_item_id, i_item_desc, s_store_id, s_store_name,
       CAST(SUM(ss_net_profit) AS DOUBLE) store_sales_profit,
       CAST(SUM(sr_net_loss) AS DOUBLE) store_returns_loss,
       CAST(SUM(cs_net_profit) AS DOUBLE) catalog_sales_profit
FROM store_sales, store_returns, catalog_sales, date_dim d1, date_dim d2,
     date_dim d3, store, item
WHERE d1.d_year = 2000
  AND d1.d_date_sk = ss_sold_date_sk
  AND i_item_sk = ss_item_sk
  AND s_store_sk = ss_store_sk
  AND ss_customer_sk = sr_customer_sk
  AND ss_item_sk = sr_item_sk
  AND ss_ticket_number = sr_ticket_number
  AND sr_returned_date_sk = d2.d_date_sk
  AND d2.d_moy BETWEEN 1 AND 12
  AND d2.d_year = 2000
  AND sr_customer_sk = cs_bill_customer_sk
  AND sr_item_sk = cs_item_sk
  AND cs_sold_date_sk = d3.d_date_sk
  AND d3.d_moy BETWEEN 1 AND 12
  AND d3.d_year = 2001
GROUP BY i_item_id, i_item_desc, s_store_id, s_store_name
ORDER BY i_item_id ASC NULLS FIRST, i_item_desc ASC NULLS FIRST,
         s_store_id ASC NULLS FIRST, s_store_name ASC NULLS FIRST
LIMIT 100""")

  private val q26 = tq("tpcds_q26",
    Seq("catalog_sales", "customer_demographics", "date_dim", "item", "promotion"),
    """SELECT i_item_id,
       CAST(SUM(CAST(cs_quantity AS BIGINT)) AS DOUBLE) / COUNT(*) agg1,
       CAST(SUM(cs_list_price) AS DOUBLE) / COUNT(*) agg2,
       CAST(SUM(cs_coupon_amt) AS DOUBLE) / COUNT(*) agg3,
       CAST(SUM(cs_sales_price) AS DOUBLE) / COUNT(*) agg4
FROM catalog_sales, customer_demographics, date_dim, item, promotion
WHERE cs_sold_date_sk = d_date_sk AND cs_item_sk = i_item_sk
  AND cs_bill_cdemo_sk = cd_demo_sk AND cs_promo_sk = p_promo_sk
  AND cd_gender = 'F' AND cd_marital_status = 'M'
  AND cd_education_status = '2 yr Degree'
  AND (p_channel_email = 'N' OR p_channel_event = 'N')
  AND d_year = 2000
GROUP BY i_item_id
ORDER BY i_item_id ASC NULLS FIRST
LIMIT 100""")

  private val q27 = tq("tpcds_q27",
    Seq("store_sales", "customer_demographics", "date_dim", "store", "item"),
    """SELECT i_item_id, s_state, CAST(GROUPING(s_state) AS INT) g_state,
       CAST(SUM(CAST(ss_quantity AS BIGINT)) AS DOUBLE) / COUNT(*) agg1,
       CAST(SUM(ss_list_price) AS DOUBLE) / COUNT(*) agg2,
       CAST(SUM(ss_coupon_amt) AS DOUBLE) / COUNT(*) agg3,
       CAST(SUM(ss_sales_price) AS DOUBLE) / COUNT(*) agg4
FROM store_sales, customer_demographics, date_dim, store, item
WHERE ss_sold_date_sk = d_date_sk AND ss_item_sk = i_item_sk
  AND ss_store_sk = s_store_sk AND ss_cdemo_sk = cd_demo_sk
  AND cd_gender = 'F' AND cd_marital_status = 'S'
  AND cd_education_status = 'Advanced Degree'
  AND d_year = 2000
  AND s_state IN ('CA', 'TX', 'NY', 'FL', 'IL', 'OH')
GROUP BY ROLLUP (i_item_id, s_state)
ORDER BY i_item_id ASC NULLS FIRST, s_state ASC NULLS FIRST,
         g_state ASC NULLS FIRST, agg1 ASC NULLS FIRST, agg2 ASC NULLS FIRST,
         agg3 ASC NULLS FIRST, agg4 ASC NULLS FIRST
LIMIT 100""")

  private val q28 = tq("tpcds_q28",
    Seq("store_sales"),
    """SELECT * FROM
 (SELECT CAST(SUM(ss_list_price) AS DOUBLE) / COUNT(ss_list_price) b1_lp,
         COUNT(ss_list_price) b1_cnt, COUNT(DISTINCT ss_list_price) b1_cntd
  FROM store_sales
  WHERE ss_quantity BETWEEN 0 AND 5
    AND (ss_list_price BETWEEN 1100 AND 1210
         OR ss_coupon_amt BETWEEN 100 AND 1100
         OR ss_wholesale_cost BETWEEN 600 AND 800)) b1,
 (SELECT CAST(SUM(ss_list_price) AS DOUBLE) / COUNT(ss_list_price) b2_lp,
         COUNT(ss_list_price) b2_cnt, COUNT(DISTINCT ss_list_price) b2_cntd
  FROM store_sales
  WHERE ss_quantity BETWEEN 6 AND 10
    AND (ss_list_price BETWEEN 1210 AND 1320
         OR ss_coupon_amt BETWEEN 1100 AND 2100
         OR ss_wholesale_cost BETWEEN 650 AND 850)) b2,
 (SELECT CAST(SUM(ss_list_price) AS DOUBLE) / COUNT(ss_list_price) b3_lp,
         COUNT(ss_list_price) b3_cnt, COUNT(DISTINCT ss_list_price) b3_cntd
  FROM store_sales
  WHERE ss_quantity BETWEEN 11 AND 15
    AND (ss_list_price BETWEEN 1320 AND 1430
         OR ss_coupon_amt BETWEEN 2100 AND 3100
         OR ss_wholesale_cost BETWEEN 700 AND 900)) b3,
 (SELECT CAST(SUM(ss_list_price) AS DOUBLE) / COUNT(ss_list_price) b4_lp,
         COUNT(ss_list_price) b4_cnt, COUNT(DISTINCT ss_list_price) b4_cntd
  FROM store_sales
  WHERE ss_quantity BETWEEN 16 AND 20
    AND (ss_list_price BETWEEN 1430 AND 1540
         OR ss_coupon_amt BETWEEN 3100 AND 4100
         OR ss_wholesale_cost BETWEEN 750 AND 950)) b4,
 (SELECT CAST(SUM(ss_list_price) AS DOUBLE) / COUNT(ss_list_price) b5_lp,
         COUNT(ss_list_price) b5_cnt, COUNT(DISTINCT ss_list_price) b5_cntd
  FROM store_sales
  WHERE ss_quantity BETWEEN 21 AND 25
    AND (ss_list_price BETWEEN 1540 AND 1650
         OR ss_coupon_amt BETWEEN 4100 AND 5100
         OR ss_wholesale_cost BETWEEN 800 AND 1000)) b5,
 (SELECT CAST(SUM(ss_list_price) AS DOUBLE) / COUNT(ss_list_price) b6_lp,
         COUNT(ss_list_price) b6_cnt, COUNT(DISTINCT ss_list_price) b6_cntd
  FROM store_sales
  WHERE ss_quantity BETWEEN 26 AND 30
    AND (ss_list_price BETWEEN 1650 AND 1760
         OR ss_coupon_amt BETWEEN 5100 AND 6100
         OR ss_wholesale_cost BETWEEN 850 AND 1050)) b6
LIMIT 100""")

  private val q29 = tq("tpcds_q29",
    Seq("store_sales", "store_returns", "catalog_sales", "date_dim", "store", "item"),
    s"""SELECT i_item_id, i_item_desc, s_store_id, s_store_name,
       ${stddevExact("ss_quantity")} store_sales_quantity,
       ${stddevExact("sr_return_quantity")} store_returns_quantity,
       ${stddevExact("cs_quantity")} catalog_sales_quantity
FROM store_sales, store_returns, catalog_sales, date_dim d1, date_dim d2,
     date_dim d3, store, item
WHERE d1.d_year = 2000
  AND d1.d_date_sk = ss_sold_date_sk
  AND i_item_sk = ss_item_sk
  AND s_store_sk = ss_store_sk
  AND ss_customer_sk = sr_customer_sk
  AND ss_item_sk = sr_item_sk
  AND ss_ticket_number = sr_ticket_number
  AND sr_returned_date_sk = d2.d_date_sk
  AND d2.d_moy BETWEEN 1 AND 12
  AND d2.d_year = 2000
  AND sr_customer_sk = cs_bill_customer_sk
  AND sr_item_sk = cs_item_sk
  AND cs_sold_date_sk = d3.d_date_sk
  AND d3.d_year IN (2000, 2000 + 1)
GROUP BY i_item_id, i_item_desc, s_store_id, s_store_name
ORDER BY i_item_id ASC NULLS FIRST, i_item_desc ASC NULLS FIRST,
         s_store_id ASC NULLS FIRST, s_store_name ASC NULLS FIRST
LIMIT 100""")

  private val q30 = tq("tpcds_q30",
    Seq("web_returns", "date_dim", "customer_address", "customer"),
    """WITH customer_total_return AS (
 SELECT wr_returning_customer_sk ctr_customer_sk, ca_state ctr_state,
        SUM(wr_return_amt) ctr_total_return
 FROM web_returns, date_dim, customer_address
 WHERE wr_returned_date_sk = d_date_sk AND d_year = 2000
   AND wr_returning_addr_sk = ca_address_sk
 GROUP BY wr_returning_customer_sk, ca_state)
SELECT c_customer_id, c_salutation, c_first_name, c_last_name,
       c_preferred_cust_flag, c_birth_day, c_birth_month, c_birth_year,
       c_birth_country, c_login, c_email_address, c_last_review_date_sk,
       CAST(ctr_total_return AS DOUBLE) ctr_total_return
FROM customer_total_return ctr1, customer_address, customer
WHERE ctr1.ctr_total_return >
      (SELECT CAST(SUM(ctr_total_return) AS DOUBLE) / COUNT(*) * 1.2
       FROM customer_total_return ctr2
       WHERE ctr1.ctr_state = ctr2.ctr_state)
  AND ca_address_sk = c_current_addr_sk
  AND ca_state = 'GA'
  AND ctr1.ctr_customer_sk = c_customer_sk
ORDER BY c_customer_id ASC NULLS FIRST, c_salutation ASC NULLS FIRST,
         c_first_name ASC NULLS FIRST, c_last_name ASC NULLS FIRST,
         c_preferred_cust_flag ASC NULLS FIRST, c_birth_day ASC NULLS FIRST,
         c_birth_month ASC NULLS FIRST, c_birth_year ASC NULLS FIRST,
         c_birth_country ASC NULLS FIRST, c_login ASC NULLS FIRST,
         c_email_address ASC NULLS FIRST,
         c_last_review_date_sk ASC NULLS FIRST,
         ctr_total_return ASC NULLS FIRST
LIMIT 100""")

  private val q31 = tq("tpcds_q31",
    Seq("store_sales", "web_sales", "date_dim", "customer_address"),
    """WITH ss AS (
 SELECT ca_county, d_qoy, d_year, SUM(ss_ext_sales_price) store_sales
 FROM store_sales, date_dim, customer_address
 WHERE ss_sold_date_sk = d_date_sk AND ss_addr_sk = ca_address_sk
 GROUP BY ca_county, d_qoy, d_year),
ws AS (
 SELECT ca_county, d_qoy, d_year, SUM(ws_ext_sales_price) web_sales
 FROM web_sales, date_dim, customer_address
 WHERE ws_sold_date_sk = d_date_sk AND ws_bill_addr_sk = ca_address_sk
 GROUP BY ca_county, d_qoy, d_year)
SELECT ss1.ca_county, ss1.d_year,
       CAST(ws2.web_sales AS DOUBLE) / CAST(ws1.web_sales AS DOUBLE) web_q1_q2_increase,
       CAST(ss2.store_sales AS DOUBLE) / CAST(ss1.store_sales AS DOUBLE) store_q1_q2_increase,
       CAST(ws3.web_sales AS DOUBLE) / CAST(ws2.web_sales AS DOUBLE) web_q2_q3_increase,
       CAST(ss3.store_sales AS DOUBLE) / CAST(ss2.store_sales AS DOUBLE) store_q2_q3_increase
FROM ss ss1, ss ss2, ss ss3, ws ws1, ws ws2, ws ws3
WHERE ss1.d_qoy = 1 AND ss1.d_year = 2000
  AND ss1.ca_county = ss2.ca_county
  AND ss2.d_qoy = 2 AND ss2.d_year = 2000
  AND ss2.ca_county = ss3.ca_county
  AND ss3.d_qoy = 3 AND ss3.d_year = 2000
  AND ss1.ca_county = ws1.ca_county
  AND ws1.d_qoy = 1 AND ws1.d_year = 2000
  AND ws1.ca_county = ws2.ca_county
  AND ws2.d_qoy = 2 AND ws2.d_year = 2000
  AND ws1.ca_county = ws3.ca_county
  AND ws3.d_qoy = 3 AND ws3.d_year = 2000
  AND CASE WHEN ws1.web_sales > 0
           THEN CAST(ws2.web_sales AS DOUBLE) / CAST(ws1.web_sales AS DOUBLE)
           ELSE NULL END
      > CASE WHEN ss1.store_sales > 0
             THEN CAST(ss2.store_sales AS DOUBLE) / CAST(ss1.store_sales AS DOUBLE)
             ELSE NULL END
  AND CASE WHEN ws2.web_sales > 0
           THEN CAST(ws3.web_sales AS DOUBLE) / CAST(ws2.web_sales AS DOUBLE)
           ELSE NULL END
      > CASE WHEN ss2.store_sales > 0
             THEN CAST(ss3.store_sales AS DOUBLE) / CAST(ss2.store_sales AS DOUBLE)
             ELSE NULL END
ORDER BY ss1.ca_county ASC NULLS FIRST""")

  private val q32 = tq("tpcds_q32",
    Seq("catalog_sales", "item", "date_dim"),
    """SELECT CAST(SUM(cs_ext_discount_amt) AS DOUBLE) excess_discount_amount
FROM catalog_sales, item, date_dim
WHERE i_manufact_id = 948
  AND i_item_sk = cs_item_sk
  AND d_date BETWEEN DATE '2000-02-03' AND DATE '2000-02-03' + 90
  AND d_date_sk = cs_sold_date_sk
  AND cs_ext_discount_amt >
      (SELECT 1.3 * CAST(SUM(cs_ext_discount_amt) AS DOUBLE) / COUNT(*)
       FROM catalog_sales, date_dim
       WHERE cs_item_sk = i_item_sk
         AND d_date BETWEEN DATE '2000-02-03' AND DATE '2000-02-03' + 90
         AND d_date_sk = cs_sold_date_sk)""")

  val defs: Seq[OpQuery] =
    Seq(q24a, q24b, q25, q26, q27, q28, q29, q30, q31, q32)
}
