package graft.operators

import graft.OpQuery
import graft.sources.Tpcds

/** TPC-DS conformance sweep, part 2: the report-shaped corpus tier
  * (reference corpus TPCDSBenchmarkQueries.scala:21-518, 1018-2133,
  * 2860-2903, 4651-4682), re-authored from the public TPC-DS v2.13 spec
  * under the same dialect-common + determinism conventions as
  * [[TpcdsQueries]] (see that file's header), parameters fitted to the
  * graft synthetic generator domains (years 1995-2001, County0-29,
  * 8-state store list, 5-char numeric zips).
  *
  * Includes the incremental-refresh protocol's own query set — q34, q42,
  * q59 complete it (q3, q9 were already ported); the reference runs
  * exactly {q3,q9,q34,q42,q59} before/after every refresh round
  * (IncrementalTPCDSBenchmark.scala:119).
  */
object TpcdsQueries2 {

  private def tq(name: String, tables: Seq[String], body: String): OpQuery =
    OpQuery(name, Some(Tpcds.oracle(tables, body)),
      (s, d) => { Tpcds.ensure(s, d); s.sql(body) })

  private val q1 = tq("tpcds_q1",
    Seq("store_returns", "date_dim", "store", "customer"),
    """WITH customer_total_return AS (
 SELECT sr_customer_sk ctr_customer_sk, sr_store_sk ctr_store_sk,
        SUM(sr_fee) ctr_total_return
 FROM store_returns, date_dim
 WHERE sr_returned_date_sk = d_date_sk AND d_year = 2000
 GROUP BY sr_customer_sk, sr_store_sk)
SELECT c_customer_id
FROM customer_total_return ctr1, store, customer
WHERE ctr1.ctr_total_return >
      (SELECT CAST(SUM(ctr_total_return) AS DOUBLE) / COUNT(*) * 1.2
       FROM customer_total_return ctr2
       WHERE ctr1.ctr_store_sk = ctr2.ctr_store_sk)
  AND s_store_sk = ctr1.ctr_store_sk
  AND s_state = 'TX'
  AND ctr1.ctr_customer_sk = c_customer_sk
ORDER BY c_customer_id ASC NULLS FIRST
LIMIT 100""")

  private val q2 = tq("tpcds_q2",
    Seq("web_sales", "catalog_sales", "date_dim"),
    """WITH wscs AS (
 SELECT sold_date_sk, sales_price
 FROM (SELECT ws_sold_date_sk sold_date_sk, ws_ext_sales_price sales_price
       FROM web_sales
       UNION ALL
       SELECT cs_sold_date_sk sold_date_sk, cs_ext_sales_price sales_price
       FROM catalog_sales) x),
wswscs AS (
 SELECT d_week_seq,
        SUM(CASE WHEN d_day_name = 'Sunday' THEN sales_price ELSE NULL END) sun_sales,
        SUM(CASE WHEN d_day_name = 'Monday' THEN sales_price ELSE NULL END) mon_sales,
        SUM(CASE WHEN d_day_name = 'Tuesday' THEN sales_price ELSE NULL END) tue_sales,
        SUM(CASE WHEN d_day_name = 'Wednesday' THEN sales_price ELSE NULL END) wed_sales,
        SUM(CASE WHEN d_day_name = 'Thursday' THEN sales_price ELSE NULL END) thu_sales,
        SUM(CASE WHEN d_day_name = 'Friday' THEN sales_price ELSE NULL END) fri_sales,
        SUM(CASE WHEN d_day_name = 'Saturday' THEN sales_price ELSE NULL END) sat_sales
 FROM wscs, date_dim
 WHERE d_date_sk = sold_date_sk
 GROUP BY d_week_seq)
SELECT d_week_seq1,
       ROUND(CAST(sun_sales1 AS DOUBLE) / CAST(sun_sales2 AS DOUBLE), 2) r_sun,
       ROUND(CAST(mon_sales1 AS DOUBLE) / CAST(mon_sales2 AS DOUBLE), 2) r_mon,
       ROUND(CAST(tue_sales1 AS DOUBLE) / CAST(tue_sales2 AS DOUBLE), 2) r_tue,
       ROUND(CAST(wed_sales1 AS DOUBLE) / CAST(wed_sales2 AS DOUBLE), 2) r_wed,
       ROUND(CAST(thu_sales1 AS DOUBLE) / CAST(thu_sales2 AS DOUBLE), 2) r_thu,
       ROUND(CAST(fri_sales1 AS DOUBLE) / CAST(fri_sales2 AS DOUBLE), 2) r_fri,
       ROUND(CAST(sat_sales1 AS DOUBLE) / CAST(sat_sales2 AS DOUBLE), 2) r_sat
FROM (SELECT wswscs.d_week_seq d_week_seq1, sun_sales sun_sales1,
             mon_sales mon_sales1, tue_sales tue_sales1, wed_sales wed_sales1,
             thu_sales thu_sales1, fri_sales fri_sales1, sat_sales sat_sales1
      FROM wswscs, date_dim
      WHERE date_dim.d_week_seq = wswscs.d_week_seq AND d_year = 1999) y,
     (SELECT wswscs.d_week_seq d_week_seq2, sun_sales sun_sales2,
             mon_sales mon_sales2, tue_sales tue_sales2, wed_sales wed_sales2,
             thu_sales thu_sales2, fri_sales fri_sales2, sat_sales sat_sales2
      FROM wswscs, date_dim
      WHERE date_dim.d_week_seq = wswscs.d_week_seq AND d_year = 2000) z
WHERE d_week_seq1 = d_week_seq2 - 53
ORDER BY d_week_seq1 ASC NULLS FIRST""")

  /** q3/q34/q42/q59 bodies are shared with the incremental-refresh
    * protocol sweep ([[BenchExtras.refreshProtocol]]), which re-points
    * `store_sales` at a snapshot table between MERGE rounds. */
  private[operators] val q3Body = """SELECT dt.d_year, item.i_brand_id brand_id, item.i_brand brand,
       CAST(SUM(ss_sales_price) AS DOUBLE) sum_agg
FROM date_dim dt, store_sales, item
WHERE dt.d_date_sk = store_sales.ss_sold_date_sk
  AND store_sales.ss_item_sk = item.i_item_sk
  AND item.i_manufact_id = 128
  AND dt.d_moy = 11
GROUP BY dt.d_year, item.i_brand, item.i_brand_id
ORDER BY dt.d_year ASC NULLS FIRST, sum_agg DESC NULLS LAST,
         brand_id ASC NULLS FIRST, brand ASC NULLS FIRST
LIMIT 100"""

  private val q3 = tq("tpcds_q3",
    Seq("date_dim", "store_sales", "item"), q3Body)

  private val q6 = tq("tpcds_q6",
    Seq("customer_address", "customer", "store_sales", "date_dim", "item"),
    """SELECT a.ca_state state, COUNT(*) cnt
FROM customer_address a, customer c, store_sales s, date_dim d, item i
WHERE a.ca_address_sk = c.c_current_addr_sk
  AND c.c_customer_sk = s.ss_customer_sk
  AND s.ss_sold_date_sk = d.d_date_sk
  AND s.ss_item_sk = i.i_item_sk
  AND d.d_month_seq = (SELECT DISTINCT d_month_seq FROM date_dim
                       WHERE d_year = 2001 AND d_moy = 3)
  AND i.i_current_price > 1.03 *
      (SELECT CAST(SUM(j.i_current_price) AS DOUBLE) / COUNT(*)
       FROM item j WHERE j.i_category = i.i_category)
GROUP BY a.ca_state
HAVING COUNT(*) >= 2
ORDER BY cnt ASC NULLS FIRST, a.ca_state ASC NULLS FIRST
LIMIT 100""")

  private val q7 = tq("tpcds_q7",
    Seq("store_sales", "customer_demographics", "date_dim", "item", "promotion"),
    """SELECT i_item_id,
       CAST(SUM(CAST(ss_quantity AS BIGINT)) AS DOUBLE) / COUNT(*) agg1,
       CAST(SUM(ss_list_price) AS DOUBLE) / COUNT(*) agg2,
       CAST(SUM(ss_coupon_amt) AS DOUBLE) / COUNT(*) agg3,
       CAST(SUM(ss_sales_price) AS DOUBLE) / COUNT(*) agg4
FROM store_sales, customer_demographics, date_dim, item, promotion
WHERE ss_sold_date_sk = d_date_sk AND ss_item_sk = i_item_sk
  AND ss_cdemo_sk = cd_demo_sk AND ss_promo_sk = p_promo_sk
  AND cd_gender = 'F' AND cd_marital_status = 'W'
  AND cd_education_status = 'College'
  AND (p_channel_email = 'N' OR p_channel_event = 'N')
  AND d_year = 2001
GROUP BY i_item_id
ORDER BY i_item_id ASC NULLS FIRST
LIMIT 100""")

  private val q8 = tq("tpcds_q8",
    Seq("store_sales", "date_dim", "store", "customer_address", "customer"),
    """SELECT s_store_name, CAST(SUM(ss_net_profit) AS DOUBLE) net_profit
FROM store_sales, date_dim, store,
     (SELECT ca_zip FROM (
        SELECT SUBSTR(ca_zip, 1, 5) ca_zip
        FROM customer_address
        WHERE SUBSTR(ca_zip, 1, 5) IN (
          '00089','00172','00255','00338','00421','00504','00587','00670',
          '00753','00836','00919','01002','01085','01168','01251','01334',
          '01417','01500','01583','01666','01749','01832','01915','01998',
          '02081','02164','02247','02330','02413','02496','02579','02662',
          '02745','02828','02911','02994','03077','03160','03243','03326')
        INTERSECT
        SELECT ca_zip
        FROM (SELECT SUBSTR(ca_zip, 1, 5) ca_zip, COUNT(*) cnt
              FROM customer_address, customer
              WHERE ca_address_sk = c_current_addr_sk
                AND c_preferred_cust_flag = 'Y'
              GROUP BY ca_zip
              HAVING COUNT(*) >= 1) a1) a2) v1
WHERE ss_store_sk = s_store_sk
  AND ss_sold_date_sk = d_date_sk
  AND d_qoy = 2 AND d_year = 1999
  AND SUBSTR(s_zip, 1, 2) = SUBSTR(v1.ca_zip, 1, 2)
GROUP BY s_store_name
ORDER BY s_store_name ASC NULLS FIRST
LIMIT 100""")

  private val q16 = tq("tpcds_q16",
    Seq("catalog_sales", "date_dim", "customer_address", "call_center", "catalog_returns"),
    """SELECT COUNT(DISTINCT cs_order_number) order_count,
       CAST(SUM(cs_ext_ship_cost) AS DOUBLE) total_shipping_cost,
       CAST(SUM(cs_net_profit) AS DOUBLE) total_net_profit
FROM catalog_sales cs1, date_dim, customer_address, call_center
WHERE d_date BETWEEN DATE '2000-02-01' AND DATE '2000-02-01' + 60
  AND cs1.cs_ship_date_sk = d_date_sk
  AND cs1.cs_ship_addr_sk = ca_address_sk
  AND ca_state = 'CA'
  AND cs1.cs_call_center_sk = cc_call_center_sk
  AND cc_county IN ('County0', 'County1', 'County2')
  AND EXISTS (SELECT * FROM catalog_sales cs2
              WHERE cs1.cs_order_number = cs2.cs_order_number
                AND cs1.cs_warehouse_sk <> cs2.cs_warehouse_sk)
  AND NOT EXISTS (SELECT * FROM catalog_returns cr1
                  WHERE cs1.cs_order_number = cr1.cr_order_number)""")

  private[operators] val q34Body = """SELECT c_last_name, c_first_name, c_salutation, c_preferred_cust_flag,
       ss_ticket_number, cnt
FROM (SELECT ss_ticket_number, ss_customer_sk, COUNT(*) cnt
      FROM store_sales, date_dim, store, household_demographics
      WHERE store_sales.ss_sold_date_sk = date_dim.d_date_sk
        AND store_sales.ss_store_sk = store.s_store_sk
        AND store_sales.ss_hdemo_sk = household_demographics.hd_demo_sk
        AND (date_dim.d_dom BETWEEN 1 AND 3 OR date_dim.d_dom BETWEEN 25 AND 28)
        AND (household_demographics.hd_buy_potential = '>10000'
             OR household_demographics.hd_buy_potential = '5001-10000')
        AND household_demographics.hd_vehicle_count > 0
        AND (CASE WHEN household_demographics.hd_vehicle_count > 0
                  THEN CAST(household_demographics.hd_dep_count AS DOUBLE)
                       / household_demographics.hd_vehicle_count
                  ELSE NULL END) > 1.2
        AND date_dim.d_year IN (1999, 1999 + 1, 1999 + 2)
        AND store.s_county IN ('County5', 'County24', 'County13', 'County2',
                               'County21', 'County10', 'County29', 'County18')
      GROUP BY ss_ticket_number, ss_customer_sk) dn, customer
WHERE ss_customer_sk = c_customer_sk AND cnt BETWEEN 2 AND 4
ORDER BY c_last_name ASC NULLS FIRST, c_first_name ASC NULLS FIRST,
         c_salutation ASC NULLS FIRST, c_preferred_cust_flag DESC NULLS LAST,
         ss_ticket_number ASC NULLS FIRST"""

  private val q34 = tq("tpcds_q34",
    Seq("store_sales", "date_dim", "store", "household_demographics",
      "customer"), q34Body)

  private[operators] val q42Body = """SELECT dt.d_year, item.i_category_id, item.i_category,
       CAST(SUM(ss_ext_sales_price) AS DOUBLE) sum_sales
FROM date_dim dt, store_sales, item
WHERE dt.d_date_sk = store_sales.ss_sold_date_sk
  AND store_sales.ss_item_sk = item.i_item_sk
  AND item.i_manager_id = 1
  AND dt.d_moy = 11 AND dt.d_year = 2000
GROUP BY dt.d_year, item.i_category_id, item.i_category
ORDER BY sum_sales DESC NULLS LAST, dt.d_year ASC NULLS FIRST,
         item.i_category_id ASC NULLS FIRST, item.i_category ASC NULLS FIRST
LIMIT 100"""

  private val q42 = tq("tpcds_q42",
    Seq("date_dim", "store_sales", "item"), q42Body)

  private[operators] val q59Body = """WITH wss AS (
 SELECT d_week_seq, ss_store_sk,
        SUM(CASE WHEN d_day_name = 'Sunday' THEN ss_sales_price ELSE NULL END) sun_sales,
        SUM(CASE WHEN d_day_name = 'Monday' THEN ss_sales_price ELSE NULL END) mon_sales,
        SUM(CASE WHEN d_day_name = 'Tuesday' THEN ss_sales_price ELSE NULL END) tue_sales,
        SUM(CASE WHEN d_day_name = 'Wednesday' THEN ss_sales_price ELSE NULL END) wed_sales,
        SUM(CASE WHEN d_day_name = 'Thursday' THEN ss_sales_price ELSE NULL END) thu_sales,
        SUM(CASE WHEN d_day_name = 'Friday' THEN ss_sales_price ELSE NULL END) fri_sales,
        SUM(CASE WHEN d_day_name = 'Saturday' THEN ss_sales_price ELSE NULL END) sat_sales
 FROM store_sales, date_dim
 WHERE d_date_sk = ss_sold_date_sk
 GROUP BY d_week_seq, ss_store_sk)
SELECT s_store_name1, s_store_id1, d_week_seq1,
       CAST(sun_sales1 AS DOUBLE) / CAST(sun_sales2 AS DOUBLE) r_sun,
       CAST(mon_sales1 AS DOUBLE) / CAST(mon_sales2 AS DOUBLE) r_mon,
       CAST(tue_sales1 AS DOUBLE) / CAST(tue_sales2 AS DOUBLE) r_tue,
       CAST(wed_sales1 AS DOUBLE) / CAST(wed_sales2 AS DOUBLE) r_wed,
       CAST(thu_sales1 AS DOUBLE) / CAST(thu_sales2 AS DOUBLE) r_thu,
       CAST(fri_sales1 AS DOUBLE) / CAST(fri_sales2 AS DOUBLE) r_fri,
       CAST(sat_sales1 AS DOUBLE) / CAST(sat_sales2 AS DOUBLE) r_sat
FROM (SELECT s_store_name s_store_name1, wss.d_week_seq d_week_seq1,
             s_store_id s_store_id1, sun_sales sun_sales1, mon_sales mon_sales1,
             tue_sales tue_sales1, wed_sales wed_sales1, thu_sales thu_sales1,
             fri_sales fri_sales1, sat_sales sat_sales1
      FROM wss, store, date_dim d
      WHERE d.d_week_seq = wss.d_week_seq AND ss_store_sk = s_store_sk
        AND d_month_seq BETWEEN 108 AND 108 + 11) y,
     (SELECT s_store_name s_store_name2, wss.d_week_seq d_week_seq2,
             s_store_id s_store_id2, sun_sales sun_sales2, mon_sales mon_sales2,
             tue_sales tue_sales2, wed_sales wed_sales2, thu_sales thu_sales2,
             fri_sales fri_sales2, sat_sales sat_sales2
      FROM wss, store, date_dim d
      WHERE d.d_week_seq = wss.d_week_seq AND ss_store_sk = s_store_sk
        AND d_month_seq BETWEEN 108 + 12 AND 108 + 23) x
WHERE s_store_id1 = s_store_id2 AND d_week_seq1 = d_week_seq2 - 52
ORDER BY s_store_name1 ASC NULLS FIRST, s_store_id1 ASC NULLS FIRST,
         d_week_seq1 ASC NULLS FIRST, r_sun ASC NULLS FIRST,
         r_mon ASC NULLS FIRST, r_tue ASC NULLS FIRST, r_wed ASC NULLS FIRST,
         r_thu ASC NULLS FIRST, r_fri ASC NULLS FIRST, r_sat ASC NULLS FIRST
LIMIT 100"""

  private val q59 = tq("tpcds_q59",
    Seq("store_sales", "date_dim", "store"), q59Body)

  private val q95 = tq("tpcds_q95",
    Seq("web_sales", "date_dim", "customer_address", "web_site", "web_returns"),
    """WITH ws_wh AS (
 SELECT ws1.ws_order_number, ws1.ws_warehouse_sk wh1, ws2.ws_warehouse_sk wh2
 FROM web_sales ws1, web_sales ws2
 WHERE ws1.ws_order_number = ws2.ws_order_number
   AND ws1.ws_warehouse_sk <> ws2.ws_warehouse_sk)
SELECT COUNT(DISTINCT ws_order_number) order_count,
       CAST(SUM(ws_ext_ship_cost) AS DOUBLE) total_shipping_cost,
       CAST(SUM(ws_net_profit) AS DOUBLE) total_net_profit
FROM web_sales ws1, date_dim, customer_address, web_site
WHERE d_date BETWEEN DATE '2000-03-01' AND DATE '2000-03-01' + 60
  AND ws1.ws_ship_date_sk = d_date_sk
  AND ws1.ws_ship_addr_sk = ca_address_sk
  AND ca_state = 'TN'
  AND ws1.ws_web_site_sk = web_site_sk
  AND web_name = 'Site1'
  AND ws1.ws_order_number IN (SELECT ws_order_number FROM ws_wh)
  AND ws1.ws_order_number IN (SELECT wr_order_number
                              FROM web_returns, ws_wh
                              WHERE wr_order_number = ws_wh.ws_order_number)""")

  val defs: Seq[OpQuery] =
    Seq(q1, q2, q3, q6, q7, q8, q16, q34, q42, q59, q95)
}
