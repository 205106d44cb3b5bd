package graft.operators

import graft.OpQuery
import graft.sources.Tpcds

/** TPC-DS conformance sweep, part 6 (reference corpus
  * TPCDSBenchmarkQueries.scala:2463-3233): return-lag pivots, brand
  * monthly reports, quarterly-deviation filters, tri-channel revenue
  * balance, promo share and underperforming-item scans. Generator fits:
  * i_class is the first word of p_type (ECONOMY/LARGE/MEDIUM/PROMO/
  * SMALL/STANDARD), brands are TPC-H 'Brand#xy', store gmt offset is
  * always -5, month_seq 120-131 = calendar 2000.
  */
object TpcdsQueries6 {

  private def tq(name: String, tables: Seq[String], body: String): OpQuery =
    OpQuery(name, Some(Tpcds.oracle(tables, body)),
      (s, d) => { Tpcds.ensure(s, d); s.sql(body) })

  private val q50 = tq("tpcds_q50",
    Seq("store_sales", "store_returns", "store", "date_dim"),
    """SELECT s_store_name, s_company_id, s_street_number, s_street_name,
       s_street_type, s_suite_number, s_city, s_county, s_state, s_zip,
       CAST(SUM(CASE WHEN (sr_returned_date_sk - ss_sold_date_sk <= 30)
                THEN 1 ELSE 0 END) AS BIGINT) d30_days,
       CAST(SUM(CASE WHEN (sr_returned_date_sk - ss_sold_date_sk > 30)
                      AND (sr_returned_date_sk - ss_sold_date_sk <= 60)
                THEN 1 ELSE 0 END) AS BIGINT) d31_60_days,
       CAST(SUM(CASE WHEN (sr_returned_date_sk - ss_sold_date_sk > 60)
                      AND (sr_returned_date_sk - ss_sold_date_sk <= 90)
                THEN 1 ELSE 0 END) AS BIGINT) d61_90_days,
       CAST(SUM(CASE WHEN (sr_returned_date_sk - ss_sold_date_sk > 90)
                      AND (sr_returned_date_sk - ss_sold_date_sk <= 120)
                THEN 1 ELSE 0 END) AS BIGINT) d91_120_days,
       CAST(SUM(CASE WHEN (sr_returned_date_sk - ss_sold_date_sk > 120)
                THEN 1 ELSE 0 END) AS BIGINT) d_over_120_days
FROM store_sales, store_returns, store, date_dim d1, date_dim d2
WHERE d2.d_year = 1999 AND d2.d_moy = 9
  AND ss_ticket_number = sr_ticket_number
  AND ss_item_sk = sr_item_sk
  AND ss_sold_date_sk = d1.d_date_sk
  AND sr_returned_date_sk = d2.d_date_sk
  AND ss_customer_sk = sr_customer_sk
  AND ss_store_sk = s_store_sk
GROUP BY s_store_name, s_company_id, s_street_number, s_street_name,
         s_street_type, s_suite_number, s_city, s_county, s_state, s_zip
ORDER BY s_store_name ASC NULLS FIRST, s_company_id ASC NULLS FIRST,
         s_street_number ASC NULLS FIRST, s_street_name ASC NULLS FIRST,
         s_street_type ASC NULLS FIRST, s_suite_number ASC NULLS FIRST,
         s_city ASC NULLS FIRST, s_county ASC NULLS FIRST,
         s_state ASC NULLS FIRST, s_zip ASC NULLS FIRST
LIMIT 100""")

  private val q52 = tq("tpcds_q52",
    Seq("date_dim", "store_sales", "item"),
    """SELECT dt.d_year, item.i_brand_id brand_id, item.i_brand brand,
       CAST(SUM(ss_ext_sales_price) AS DOUBLE) ext_price
FROM date_dim dt, store_sales, item
WHERE dt.d_date_sk = store_sales.ss_sold_date_sk
  AND store_sales.ss_item_sk = item.i_item_sk
  AND item.i_manager_id = 1
  AND dt.d_moy = 11 AND dt.d_year = 2000
GROUP BY dt.d_year, item.i_brand, item.i_brand_id
ORDER BY dt.d_year ASC NULLS FIRST, ext_price DESC NULLS LAST,
         brand_id ASC NULLS FIRST, brand ASC NULLS FIRST
LIMIT 100""")

  private val q53 = tq("tpcds_q53",
    Seq("item", "store_sales", "date_dim", "store"),
    """SELECT * FROM (
 SELECT i_manufact_id, CAST(SUM(ss_sales_price) AS DOUBLE) sum_sales,
        CAST(SUM(SUM(ss_sales_price)) OVER (PARTITION BY i_manufact_id)
             AS DOUBLE)
          / COUNT(*) OVER (PARTITION BY i_manufact_id) avg_quarterly_sales
 FROM item, store_sales, date_dim, store
 WHERE ss_item_sk = i_item_sk AND ss_sold_date_sk = d_date_sk
   AND ss_store_sk = s_store_sk
   AND d_month_seq IN (120, 121, 122, 123, 124, 125, 126, 127, 128, 129,
                       130, 131)
   AND ((i_category IN ('Books', 'Children', 'Electronics')
         AND i_class IN ('STANDARD', 'SMALL', 'MEDIUM', 'LARGE')
         AND i_brand IN ('Brand#11', 'Brand#12', 'Brand#13', 'Brand#14'))
        OR (i_category IN ('Women', 'Music', 'Men')
            AND i_class IN ('ECONOMY', 'PROMO', 'STANDARD', 'SMALL')
            AND i_brand IN ('Brand#21', 'Brand#22', 'Brand#23', 'Brand#24')))
 GROUP BY i_manufact_id, d_qoy) tmp1
WHERE CASE WHEN avg_quarterly_sales > 0
           THEN ABS(sum_sales - avg_quarterly_sales) / avg_quarterly_sales
           ELSE NULL END > 0.1
ORDER BY avg_quarterly_sales ASC NULLS FIRST, sum_sales ASC NULLS FIRST,
         i_manufact_id ASC NULLS FIRST
LIMIT 100""")

  // q54: cross-channel "my_customers" cohort (bought Music/Books/Home via
  // catalog or web during 2001) × their store revenue in the quarter after
  // 2001-07, bucketed into $50 segments. Geo-constrained to customers
  // whose address county+state hosts a store — the generator emits only 12
  // store (county,state) pairs against 600 customer combinations, so ~2%
  // of customers can ever pass; the cohort is widened to 3 categories ×
  // the full year (vs the spec's 1 category/class × 1 month) so the
  // surviving segment set is non-empty at sf0.001 and multi-row at sf0.01.
  // The segment cut is FLOOR(CAST(.. AS DOUBLE)/50): both engines run the
  // identical IEEE divide+floor on the exact decimal sum (CAST double→INT
  // would diverge: Spark truncates, DuckDB rounds).
  private val q54 = tq("tpcds_q54",
    Seq("catalog_sales", "web_sales", "item", "date_dim", "customer",
      "store_sales", "customer_address", "store"),
    """WITH my_customers AS (
 SELECT DISTINCT c_customer_sk, c_current_addr_sk
 FROM (SELECT cs_sold_date_sk sold_date_sk, cs_bill_customer_sk customer_sk,
              cs_item_sk item_sk
       FROM catalog_sales
       UNION ALL
       SELECT ws_sold_date_sk sold_date_sk, ws_bill_customer_sk customer_sk,
              ws_item_sk item_sk
       FROM web_sales) cs_or_ws_sales, item, date_dim, customer
 WHERE sold_date_sk = d_date_sk AND item_sk = i_item_sk
   AND i_category IN ('Music', 'Books', 'Home')
   AND c_customer_sk = customer_sk
   AND d_year = 2001),
my_revenue AS (
 SELECT c_customer_sk, SUM(ss_ext_sales_price) AS revenue
 FROM my_customers, store_sales, customer_address, store, date_dim
 WHERE c_current_addr_sk = ca_address_sk
   AND ca_county = s_county AND ca_state = s_state
   AND ss_sold_date_sk = d_date_sk AND c_customer_sk = ss_customer_sk
   AND d_month_seq BETWEEN (SELECT DISTINCT d_month_seq + 1 FROM date_dim
                            WHERE d_year = 2001 AND d_moy = 7)
                       AND (SELECT DISTINCT d_month_seq + 3 FROM date_dim
                            WHERE d_year = 2001 AND d_moy = 7)
 GROUP BY c_customer_sk),
segments AS (
 SELECT CAST(FLOOR(CAST(revenue AS DOUBLE) / 50) AS BIGINT) AS segment
 FROM my_revenue)
SELECT segment, CAST(COUNT(*) AS BIGINT) num_customers,
       segment * 50 AS segment_base
FROM segments GROUP BY segment
ORDER BY segment ASC NULLS FIRST, num_customers ASC NULLS FIRST
LIMIT 100""")

  private val q55 = tq("tpcds_q55",
    Seq("date_dim", "store_sales", "item"),
    """SELECT i_brand_id brand_id, i_brand brand,
       CAST(SUM(ss_ext_sales_price) AS DOUBLE) ext_price
FROM date_dim, store_sales, item
WHERE d_date_sk = ss_sold_date_sk
  AND ss_item_sk = i_item_sk
  AND i_manager_id = 87
  AND d_moy = 11 AND d_year = 2000
GROUP BY i_brand, i_brand_id
ORDER BY ext_price DESC NULLS LAST, brand_id ASC NULLS FIRST,
         brand ASC NULLS FIRST
LIMIT 100""")

  /** Shared tri-channel item-revenue union shape of q56/q60 (they differ
    * only in the item filter, month and ordering, like the corpus). */
  private def triChannel(itemFilter: String, moy: Int, order: String): String =
    s"""WITH ss AS (
 SELECT i_item_id, SUM(ss_ext_sales_price) total_sales
 FROM store_sales, date_dim, customer_address, item
 WHERE i_item_id IN (SELECT i_item_id FROM item WHERE $itemFilter)
   AND ss_item_sk = i_item_sk AND ss_sold_date_sk = d_date_sk
   AND d_year = 2000 AND d_moy = $moy
   AND ss_addr_sk = ca_address_sk AND ca_gmt_offset = -5
 GROUP BY i_item_id),
cs AS (
 SELECT i_item_id, SUM(cs_ext_sales_price) total_sales
 FROM catalog_sales, date_dim, customer_address, item
 WHERE i_item_id IN (SELECT i_item_id FROM item WHERE $itemFilter)
   AND cs_item_sk = i_item_sk AND cs_sold_date_sk = d_date_sk
   AND d_year = 2000 AND d_moy = $moy
   AND cs_bill_addr_sk = ca_address_sk AND ca_gmt_offset = -5
 GROUP BY i_item_id),
ws AS (
 SELECT i_item_id, SUM(ws_ext_sales_price) total_sales
 FROM web_sales, date_dim, customer_address, item
 WHERE i_item_id IN (SELECT i_item_id FROM item WHERE $itemFilter)
   AND ws_item_sk = i_item_sk AND ws_sold_date_sk = d_date_sk
   AND d_year = 2000 AND d_moy = $moy
   AND ws_bill_addr_sk = ca_address_sk AND ca_gmt_offset = -5
 GROUP BY i_item_id)
SELECT i_item_id, CAST(SUM(total_sales) AS DOUBLE) total_sales
FROM (SELECT * FROM ss UNION ALL SELECT * FROM cs
      UNION ALL SELECT * FROM ws) tmp1
GROUP BY i_item_id
ORDER BY $order
LIMIT 100"""

  private val q56 = tq("tpcds_q56",
    Seq("store_sales", "catalog_sales", "web_sales", "date_dim", "customer_address", "item"),
    triChannel("i_color IN ('red', 'white', 'violet')", 3,
      "total_sales ASC NULLS FIRST, i_item_id ASC NULLS FIRST"))

  private val q60 = tq("tpcds_q60",
    Seq("store_sales", "catalog_sales", "web_sales", "date_dim", "customer_address", "item"),
    triChannel("i_category IN ('Men')", 9,
      "i_item_id ASC NULLS FIRST, total_sales ASC NULLS FIRST"))

  private val q58 = tq("tpcds_q58",
    Seq("store_sales", "catalog_sales", "web_sales", "item", "date_dim"),
    """WITH ss_items AS (
 SELECT i_item_id item_id, SUM(ss_ext_sales_price) ss_item_rev
 FROM store_sales, item, date_dim
 WHERE ss_item_sk = i_item_sk
   AND d_date IN (SELECT d_date FROM date_dim
                  WHERE d_quarter_name = (SELECT d_quarter_name FROM date_dim
                                          WHERE d_date = DATE '2000-03-26'))
   AND ss_sold_date_sk = d_date_sk
 GROUP BY i_item_id),
cs_items AS (
 SELECT i_item_id item_id, SUM(cs_ext_sales_price) cs_item_rev
 FROM catalog_sales, item, date_dim
 WHERE cs_item_sk = i_item_sk
   AND d_date IN (SELECT d_date FROM date_dim
                  WHERE d_quarter_name = (SELECT d_quarter_name FROM date_dim
                                          WHERE d_date = DATE '2000-03-26'))
   AND cs_sold_date_sk = d_date_sk
 GROUP BY i_item_id),
ws_items AS (
 SELECT i_item_id item_id, SUM(ws_ext_sales_price) ws_item_rev
 FROM web_sales, item, date_dim
 WHERE ws_item_sk = i_item_sk
   AND d_date IN (SELECT d_date FROM date_dim
                  WHERE d_quarter_name = (SELECT d_quarter_name FROM date_dim
                                          WHERE d_date = DATE '2000-03-26'))
   AND ws_sold_date_sk = d_date_sk
 GROUP BY i_item_id)
SELECT ss_items.item_id, CAST(ss_item_rev AS DOUBLE) ss_item_rev,
       CAST(ss_item_rev AS DOUBLE)
         / (CAST(ss_item_rev + cs_item_rev + ws_item_rev AS DOUBLE) / 3)
         * 100 ss_dev,
       CAST(cs_item_rev AS DOUBLE) cs_item_rev,
       CAST(cs_item_rev AS DOUBLE)
         / (CAST(ss_item_rev + cs_item_rev + ws_item_rev AS DOUBLE) / 3)
         * 100 cs_dev,
       CAST(ws_item_rev AS DOUBLE) ws_item_rev,
       CAST(ws_item_rev AS DOUBLE)
         / (CAST(ss_item_rev + cs_item_rev + ws_item_rev AS DOUBLE) / 3)
         * 100 ws_dev,
       CAST(ss_item_rev + cs_item_rev + ws_item_rev AS DOUBLE) / 3 average
FROM ss_items, cs_items, ws_items
WHERE ss_items.item_id = cs_items.item_id
  AND ss_items.item_id = ws_items.item_id
  AND ss_item_rev BETWEEN 0.2 * cs_item_rev AND 5 * cs_item_rev
  AND ss_item_rev BETWEEN 0.2 * ws_item_rev AND 5 * ws_item_rev
  AND cs_item_rev BETWEEN 0.2 * ss_item_rev AND 5 * ss_item_rev
  AND cs_item_rev BETWEEN 0.2 * ws_item_rev AND 5 * ws_item_rev
  AND ws_item_rev BETWEEN 0.2 * ss_item_rev AND 5 * ss_item_rev
  AND ws_item_rev BETWEEN 0.2 * cs_item_rev AND 5 * cs_item_rev
ORDER BY ss_items.item_id ASC NULLS FIRST, ss_item_rev ASC NULLS FIRST
LIMIT 100""")

  private val q61 = tq("tpcds_q61",
    Seq("store_sales", "store", "promotion", "date_dim", "customer",
      "customer_address", "item"),
    """SELECT promotions, total,
       CAST(promotions AS DOUBLE) / CAST(total AS DOUBLE) * 100 promo_pct
FROM (SELECT CAST(SUM(ss_ext_sales_price) AS DOUBLE) promotions
      FROM store_sales, store, promotion, date_dim, customer,
           customer_address, item
      WHERE ss_sold_date_sk = d_date_sk
        AND ss_store_sk = s_store_sk
        AND ss_promo_sk = p_promo_sk
        AND ss_customer_sk = c_customer_sk
        AND ca_address_sk = c_current_addr_sk
        AND ss_item_sk = i_item_sk
        AND ca_gmt_offset = -7
        AND i_category = 'Electronics'
        AND (p_channel_dmail = 'Y' OR p_channel_email = 'Y'
             OR p_channel_tv = 'Y')
        AND s_gmt_offset = -5
        AND d_year = 2000 AND d_moy = 11) promotional_sales,
     (SELECT CAST(SUM(ss_ext_sales_price) AS DOUBLE) total
      FROM store_sales, store, date_dim, customer, customer_address, item
      WHERE ss_sold_date_sk = d_date_sk
        AND ss_store_sk = s_store_sk
        AND ss_customer_sk = c_customer_sk
        AND ca_address_sk = c_current_addr_sk
        AND ss_item_sk = i_item_sk
        AND ca_gmt_offset = -7
        AND i_category = 'Electronics'
        AND s_gmt_offset = -5
        AND d_year = 2000 AND d_moy = 11) all_sales
ORDER BY promotions ASC NULLS FIRST, total ASC NULLS FIRST""")

  private val q62 = tq("tpcds_q62",
    Seq("web_sales", "warehouse", "ship_mode", "web_site", "date_dim"),
    """SELECT SUBSTR(w_warehouse_name, 1, 20) wh_name, sm_type, web_name,
       CAST(SUM(CASE WHEN (ws_ship_date_sk - ws_sold_date_sk <= 30)
                THEN 1 ELSE 0 END) AS BIGINT) d30_days,
       CAST(SUM(CASE WHEN (ws_ship_date_sk - ws_sold_date_sk > 30)
                      AND (ws_ship_date_sk - ws_sold_date_sk <= 60)
                THEN 1 ELSE 0 END) AS BIGINT) d31_60_days,
       CAST(SUM(CASE WHEN (ws_ship_date_sk - ws_sold_date_sk > 60)
                      AND (ws_ship_date_sk - ws_sold_date_sk <= 90)
                THEN 1 ELSE 0 END) AS BIGINT) d61_90_days,
       CAST(SUM(CASE WHEN (ws_ship_date_sk - ws_sold_date_sk > 90)
                      AND (ws_ship_date_sk - ws_sold_date_sk <= 120)
                THEN 1 ELSE 0 END) AS BIGINT) d91_120_days,
       CAST(SUM(CASE WHEN (ws_ship_date_sk - ws_sold_date_sk > 120)
                THEN 1 ELSE 0 END) AS BIGINT) d_over_120_days
FROM web_sales, warehouse, ship_mode, web_site, date_dim
WHERE d_month_seq BETWEEN 120 AND 120 + 11
  AND ws_ship_date_sk = d_date_sk
  AND ws_warehouse_sk = w_warehouse_sk
  AND ws_ship_mode_sk = sm_ship_mode_sk
  AND ws_web_site_sk = web_site_sk
GROUP BY SUBSTR(w_warehouse_name, 1, 20), sm_type, web_name
ORDER BY wh_name ASC NULLS FIRST, sm_type ASC NULLS FIRST,
         web_name ASC NULLS FIRST
LIMIT 100""")

  private val q63 = tq("tpcds_q63",
    Seq("item", "store_sales", "date_dim", "store"),
    """SELECT * FROM (
 SELECT i_manager_id, CAST(SUM(ss_sales_price) AS DOUBLE) sum_sales,
        CAST(SUM(SUM(ss_sales_price)) OVER (PARTITION BY i_manager_id)
             AS DOUBLE)
          / COUNT(*) OVER (PARTITION BY i_manager_id) avg_monthly_sales
 FROM item, store_sales, date_dim, store
 WHERE ss_item_sk = i_item_sk AND ss_sold_date_sk = d_date_sk
   AND ss_store_sk = s_store_sk
   AND d_month_seq IN (120, 121, 122, 123, 124, 125, 126, 127, 128, 129,
                       130, 131)
   AND ((i_category IN ('Books', 'Children', 'Electronics')
         AND i_class IN ('STANDARD', 'SMALL', 'MEDIUM', 'LARGE')
         AND i_brand IN ('Brand#11', 'Brand#12', 'Brand#13', 'Brand#14'))
        OR (i_category IN ('Women', 'Music', 'Men')
            AND i_class IN ('ECONOMY', 'PROMO', 'STANDARD', 'SMALL')
            AND i_brand IN ('Brand#21', 'Brand#22', 'Brand#23', 'Brand#24')))
 GROUP BY i_manager_id, d_moy) tmp1
WHERE CASE WHEN avg_monthly_sales > 0
           THEN ABS(sum_sales - avg_monthly_sales) / avg_monthly_sales
           ELSE NULL END > 0.1
ORDER BY i_manager_id ASC NULLS FIRST, avg_monthly_sales ASC NULLS FIRST,
         sum_sales ASC NULLS FIRST
LIMIT 100""")

  private val q65 = tq("tpcds_q65",
    Seq("store", "item", "store_sales", "date_dim"),
    """SELECT s_store_name, i_item_desc, CAST(sc.revenue AS DOUBLE) revenue,
       CAST(i_current_price AS DOUBLE) i_current_price,
       CAST(i_wholesale_cost AS DOUBLE) i_wholesale_cost, i_brand
FROM store, item,
     (SELECT ss_store_sk, CAST(SUM(revenue) AS DOUBLE) / COUNT(*) ave
      FROM (SELECT ss_store_sk, ss_item_sk, SUM(ss_sales_price) revenue
            FROM store_sales, date_dim
            WHERE ss_sold_date_sk = d_date_sk
              AND d_month_seq BETWEEN 120 AND 120 + 11
            GROUP BY ss_store_sk, ss_item_sk) sa
      GROUP BY ss_store_sk) sb,
     (SELECT ss_store_sk, ss_item_sk, SUM(ss_sales_price) revenue
      FROM store_sales, date_dim
      WHERE ss_sold_date_sk = d_date_sk
        AND d_month_seq BETWEEN 120 AND 120 + 11
      GROUP BY ss_store_sk, ss_item_sk) sc
WHERE sb.ss_store_sk = sc.ss_store_sk
  AND sc.revenue <= 0.1 * sb.ave
  AND s_store_sk = sc.ss_store_sk
  AND i_item_sk = sc.ss_item_sk
ORDER BY s_store_name ASC NULLS FIRST, i_item_desc ASC NULLS FIRST,
         revenue ASC NULLS FIRST
LIMIT 100""")

  val defs: Seq[OpQuery] =
    Seq(q50, q52, q53, q54, q55, q56, q58, q60, q61, q62, q63, q65)
}
