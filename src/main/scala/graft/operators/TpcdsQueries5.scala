package graft.operators

import graft.OpQuery
import graft.sources.Tpcds

/** TPC-DS conformance sweep, part 5 (reference corpus
  * TPCDSBenchmarkQueries.scala:1735-2335): multi-channel manufacturer
  * rollups, demographic EXISTS batteries, hierarchy ranks, inventory
  * windows, item-attribute self-probes, day-of-week pivots and
  * best/worst rank joins. Same conventions as [[TpcdsQueries]];
  * generator fits: gmt offsets are -5..-8 (store -5), store ids 1-12,
  * cities City0-59, i_units is constant 'Unknown', inventory spans
  * calendar year 2000 only, item prices sit in [900, 1000).
  */
object TpcdsQueries5 {

  private def tq(name: String, tables: Seq[String], body: String): OpQuery =
    OpQuery(name, Some(Tpcds.oracle(tables, body)),
      (s, d) => { Tpcds.ensure(s, d); s.sql(body) })

  private def stddevExact(c: String): String =
    s"""CASE WHEN COUNT($c) > 1 THEN SQRT(GREATEST(
       (CAST(SUM(CAST($c AS BIGINT) * $c) AS DOUBLE)
        - CAST(SUM(CAST($c AS BIGINT)) AS DOUBLE) / COUNT($c)
          * CAST(SUM(CAST($c AS BIGINT)) AS DOUBLE))
       / (COUNT($c) - 1), CAST(0 AS DOUBLE))) ELSE CAST(NULL AS DOUBLE) END"""

  private val q33 = tq("tpcds_q33",
    Seq("store_sales", "catalog_sales", "web_sales", "date_dim", "customer_address", "item"),
    """WITH ss AS (
 SELECT i_manufact_id, SUM(ss_ext_sales_price) total_sales
 FROM store_sales, date_dim, customer_address, item
 WHERE i_manufact_id IN (SELECT i_manufact_id FROM item
                         WHERE i_category IN ('Electronics'))
   AND ss_item_sk = i_item_sk AND ss_sold_date_sk = d_date_sk
   AND d_year = 1999 AND d_moy = 2
   AND ss_addr_sk = ca_address_sk AND ca_gmt_offset = -6
 GROUP BY i_manufact_id),
cs AS (
 SELECT i_manufact_id, SUM(cs_ext_sales_price) total_sales
 FROM catalog_sales, date_dim, customer_address, item
 WHERE i_manufact_id IN (SELECT i_manufact_id FROM item
                         WHERE i_category IN ('Electronics'))
   AND cs_item_sk = i_item_sk AND cs_sold_date_sk = d_date_sk
   AND d_year = 1999 AND d_moy = 2
   AND cs_bill_addr_sk = ca_address_sk AND ca_gmt_offset = -6
 GROUP BY i_manufact_id),
ws AS (
 SELECT i_manufact_id, SUM(ws_ext_sales_price) total_sales
 FROM web_sales, date_dim, customer_address, item
 WHERE i_manufact_id IN (SELECT i_manufact_id FROM item
                         WHERE i_category IN ('Electronics'))
   AND ws_item_sk = i_item_sk AND ws_sold_date_sk = d_date_sk
   AND d_year = 1999 AND d_moy = 2
   AND ws_bill_addr_sk = ca_address_sk AND ca_gmt_offset = -6
 GROUP BY i_manufact_id)
SELECT i_manufact_id, CAST(SUM(total_sales) AS DOUBLE) total_sales
FROM (SELECT * FROM ss UNION ALL SELECT * FROM cs
      UNION ALL SELECT * FROM ws) tmp1
GROUP BY i_manufact_id
ORDER BY total_sales ASC NULLS FIRST, i_manufact_id ASC NULLS FIRST
LIMIT 100""")

  private val q35 = tq("tpcds_q35",
    Seq("customer", "customer_address", "customer_demographics",
      "store_sales", "web_sales", "catalog_sales", "date_dim"),
    s"""SELECT ca_state, cd_gender, cd_marital_status, cd_dep_count,
       COUNT(*) cnt1,
       ${stddevExact("cd_dep_count")} std1,
       MIN(cd_dep_count) min1,
       cd_dep_employed_count, COUNT(*) cnt2,
       ${stddevExact("cd_dep_employed_count")} std2,
       MIN(cd_dep_employed_count) min2,
       cd_dep_college_count, COUNT(*) cnt3,
       ${stddevExact("cd_dep_college_count")} std3,
       MIN(cd_dep_college_count) min3
FROM customer c, customer_address ca, customer_demographics
WHERE c.c_current_addr_sk = ca.ca_address_sk
  AND cd_demo_sk = c.c_current_cdemo_sk
  AND EXISTS (SELECT * FROM store_sales, date_dim
              WHERE c.c_customer_sk = ss_customer_sk
                AND ss_sold_date_sk = d_date_sk
                AND d_year = 2000 AND d_qoy < 4)
  AND (EXISTS (SELECT * FROM web_sales, date_dim
               WHERE c.c_customer_sk = ws_bill_customer_sk
                 AND ws_sold_date_sk = d_date_sk
                 AND d_year = 2000 AND d_qoy < 4)
       OR EXISTS (SELECT * FROM catalog_sales, date_dim
                  WHERE c.c_customer_sk = cs_ship_customer_sk
                    AND cs_sold_date_sk = d_date_sk
                    AND d_year = 2000 AND d_qoy < 4))
GROUP BY ca_state, cd_gender, cd_marital_status, cd_dep_count,
         cd_dep_employed_count, cd_dep_college_count
ORDER BY ca_state ASC NULLS FIRST, cd_gender ASC NULLS FIRST,
         cd_marital_status ASC NULLS FIRST, cd_dep_count ASC NULLS FIRST,
         cd_dep_employed_count ASC NULLS FIRST,
         cd_dep_college_count ASC NULLS FIRST
LIMIT 100""")

  private val q36 = tq("tpcds_q36",
    Seq("store_sales", "date_dim", "item", "store"),
    """SELECT CAST(SUM(ss_net_profit) AS DOUBLE)
         / CAST(SUM(ss_ext_sales_price) AS DOUBLE) gross_margin,
       i_category, i_class,
       CAST(GROUPING(i_category) + GROUPING(i_class) AS INT) lochierarchy,
       CAST(RANK() OVER (
         PARTITION BY GROUPING(i_category) + GROUPING(i_class),
                      CASE WHEN GROUPING(i_class) = 0 THEN i_category END
         ORDER BY CAST(SUM(ss_net_profit) AS DOUBLE)
                  / CAST(SUM(ss_ext_sales_price) AS DOUBLE) ASC)
            AS BIGINT) rank_within_parent
FROM store_sales, date_dim d1, item, store
WHERE d1.d_year = 1999
  AND d1.d_date_sk = ss_sold_date_sk
  AND i_item_sk = ss_item_sk
  AND s_store_sk = ss_store_sk
  AND s_state IN ('OH', 'CA', 'TX', 'NY', 'FL', 'IL', 'GA', 'WA')
GROUP BY ROLLUP (i_category, i_class)
ORDER BY lochierarchy DESC NULLS LAST,
         CASE WHEN lochierarchy = 0 THEN i_category END ASC NULLS FIRST,
         rank_within_parent ASC NULLS FIRST, i_category ASC NULLS FIRST,
         i_class ASC NULLS FIRST
LIMIT 100""")

  private val q37 = tq("tpcds_q37",
    Seq("item", "inventory", "date_dim", "catalog_sales"),
    """SELECT i_item_id, i_item_desc, CAST(i_current_price AS DOUBLE) i_current_price
FROM item, inventory, date_dim, catalog_sales
WHERE i_current_price BETWEEN 920 AND 920 + 60
  AND inv_item_sk = i_item_sk
  AND d_date_sk = inv_date_sk
  AND d_date BETWEEN DATE '2000-03-20' AND DATE '2000-03-20' + 60
  AND i_manufact_id IN (928, 715, 942, 861)
  AND inv_quantity_on_hand BETWEEN 100 AND 500
  AND cs_item_sk = i_item_sk
GROUP BY i_item_id, i_item_desc, i_current_price
ORDER BY i_item_id ASC NULLS FIRST, i_item_desc ASC NULLS FIRST,
         i_current_price ASC NULLS FIRST
LIMIT 100""")

  private val q38 = tq("tpcds_q38",
    Seq("store_sales", "catalog_sales", "web_sales", "date_dim", "customer"),
    """SELECT COUNT(*) cnt FROM (
 SELECT DISTINCT c_last_name, c_first_name, d_date
 FROM store_sales, date_dim, customer
 WHERE store_sales.ss_sold_date_sk = date_dim.d_date_sk
   AND store_sales.ss_customer_sk = customer.c_customer_sk
   AND d_month_seq BETWEEN 120 AND 120 + 11
 INTERSECT
 SELECT DISTINCT c_last_name, c_first_name, d_date
 FROM catalog_sales, date_dim, customer
 WHERE catalog_sales.cs_sold_date_sk = date_dim.d_date_sk
   AND catalog_sales.cs_bill_customer_sk = customer.c_customer_sk
   AND d_month_seq BETWEEN 120 AND 120 + 11
 INTERSECT
 SELECT DISTINCT c_last_name, c_first_name, d_date
 FROM web_sales, date_dim, customer
 WHERE web_sales.ws_sold_date_sk = date_dim.d_date_sk
   AND web_sales.ws_bill_customer_sk = customer.c_customer_sk
   AND d_month_seq BETWEEN 120 AND 120 + 11) hot_cust
LIMIT 100""")

  private val q40 = tq("tpcds_q40",
    Seq("catalog_sales", "catalog_returns", "warehouse", "item", "date_dim"),
    """SELECT w_state, i_item_id,
       CAST(SUM(CASE WHEN d_date < DATE '2000-02-02'
                     THEN cs_sales_price - COALESCE(cr_refunded_cash,
                          CAST(0 AS DECIMAL(12,2))) ELSE CAST(0 AS DECIMAL(12,2))
                END) AS DOUBLE) sales_before,
       CAST(SUM(CASE WHEN d_date >= DATE '2000-02-02'
                     THEN cs_sales_price - COALESCE(cr_refunded_cash,
                          CAST(0 AS DECIMAL(12,2))) ELSE CAST(0 AS DECIMAL(12,2))
                END) AS DOUBLE) sales_after
FROM catalog_sales
LEFT OUTER JOIN catalog_returns ON (cs_order_number = cr_order_number
                                    AND cs_item_sk = cr_item_sk),
     warehouse, item, date_dim
WHERE i_current_price BETWEEN 920 AND 980
  AND i_item_sk = cs_item_sk
  AND cs_warehouse_sk = w_warehouse_sk
  AND cs_sold_date_sk = d_date_sk
  AND d_date BETWEEN DATE '2000-02-02' - 30 AND DATE '2000-02-02' + 30
GROUP BY w_state, i_item_id
ORDER BY w_state ASC NULLS FIRST, i_item_id ASC NULLS FIRST
LIMIT 100""")

  private val q41 = tq("tpcds_q41",
    Seq("item"),
    """SELECT DISTINCT (i_product_name) i_product_name
FROM item i1
WHERE i_manufact_id BETWEEN 732 AND 732 + 40
  AND (SELECT COUNT(*) item_cnt FROM item
       WHERE (i_manufact = i1.i_manufact AND
              ((i_category = 'Women' AND (i_color = 'red' OR i_color = 'blue')
                AND (i_units = 'Unknown' OR i_units = 'Ton')
                AND (i_size = 'petite' OR i_size = 'large'))
               OR (i_category = 'Women' AND (i_color = 'green' OR i_color = 'yellow')
                   AND (i_units = 'Unknown' OR i_units = 'Dram')
                   AND (i_size = 'small' OR i_size = 'medium'))
               OR (i_category = 'Men' AND (i_color = 'black' OR i_color = 'white')
                   AND (i_units = 'Unknown' OR i_units = 'Carton')
                   AND (i_size = 'small' OR i_size = 'extra large'))
               OR (i_category = 'Men' AND (i_color = 'violet' OR i_color = 'orange')
                   AND (i_units = 'Unknown' OR i_units = 'Gross')
                   AND (i_size = 'petite' OR i_size = 'medium'))))
          OR (i_manufact = i1.i_manufact AND
              ((i_category = 'Women' AND (i_color = 'red' OR i_color = 'black')
                AND (i_units = 'Unknown' OR i_units = 'Cup')
                AND (i_size = 'petite' OR i_size = 'extra large'))
               OR (i_category = 'Women' AND (i_color = 'white' OR i_color = 'violet')
                   AND (i_units = 'Unknown' OR i_units = 'Bundle')
                   AND (i_size = 'large' OR i_size = 'medium'))
               OR (i_category = 'Men' AND (i_color = 'blue' OR i_color = 'orange')
                   AND (i_units = 'Unknown' OR i_units = 'Dozen')
                   AND (i_size = 'small' OR i_size = 'medium'))
               OR (i_category = 'Men' AND (i_color = 'green' OR i_color = 'yellow')
                   AND (i_units = 'Unknown' OR i_units = 'Oz')
                   AND (i_size = 'petite' OR i_size = 'extra large'))))) > 0
ORDER BY i_product_name ASC NULLS FIRST
LIMIT 100""")

  private val q43 = tq("tpcds_q43",
    Seq("date_dim", "store_sales", "store"),
    """SELECT s_store_name, s_store_id,
       CAST(SUM(CASE WHEN d_day_name = 'Sunday' THEN ss_sales_price ELSE NULL END) AS DOUBLE) sun_sales,
       CAST(SUM(CASE WHEN d_day_name = 'Monday' THEN ss_sales_price ELSE NULL END) AS DOUBLE) mon_sales,
       CAST(SUM(CASE WHEN d_day_name = 'Tuesday' THEN ss_sales_price ELSE NULL END) AS DOUBLE) tue_sales,
       CAST(SUM(CASE WHEN d_day_name = 'Wednesday' THEN ss_sales_price ELSE NULL END) AS DOUBLE) wed_sales,
       CAST(SUM(CASE WHEN d_day_name = 'Thursday' THEN ss_sales_price ELSE NULL END) AS DOUBLE) thu_sales,
       CAST(SUM(CASE WHEN d_day_name = 'Friday' THEN ss_sales_price ELSE NULL END) AS DOUBLE) fri_sales,
       CAST(SUM(CASE WHEN d_day_name = 'Saturday' THEN ss_sales_price ELSE NULL END) AS DOUBLE) sat_sales
FROM date_dim, store_sales, store
WHERE d_date_sk = ss_sold_date_sk
  AND s_store_sk = ss_store_sk
  AND s_gmt_offset = -5
  AND d_year = 1999
GROUP BY s_store_name, s_store_id
ORDER BY s_store_name ASC NULLS FIRST, s_store_id ASC NULLS FIRST,
         sun_sales ASC NULLS FIRST, mon_sales ASC NULLS FIRST,
         tue_sales ASC NULLS FIRST, wed_sales ASC NULLS FIRST,
         thu_sales ASC NULLS FIRST, fri_sales ASC NULLS FIRST,
         sat_sales ASC NULLS FIRST
LIMIT 100""")

  private val q44 = tq("tpcds_q44",
    Seq("store_sales", "item"),
    """SELECT asceding.rnk, i1.i_product_name best_performing,
       i2.i_product_name worst_performing
FROM (SELECT * FROM (
        SELECT item_sk, CAST(RANK() OVER (ORDER BY rank_col ASC) AS BIGINT) rnk
        FROM (SELECT ss_item_sk item_sk,
                     CAST(SUM(ss_net_profit) AS DOUBLE) / COUNT(*) rank_col
              FROM store_sales ss1
              WHERE ss_store_sk = 4
              GROUP BY ss_item_sk
              HAVING CAST(SUM(ss_net_profit) AS DOUBLE) / COUNT(*) >
                     0.9 * (SELECT CAST(SUM(ss_net_profit) AS DOUBLE)
                                   / COUNT(*) rank_col
                            FROM store_sales
                            WHERE ss_store_sk = 4
                            GROUP BY ss_store_sk)) v1) v11
      WHERE rnk < 11) asceding,
     (SELECT * FROM (
        SELECT item_sk, CAST(RANK() OVER (ORDER BY rank_col DESC) AS BIGINT) rnk
        FROM (SELECT ss_item_sk item_sk,
                     CAST(SUM(ss_net_profit) AS DOUBLE) / COUNT(*) rank_col
              FROM store_sales ss1
              WHERE ss_store_sk = 4
              GROUP BY ss_item_sk
              HAVING CAST(SUM(ss_net_profit) AS DOUBLE) / COUNT(*) >
                     0.9 * (SELECT CAST(SUM(ss_net_profit) AS DOUBLE)
                                   / COUNT(*) rank_col
                            FROM store_sales
                            WHERE ss_store_sk = 4
                            GROUP BY ss_store_sk)) v2) v21
      WHERE rnk < 11) descending,
     item i1, item i2
WHERE asceding.rnk = descending.rnk
  AND i1.i_item_sk = asceding.item_sk
  AND i2.i_item_sk = descending.item_sk
ORDER BY asceding.rnk ASC NULLS FIRST, best_performing ASC NULLS FIRST,
         worst_performing ASC NULLS FIRST
LIMIT 100""")

  private val q45 = tq("tpcds_q45",
    Seq("web_sales", "customer", "customer_address", "date_dim", "item"),
    """SELECT ca_zip, ca_county, CAST(SUM(ws_sales_price) AS DOUBLE) sum_sales
FROM web_sales, customer, customer_address, date_dim, item
WHERE ws_bill_customer_sk = c_customer_sk
  AND c_current_addr_sk = ca_address_sk
  AND ws_item_sk = i_item_sk
  AND (SUBSTR(ca_zip, 1, 5) IN ('00089', '00172', '00255', '00338', '00421',
                                '00504', '00587', '00670', '00753')
       OR i_item_id IN (SELECT i_item_id FROM item
                        WHERE i_item_sk IN (2, 3, 5, 7, 11, 13, 17, 19, 23, 29)))
  AND ws_sold_date_sk = d_date_sk
  AND d_qoy = 2 AND d_year = 2000
GROUP BY ca_zip, ca_county
ORDER BY ca_zip ASC NULLS FIRST, ca_county ASC NULLS FIRST
LIMIT 100""")

  private val q46 = tq("tpcds_q46",
    Seq("store_sales", "date_dim", "store", "household_demographics",
      "customer_address", "customer"),
    """SELECT c_last_name, c_first_name, ca_city, bought_city, ss_ticket_number,
       amt, profit
FROM (SELECT ss_ticket_number, ss_customer_sk, ca_city bought_city,
             CAST(SUM(ss_coupon_amt) AS DOUBLE) amt,
             CAST(SUM(ss_net_profit) AS DOUBLE) profit
      FROM store_sales, date_dim, store, household_demographics,
           customer_address
      WHERE store_sales.ss_sold_date_sk = date_dim.d_date_sk
        AND store_sales.ss_store_sk = store.s_store_sk
        AND store_sales.ss_hdemo_sk = household_demographics.hd_demo_sk
        AND store_sales.ss_addr_sk = customer_address.ca_address_sk
        AND (household_demographics.hd_dep_count = 2
             OR household_demographics.hd_vehicle_count = 2)
        AND date_dim.d_dow IN (6, 0)
        AND date_dim.d_year IN (1999, 1999 + 1, 1999 + 2)
        AND store.s_city IN ('City4', 'City17', 'City30', 'City43', 'City56')
      GROUP BY ss_ticket_number, ss_customer_sk, ss_addr_sk, ca_city) dn,
     customer, customer_address current_addr
WHERE ss_customer_sk = c_customer_sk
  AND customer.c_current_addr_sk = current_addr.ca_address_sk
  AND current_addr.ca_city <> bought_city
ORDER BY c_last_name ASC NULLS FIRST, c_first_name ASC NULLS FIRST,
         ca_city ASC NULLS FIRST, bought_city ASC NULLS FIRST,
         ss_ticket_number ASC NULLS FIRST, amt ASC NULLS FIRST,
         profit ASC NULLS FIRST
LIMIT 100""")

  private val q48 = tq("tpcds_q48",
    Seq("store_sales", "store", "customer_demographics", "customer_address", "date_dim"),
    """SELECT CAST(SUM(CAST(ss_quantity AS BIGINT)) AS BIGINT) sum_qty
FROM store_sales, store, customer_demographics, customer_address, date_dim
WHERE s_store_sk = ss_store_sk
  AND ss_sold_date_sk = d_date_sk AND d_year = 1999
  AND ((cd_demo_sk = ss_cdemo_sk AND cd_marital_status = 'D'
        AND cd_education_status = 'College'
        AND ss_sales_price BETWEEN 1000.00 AND 1200.00)
       OR (cd_demo_sk = ss_cdemo_sk AND cd_marital_status = 'W'
           AND cd_education_status = 'Secondary'
           AND ss_sales_price BETWEEN 1200.00 AND 1500.00)
       OR (cd_demo_sk = ss_cdemo_sk AND cd_marital_status = 'M'
           AND cd_education_status = '2 yr Degree'
           AND ss_sales_price BETWEEN 1500.00 AND 2000.00))
  AND ((ss_addr_sk = ca_address_sk AND ca_country = 'United States'
        AND ca_state IN ('MN', 'IL', 'NY')
        AND ss_net_profit BETWEEN 0 AND 2000)
       OR (ss_addr_sk = ca_address_sk AND ca_country = 'United States'
           AND ca_state IN ('IN', 'TN', 'OH')
           AND ss_net_profit BETWEEN 150 AND 3000)
       OR (ss_addr_sk = ca_address_sk AND ca_country = 'United States'
           AND ca_state IN ('KS', 'CA', 'CO')
           AND ss_net_profit BETWEEN 50 AND 25000))""")

  val defs: Seq[OpQuery] =
    Seq(q33, q35, q36, q37, q38, q40, q41, q43, q44, q45, q46, q48)
}
