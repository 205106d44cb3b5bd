package graft.operators

import graft.OpQuery
import graft.sources.Tpcds

/** TPC-DS conformance sweep, part 3: the demographic / inventory /
  * revenue-ratio tier (reference corpus TPCDSBenchmarkQueries.scala:
  * 567-1226), same conventions as [[TpcdsQueries]], parameters fitted to
  * the graft generator domains.
  */
object TpcdsQueries3 {

  private def tq(name: String, tables: Seq[String], body: String): OpQuery =
    OpQuery(name, Some(Tpcds.oracle(tables, body)),
      (s, d) => { Tpcds.ensure(s, d); s.sql(body) })

  /** Sample stddev from exact integer moments — both engines run the
    * same few IEEE double ops on exact BIGINT sums, so the value is
    * bit-identical (STDDEV_SAMP's distributed float accumulation is not;
    * see TpcdsQueries header + q39). `c` must be an integral column. */
  private def stddevExact(c: String): String =
    s"""CASE WHEN COUNT($c) > 1 THEN SQRT(GREATEST(
       (CAST(SUM(CAST($c AS BIGINT) * $c) AS DOUBLE)
        - CAST(SUM(CAST($c AS BIGINT)) AS DOUBLE) / COUNT($c)
          * CAST(SUM(CAST($c AS BIGINT)) AS DOUBLE))
       / (COUNT($c) - 1), CAST(0 AS DOUBLE))) ELSE CAST(NULL AS DOUBLE) END"""

  /** Exact integral average: one IEEE division over exact sums. */
  private def avgIntExact(c: String): String =
    s"CAST(SUM(CAST($c AS BIGINT)) AS DOUBLE) / COUNT($c)"

  private val q10 = tq("tpcds_q10",
    Seq("customer", "customer_address", "customer_demographics",
      "store_sales", "web_sales", "catalog_sales", "date_dim"),
    """SELECT cd_gender, cd_marital_status, cd_education_status, COUNT(*) cnt1,
       cd_purchase_estimate, COUNT(*) cnt2, cd_credit_rating, COUNT(*) cnt3,
       cd_dep_count, COUNT(*) cnt4, cd_dep_employed_count, COUNT(*) cnt5,
       cd_dep_college_count, COUNT(*) cnt6
FROM customer c, customer_address ca, customer_demographics
WHERE c.c_current_addr_sk = ca.ca_address_sk
  AND ca_county IN ('County1', 'County7', 'County13', 'County19', 'County25')
  AND cd_demo_sk = c.c_current_cdemo_sk
  AND EXISTS (SELECT * FROM store_sales, date_dim
              WHERE c.c_customer_sk = ss_customer_sk
                AND ss_sold_date_sk = d_date_sk
                AND d_year = 2000 AND d_moy BETWEEN 4 AND 4 + 3)
  AND (EXISTS (SELECT * FROM web_sales, date_dim
               WHERE c.c_customer_sk = ws_bill_customer_sk
                 AND ws_sold_date_sk = d_date_sk
                 AND d_year = 2000 AND d_moy BETWEEN 4 AND 4 + 3)
       OR EXISTS (SELECT * FROM catalog_sales, date_dim
                  WHERE c.c_customer_sk = cs_ship_customer_sk
                    AND cs_sold_date_sk = d_date_sk
                    AND d_year = 2000 AND d_moy BETWEEN 4 AND 4 + 3))
GROUP BY cd_gender, cd_marital_status, cd_education_status,
         cd_purchase_estimate, cd_credit_rating, cd_dep_count,
         cd_dep_employed_count, cd_dep_college_count
ORDER BY cd_gender ASC NULLS FIRST, cd_marital_status ASC NULLS FIRST,
         cd_education_status ASC NULLS FIRST,
         cd_purchase_estimate ASC NULLS FIRST,
         cd_credit_rating ASC NULLS FIRST, cd_dep_count ASC NULLS FIRST,
         cd_dep_employed_count ASC NULLS FIRST,
         cd_dep_college_count ASC NULLS FIRST
LIMIT 100""")

  private val q12 = tq("tpcds_q12",
    Seq("web_sales", "item", "date_dim"),
    """SELECT i_item_id, i_item_desc, i_category, i_class,
       CAST(i_current_price AS DOUBLE) i_current_price,
       CAST(SUM(ws_ext_sales_price) AS DOUBLE) itemrevenue,
       CAST(SUM(ws_ext_sales_price) AS DOUBLE) * 100
         / CAST(SUM(SUM(ws_ext_sales_price)) OVER (PARTITION BY i_class)
                AS DOUBLE) revenueratio
FROM web_sales, item, date_dim
WHERE ws_item_sk = i_item_sk
  AND i_category IN ('Men', 'Books', 'Children')
  AND ws_sold_date_sk = d_date_sk
  AND d_date BETWEEN DATE '1999-03-28' AND DATE '1999-03-28' + 30
GROUP BY i_item_id, i_item_desc, i_category, i_class, i_current_price
ORDER BY i_category ASC NULLS FIRST, i_class ASC NULLS FIRST,
         i_item_id ASC NULLS FIRST, i_item_desc ASC NULLS FIRST,
         revenueratio ASC NULLS FIRST
LIMIT 100""")

  private val q13 = tq("tpcds_q13",
    Seq("store_sales", "store", "customer_demographics",
      "household_demographics", "customer_address", "date_dim"),
    s"""SELECT ${avgIntExact("ss_quantity")} agg1,
       CAST(SUM(ss_ext_sales_price) AS DOUBLE) / COUNT(*) agg2,
       CAST(SUM(ss_ext_wholesale_cost) AS DOUBLE) / COUNT(*) agg3,
       CAST(SUM(ss_ext_wholesale_cost) AS DOUBLE) agg4
FROM store_sales, store, customer_demographics, household_demographics,
     customer_address, date_dim
WHERE s_store_sk = ss_store_sk
  AND ss_sold_date_sk = d_date_sk AND d_year = 2000
  AND ((ss_hdemo_sk = hd_demo_sk AND cd_demo_sk = ss_cdemo_sk
        AND cd_marital_status = 'U' AND cd_education_status = 'Unknown'
        AND ss_sales_price BETWEEN 1000.00 AND 1200.00 AND hd_dep_count = 3)
       OR (ss_hdemo_sk = hd_demo_sk AND cd_demo_sk = ss_cdemo_sk
           AND cd_marital_status = 'W' AND cd_education_status = '2 yr Degree'
           AND ss_sales_price BETWEEN 1200.00 AND 1500.00 AND hd_dep_count = 1)
       OR (ss_hdemo_sk = hd_demo_sk AND cd_demo_sk = ss_cdemo_sk
           AND cd_marital_status = 'S' AND cd_education_status = 'College'
           AND ss_sales_price BETWEEN 1500.00 AND 2000.00 AND hd_dep_count = 1))
  AND ((ss_addr_sk = ca_address_sk AND ca_country = 'United States'
        AND ca_state IN ('GA', 'TX', 'VA')
        AND ss_net_profit BETWEEN 100 AND 5000)
       OR (ss_addr_sk = ca_address_sk AND ca_country = 'United States'
           AND ca_state IN ('TN', 'MO', 'NC')
           AND ss_net_profit BETWEEN 1000 AND 8000)
       OR (ss_addr_sk = ca_address_sk AND ca_country = 'United States'
           AND ca_state IN ('OK', 'MN', 'CA')
           AND ss_net_profit BETWEEN 500 AND 20000))""")

  private val q15 = tq("tpcds_q15",
    Seq("catalog_sales", "customer", "customer_address", "date_dim"),
    """SELECT ca_zip, CAST(SUM(cs_sales_price) AS DOUBLE) sum_sales
FROM catalog_sales, customer, customer_address, date_dim
WHERE cs_bill_customer_sk = c_customer_sk
  AND c_current_addr_sk = ca_address_sk
  AND (SUBSTR(ca_zip, 1, 5) IN ('00089', '00172', '00255', '00338', '00421',
                                '00504', '00587', '00670', '00753')
       OR ca_state IN ('CA', 'WA', 'GA')
       OR cs_sales_price > 1500)
  AND cs_sold_date_sk = d_date_sk
  AND d_qoy = 1 AND d_year = 2000
GROUP BY ca_zip
ORDER BY ca_zip ASC NULLS FIRST
LIMIT 100""")

  private val q17 = tq("tpcds_q17",
    Seq("store_sales", "store_returns", "catalog_sales", "date_dim", "store", "item"),
    s"""SELECT i_item_id, i_item_desc, s_state,
       COUNT(ss_quantity) store_sales_quantitycount,
       ${avgIntExact("ss_quantity")} store_sales_quantityave,
       ${stddevExact("ss_quantity")} store_sales_quantitystdev,
       ${stddevExact("ss_quantity")} / (${avgIntExact("ss_quantity")}) store_sales_quantitycov,
       COUNT(sr_return_quantity) store_returns_quantitycount,
       ${avgIntExact("sr_return_quantity")} store_returns_quantityave,
       ${stddevExact("sr_return_quantity")} store_returns_quantitystdev,
       ${stddevExact("sr_return_quantity")} / (${avgIntExact("sr_return_quantity")}) store_returns_quantitycov,
       COUNT(cs_quantity) catalog_sales_quantitycount,
       ${avgIntExact("cs_quantity")} catalog_sales_quantityave,
       ${stddevExact("cs_quantity")} catalog_sales_quantitystdev,
       ${stddevExact("cs_quantity")} / (${avgIntExact("cs_quantity")}) catalog_sales_quantitycov
FROM store_sales, store_returns, catalog_sales, date_dim d1, date_dim d2,
     date_dim d3, store, item
WHERE d1.d_quarter_name IN ('2000Q1', '2000Q2', '2000Q3', '2000Q4',
                            '2001Q1', '2001Q2', '2001Q3', '2001Q4')
  AND d1.d_date_sk = ss_sold_date_sk
  AND i_item_sk = ss_item_sk
  AND s_store_sk = ss_store_sk
  AND ss_customer_sk = sr_customer_sk
  AND ss_item_sk = sr_item_sk
  AND ss_ticket_number = sr_ticket_number
  AND sr_returned_date_sk = d2.d_date_sk
  AND d2.d_quarter_name IN ('2000Q1', '2000Q2', '2000Q3', '2000Q4',
                            '2001Q1', '2001Q2', '2001Q3', '2001Q4')
  AND sr_customer_sk = cs_bill_customer_sk
  AND sr_item_sk = cs_item_sk
  AND cs_sold_date_sk = d3.d_date_sk
  AND d3.d_quarter_name IN ('1999Q1', '1999Q2', '1999Q3', '1999Q4',
                            '2000Q1', '2000Q2', '2000Q3', '2000Q4',
                            '2001Q1', '2001Q2', '2001Q3', '2001Q4')
GROUP BY i_item_id, i_item_desc, s_state
ORDER BY i_item_id ASC NULLS FIRST, i_item_desc ASC NULLS FIRST,
         s_state ASC NULLS FIRST
LIMIT 100""")

  private val q18 = tq("tpcds_q18",
    Seq("catalog_sales", "customer_demographics", "customer",
      "customer_address", "date_dim", "item"),
    """SELECT i_item_id, ca_country, ca_state, ca_county,
       CAST(SUM(CAST(cs_quantity AS BIGINT)) AS DOUBLE) / COUNT(*) agg1,
       CAST(SUM(cs_list_price) AS DOUBLE) / COUNT(*) agg2,
       CAST(SUM(cs_coupon_amt) AS DOUBLE) / COUNT(*) agg3,
       CAST(SUM(cs_sales_price) AS DOUBLE) / COUNT(*) agg4,
       CAST(SUM(cs_net_profit) AS DOUBLE) / COUNT(*) agg5,
       CAST(SUM(CAST(c_birth_year AS BIGINT)) AS DOUBLE) / COUNT(*) agg6,
       CAST(SUM(CAST(cd1.cd_dep_count AS BIGINT)) AS DOUBLE) / COUNT(*) agg7
FROM catalog_sales, customer_demographics cd1, customer_demographics cd2,
     customer, customer_address, date_dim, item
WHERE cs_sold_date_sk = d_date_sk AND cs_item_sk = i_item_sk
  AND cs_bill_cdemo_sk = cd1.cd_demo_sk
  AND cs_bill_customer_sk = c_customer_sk
  AND cd1.cd_gender = 'F' AND cd1.cd_education_status = 'Primary'
  AND c_current_cdemo_sk = cd2.cd_demo_sk
  AND c_current_addr_sk = ca_address_sk
  AND c_birth_month IN (1, 5, 9, 3, 7, 11)
  AND d_year = 1999
  AND ca_state IN ('NY', 'MI', 'GA', 'OK', 'VA', 'IN')
GROUP BY ROLLUP (i_item_id, ca_country, ca_state, ca_county)
ORDER BY ca_country ASC NULLS FIRST, ca_state ASC NULLS FIRST,
         ca_county ASC NULLS FIRST, i_item_id ASC NULLS FIRST,
         agg1 ASC NULLS FIRST, agg2 ASC NULLS FIRST, agg3 ASC NULLS FIRST,
         agg4 ASC NULLS FIRST, agg5 ASC NULLS FIRST, agg6 ASC NULLS FIRST,
         agg7 ASC NULLS FIRST
LIMIT 100""")

  private val q19 = tq("tpcds_q19",
    Seq("date_dim", "store_sales", "item", "customer", "customer_address", "store"),
    """SELECT i_brand_id brand_id, i_brand brand, i_manufact_id, i_manufact,
       CAST(SUM(ss_ext_sales_price) AS DOUBLE) ext_price
FROM date_dim, store_sales, item, customer, customer_address, store
WHERE d_date_sk = ss_sold_date_sk
  AND ss_item_sk = i_item_sk
  AND i_manager_id = 26
  AND d_moy = 12 AND d_year = 2000
  AND ss_customer_sk = c_customer_sk
  AND c_current_addr_sk = ca_address_sk
  AND SUBSTR(ca_zip, 1, 5) <> SUBSTR(s_zip, 1, 5)
  AND ss_store_sk = s_store_sk
GROUP BY i_brand, i_brand_id, i_manufact_id, i_manufact
ORDER BY ext_price DESC NULLS LAST, i_brand ASC NULLS FIRST,
         i_brand_id ASC NULLS FIRST, i_manufact_id ASC NULLS FIRST,
         i_manufact ASC NULLS FIRST
LIMIT 100""")

  private val q20 = tq("tpcds_q20",
    Seq("catalog_sales", "item", "date_dim"),
    """SELECT i_item_id, i_item_desc, i_category, i_class,
       CAST(i_current_price AS DOUBLE) i_current_price,
       CAST(SUM(cs_ext_sales_price) AS DOUBLE) itemrevenue,
       CAST(SUM(cs_ext_sales_price) AS DOUBLE) * 100
         / CAST(SUM(SUM(cs_ext_sales_price)) OVER (PARTITION BY i_class)
                AS DOUBLE) revenueratio
FROM catalog_sales, item, date_dim
WHERE cs_item_sk = i_item_sk
  AND i_category IN ('Books', 'Home', 'Jewelry')
  AND cs_sold_date_sk = d_date_sk
  AND d_date BETWEEN DATE '1999-05-08' AND DATE '1999-05-08' + 30
GROUP BY i_item_id, i_item_desc, i_category, i_class, i_current_price
ORDER BY i_category ASC NULLS FIRST, i_class ASC NULLS FIRST,
         i_item_id ASC NULLS FIRST, i_item_desc ASC NULLS FIRST,
         revenueratio ASC NULLS FIRST
LIMIT 100""")

  private val q21 = tq("tpcds_q21",
    Seq("inventory", "warehouse", "item", "date_dim"),
    """SELECT * FROM (
 SELECT w_warehouse_name, i_item_id,
        CAST(SUM(CASE WHEN d_date < DATE '2000-05-22'
                      THEN CAST(inv_quantity_on_hand AS BIGINT)
                      ELSE 0 END) AS BIGINT) inv_before,
        CAST(SUM(CASE WHEN d_date >= DATE '2000-05-22'
                      THEN CAST(inv_quantity_on_hand AS BIGINT)
                      ELSE 0 END) AS BIGINT) inv_after
 FROM inventory, warehouse, item, date_dim
 WHERE i_current_price BETWEEN 990 AND 1490
   AND i_item_sk = inv_item_sk
   AND inv_warehouse_sk = w_warehouse_sk
   AND inv_date_sk = d_date_sk
   AND d_date BETWEEN DATE '2000-05-22' - 30 AND DATE '2000-05-22' + 30
 GROUP BY w_warehouse_name, i_item_id) x
WHERE (CASE WHEN inv_before > 0
            THEN CAST(inv_after AS DOUBLE) / inv_before
            ELSE NULL END) BETWEEN 2.0 / 3.0 AND 3.0 / 2.0
ORDER BY w_warehouse_name ASC NULLS FIRST, i_item_id ASC NULLS FIRST
LIMIT 100""")

  // The spec shape rolls up the raw inventory join, so Spark's Expand
  // multiplies every fact row x5 (one per grouping set) before any
  // aggregation; at 100 TB that is 5x the scan feeding the shuffle. SUM
  // and COUNT are decomposable over the item-attribute grouping sets, so
  // pre-aggregating per inv_item_sk first shrinks the rollup input from
  // |inventory| to |item| rows. Same exact BIGINT sums, same single IEEE
  // division — oracle-identical in both engines.
  private val q22 = tq("tpcds_q22",
    Seq("inventory", "date_dim", "item"),
    """SELECT i_product_name, i_brand, i_class, i_category,
       CAST(SUM(qty_sum) AS DOUBLE) / SUM(n_obs) qoh
FROM (SELECT inv_item_sk,
             SUM(CAST(inv_quantity_on_hand AS BIGINT)) qty_sum,
             COUNT(*) n_obs
      FROM inventory, date_dim
      WHERE inv_date_sk = d_date_sk
        AND d_month_seq BETWEEN 120 AND 120 + 11
      GROUP BY inv_item_sk) pre, item
WHERE inv_item_sk = i_item_sk
GROUP BY ROLLUP (i_product_name, i_brand, i_class, i_category)
ORDER BY qoh ASC NULLS FIRST, i_product_name ASC NULLS FIRST,
         i_brand ASC NULLS FIRST, i_class ASC NULLS FIRST,
         i_category ASC NULLS FIRST
LIMIT 100""")

  val defs: Seq[OpQuery] =
    Seq(q10, q12, q13, q15, q17, q18, q19, q20, q21, q22)
}
