package graft.sources

/** TPC-DS-shaped table generators in the dialect-common subset of Spark 4
  * ANSI SQL and DuckDB SQL (reference schema: TPCDSDataLoad.scala:163-645;
  * the 24 benchmark tables of TPCDSDataLoad.scala:153-160).
  *
  * Each generator derives deterministically from the graft testdata tables
  * (lineitem/orders/customer/part/nation) or range(); the exact same text
  * runs as a Spark temp view during staging and as a DuckDB CTE in the
  * oracle, so both engines see bit-identical data. Channel split: store =
  * l_orderkey % 4 IN (0,1), catalog = 2, web = 3; returns are each
  * channel's 'R'-flagged lines, so sales<->returns joins behave like the
  * reference's (shared order/ticket + item keys).
  *
  * Engine-determinism rules baked into the text:
  *   - never CAST a fractional double to an integer type (Spark truncates,
  *     DuckDB rounds); all money math is integer cents, surfaced via one
  *     exact /100.0 division into DECIMAL(12,2)
  *   - every EXTRACT wrapped in CAST (Spark INT vs DuckDB BIGINT)
  *   - fact-side purchase-time demographics hash differently from the
  *     customer dimension's current demographics (q64 compares cd1 <> cd2)
  */
object TpcdsSchema {

  /** (table, generator SQL) ordered so CTEs only reference earlier CTEs. */
  val generators: Seq[(String, String)] = Seq(
    "date_dim" -> """SELECT
  CAST(day_id AS BIGINT)                          AS d_date_sk,
  'D' || LPAD(CAST(day_id AS STRING), 7, '0')     AS d_date_id,
  cal_date                                        AS d_date,
  CAST(EXTRACT(YEAR FROM cal_date) AS INT)        AS d_year,
  CAST(EXTRACT(MONTH FROM cal_date) AS INT)       AS d_moy,
  CAST(EXTRACT(DAY FROM cal_date) AS INT)         AS d_dom,
  CAST(FLOOR((EXTRACT(MONTH FROM cal_date) - 1) / 3) + 1 AS INT) AS d_qoy,
  CAST((EXTRACT(YEAR FROM cal_date) - 1990) * 12
       + EXTRACT(MONTH FROM cal_date) - 1 AS INT) AS d_month_seq,
  CAST(FLOOR(day_id / 7) AS INT)                  AS d_week_seq,
  CAST(day_id % 7 AS INT)                         AS d_dow,
  CASE CAST(day_id % 7 AS INT)
    WHEN 0 THEN 'Sunday' WHEN 1 THEN 'Monday' WHEN 2 THEN 'Tuesday'
    WHEN 3 THEN 'Wednesday' WHEN 4 THEN 'Thursday' WHEN 5 THEN 'Friday'
    ELSE 'Saturday' END                           AS d_day_name,
  CAST(EXTRACT(YEAR FROM cal_date) AS STRING) || 'Q'
    || CAST(CAST(FLOOR((EXTRACT(MONTH FROM cal_date) - 1) / 3) + 1 AS INT)
            AS STRING)                            AS d_quarter_name,
  CASE WHEN CAST(day_id % 7 AS INT) IN (0, 6) THEN 'Y' ELSE 'N' END AS d_weekend,
  'N'                                             AS d_holiday,
  CAST(EXTRACT(YEAR FROM cal_date) AS INT)        AS d_fy_year
FROM (SELECT id AS day_id, DATE '1995-01-01' + CAST(id AS INT) AS cal_date
      FROM range(0, 2922) t(id)) c""",
    "time_dim" -> """SELECT
  CAST(id AS BIGINT)                              AS t_time_sk,
  'T' || LPAD(CAST(id AS STRING), 6, '0')         AS t_time_id,
  CAST(id AS INT)                                 AS t_time,
  CAST(FLOOR(id / 3600) AS INT)                   AS t_hour,
  CAST(FLOOR(id / 60) % 60 AS INT)                AS t_minute,
  CAST(id % 60 AS INT)                            AS t_second,
  CASE WHEN id < 43200 THEN 'AM' ELSE 'PM' END    AS t_am_pm,
  CASE WHEN id < 28800 THEN 'first' WHEN id < 57600 THEN 'second'
       ELSE 'third' END                           AS t_shift,
  CASE WHEN FLOOR(id / 3600) % 24 BETWEEN 6 AND 11 THEN 'breakfast'
       WHEN FLOOR(id / 3600) % 24 BETWEEN 12 AND 20 THEN 'dinner'
       ELSE 'night' END                           AS t_meal_time
FROM range(0, 86400) t(id)""",
    "item" -> """SELECT
  p_partkey                                       AS i_item_sk,
  'ITEM' || LPAD(CAST(p_partkey AS STRING), 10, '0') AS i_item_id,
  DATE '1995-01-01'                               AS i_rec_start_date,
  CAST(NULL AS DATE)                              AS i_rec_end_date,
  p_name                                          AS i_item_desc,
  CAST(p_retailprice AS DECIMAL(12,2))            AS i_current_price,
  CAST(CAST(CAST(p_retailprice AS DECIMAL(12,2)) * 100 AS BIGINT) * 6
       / 10.0 / 100.0 AS DECIMAL(12,2))           AS i_wholesale_cost,
  CAST((p_partkey * 131 + 7) % 1000 + 1 AS INT)   AS i_brand_id,
  p_brand                                         AS i_brand,
  CAST((p_partkey * 29 + 5) % 100 + 1 AS INT)     AS i_class_id,
  SUBSTR(p_type, 1, 10)                           AS i_class,
  CAST(p_partkey % 10 + 1 AS INT)                 AS i_category_id,
  CASE CAST(p_partkey % 10 AS INT)
    WHEN 0 THEN 'Books' WHEN 1 THEN 'Electronics' WHEN 2 THEN 'Home'
    WHEN 3 THEN 'Jewelry' WHEN 4 THEN 'Men' WHEN 5 THEN 'Music'
    WHEN 6 THEN 'Shoes' WHEN 7 THEN 'Sports' WHEN 8 THEN 'Children'
    ELSE 'Women' END                              AS i_category,
  CAST((p_partkey * 17 + 11) % 1000 + 1 AS INT)   AS i_manufact_id,
  'manu' || CAST((p_partkey * 17 + 11) % 1000 + 1 AS STRING) AS i_manufact,
  CASE CAST(p_partkey % 5 AS INT)
    WHEN 0 THEN 'small' WHEN 1 THEN 'petite' WHEN 2 THEN 'medium'
    WHEN 3 THEN 'large' ELSE 'extra large' END    AS i_size,
  CASE CAST((p_partkey * 43 + 19) % 8 AS INT)
    WHEN 0 THEN 'red' WHEN 1 THEN 'blue' WHEN 2 THEN 'green'
    WHEN 3 THEN 'yellow' WHEN 4 THEN 'black' WHEN 5 THEN 'white'
    WHEN 6 THEN 'violet' ELSE 'orange' END        AS i_color,
  'Unknown'                                       AS i_units,
  'Unknown'                                       AS i_container,
  CAST((p_partkey * 37 + 13) % 100 + 1 AS INT)    AS i_manager_id,
  p_name                                          AS i_product_name
FROM part""",
    "customer" -> """SELECT
  c.c_custkey                                     AS c_customer_sk,
  'CUST' || LPAD(CAST(c.c_custkey AS STRING), 12, '0') AS c_customer_id,
  (c.c_custkey * 53 + 7) % 7200 + 1               AS c_current_cdemo_sk,
  (c.c_custkey * 31 + 11) % 720 + 1               AS c_current_hdemo_sk,
  c.c_custkey                                     AS c_current_addr_sk,
  (c.c_custkey * 13 + 3) % 2557                   AS c_first_shipto_date_sk,
  (c.c_custkey * 17 + 5) % 2557                   AS c_first_sales_date_sk,
  CASE CAST(c.c_custkey % 6 AS INT)
    WHEN 0 THEN 'Mr.' WHEN 1 THEN 'Mrs.' WHEN 2 THEN 'Ms.'
    WHEN 3 THEN 'Dr.' WHEN 4 THEN 'Miss' ELSE 'Sir' END AS c_salutation,
  'First' || CAST(c.c_custkey % 997 AS STRING)    AS c_first_name,
  'Last' || CAST(c.c_custkey % 89 AS STRING)      AS c_last_name,
  CASE WHEN c.c_custkey % 2 = 0 THEN 'Y' ELSE 'N' END AS c_preferred_cust_flag,
  CAST(c.c_custkey % 28 + 1 AS INT)               AS c_birth_day,
  CAST(c.c_custkey % 12 + 1 AS INT)               AS c_birth_month,
  CAST(1920 + c.c_custkey % 73 AS INT)            AS c_birth_year,
  n.n_name                                        AS c_birth_country,
  'login' || CAST(c.c_custkey AS STRING)          AS c_login,
  'c' || CAST(c.c_custkey AS STRING) || '@example.com' AS c_email_address,
  (c.c_custkey * 13 + 3) % 2557                   AS c_last_review_date_sk
FROM customer_src c JOIN nation n ON c.c_nationkey = n.n_nationkey""",
    "customer_address" -> """SELECT
  c_custkey                                       AS ca_address_sk,
  'ADDR' || LPAD(CAST(c_custkey AS STRING), 12, '0') AS ca_address_id,
  CAST((c_custkey * 61 + 1) % 999 + 1 AS STRING)  AS ca_street_number,
  'Street' || CAST((c_custkey * 67 + 2) % 50 AS STRING) AS ca_street_name,
  CASE CAST(c_custkey % 4 AS INT)
    WHEN 0 THEN 'Ave' WHEN 1 THEN 'Blvd' WHEN 2 THEN 'St'
    ELSE 'Way' END                                AS ca_street_type,
  'Suite ' || CAST((c_custkey * 71 + 3) % 100 AS STRING) AS ca_suite_number,
  'City' || CAST((c_custkey * 73 + 4) % 60 AS STRING)    AS ca_city,
  'County' || CAST((c_custkey * 79 + 5) % 30 AS STRING)  AS ca_county,
  CASE CAST(c_custkey % 20 AS INT)
    WHEN 0 THEN 'AL' WHEN 1 THEN 'CA' WHEN 2 THEN 'CO' WHEN 3 THEN 'FL'
    WHEN 4 THEN 'GA' WHEN 5 THEN 'IL' WHEN 6 THEN 'IN' WHEN 7 THEN 'KS'
    WHEN 8 THEN 'MI' WHEN 9 THEN 'MN' WHEN 10 THEN 'MO' WHEN 11 THEN 'NC'
    WHEN 12 THEN 'NY' WHEN 13 THEN 'OH' WHEN 14 THEN 'OK' WHEN 15 THEN 'PA'
    WHEN 16 THEN 'TN' WHEN 17 THEN 'TX' WHEN 18 THEN 'VA'
    ELSE 'WA' END                                 AS ca_state,
  LPAD(CAST((c_custkey * 83 + 6) % 100000 AS STRING), 5, '0') AS ca_zip,
  'United States'                                 AS ca_country,
  CAST(0 - (5 + c_custkey % 4) AS DECIMAL(5,2))   AS ca_gmt_offset,
  CASE CAST(c_custkey % 3 AS INT)
    WHEN 0 THEN 'apartment' WHEN 1 THEN 'condo'
    ELSE 'single family' END                      AS ca_location_type
FROM customer_src""",
    "customer_demographics" -> """SELECT
  CAST(id + 1 AS BIGINT)                          AS cd_demo_sk,
  CASE CAST(id % 2 AS INT) WHEN 0 THEN 'M' ELSE 'F' END AS cd_gender,
  CASE CAST(id % 5 AS INT)
    WHEN 0 THEN 'M' WHEN 1 THEN 'S' WHEN 2 THEN 'D' WHEN 3 THEN 'W'
    ELSE 'U' END                                  AS cd_marital_status,
  CASE CAST(FLOOR(id / 10) % 7 AS INT)
    WHEN 0 THEN 'Primary' WHEN 1 THEN 'Secondary' WHEN 2 THEN 'College'
    WHEN 3 THEN '2 yr Degree' WHEN 4 THEN '4 yr Degree'
    WHEN 5 THEN 'Advanced Degree' ELSE 'Unknown' END AS cd_education_status,
  CAST((id % 20 + 1) * 500 AS INT)                AS cd_purchase_estimate,
  CASE CAST(id % 4 AS INT)
    WHEN 0 THEN 'Good' WHEN 1 THEN 'High Risk' WHEN 2 THEN 'Low Risk'
    ELSE 'Unknown' END                            AS cd_credit_rating,
  CAST(id % 7 AS INT)                             AS cd_dep_count,
  CAST(id % 5 AS INT)                             AS cd_dep_employed_count,
  CAST(id % 3 AS INT)                             AS cd_dep_college_count
FROM range(0, 7200) t(id)""",
    "household_demographics" -> """SELECT
  CAST(id + 1 AS BIGINT)                          AS hd_demo_sk,
  CAST(id % 20 + 1 AS BIGINT)                     AS hd_income_band_sk,
  CASE CAST(id % 6 AS INT)
    WHEN 0 THEN '0-500' WHEN 1 THEN '501-1000' WHEN 2 THEN '1001-5000'
    WHEN 3 THEN '5001-10000' WHEN 4 THEN '>10000'
    ELSE 'Unknown' END                            AS hd_buy_potential,
  CAST(id % 10 AS INT)                            AS hd_dep_count,
  CAST(id % 6 AS INT)                             AS hd_vehicle_count
FROM range(0, 720) t(id)""",
    "income_band" -> """SELECT
  CAST(id + 1 AS BIGINT)                          AS ib_income_band_sk,
  CAST(id * 10000 AS INT)                         AS ib_lower_bound,
  CAST((id + 1) * 10000 AS INT)                   AS ib_upper_bound
FROM range(0, 20) t(id)""",
    "store" -> """SELECT
  CAST(id + 1 AS BIGINT)                          AS s_store_sk,
  'STORE' || LPAD(CAST(id AS STRING), 6, '0')     AS s_store_id,
  'Store' || CAST(id AS STRING)                   AS s_store_name,
  CAST(150 + id * 13 AS INT)                      AS s_number_employees,
  CAST(5000000 + id * 37411 AS INT)               AS s_floor_space,
  '8AM-10PM'                                      AS s_hours,
  'Manager' || CAST(id AS STRING)                 AS s_manager,
  CAST(id % 6 + 1 AS INT)                         AS s_market_id,
  CAST(id % 3 + 1 AS INT)                         AS s_company_id,
  'Company' || CAST(id % 3 AS STRING)             AS s_company_name,
  CAST((id * 61 + 1) % 999 + 1 AS STRING)         AS s_street_number,
  'Street' || CAST((id * 67 + 2) % 50 AS STRING)  AS s_street_name,
  'Ave'                                           AS s_street_type,
  'Suite ' || CAST(id AS STRING)                  AS s_suite_number,
  'City' || CAST((id * 73 + 4) % 60 AS STRING)    AS s_city,
  'County' || CAST((id * 79 + 5) % 30 AS STRING)  AS s_county,
  CASE CAST(id % 8 AS INT)
    WHEN 0 THEN 'CA' WHEN 1 THEN 'TX' WHEN 2 THEN 'NY' WHEN 3 THEN 'FL'
    WHEN 4 THEN 'IL' WHEN 5 THEN 'OH' WHEN 6 THEN 'GA'
    ELSE 'WA' END                                 AS s_state,
  LPAD(CAST((id * 83 + 6) % 100000 AS STRING), 5, '0') AS s_zip,
  'United States'                                 AS s_country,
  CAST(-5 AS DECIMAL(5,2))                        AS s_gmt_offset,
  CAST((id % 10) / 100.0 AS DECIMAL(5,2))         AS s_tax_percentage
FROM range(0, 12) t(id)""",
    "warehouse" -> """SELECT
  CAST(id + 1 AS BIGINT)                          AS w_warehouse_sk,
  'WH' || LPAD(CAST(id AS STRING), 4, '0')        AS w_warehouse_id,
  'Warehouse' || CAST(id AS STRING)               AS w_warehouse_name,
  CAST(100000 * (id + 1) AS INT)                  AS w_warehouse_sq_ft,
  'City' || CAST(id AS STRING)                    AS w_city,
  'County' || CAST(id AS STRING)                  AS w_county,
  CASE CAST(id % 5 AS INT)
    WHEN 0 THEN 'CA' WHEN 1 THEN 'TX' WHEN 2 THEN 'NY' WHEN 3 THEN 'FL'
    ELSE 'IL' END                                 AS w_state,
  'United States'                                 AS w_country
FROM range(0, 5) t(id)""",
    "call_center" -> """SELECT
  CAST(id + 1 AS BIGINT)                          AS cc_call_center_sk,
  'CC' || LPAD(CAST(id AS STRING), 4, '0')        AS cc_call_center_id,
  'CallCenter' || CAST(id AS STRING)              AS cc_name,
  CASE CAST(id % 3 AS INT) WHEN 0 THEN 'small' WHEN 1 THEN 'medium'
    ELSE 'large' END                              AS cc_class,
  CAST(50 + id * 11 AS INT)                       AS cc_employees,
  'Manager' || CAST(id AS STRING)                 AS cc_manager,
  'County' || CAST(id AS STRING)                  AS cc_county
FROM range(0, 4) t(id)""",
    "web_site" -> """SELECT
  CAST(id + 1 AS BIGINT)                          AS web_site_sk,
  'WEB' || LPAD(CAST(id AS STRING), 4, '0')       AS web_site_id,
  'Site' || CAST(id AS STRING)                    AS web_name,
  'Manager' || CAST(id AS STRING)                 AS web_manager
FROM range(0, 4) t(id)""",
    "web_page" -> """SELECT
  CAST(id + 1 AS BIGINT)                          AS wp_web_page_sk,
  'WP' || LPAD(CAST(id AS STRING), 4, '0')        AS wp_web_page_id,
  CAST(100 * (id + 1) AS INT)                     AS wp_char_count,
  CAST(id % 4 AS INT)                             AS wp_link_count,
  CASE CAST(id % 2 AS INT) WHEN 0 THEN 'Y' ELSE 'N' END AS wp_autogen_flag
FROM range(0, 8) t(id)""",
    "catalog_page" -> """SELECT
  CAST(id + 1 AS BIGINT)                          AS cp_catalog_page_sk,
  'CP' || LPAD(CAST(id AS STRING), 6, '0')        AS cp_catalog_page_id,
  CAST(FLOOR(id / 10) + 1 AS INT)                 AS cp_catalog_number,
  CAST(id % 10 + 1 AS INT)                        AS cp_catalog_page_number,
  'DEPT' || CAST(id % 5 AS STRING)                AS cp_department,
  CASE CAST(id % 3 AS INT) WHEN 0 THEN 'bi-annual' WHEN 1 THEN 'quarterly'
    ELSE 'monthly' END                            AS cp_type
FROM range(0, 40) t(id)""",
    "promotion" -> """SELECT
  CAST(id + 1 AS BIGINT)                          AS p_promo_sk,
  'PROMO' || LPAD(CAST(id AS STRING), 6, '0')     AS p_promo_id,
  CAST(1000 * (id + 1) AS DECIMAL(15,2))          AS p_cost,
  CAST(id % 3 + 1 AS INT)                         AS p_response_target,
  'promo' || CAST(id AS STRING)                   AS p_promo_name,
  CASE CAST(id % 2 AS INT) WHEN 0 THEN 'Y' ELSE 'N' END AS p_channel_dmail,
  CASE CAST(id % 3 AS INT) WHEN 0 THEN 'Y' ELSE 'N' END AS p_channel_email,
  CASE CAST(id % 5 AS INT) WHEN 0 THEN 'Y' ELSE 'N' END AS p_channel_catalog,
  CASE CAST(id % 7 AS INT) WHEN 0 THEN 'Y' ELSE 'N' END AS p_channel_tv,
  CASE CAST(id % 4 AS INT) WHEN 0 THEN 'Y' ELSE 'N' END AS p_channel_event,
  'Unknown'                                       AS p_purpose,
  'N'                                             AS p_discount_active
FROM range(0, 30) t(id)""",
    "reason" -> """SELECT
  CAST(id + 1 AS BIGINT)                          AS r_reason_sk,
  'R' || LPAD(CAST(id AS STRING), 4, '0')         AS r_reason_id,
  'reason ' || CAST(id AS STRING)                 AS r_reason_desc
FROM range(0, 10) t(id)""",
    "ship_mode" -> """SELECT
  CAST(id + 1 AS BIGINT)                          AS sm_ship_mode_sk,
  'SM' || LPAD(CAST(id AS STRING), 4, '0')        AS sm_ship_mode_id,
  CASE CAST(id % 5 AS INT)
    WHEN 0 THEN 'EXPRESS' WHEN 1 THEN 'NEXT DAY' WHEN 2 THEN 'OVERNIGHT'
    WHEN 3 THEN 'REGULAR' ELSE 'TWO DAY' END      AS sm_type,
  CASE CAST(id % 4 AS INT)
    WHEN 0 THEN 'AIR' WHEN 1 THEN 'GROUND' WHEN 2 THEN 'SEA'
    ELSE 'RAIL' END                               AS sm_code,
  'Carrier' || CAST(id AS STRING)                 AS sm_carrier
FROM range(0, 20) t(id)""",
    "store_sales" -> """SELECT
    x.sold_sk                                       AS ss_sold_date_sk,
    x.time_sk                                       AS ss_sold_time_sk,
    x.ikey                                          AS ss_item_sk,
    x.ckey                                          AS ss_customer_sk,
    (x.ckey * 59 + 23) % 7200 + 1                    AS ss_cdemo_sk,
    (x.ckey * 37 + 17) % 720 + 1                    AS ss_hdemo_sk,
    -- purchase-time address: the mirror of the customer's CURRENT address
    -- (q46/q68 compare bought-city vs current-city; ckey itself would make
    -- the two identical and the comparison structurally empty)
    (SELECT MAX(c_custkey) FROM customer_src) + 1 - x.ckey AS ss_addr_sk,
    x.skey % 12 + 1                                 AS ss_store_sk,
    x.promo_sk                                      AS ss_promo_sk,
    x.okey                                          AS ss_ticket_number,
    CAST(x.qty AS INT)                              AS ss_quantity,

    CAST(x.cents / 100.0 AS DECIMAL(12,2))          AS ss_ext_sales_price,
    CAST(x.sp_c / 100.0 AS DECIMAL(12,2))           AS ss_sales_price,
    CAST(x.dsc_c / 100.0 AS DECIMAL(12,2))          AS ss_ext_discount_amt,
    CAST(x.wc_c / 100.0 AS DECIMAL(12,2))           AS ss_ext_wholesale_cost,
    CAST(CAST(FLOOR(x.wc_c / x.qty) AS BIGINT) / 100.0 AS DECIMAL(12,2)) AS ss_wholesale_cost,
    CAST(x.lp_c / 100.0 AS DECIMAL(12,2))           AS ss_ext_list_price,
    CAST(CAST(FLOOR(x.lp_c / x.qty) AS BIGINT) / 100.0 AS DECIMAL(12,2)) AS ss_list_price,
    CAST(x.tax_c / 100.0 AS DECIMAL(12,2))          AS ss_ext_tax,
    CAST(x.cpn_c / 100.0 AS DECIMAL(12,2))          AS ss_coupon_amt,
    CAST((x.cents - x.cpn_c) / 100.0 AS DECIMAL(12,2)) AS ss_net_paid,
    CAST((x.cents - x.cpn_c + x.tax_c) / 100.0 AS DECIMAL(12,2)) AS ss_net_paid_inc_tax,
    CAST((x.cents - x.cpn_c - x.wc_c) / 100.0 AS DECIMAL(12,2)) AS ss_net_profit
FROM (
  SELECT b.*,
         d.d_date_sk AS sold_sk,
         (b.okey * 7 + b.lnum * 13 + 1) % 86400 AS time_sk,
         CAST(FLOOR(b.cents / b.qty) AS BIGINT) AS sp_c,
         CAST(FLOOR(b.cents * b.disc_pct / 100) AS BIGINT) AS dsc_c,
         CAST(FLOOR(b.cents * 6 / 10) AS BIGINT) AS wc_c,
         CAST(FLOOR(b.cents * 12 / 10) AS BIGINT) AS lp_c,
         CAST(FLOOR(b.cents * b.tax_pct / 100) AS BIGINT) AS tax_c,
         CASE WHEN b.ikey % 5 = 0 THEN CAST(FLOOR(b.cents / 20) AS BIGINT)
              ELSE 0 END AS cpn_c,
         CASE WHEN b.ikey % 5 = 0 THEN b.ikey % 30 + 1
              ELSE CAST(NULL AS BIGINT) END AS promo_sk,
         CAST(FLOOR(b.cents / 8) AS BIGINT) AS ship_c
  FROM (
  SELECT l.l_orderkey AS okey, l.l_partkey AS ikey, l.l_suppkey AS skey,
         l.l_linenumber AS lnum, o.o_custkey AS ckey,
         l.l_returnflag AS rflag,
         CAST(l.l_shipdate AS DATE) AS sdate,
         CAST(o.o_orderdate AS DATE) AS odate,
         CAST(l.l_quantity AS BIGINT) AS qty,
         CAST(CAST(l.l_extendedprice AS DECIMAL(12,2)) * 100 AS BIGINT) AS cents,
         CAST(CAST(l.l_discount AS DECIMAL(4,2)) * 100 AS BIGINT) AS disc_pct,
         CAST(CAST(l.l_tax AS DECIMAL(4,2)) * 100 AS BIGINT) AS tax_pct
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
  WHERE l.l_orderkey % 4 IN (0, 1)) b JOIN date_dim d ON d.d_date = b.sdate) x""",
    "store_returns" -> """SELECT
    r.sold_sk + (r.okey % 60) + 3                   AS sr_returned_date_sk,
    r.time_sk                                       AS sr_return_time_sk,
    r.ikey                                          AS sr_item_sk,
    r.ckey                                          AS sr_customer_sk,
    (r.ckey * 59 + 23) % 7200 + 1                    AS sr_cdemo_sk,
    (r.ckey * 37 + 17) % 720 + 1                    AS sr_hdemo_sk,
    -- mirrors ss_addr_sk (the return is filed from the purchase address)
    (SELECT MAX(c_custkey) FROM customer_src) + 1 - r.ckey AS sr_addr_sk,
    r.skey % 12 + 1                                 AS sr_store_sk,
    (r.okey * 3 + r.lnum) % 10 + 1                  AS sr_reason_sk,
    r.okey                                          AS sr_ticket_number,
    CAST(r.rqty AS INT)                             AS sr_return_quantity,

    CAST(r.ret_c / 100.0 AS DECIMAL(12,2))          AS sr_return_amt,
    CAST(CAST(FLOOR(r.ret_c * r.disc_pct / 100) AS BIGINT) / 100.0 AS DECIMAL(12,2)) AS sr_return_tax,
    CAST((r.ret_c + CAST(FLOOR(r.ret_c * r.disc_pct / 100) AS BIGINT)) / 100.0 AS DECIMAL(12,2)) AS sr_return_amt_inc_tax,
    CAST(CAST(FLOOR(r.ret_c / 50) AS BIGINT) / 100.0 AS DECIMAL(12,2)) AS sr_fee,
    CAST(CAST(FLOOR(r.ret_c / 10) AS BIGINT) / 100.0 AS DECIMAL(12,2)) AS sr_return_ship_cost,
    CAST(CAST(FLOOR(r.ret_c * 6 / 10) AS BIGINT) / 100.0 AS DECIMAL(12,2)) AS sr_refunded_cash,
    CAST(CAST(FLOOR(r.ret_c * 2 / 10) AS BIGINT) / 100.0 AS DECIMAL(12,2)) AS sr_reversed_charge,
    CAST((r.ret_c - CAST(FLOOR(r.ret_c * 6 / 10) AS BIGINT)
          - CAST(FLOOR(r.ret_c * 2 / 10) AS BIGINT)) / 100.0 AS DECIMAL(12,2)) AS sr_store_credit,
    CAST((CAST(FLOOR(r.ret_c / 10) AS BIGINT)
          + CAST(FLOOR(r.ret_c / 50) AS BIGINT)) / 100.0 AS DECIMAL(12,2)) AS sr_net_loss
FROM (
  SELECT x.*,
         CAST(FLOOR(x.qty / 2) + 1 AS BIGINT) AS rqty,
         CAST(FLOOR(x.cents * (CAST(FLOOR(x.qty / 2) AS BIGINT) + 1) / x.qty) AS BIGINT) AS ret_c
  FROM (
  SELECT b.*,
         d.d_date_sk AS sold_sk,
         (b.okey * 7 + b.lnum * 13 + 1) % 86400 AS time_sk,
         CAST(FLOOR(b.cents / b.qty) AS BIGINT) AS sp_c,
         CAST(FLOOR(b.cents * b.disc_pct / 100) AS BIGINT) AS dsc_c,
         CAST(FLOOR(b.cents * 6 / 10) AS BIGINT) AS wc_c,
         CAST(FLOOR(b.cents * 12 / 10) AS BIGINT) AS lp_c,
         CAST(FLOOR(b.cents * b.tax_pct / 100) AS BIGINT) AS tax_c,
         CASE WHEN b.ikey % 5 = 0 THEN CAST(FLOOR(b.cents / 20) AS BIGINT)
              ELSE 0 END AS cpn_c,
         CASE WHEN b.ikey % 5 = 0 THEN b.ikey % 30 + 1
              ELSE CAST(NULL AS BIGINT) END AS promo_sk,
         CAST(FLOOR(b.cents / 8) AS BIGINT) AS ship_c
  FROM (
  SELECT l.l_orderkey AS okey, l.l_partkey AS ikey, l.l_suppkey AS skey,
         l.l_linenumber AS lnum, o.o_custkey AS ckey,
         l.l_returnflag AS rflag,
         CAST(l.l_shipdate AS DATE) AS sdate,
         CAST(o.o_orderdate AS DATE) AS odate,
         CAST(l.l_quantity AS BIGINT) AS qty,
         CAST(CAST(l.l_extendedprice AS DECIMAL(12,2)) * 100 AS BIGINT) AS cents,
         CAST(CAST(l.l_discount AS DECIMAL(4,2)) * 100 AS BIGINT) AS disc_pct,
         CAST(CAST(l.l_tax AS DECIMAL(4,2)) * 100 AS BIGINT) AS tax_pct
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
  WHERE l.l_orderkey % 4 IN (0, 1)) b JOIN date_dim d ON d.d_date = b.sdate) x
  WHERE x.rflag = 'R') r""",
    "catalog_sales" -> """SELECT
    x.sold_sk                                       AS cs_sold_date_sk,
    x.time_sk                                       AS cs_sold_time_sk,
    x.sold_sk + (x.okey * 3 + x.lnum) % 30 + 2      AS cs_ship_date_sk,
    x.ckey                                          AS cs_bill_customer_sk,
    (x.ckey * 59 + 23) % 7200 + 1                    AS cs_bill_cdemo_sk,
    (x.ckey * 37 + 17) % 720 + 1                    AS cs_bill_hdemo_sk,
    x.ckey                                          AS cs_bill_addr_sk,
    x.ckey                                          AS cs_ship_customer_sk,
    (x.ckey * 59 + 23) % 7200 + 1                    AS cs_ship_cdemo_sk,
    (x.ckey * 37 + 17) % 720 + 1                    AS cs_ship_hdemo_sk,
    x.ckey                                          AS cs_ship_addr_sk,
    (x.okey * 5 + 1) % 4 + 1                        AS cs_call_center_sk,
    (x.okey * 11 + x.lnum) % 40 + 1                 AS cs_catalog_page_sk,
    (x.okey + x.lnum) % 20 + 1                      AS cs_ship_mode_sk,
    x.skey % 5 + 1                                  AS cs_warehouse_sk,
    x.ikey                                          AS cs_item_sk,
    x.promo_sk                                      AS cs_promo_sk,
    x.okey                                          AS cs_order_number,
    CAST(x.qty AS INT)                              AS cs_quantity,

    CAST(x.cents / 100.0 AS DECIMAL(12,2))          AS cs_ext_sales_price,
    CAST(x.sp_c / 100.0 AS DECIMAL(12,2))           AS cs_sales_price,
    CAST(x.dsc_c / 100.0 AS DECIMAL(12,2))          AS cs_ext_discount_amt,
    CAST(x.wc_c / 100.0 AS DECIMAL(12,2))           AS cs_ext_wholesale_cost,
    CAST(CAST(FLOOR(x.wc_c / x.qty) AS BIGINT) / 100.0 AS DECIMAL(12,2)) AS cs_wholesale_cost,
    CAST(x.lp_c / 100.0 AS DECIMAL(12,2))           AS cs_ext_list_price,
    CAST(CAST(FLOOR(x.lp_c / x.qty) AS BIGINT) / 100.0 AS DECIMAL(12,2)) AS cs_list_price,
    CAST(x.tax_c / 100.0 AS DECIMAL(12,2))          AS cs_ext_tax,
    CAST(x.cpn_c / 100.0 AS DECIMAL(12,2))          AS cs_coupon_amt,
    CAST((x.cents - x.cpn_c) / 100.0 AS DECIMAL(12,2)) AS cs_net_paid,
    CAST((x.cents - x.cpn_c + x.tax_c) / 100.0 AS DECIMAL(12,2)) AS cs_net_paid_inc_tax,
    CAST((x.cents - x.cpn_c - x.wc_c) / 100.0 AS DECIMAL(12,2)) AS cs_net_profit,
    CAST(x.ship_c / 100.0 AS DECIMAL(12,2))         AS cs_ext_ship_cost,
    CAST((x.cents - x.cpn_c + x.ship_c) / 100.0 AS DECIMAL(12,2)) AS cs_net_paid_inc_ship,
    CAST((x.cents - x.cpn_c + x.ship_c + x.tax_c) / 100.0 AS DECIMAL(12,2)) AS cs_net_paid_inc_ship_tax
FROM (
  SELECT b.*,
         d.d_date_sk AS sold_sk,
         (b.okey * 7 + b.lnum * 13 + 1) % 86400 AS time_sk,
         CAST(FLOOR(b.cents / b.qty) AS BIGINT) AS sp_c,
         CAST(FLOOR(b.cents * b.disc_pct / 100) AS BIGINT) AS dsc_c,
         CAST(FLOOR(b.cents * 6 / 10) AS BIGINT) AS wc_c,
         CAST(FLOOR(b.cents * 12 / 10) AS BIGINT) AS lp_c,
         CAST(FLOOR(b.cents * b.tax_pct / 100) AS BIGINT) AS tax_c,
         CASE WHEN b.ikey % 5 = 0 THEN CAST(FLOOR(b.cents / 20) AS BIGINT)
              ELSE 0 END AS cpn_c,
         CASE WHEN b.ikey % 5 = 0 THEN b.ikey % 30 + 1
              ELSE CAST(NULL AS BIGINT) END AS promo_sk,
         CAST(FLOOR(b.cents / 8) AS BIGINT) AS ship_c
  FROM (
  SELECT l.l_orderkey AS okey, l.l_partkey AS ikey, l.l_suppkey AS skey,
         l.l_linenumber AS lnum, o.o_custkey AS ckey,
         l.l_returnflag AS rflag,
         CAST(l.l_shipdate AS DATE) AS sdate,
         CAST(o.o_orderdate AS DATE) AS odate,
         CAST(l.l_quantity AS BIGINT) AS qty,
         CAST(CAST(l.l_extendedprice AS DECIMAL(12,2)) * 100 AS BIGINT) AS cents,
         CAST(CAST(l.l_discount AS DECIMAL(4,2)) * 100 AS BIGINT) AS disc_pct,
         CAST(CAST(l.l_tax AS DECIMAL(4,2)) * 100 AS BIGINT) AS tax_pct
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
  WHERE l.l_orderkey % 4 = 2) b JOIN date_dim d ON d.d_date = b.sdate) x""",
    "catalog_returns" -> """SELECT
    r.sold_sk + (r.okey % 60) + 3                   AS cr_returned_date_sk,
    r.time_sk                                       AS cr_returned_time_sk,
    r.ikey                                          AS cr_item_sk,
    r.ckey                                          AS cr_refunded_customer_sk,
    r.ckey                                          AS cr_returning_customer_sk,
    (r.ckey * 59 + 23) % 7200 + 1                    AS cr_returning_cdemo_sk,
    (r.ckey * 37 + 17) % 720 + 1                    AS cr_returning_hdemo_sk,
    r.ckey                                          AS cr_returning_addr_sk,
    (r.okey * 5 + 1) % 4 + 1                        AS cr_call_center_sk,
    (r.okey * 11 + r.lnum) % 40 + 1                 AS cr_catalog_page_sk,
    (r.okey * 3 + r.lnum) % 10 + 1                  AS cr_reason_sk,
    r.okey                                          AS cr_order_number,
    CAST(r.rqty AS INT)                             AS cr_return_quantity,
    CAST(r.ret_c / 100.0 AS DECIMAL(12,2))          AS cr_return_amount,

    CAST(r.ret_c / 100.0 AS DECIMAL(12,2))          AS cr_return_amt,
    CAST(CAST(FLOOR(r.ret_c * r.disc_pct / 100) AS BIGINT) / 100.0 AS DECIMAL(12,2)) AS cr_return_tax,
    CAST((r.ret_c + CAST(FLOOR(r.ret_c * r.disc_pct / 100) AS BIGINT)) / 100.0 AS DECIMAL(12,2)) AS cr_return_amt_inc_tax,
    CAST(CAST(FLOOR(r.ret_c / 50) AS BIGINT) / 100.0 AS DECIMAL(12,2)) AS cr_fee,
    CAST(CAST(FLOOR(r.ret_c / 10) AS BIGINT) / 100.0 AS DECIMAL(12,2)) AS cr_return_ship_cost,
    CAST(CAST(FLOOR(r.ret_c * 6 / 10) AS BIGINT) / 100.0 AS DECIMAL(12,2)) AS cr_refunded_cash,
    CAST(CAST(FLOOR(r.ret_c * 2 / 10) AS BIGINT) / 100.0 AS DECIMAL(12,2)) AS cr_reversed_charge,
    CAST((r.ret_c - CAST(FLOOR(r.ret_c * 6 / 10) AS BIGINT)
          - CAST(FLOOR(r.ret_c * 2 / 10) AS BIGINT)) / 100.0 AS DECIMAL(12,2)) AS cr_store_credit,
    CAST((CAST(FLOOR(r.ret_c / 10) AS BIGINT)
          + CAST(FLOOR(r.ret_c / 50) AS BIGINT)) / 100.0 AS DECIMAL(12,2)) AS cr_net_loss
FROM (
  SELECT x.*,
         CAST(FLOOR(x.qty / 2) + 1 AS BIGINT) AS rqty,
         CAST(FLOOR(x.cents * (CAST(FLOOR(x.qty / 2) AS BIGINT) + 1) / x.qty) AS BIGINT) AS ret_c
  FROM (
  SELECT b.*,
         d.d_date_sk AS sold_sk,
         (b.okey * 7 + b.lnum * 13 + 1) % 86400 AS time_sk,
         CAST(FLOOR(b.cents / b.qty) AS BIGINT) AS sp_c,
         CAST(FLOOR(b.cents * b.disc_pct / 100) AS BIGINT) AS dsc_c,
         CAST(FLOOR(b.cents * 6 / 10) AS BIGINT) AS wc_c,
         CAST(FLOOR(b.cents * 12 / 10) AS BIGINT) AS lp_c,
         CAST(FLOOR(b.cents * b.tax_pct / 100) AS BIGINT) AS tax_c,
         CASE WHEN b.ikey % 5 = 0 THEN CAST(FLOOR(b.cents / 20) AS BIGINT)
              ELSE 0 END AS cpn_c,
         CASE WHEN b.ikey % 5 = 0 THEN b.ikey % 30 + 1
              ELSE CAST(NULL AS BIGINT) END AS promo_sk,
         CAST(FLOOR(b.cents / 8) AS BIGINT) AS ship_c
  FROM (
  SELECT l.l_orderkey AS okey, l.l_partkey AS ikey, l.l_suppkey AS skey,
         l.l_linenumber AS lnum, o.o_custkey AS ckey,
         l.l_returnflag AS rflag,
         CAST(l.l_shipdate AS DATE) AS sdate,
         CAST(o.o_orderdate AS DATE) AS odate,
         CAST(l.l_quantity AS BIGINT) AS qty,
         CAST(CAST(l.l_extendedprice AS DECIMAL(12,2)) * 100 AS BIGINT) AS cents,
         CAST(CAST(l.l_discount AS DECIMAL(4,2)) * 100 AS BIGINT) AS disc_pct,
         CAST(CAST(l.l_tax AS DECIMAL(4,2)) * 100 AS BIGINT) AS tax_pct
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
  WHERE l.l_orderkey % 4 = 2) b JOIN date_dim d ON d.d_date = b.sdate) x
  WHERE x.rflag = 'R') r""",
    "web_sales" -> """SELECT
    x.sold_sk                                       AS ws_sold_date_sk,
    x.time_sk                                       AS ws_sold_time_sk,
    x.sold_sk + (x.okey * 3 + x.lnum) % 30 + 2      AS ws_ship_date_sk,
    x.ikey                                          AS ws_item_sk,
    (x.okey * 13 + 5) % 8 + 1                       AS ws_web_page_sk,
    (x.okey * 7 + 3) % 4 + 1                        AS ws_web_site_sk,
    (x.okey + x.lnum) % 20 + 1                      AS ws_ship_mode_sk,
    x.skey % 5 + 1                                  AS ws_warehouse_sk,
    x.promo_sk                                      AS ws_promo_sk,
    x.okey                                          AS ws_order_number,
    CAST(x.qty AS INT)                              AS ws_quantity,
    x.ckey                                          AS ws_bill_customer_sk,
    (x.ckey * 59 + 23) % 7200 + 1                    AS ws_bill_cdemo_sk,
    (x.ckey * 37 + 17) % 720 + 1                    AS ws_bill_hdemo_sk,
    x.ckey                                          AS ws_bill_addr_sk,
    x.ckey                                          AS ws_ship_customer_sk,
    (x.ckey * 59 + 23) % 7200 + 1                    AS ws_ship_cdemo_sk,
    (x.ckey * 37 + 17) % 720 + 1                    AS ws_ship_hdemo_sk,
    x.ckey                                          AS ws_ship_addr_sk,

    CAST(x.cents / 100.0 AS DECIMAL(12,2))          AS ws_ext_sales_price,
    CAST(x.sp_c / 100.0 AS DECIMAL(12,2))           AS ws_sales_price,
    CAST(x.dsc_c / 100.0 AS DECIMAL(12,2))          AS ws_ext_discount_amt,
    CAST(x.wc_c / 100.0 AS DECIMAL(12,2))           AS ws_ext_wholesale_cost,
    CAST(CAST(FLOOR(x.wc_c / x.qty) AS BIGINT) / 100.0 AS DECIMAL(12,2)) AS ws_wholesale_cost,
    CAST(x.lp_c / 100.0 AS DECIMAL(12,2))           AS ws_ext_list_price,
    CAST(CAST(FLOOR(x.lp_c / x.qty) AS BIGINT) / 100.0 AS DECIMAL(12,2)) AS ws_list_price,
    CAST(x.tax_c / 100.0 AS DECIMAL(12,2))          AS ws_ext_tax,
    CAST(x.cpn_c / 100.0 AS DECIMAL(12,2))          AS ws_coupon_amt,
    CAST((x.cents - x.cpn_c) / 100.0 AS DECIMAL(12,2)) AS ws_net_paid,
    CAST((x.cents - x.cpn_c + x.tax_c) / 100.0 AS DECIMAL(12,2)) AS ws_net_paid_inc_tax,
    CAST((x.cents - x.cpn_c - x.wc_c) / 100.0 AS DECIMAL(12,2)) AS ws_net_profit,
    CAST(x.ship_c / 100.0 AS DECIMAL(12,2))         AS ws_ext_ship_cost,
    CAST((x.cents - x.cpn_c + x.ship_c) / 100.0 AS DECIMAL(12,2)) AS ws_net_paid_inc_ship,
    CAST((x.cents - x.cpn_c + x.ship_c + x.tax_c) / 100.0 AS DECIMAL(12,2)) AS ws_net_paid_inc_ship_tax
FROM (
  SELECT b.*,
         d.d_date_sk AS sold_sk,
         (b.okey * 7 + b.lnum * 13 + 1) % 86400 AS time_sk,
         CAST(FLOOR(b.cents / b.qty) AS BIGINT) AS sp_c,
         CAST(FLOOR(b.cents * b.disc_pct / 100) AS BIGINT) AS dsc_c,
         CAST(FLOOR(b.cents * 6 / 10) AS BIGINT) AS wc_c,
         CAST(FLOOR(b.cents * 12 / 10) AS BIGINT) AS lp_c,
         CAST(FLOOR(b.cents * b.tax_pct / 100) AS BIGINT) AS tax_c,
         CASE WHEN b.ikey % 5 = 0 THEN CAST(FLOOR(b.cents / 20) AS BIGINT)
              ELSE 0 END AS cpn_c,
         CASE WHEN b.ikey % 5 = 0 THEN b.ikey % 30 + 1
              ELSE CAST(NULL AS BIGINT) END AS promo_sk,
         CAST(FLOOR(b.cents / 8) AS BIGINT) AS ship_c
  FROM (
  SELECT l.l_orderkey AS okey, l.l_partkey AS ikey, l.l_suppkey AS skey,
         l.l_linenumber AS lnum, o.o_custkey AS ckey,
         l.l_returnflag AS rflag,
         CAST(l.l_shipdate AS DATE) AS sdate,
         CAST(o.o_orderdate AS DATE) AS odate,
         CAST(l.l_quantity AS BIGINT) AS qty,
         CAST(CAST(l.l_extendedprice AS DECIMAL(12,2)) * 100 AS BIGINT) AS cents,
         CAST(CAST(l.l_discount AS DECIMAL(4,2)) * 100 AS BIGINT) AS disc_pct,
         CAST(CAST(l.l_tax AS DECIMAL(4,2)) * 100 AS BIGINT) AS tax_pct
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
  WHERE l.l_orderkey % 4 = 3) b JOIN date_dim d ON d.d_date = b.sdate) x""",
    "web_returns" -> """SELECT
    r.sold_sk + (r.okey % 60) + 3                   AS wr_returned_date_sk,
    r.time_sk                                       AS wr_returned_time_sk,
    r.ikey                                          AS wr_item_sk,
    r.ckey                                          AS wr_refunded_customer_sk,
    r.ckey                                          AS wr_returning_customer_sk,
    (r.ckey * 59 + 23) % 7200 + 1                    AS wr_returning_cdemo_sk,
    (r.ckey * 37 + 17) % 720 + 1                    AS wr_returning_hdemo_sk,
    r.ckey                                          AS wr_returning_addr_sk,
    (r.okey * 13 + 5) % 8 + 1                       AS wr_web_page_sk,
    (r.okey * 3 + r.lnum) % 10 + 1                  AS wr_reason_sk,
    r.okey                                          AS wr_order_number,
    CAST(r.rqty AS INT)                             AS wr_return_quantity,

    CAST(r.ret_c / 100.0 AS DECIMAL(12,2))          AS wr_return_amt,
    CAST(CAST(FLOOR(r.ret_c * r.disc_pct / 100) AS BIGINT) / 100.0 AS DECIMAL(12,2)) AS wr_return_tax,
    CAST((r.ret_c + CAST(FLOOR(r.ret_c * r.disc_pct / 100) AS BIGINT)) / 100.0 AS DECIMAL(12,2)) AS wr_return_amt_inc_tax,
    CAST(CAST(FLOOR(r.ret_c / 50) AS BIGINT) / 100.0 AS DECIMAL(12,2)) AS wr_fee,
    CAST(CAST(FLOOR(r.ret_c / 10) AS BIGINT) / 100.0 AS DECIMAL(12,2)) AS wr_return_ship_cost,
    CAST(CAST(FLOOR(r.ret_c * 6 / 10) AS BIGINT) / 100.0 AS DECIMAL(12,2)) AS wr_refunded_cash,
    CAST(CAST(FLOOR(r.ret_c * 2 / 10) AS BIGINT) / 100.0 AS DECIMAL(12,2)) AS wr_reversed_charge,
    CAST((r.ret_c - CAST(FLOOR(r.ret_c * 6 / 10) AS BIGINT)
          - CAST(FLOOR(r.ret_c * 2 / 10) AS BIGINT)) / 100.0 AS DECIMAL(12,2)) AS wr_store_credit,
    CAST((CAST(FLOOR(r.ret_c / 10) AS BIGINT)
          + CAST(FLOOR(r.ret_c / 50) AS BIGINT)) / 100.0 AS DECIMAL(12,2)) AS wr_net_loss
FROM (
  SELECT x.*,
         CAST(FLOOR(x.qty / 2) + 1 AS BIGINT) AS rqty,
         CAST(FLOOR(x.cents * (CAST(FLOOR(x.qty / 2) AS BIGINT) + 1) / x.qty) AS BIGINT) AS ret_c
  FROM (
  SELECT b.*,
         d.d_date_sk AS sold_sk,
         (b.okey * 7 + b.lnum * 13 + 1) % 86400 AS time_sk,
         CAST(FLOOR(b.cents / b.qty) AS BIGINT) AS sp_c,
         CAST(FLOOR(b.cents * b.disc_pct / 100) AS BIGINT) AS dsc_c,
         CAST(FLOOR(b.cents * 6 / 10) AS BIGINT) AS wc_c,
         CAST(FLOOR(b.cents * 12 / 10) AS BIGINT) AS lp_c,
         CAST(FLOOR(b.cents * b.tax_pct / 100) AS BIGINT) AS tax_c,
         CASE WHEN b.ikey % 5 = 0 THEN CAST(FLOOR(b.cents / 20) AS BIGINT)
              ELSE 0 END AS cpn_c,
         CASE WHEN b.ikey % 5 = 0 THEN b.ikey % 30 + 1
              ELSE CAST(NULL AS BIGINT) END AS promo_sk,
         CAST(FLOOR(b.cents / 8) AS BIGINT) AS ship_c
  FROM (
  SELECT l.l_orderkey AS okey, l.l_partkey AS ikey, l.l_suppkey AS skey,
         l.l_linenumber AS lnum, o.o_custkey AS ckey,
         l.l_returnflag AS rflag,
         CAST(l.l_shipdate AS DATE) AS sdate,
         CAST(o.o_orderdate AS DATE) AS odate,
         CAST(l.l_quantity AS BIGINT) AS qty,
         CAST(CAST(l.l_extendedprice AS DECIMAL(12,2)) * 100 AS BIGINT) AS cents,
         CAST(CAST(l.l_discount AS DECIMAL(4,2)) * 100 AS BIGINT) AS disc_pct,
         CAST(CAST(l.l_tax AS DECIMAL(4,2)) * 100 AS BIGINT) AS tax_pct
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
  WHERE l.l_orderkey % 4 = 3) b JOIN date_dim d ON d.d_date = b.sdate) x
  WHERE x.rflag = 'R') r""",
    "inventory" -> """SELECT
  CAST(c.day_id AS BIGINT)                          AS inv_date_sk,
  p.p_partkey                                       AS inv_item_sk,
  CAST(w.id + 1 AS BIGINT)                          AS inv_warehouse_sk,
  CAST(CASE WHEN (p.p_partkey * 31 + w.id * 7 + c.day_id) % 5 = 0
            THEN (p.p_partkey * 13 + w.id * 17 + c.day_id * 3) % 1000
            ELSE (p.p_partkey * 13 + w.id * 17 + c.day_id * 3) % 20
       END AS INT)                                  AS inv_quantity_on_hand
FROM part p
CROSS JOIN range(0, 5) w(id)
CROSS JOIN (SELECT id AS day_id FROM range(0, 2922) t(id)
            WHERE id % 7 = 0 AND id >= 1826 AND id < 2192) c""")

  /** TPC-DS tables each generator's SQL references (for oracle preludes). */
  val deps: Map[String, Seq[String]] = Map(
    "date_dim" -> Seq(),
    "time_dim" -> Seq(),
    "item" -> Seq(),
    "customer" -> Seq(),
    "customer_address" -> Seq(),
    "customer_demographics" -> Seq(),
    "household_demographics" -> Seq(),
    "income_band" -> Seq(),
    "store" -> Seq(),
    "warehouse" -> Seq(),
    "call_center" -> Seq(),
    "web_site" -> Seq(),
    "web_page" -> Seq(),
    "catalog_page" -> Seq(),
    "promotion" -> Seq(),
    "reason" -> Seq(),
    "ship_mode" -> Seq(),
    "store_sales" -> Seq("date_dim"),
    "store_returns" -> Seq("date_dim"),
    "catalog_sales" -> Seq("date_dim"),
    "catalog_returns" -> Seq("date_dim"),
    "web_sales" -> Seq("date_dim"),
    "web_returns" -> Seq("date_dim"),
    "inventory" -> Seq())

  /** Generators that read the base `customer` table, which a CTE named
    * `customer` cannot name in DuckDB (circular-reference rule) — they
    * reference `customer_src` instead; each engine aliases it. */
  val needsCustomerSrc: Set[String] =
    Set("customer", "customer_address", "store_sales", "store_returns")

  /** Flat ID-keyed refresh-source tables (reference: the s_* staged
    * sources of TPCDSRefreshSchema.scala:21-562), same dialect-common
    * derivation machinery as the fact generators. */
  val refreshSources: Seq[(String, String)] = Seq(
    "s_purchase" -> """SELECT DISTINCT
  x.okey                                          AS purc_purchase_id,
  'STORE' || LPAD(CAST(x.okey * 3 % 12 AS STRING), 6, '0') AS purc_store_id,
  'CUST' || LPAD(CAST(x.ckey AS STRING), 12, '0') AS purc_customer_id,
  CAST(x.odate AS STRING)                         AS purc_purchase_date,
  CAST((x.okey * 7 + 1) % 86400 AS INT)           AS purc_purchase_time,
  'purchase ' || CAST(x.okey AS STRING)           AS purc_comment
FROM (
  SELECT l.l_orderkey AS okey, l.l_partkey AS ikey, l.l_suppkey AS skey,
         l.l_linenumber AS lnum, o.o_custkey AS ckey,
         l.l_returnflag AS rflag,
         CAST(l.l_shipdate AS DATE) AS sdate,
         CAST(o.o_orderdate AS DATE) AS odate,
         CAST(l.l_quantity AS BIGINT) AS qty,
         CAST(CAST(l.l_extendedprice AS DECIMAL(12,2)) * 100 AS BIGINT) AS cents,
         CAST(CAST(l.l_discount AS DECIMAL(4,2)) * 100 AS BIGINT) AS disc_pct,
         CAST(CAST(l.l_tax AS DECIMAL(4,2)) * 100 AS BIGINT) AS tax_pct
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
  WHERE l.l_orderkey % 4 IN (0, 1)) x""",
    "s_purchase_lineitem" -> """SELECT
  x.okey                                          AS plin_purchase_id,
  CAST(x.lnum AS INT)                             AS plin_line_number,
  'ITEM' || LPAD(CAST(x.ikey AS STRING), 10, '0') AS plin_item_id,
  CASE WHEN x.promo_sk IS NULL THEN CAST(NULL AS STRING)
       ELSE 'PROMO' || LPAD(CAST(x.promo_sk - 1 AS STRING), 6, '0')
  END                                             AS plin_promotion_id,
  CAST(x.qty AS INT)                              AS plin_quantity,
  CAST(x.sp_c / 100.0 AS DECIMAL(12,2))           AS plin_sale_price,
  CAST(x.cpn_c / 100.0 AS DECIMAL(12,2))          AS plin_coupon_amt,
  'line ' || CAST(x.lnum AS STRING)               AS plin_comment
FROM (
  SELECT b.*,
         d.d_date_sk AS sold_sk,
         (b.okey * 7 + b.lnum * 13 + 1) % 86400 AS time_sk,
         CAST(FLOOR(b.cents / b.qty) AS BIGINT) AS sp_c,
         CAST(FLOOR(b.cents * b.disc_pct / 100) AS BIGINT) AS dsc_c,
         CAST(FLOOR(b.cents * 6 / 10) AS BIGINT) AS wc_c,
         CAST(FLOOR(b.cents * 12 / 10) AS BIGINT) AS lp_c,
         CAST(FLOOR(b.cents * b.tax_pct / 100) AS BIGINT) AS tax_c,
         CASE WHEN b.ikey % 5 = 0 THEN CAST(FLOOR(b.cents / 20) AS BIGINT)
              ELSE 0 END AS cpn_c,
         CASE WHEN b.ikey % 5 = 0 THEN b.ikey % 30 + 1
              ELSE CAST(NULL AS BIGINT) END AS promo_sk,
         CAST(FLOOR(b.cents / 8) AS BIGINT) AS ship_c
  FROM (
  SELECT l.l_orderkey AS okey, l.l_partkey AS ikey, l.l_suppkey AS skey,
         l.l_linenumber AS lnum, o.o_custkey AS ckey,
         l.l_returnflag AS rflag,
         CAST(l.l_shipdate AS DATE) AS sdate,
         CAST(o.o_orderdate AS DATE) AS odate,
         CAST(l.l_quantity AS BIGINT) AS qty,
         CAST(CAST(l.l_extendedprice AS DECIMAL(12,2)) * 100 AS BIGINT) AS cents,
         CAST(CAST(l.l_discount AS DECIMAL(4,2)) * 100 AS BIGINT) AS disc_pct,
         CAST(CAST(l.l_tax AS DECIMAL(4,2)) * 100 AS BIGINT) AS tax_pct
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
  WHERE l.l_orderkey % 4 IN (0, 1)) b JOIN date_dim d ON d.d_date = b.sdate) x""",
    "s_store_returns" -> """SELECT
  r.okey                                          AS sret_purchase_id,
  CAST(r.lnum AS INT)                             AS sret_line_number,
  'ITEM' || LPAD(CAST(r.ikey AS STRING), 10, '0') AS sret_item_id,
  'CUST' || LPAD(CAST(r.ckey AS STRING), 12, '0') AS sret_customer_id,
  CAST(DATE '1995-01-01' + CAST(r.sold_sk + (r.okey % 60) + 3 AS INT) AS STRING)
                                                  AS sret_return_date,
  CAST(r.time_sk AS INT)                          AS sret_return_time,
  'STORE' || LPAD(CAST(r.skey % 12 AS STRING), 6, '0') AS sret_store_id,
  CAST(r.rqty AS INT)                             AS sret_return_qty,
  CAST(r.ret_c / 100.0 AS DECIMAL(12,2))          AS sret_return_amt,
  CAST(CAST(FLOOR(r.ret_c * r.disc_pct / 100) AS BIGINT) / 100.0 AS DECIMAL(12,2)) AS sret_return_tax,
  CAST(CAST(FLOOR(r.ret_c / 50) AS BIGINT) / 100.0 AS DECIMAL(12,2)) AS sret_return_fee,
  CAST(CAST(FLOOR(r.ret_c / 10) AS BIGINT) / 100.0 AS DECIMAL(12,2)) AS sret_return_ship_cost,
  CAST(CAST(FLOOR(r.ret_c * 6 / 10) AS BIGINT) / 100.0 AS DECIMAL(12,2)) AS sret_refunded_cash,
  CAST(CAST(FLOOR(r.ret_c * 2 / 10) AS BIGINT) / 100.0 AS DECIMAL(12,2)) AS sret_reversed_charge,
  CAST((r.ret_c - CAST(FLOOR(r.ret_c * 6 / 10) AS BIGINT)
        - CAST(FLOOR(r.ret_c * 2 / 10) AS BIGINT)) / 100.0 AS DECIMAL(12,2)) AS sret_store_credit,
  'R' || LPAD(CAST((r.okey * 3 + r.lnum) % 10 AS STRING), 4, '0') AS sret_reason_id
FROM (
  SELECT x.*,
         CAST(FLOOR(x.qty / 2) + 1 AS BIGINT) AS rqty,
         CAST(FLOOR(x.cents * (CAST(FLOOR(x.qty / 2) AS BIGINT) + 1) / x.qty) AS BIGINT) AS ret_c
  FROM (
  SELECT b.*,
         d.d_date_sk AS sold_sk,
         (b.okey * 7 + b.lnum * 13 + 1) % 86400 AS time_sk,
         CAST(FLOOR(b.cents / b.qty) AS BIGINT) AS sp_c,
         CAST(FLOOR(b.cents * b.disc_pct / 100) AS BIGINT) AS dsc_c,
         CAST(FLOOR(b.cents * 6 / 10) AS BIGINT) AS wc_c,
         CAST(FLOOR(b.cents * 12 / 10) AS BIGINT) AS lp_c,
         CAST(FLOOR(b.cents * b.tax_pct / 100) AS BIGINT) AS tax_c,
         CASE WHEN b.ikey % 5 = 0 THEN CAST(FLOOR(b.cents / 20) AS BIGINT)
              ELSE 0 END AS cpn_c,
         CASE WHEN b.ikey % 5 = 0 THEN b.ikey % 30 + 1
              ELSE CAST(NULL AS BIGINT) END AS promo_sk,
         CAST(FLOOR(b.cents / 8) AS BIGINT) AS ship_c
  FROM (
  SELECT l.l_orderkey AS okey, l.l_partkey AS ikey, l.l_suppkey AS skey,
         l.l_linenumber AS lnum, o.o_custkey AS ckey,
         l.l_returnflag AS rflag,
         CAST(l.l_shipdate AS DATE) AS sdate,
         CAST(o.o_orderdate AS DATE) AS odate,
         CAST(l.l_quantity AS BIGINT) AS qty,
         CAST(CAST(l.l_extendedprice AS DECIMAL(12,2)) * 100 AS BIGINT) AS cents,
         CAST(CAST(l.l_discount AS DECIMAL(4,2)) * 100 AS BIGINT) AS disc_pct,
         CAST(CAST(l.l_tax AS DECIMAL(4,2)) * 100 AS BIGINT) AS tax_pct
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
  WHERE l.l_orderkey % 4 IN (0, 1)) b JOIN date_dim d ON d.d_date = b.sdate) x
  WHERE x.rflag = 'R') r""",
    "s_catalog_order" -> """SELECT DISTINCT
  x.okey                                          AS cord_order_id,
  'CUST' || LPAD(CAST(x.ckey AS STRING), 12, '0') AS cord_bill_customer_id,
  'CUST' || LPAD(CAST(x.ckey AS STRING), 12, '0') AS cord_ship_customer_id,
  CAST(x.odate AS STRING)                         AS cord_order_date,
  CAST((x.okey * 7 + 1) % 86400 AS INT)           AS cord_order_time,
  'SM' || LPAD(CAST(x.okey % 20 AS STRING), 4, '0') AS cord_ship_mode_id,
  'CC' || LPAD(CAST((x.okey * 5 + 1) % 4 AS STRING), 4, '0') AS cord_call_center_id,
  'order ' || CAST(x.okey AS STRING)              AS cord_comment
FROM (
  SELECT l.l_orderkey AS okey, l.l_partkey AS ikey, l.l_suppkey AS skey,
         l.l_linenumber AS lnum, o.o_custkey AS ckey,
         l.l_returnflag AS rflag,
         CAST(l.l_shipdate AS DATE) AS sdate,
         CAST(o.o_orderdate AS DATE) AS odate,
         CAST(l.l_quantity AS BIGINT) AS qty,
         CAST(CAST(l.l_extendedprice AS DECIMAL(12,2)) * 100 AS BIGINT) AS cents,
         CAST(CAST(l.l_discount AS DECIMAL(4,2)) * 100 AS BIGINT) AS disc_pct,
         CAST(CAST(l.l_tax AS DECIMAL(4,2)) * 100 AS BIGINT) AS tax_pct
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
  WHERE l.l_orderkey % 4 = 2) x""",
    "s_catalog_order_lineitem" -> """SELECT
  x.okey                                          AS clin_order_id,
  CAST(x.lnum AS INT)                             AS clin_line_number,
  'ITEM' || LPAD(CAST(x.ikey AS STRING), 10, '0') AS clin_item_id,
  CASE WHEN x.promo_sk IS NULL THEN CAST(NULL AS STRING)
       ELSE 'PROMO' || LPAD(CAST(x.promo_sk - 1 AS STRING), 6, '0')
  END                                             AS clin_promotion_id,
  CAST(x.qty AS INT)                              AS clin_quantity,
  CAST(x.sp_c / 100.0 AS DECIMAL(12,2))           AS clin_sale_price,
  CAST(x.cpn_c / 100.0 AS DECIMAL(12,2))          AS clin_coupon_amt,
  CAST(x.ship_c / 100.0 AS DECIMAL(12,2))         AS clin_ship_cost,
  'WH' || LPAD(CAST(x.skey % 5 AS STRING), 4, '0') AS clin_warehouse_id,
  CAST(DATE '1995-01-01' + CAST(x.sold_sk + (x.okey * 3 + x.lnum) % 30 + 2 AS INT) AS STRING)
                                                  AS clin_ship_date,
  'CP' || LPAD(CAST((x.okey * 11 + x.lnum) % 40 AS STRING), 6, '0') AS clin_catalog_page_id
FROM (
  SELECT b.*,
         d.d_date_sk AS sold_sk,
         (b.okey * 7 + b.lnum * 13 + 1) % 86400 AS time_sk,
         CAST(FLOOR(b.cents / b.qty) AS BIGINT) AS sp_c,
         CAST(FLOOR(b.cents * b.disc_pct / 100) AS BIGINT) AS dsc_c,
         CAST(FLOOR(b.cents * 6 / 10) AS BIGINT) AS wc_c,
         CAST(FLOOR(b.cents * 12 / 10) AS BIGINT) AS lp_c,
         CAST(FLOOR(b.cents * b.tax_pct / 100) AS BIGINT) AS tax_c,
         CASE WHEN b.ikey % 5 = 0 THEN CAST(FLOOR(b.cents / 20) AS BIGINT)
              ELSE 0 END AS cpn_c,
         CASE WHEN b.ikey % 5 = 0 THEN b.ikey % 30 + 1
              ELSE CAST(NULL AS BIGINT) END AS promo_sk,
         CAST(FLOOR(b.cents / 8) AS BIGINT) AS ship_c
  FROM (
  SELECT l.l_orderkey AS okey, l.l_partkey AS ikey, l.l_suppkey AS skey,
         l.l_linenumber AS lnum, o.o_custkey AS ckey,
         l.l_returnflag AS rflag,
         CAST(l.l_shipdate AS DATE) AS sdate,
         CAST(o.o_orderdate AS DATE) AS odate,
         CAST(l.l_quantity AS BIGINT) AS qty,
         CAST(CAST(l.l_extendedprice AS DECIMAL(12,2)) * 100 AS BIGINT) AS cents,
         CAST(CAST(l.l_discount AS DECIMAL(4,2)) * 100 AS BIGINT) AS disc_pct,
         CAST(CAST(l.l_tax AS DECIMAL(4,2)) * 100 AS BIGINT) AS tax_pct
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
  WHERE l.l_orderkey % 4 = 2) b JOIN date_dim d ON d.d_date = b.sdate) x""",
    "s_catalog_returns" -> """SELECT
  r.okey                                          AS cret_order_id,
  CAST(r.lnum AS INT)                             AS cret_line_number,
  'ITEM' || LPAD(CAST(r.ikey AS STRING), 10, '0') AS cret_item_id,
  'CUST' || LPAD(CAST(r.ckey AS STRING), 12, '0') AS cret_return_customer_id,
  'CUST' || LPAD(CAST(r.ckey AS STRING), 12, '0') AS cret_refund_customer_id,
  CAST(DATE '1995-01-01' + CAST(r.sold_sk + (r.okey % 60) + 3 AS INT) AS STRING)
                                                  AS cret_return_date,
  CAST(r.time_sk AS INT)                          AS cret_return_time,
  CAST(r.rqty AS INT)                             AS cret_return_qty,
  CAST(r.ret_c / 100.0 AS DECIMAL(12,2))          AS cret_return_amt,
  CAST(CAST(FLOOR(r.ret_c * r.disc_pct / 100) AS BIGINT) / 100.0 AS DECIMAL(12,2)) AS cret_return_tax,
  CAST(CAST(FLOOR(r.ret_c / 50) AS BIGINT) / 100.0 AS DECIMAL(12,2)) AS cret_return_fee,
  CAST(CAST(FLOOR(r.ret_c / 10) AS BIGINT) / 100.0 AS DECIMAL(12,2)) AS cret_return_ship_cost,
  CAST(CAST(FLOOR(r.ret_c * 6 / 10) AS BIGINT) / 100.0 AS DECIMAL(12,2)) AS cret_refunded_cash,
  CAST(CAST(FLOOR(r.ret_c * 2 / 10) AS BIGINT) / 100.0 AS DECIMAL(12,2)) AS cret_reversed_charge,
  CAST((r.ret_c - CAST(FLOOR(r.ret_c * 6 / 10) AS BIGINT)
        - CAST(FLOOR(r.ret_c * 2 / 10) AS BIGINT)) / 100.0 AS DECIMAL(12,2)) AS cret_account_credit,
  'R' || LPAD(CAST((r.okey * 3 + r.lnum) % 10 AS STRING), 4, '0') AS cret_reason_id,
  'SM' || LPAD(CAST(r.okey % 20 AS STRING), 4, '0') AS cret_shipmode_id,
  'CC' || LPAD(CAST((r.okey * 5 + 1) % 4 AS STRING), 4, '0') AS cret_call_center_id,
  'WH' || LPAD(CAST(r.skey % 5 AS STRING), 4, '0') AS cret_warehouse_id,
  'CP' || LPAD(CAST((r.okey * 11 + r.lnum) % 40 AS STRING), 6, '0') AS cret_catalog_page_id
FROM (
  SELECT x.*,
         CAST(FLOOR(x.qty / 2) + 1 AS BIGINT) AS rqty,
         CAST(FLOOR(x.cents * (CAST(FLOOR(x.qty / 2) AS BIGINT) + 1) / x.qty) AS BIGINT) AS ret_c
  FROM (
  SELECT b.*,
         d.d_date_sk AS sold_sk,
         (b.okey * 7 + b.lnum * 13 + 1) % 86400 AS time_sk,
         CAST(FLOOR(b.cents / b.qty) AS BIGINT) AS sp_c,
         CAST(FLOOR(b.cents * b.disc_pct / 100) AS BIGINT) AS dsc_c,
         CAST(FLOOR(b.cents * 6 / 10) AS BIGINT) AS wc_c,
         CAST(FLOOR(b.cents * 12 / 10) AS BIGINT) AS lp_c,
         CAST(FLOOR(b.cents * b.tax_pct / 100) AS BIGINT) AS tax_c,
         CASE WHEN b.ikey % 5 = 0 THEN CAST(FLOOR(b.cents / 20) AS BIGINT)
              ELSE 0 END AS cpn_c,
         CASE WHEN b.ikey % 5 = 0 THEN b.ikey % 30 + 1
              ELSE CAST(NULL AS BIGINT) END AS promo_sk,
         CAST(FLOOR(b.cents / 8) AS BIGINT) AS ship_c
  FROM (
  SELECT l.l_orderkey AS okey, l.l_partkey AS ikey, l.l_suppkey AS skey,
         l.l_linenumber AS lnum, o.o_custkey AS ckey,
         l.l_returnflag AS rflag,
         CAST(l.l_shipdate AS DATE) AS sdate,
         CAST(o.o_orderdate AS DATE) AS odate,
         CAST(l.l_quantity AS BIGINT) AS qty,
         CAST(CAST(l.l_extendedprice AS DECIMAL(12,2)) * 100 AS BIGINT) AS cents,
         CAST(CAST(l.l_discount AS DECIMAL(4,2)) * 100 AS BIGINT) AS disc_pct,
         CAST(CAST(l.l_tax AS DECIMAL(4,2)) * 100 AS BIGINT) AS tax_pct
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
  WHERE l.l_orderkey % 4 = 2) b JOIN date_dim d ON d.d_date = b.sdate) x
  WHERE x.rflag = 'R') r""",
    "s_web_order" -> """SELECT DISTINCT
  x.okey                                          AS word_order_id,
  'CUST' || LPAD(CAST(x.ckey AS STRING), 12, '0') AS word_bill_customer_id,
  'CUST' || LPAD(CAST(x.ckey AS STRING), 12, '0') AS word_ship_customer_id,
  CAST(x.odate AS STRING)                         AS word_order_date,
  CAST((x.okey * 7 + 1) % 86400 AS INT)           AS word_order_time,
  'SM' || LPAD(CAST(x.okey % 20 AS STRING), 4, '0') AS word_ship_mode_id,
  'WEB' || LPAD(CAST((x.okey * 7 + 3) % 4 AS STRING), 4, '0') AS word_web_site_id,
  'order ' || CAST(x.okey AS STRING)              AS word_comment
FROM (
  SELECT l.l_orderkey AS okey, l.l_partkey AS ikey, l.l_suppkey AS skey,
         l.l_linenumber AS lnum, o.o_custkey AS ckey,
         l.l_returnflag AS rflag,
         CAST(l.l_shipdate AS DATE) AS sdate,
         CAST(o.o_orderdate AS DATE) AS odate,
         CAST(l.l_quantity AS BIGINT) AS qty,
         CAST(CAST(l.l_extendedprice AS DECIMAL(12,2)) * 100 AS BIGINT) AS cents,
         CAST(CAST(l.l_discount AS DECIMAL(4,2)) * 100 AS BIGINT) AS disc_pct,
         CAST(CAST(l.l_tax AS DECIMAL(4,2)) * 100 AS BIGINT) AS tax_pct
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
  WHERE l.l_orderkey % 4 = 3) x""",
    "s_web_order_lineitem" -> """SELECT
  x.okey                                          AS wlin_order_id,
  CAST(x.lnum AS INT)                             AS wlin_line_number,
  'ITEM' || LPAD(CAST(x.ikey AS STRING), 10, '0') AS wlin_item_id,
  CASE WHEN x.promo_sk IS NULL THEN CAST(NULL AS STRING)
       ELSE 'PROMO' || LPAD(CAST(x.promo_sk - 1 AS STRING), 6, '0')
  END                                             AS wlin_promotion_id,
  CAST(x.qty AS INT)                              AS wlin_quantity,
  CAST(x.sp_c / 100.0 AS DECIMAL(12,2))           AS wlin_sale_price,
  CAST(x.cpn_c / 100.0 AS DECIMAL(12,2))          AS wlin_coupon_amt,
  CAST(x.ship_c / 100.0 AS DECIMAL(12,2))         AS wlin_ship_cost,
  'WH' || LPAD(CAST(x.skey % 5 AS STRING), 4, '0') AS wlin_warehouse_id,
  CAST(DATE '1995-01-01' + CAST(x.sold_sk + (x.okey * 3 + x.lnum) % 30 + 2 AS INT) AS STRING)
                                                  AS wlin_ship_date,
  'WP' || LPAD(CAST((x.okey * 13 + 5) % 8 AS STRING), 4, '0') AS wlin_web_page_id
FROM (
  SELECT b.*,
         d.d_date_sk AS sold_sk,
         (b.okey * 7 + b.lnum * 13 + 1) % 86400 AS time_sk,
         CAST(FLOOR(b.cents / b.qty) AS BIGINT) AS sp_c,
         CAST(FLOOR(b.cents * b.disc_pct / 100) AS BIGINT) AS dsc_c,
         CAST(FLOOR(b.cents * 6 / 10) AS BIGINT) AS wc_c,
         CAST(FLOOR(b.cents * 12 / 10) AS BIGINT) AS lp_c,
         CAST(FLOOR(b.cents * b.tax_pct / 100) AS BIGINT) AS tax_c,
         CASE WHEN b.ikey % 5 = 0 THEN CAST(FLOOR(b.cents / 20) AS BIGINT)
              ELSE 0 END AS cpn_c,
         CASE WHEN b.ikey % 5 = 0 THEN b.ikey % 30 + 1
              ELSE CAST(NULL AS BIGINT) END AS promo_sk,
         CAST(FLOOR(b.cents / 8) AS BIGINT) AS ship_c
  FROM (
  SELECT l.l_orderkey AS okey, l.l_partkey AS ikey, l.l_suppkey AS skey,
         l.l_linenumber AS lnum, o.o_custkey AS ckey,
         l.l_returnflag AS rflag,
         CAST(l.l_shipdate AS DATE) AS sdate,
         CAST(o.o_orderdate AS DATE) AS odate,
         CAST(l.l_quantity AS BIGINT) AS qty,
         CAST(CAST(l.l_extendedprice AS DECIMAL(12,2)) * 100 AS BIGINT) AS cents,
         CAST(CAST(l.l_discount AS DECIMAL(4,2)) * 100 AS BIGINT) AS disc_pct,
         CAST(CAST(l.l_tax AS DECIMAL(4,2)) * 100 AS BIGINT) AS tax_pct
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
  WHERE l.l_orderkey % 4 = 3) b JOIN date_dim d ON d.d_date = b.sdate) x""",
    "s_web_returns" -> """SELECT
  r.okey                                          AS wret_order_id,
  CAST(r.lnum AS INT)                             AS wret_line_number,
  'ITEM' || LPAD(CAST(r.ikey AS STRING), 10, '0') AS wret_item_id,
  'CUST' || LPAD(CAST(r.ckey AS STRING), 12, '0') AS wret_return_customer_id,
  'CUST' || LPAD(CAST(r.ckey AS STRING), 12, '0') AS wret_refund_customer_id,
  CAST(DATE '1995-01-01' + CAST(r.sold_sk + (r.okey % 60) + 3 AS INT) AS STRING)
                                                  AS wret_return_date,
  CAST(r.time_sk AS INT)                          AS wret_return_time,
  CAST(r.rqty AS INT)                             AS wret_return_qty,
  CAST(r.ret_c / 100.0 AS DECIMAL(12,2))          AS wret_return_amt,
  CAST(CAST(FLOOR(r.ret_c * r.disc_pct / 100) AS BIGINT) / 100.0 AS DECIMAL(12,2)) AS wret_return_tax,
  CAST(CAST(FLOOR(r.ret_c / 50) AS BIGINT) / 100.0 AS DECIMAL(12,2)) AS wret_return_fee,
  CAST(CAST(FLOOR(r.ret_c / 10) AS BIGINT) / 100.0 AS DECIMAL(12,2)) AS wret_return_ship_cost,
  CAST(CAST(FLOOR(r.ret_c * 6 / 10) AS BIGINT) / 100.0 AS DECIMAL(12,2)) AS wret_refunded_cash,
  CAST(CAST(FLOOR(r.ret_c * 2 / 10) AS BIGINT) / 100.0 AS DECIMAL(12,2)) AS wret_reversed_charge,
  CAST((r.ret_c - CAST(FLOOR(r.ret_c * 6 / 10) AS BIGINT)
        - CAST(FLOOR(r.ret_c * 2 / 10) AS BIGINT)) / 100.0 AS DECIMAL(12,2)) AS wret_account_credit,
  'R' || LPAD(CAST((r.okey * 3 + r.lnum) % 10 AS STRING), 4, '0') AS wret_reason_id,
  'WP' || LPAD(CAST((r.okey * 13 + 5) % 8 AS STRING), 4, '0') AS wret_web_page_id
FROM (
  SELECT x.*,
         CAST(FLOOR(x.qty / 2) + 1 AS BIGINT) AS rqty,
         CAST(FLOOR(x.cents * (CAST(FLOOR(x.qty / 2) AS BIGINT) + 1) / x.qty) AS BIGINT) AS ret_c
  FROM (
  SELECT b.*,
         d.d_date_sk AS sold_sk,
         (b.okey * 7 + b.lnum * 13 + 1) % 86400 AS time_sk,
         CAST(FLOOR(b.cents / b.qty) AS BIGINT) AS sp_c,
         CAST(FLOOR(b.cents * b.disc_pct / 100) AS BIGINT) AS dsc_c,
         CAST(FLOOR(b.cents * 6 / 10) AS BIGINT) AS wc_c,
         CAST(FLOOR(b.cents * 12 / 10) AS BIGINT) AS lp_c,
         CAST(FLOOR(b.cents * b.tax_pct / 100) AS BIGINT) AS tax_c,
         CASE WHEN b.ikey % 5 = 0 THEN CAST(FLOOR(b.cents / 20) AS BIGINT)
              ELSE 0 END AS cpn_c,
         CASE WHEN b.ikey % 5 = 0 THEN b.ikey % 30 + 1
              ELSE CAST(NULL AS BIGINT) END AS promo_sk,
         CAST(FLOOR(b.cents / 8) AS BIGINT) AS ship_c
  FROM (
  SELECT l.l_orderkey AS okey, l.l_partkey AS ikey, l.l_suppkey AS skey,
         l.l_linenumber AS lnum, o.o_custkey AS ckey,
         l.l_returnflag AS rflag,
         CAST(l.l_shipdate AS DATE) AS sdate,
         CAST(o.o_orderdate AS DATE) AS odate,
         CAST(l.l_quantity AS BIGINT) AS qty,
         CAST(CAST(l.l_extendedprice AS DECIMAL(12,2)) * 100 AS BIGINT) AS cents,
         CAST(CAST(l.l_discount AS DECIMAL(4,2)) * 100 AS BIGINT) AS disc_pct,
         CAST(CAST(l.l_tax AS DECIMAL(4,2)) * 100 AS BIGINT) AS tax_pct
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
  WHERE l.l_orderkey % 4 = 3) b JOIN date_dim d ON d.d_date = b.sdate) x
  WHERE x.rflag = 'R') r""",
    "s_inventory" -> """SELECT
  'WH' || LPAD(CAST(w.id AS STRING), 4, '0')      AS invn_warehouse_id,
  'ITEM' || LPAD(CAST(p.p_partkey AS STRING), 10, '0') AS invn_item_id,
  CAST(DATE '1995-01-01' + CAST(c.day_id AS INT) AS STRING) AS invn_date,
  CAST(CASE WHEN (p.p_partkey * 31 + w.id * 7 + c.day_id) % 5 = 0
            THEN (p.p_partkey * 13 + w.id * 17 + c.day_id * 3) % 1000
            ELSE (p.p_partkey * 13 + w.id * 17 + c.day_id * 3) % 20
       END AS INT)                                AS invn_qty_on_hand
FROM part p
CROSS JOIN range(0, 5) w(id)
CROSS JOIN (SELECT id AS day_id FROM range(0, 2922) t(id)
            WHERE id % 7 = 0 AND id >= 1826 AND id < 2192) c""")

  val refreshDeps: Map[String, Seq[String]] = Map(
    "s_purchase" -> Seq(),
    "s_purchase_lineitem" -> Seq("date_dim"),
    "s_store_returns" -> Seq("date_dim"),
    "s_catalog_order" -> Seq(),
    "s_catalog_order_lineitem" -> Seq("date_dim"),
    "s_catalog_returns" -> Seq("date_dim"),
    "s_web_order" -> Seq(),
    "s_web_order_lineitem" -> Seq("date_dim"),
    "s_web_returns" -> Seq("date_dim"),
    "s_inventory" -> Seq())

  /** Dimension-side refresh sources (TPCDSRefreshSchema.scala:28,91,202,
    * 281,306,327,341,358,389,550): flat ID-keyed deltas for the
    * dimensions the refresh protocol maintains — slowly-changing updates
    * (every Nth business key, deterministic arithmetic) plus, for item
    * and customer, inserts under fresh business keys. Same dual-engine
    * text discipline as every other generator. */
  val refreshDimSources: Seq[(String, String)] = Seq(
    "s_item" -> """SELECT
  i_item_id                                       AS item_item_id,
  i_item_desc                                     AS item_item_description,
  CAST(i_current_price + 1.00 AS DECIMAL(12,2))   AS item_list_price,
  i_wholesale_cost                                AS item_wholesale_cost,
  i_size                                          AS item_size,
  'form' || CAST(i_item_sk % 10 AS STRING)        AS item_formulation,
  i_color                                         AS item_color,
  i_units                                         AS item_units,
  i_container                                     AS item_container,
  i_manager_id                                    AS item_manager_id
FROM item WHERE i_item_sk % 7 = 0
UNION ALL
SELECT
  'ITEMN' || LPAD(CAST(i_item_sk AS STRING), 9, '0'),
  i_item_desc, i_current_price, i_wholesale_cost, i_size,
  'form' || CAST(i_item_sk % 10 AS STRING), i_color, i_units, i_container,
  i_manager_id
FROM item WHERE i_item_sk % 13 = 0""",
    "s_customer" -> """SELECT
  c_customer_id                                   AS cust_customer_id,
  c_salutation                                    AS cust_salutation,
  c_last_name                                     AS cust_last_name,
  c_first_name                                    AS cust_first_name,
  c_preferred_cust_flag                           AS cust_preffered_flag,
  c_birth_country                                 AS cust_birth_country,
  c_login                                         AS cust_login_id,
  'new_' || c_email_address                       AS cust_email_address
FROM customer WHERE c_customer_sk % 11 = 0
UNION ALL
SELECT
  'CUSTN' || LPAD(CAST(c_customer_sk AS STRING), 11, '0'),
  c_salutation, c_last_name, c_first_name, c_preferred_cust_flag,
  c_birth_country, c_login, c_email_address
FROM customer WHERE c_customer_sk % 17 = 0""",
    "s_store" -> """SELECT
  s_store_id                                      AS stor_store_id,
  s_store_name || 'R'                             AS stor_name,
  CAST(s_number_employees + 10 AS INT)            AS stor_employees,
  CAST(s_floor_space AS INT)                      AS stor_floor_space,
  s_hours                                         AS stor_hours,
  s_manager                                       AS stor_store_manager,
  CAST(s_market_id AS INT)                        AS stor_market_id,
  CAST(s_tax_percentage + 0.01 AS DECIMAL(5,2))   AS stor_tax_percentage
FROM store WHERE s_store_sk % 2 = 0""",
    "s_call_center" -> """SELECT
  cc_call_center_id                               AS call_center_id,
  cc_name                                         AS call_center_name,
  cc_class                                        AS call_center_class,
  CAST(cc_employees + 5 AS INT)                   AS call_center_employees,
  cc_manager                                      AS call_center_manager
FROM call_center""",
    "s_web_site" -> """SELECT
  web_site_id                                     AS wsit_web_site_id,
  web_name || 'R'                                 AS wsit_site_name,
  web_manager                                     AS wsit_site_manager
FROM web_site""",
    "s_warehouse" -> """SELECT
  w_warehouse_id                                  AS wrhs_warehouse_id,
  w_warehouse_name || ' desc'                     AS wrhs_warehouse_desc,
  CAST(w_warehouse_sq_ft + 1000 AS INT)           AS wrhs_warehouse_sq_ft
FROM warehouse""",
    "s_web_page" -> """SELECT
  wp_web_page_id                                  AS wpag_web_page_id,
  wp_autogen_flag                                 AS wpag_autogen_flag,
  CAST(wp_char_count + 10 AS INT)                 AS wpag_char_cnt,
  CAST(wp_link_count AS INT)                      AS wpag_link_cnt
FROM web_page""",
    "s_promotion" -> """SELECT
  p_promo_id                                      AS prom_promotion_id,
  p_promo_name                                    AS prom_promotion_name,
  CAST(p_cost + 50 AS DECIMAL(15,2))              AS prom_cost,
  p_channel_dmail                                 AS prom_channel_dmail,
  p_channel_email                                 AS prom_channel_email,
  p_channel_catalog                               AS prom_channel_catalog,
  p_channel_tv                                    AS prom_channel_tv,
  p_channel_event                                 AS prom_channel_event,
  p_purpose                                       AS prom_purpose,
  p_discount_active                               AS prom_discount_active
FROM promotion WHERE p_promo_sk % 3 = 0""",
    "s_catalog_page" -> """SELECT
  CAST(cp_catalog_number AS INT)                  AS cpag_catalog_number,
  CAST(cp_catalog_page_number AS INT)             AS cpag_catalog_page_number,
  cp_department                                   AS cpag_department,
  cp_catalog_page_id                              AS cpag_id,
  cp_type                                         AS cpag_type
FROM catalog_page WHERE cp_catalog_page_sk % 2 = 0""",
    "s_zip_to_gmt" -> """SELECT DISTINCT
  ca_zip                                          AS zipg_zip,
  CAST(ca_gmt_offset AS BIGINT)                   AS zipg_gmt_offset
FROM customer_address""")

  val refreshDimDeps: Map[String, Seq[String]] = Map(
    "s_item" -> Seq("item"),
    "s_customer" -> Seq("customer"),
    "s_store" -> Seq("store"),
    "s_call_center" -> Seq("call_center"),
    "s_web_site" -> Seq("web_site"),
    "s_warehouse" -> Seq("warehouse"),
    "s_web_page" -> Seq("web_page"),
    "s_promotion" -> Seq("promotion"),
    "s_catalog_page" -> Seq("catalog_page"),
    "s_zip_to_gmt" -> Seq("customer_address"))

  /** The 7 denormalizing refresh views (TPCDSRefreshSchema ssv..iv):
    * ID-joins resolve the flat sources against the dimensions into
    * fact-shaped rows. `csv` is named `csv_v` (CSV is a Spark format
    * keyword in temp-view positions). */
  val refreshViews: Seq[(String, String)] = Seq(
    "ssv" -> """SELECT d_date_sk ss_sold_date_sk, t_time_sk ss_sold_time_sk,
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
LEFT OUTER JOIN customer ON (purc_customer_id = c_customer_id)
LEFT OUTER JOIN store ON (purc_store_id = s_store_id)
LEFT OUTER JOIN date_dim ON (CAST(purc_purchase_date AS DATE) = d_date)
LEFT OUTER JOIN time_dim ON (purc_purchase_time = t_time)
JOIN s_purchase_lineitem ON (purc_purchase_id = plin_purchase_id)
LEFT OUTER JOIN promotion ON (plin_promotion_id = p_promo_id)
LEFT OUTER JOIN item ON (plin_item_id = i_item_id AND i_rec_end_date IS NULL)""",
    "srv" -> """SELECT d_date_sk sr_returned_date_sk, t_time_sk sr_return_time_sk,
       i_item_sk sr_item_sk, c_customer_sk sr_customer_sk,
       c_current_cdemo_sk sr_cdemo_sk, c_current_hdemo_sk sr_hdemo_sk,
       c_current_addr_sk sr_addr_sk, s_store_sk sr_store_sk,
       r_reason_sk sr_reason_sk, sret_purchase_id sr_ticket_number,
       sret_return_qty sr_return_quantity, sret_return_amt sr_return_amt,
       sret_return_tax sr_return_tax,
       sret_return_amt + sret_return_tax sr_return_amt_inc_tax,
       sret_return_fee sr_fee, sret_return_ship_cost sr_return_ship_cost,
       sret_refunded_cash sr_refunded_cash,
       sret_reversed_charge sr_reversed_charge,
       sret_store_credit sr_store_credit,
       sret_return_amt + sret_return_tax + sret_return_fee
         - sret_refunded_cash - sret_reversed_charge - sret_store_credit sr_net_loss
FROM s_store_returns
LEFT OUTER JOIN date_dim ON (CAST(sret_return_date AS DATE) = d_date)
LEFT OUTER JOIN time_dim ON (sret_return_time = t_time)
LEFT OUTER JOIN item ON (sret_item_id = i_item_id AND i_rec_end_date IS NULL)
LEFT OUTER JOIN customer ON (sret_customer_id = c_customer_id)
LEFT OUTER JOIN store ON (sret_store_id = s_store_id)
LEFT OUTER JOIN reason ON (sret_reason_id = r_reason_id)""",
    "csv_v" -> """SELECT d1.d_date_sk cs_sold_date_sk, t_time_sk cs_sold_time_sk,
       d2.d_date_sk cs_ship_date_sk,
       c1.c_customer_sk cs_bill_customer_sk,
       c1.c_current_cdemo_sk cs_bill_cdemo_sk,
       c1.c_current_hdemo_sk cs_bill_hdemo_sk,
       c1.c_current_addr_sk cs_bill_addr_sk,
       c2.c_customer_sk cs_ship_customer_sk,
       c2.c_current_cdemo_sk cs_ship_cdemo_sk,
       c2.c_current_hdemo_sk cs_ship_hdemo_sk,
       c2.c_current_addr_sk cs_ship_addr_sk,
       cc_call_center_sk cs_call_center_sk,
       cp_catalog_page_sk cs_catalog_page_sk,
       sm_ship_mode_sk cs_ship_mode_sk,
       w_warehouse_sk cs_warehouse_sk,
       i_item_sk cs_item_sk, p_promo_sk cs_promo_sk,
       cord_order_id cs_order_number, clin_quantity cs_quantity,
       i_wholesale_cost cs_wholesale_cost, i_current_price cs_list_price,
       clin_sale_price cs_sales_price,
       (i_current_price - clin_sale_price) * clin_quantity cs_ext_discount_amt,
       clin_sale_price * clin_quantity cs_ext_sales_price,
       i_wholesale_cost * clin_quantity cs_ext_wholesale_cost,
       i_current_price * clin_quantity cs_ext_list_price,
       clin_coupon_amt cs_coupon_amt, clin_ship_cost cs_ext_ship_cost,
       (clin_sale_price * clin_quantity) - clin_coupon_amt cs_net_paid,
       (clin_sale_price * clin_quantity) - clin_coupon_amt
         - (clin_quantity * i_wholesale_cost) cs_net_profit
FROM s_catalog_order
LEFT OUTER JOIN date_dim d1 ON (CAST(cord_order_date AS DATE) = d1.d_date)
LEFT OUTER JOIN time_dim ON (cord_order_time = t_time)
LEFT OUTER JOIN customer c1 ON (cord_bill_customer_id = c1.c_customer_id)
LEFT OUTER JOIN customer c2 ON (cord_ship_customer_id = c2.c_customer_id)
LEFT OUTER JOIN call_center ON (cord_call_center_id = cc_call_center_id)
LEFT OUTER JOIN ship_mode ON (cord_ship_mode_id = sm_ship_mode_id)
JOIN s_catalog_order_lineitem ON (cord_order_id = clin_order_id)
LEFT OUTER JOIN date_dim d2 ON (CAST(clin_ship_date AS DATE) = d2.d_date)
LEFT OUTER JOIN catalog_page ON (clin_catalog_page_id = cp_catalog_page_id)
LEFT OUTER JOIN warehouse ON (clin_warehouse_id = w_warehouse_id)
LEFT OUTER JOIN item ON (clin_item_id = i_item_id AND i_rec_end_date IS NULL)
LEFT OUTER JOIN promotion ON (clin_promotion_id = p_promo_id)""",
    "crv" -> """SELECT d_date_sk cr_returned_date_sk, t_time_sk cr_returned_time_sk,
       i_item_sk cr_item_sk, c1.c_customer_sk cr_refunded_customer_sk,
       c2.c_customer_sk cr_returning_customer_sk,
       cc_call_center_sk cr_call_center_sk,
       cp_catalog_page_sk cr_catalog_page_sk,
       sm_ship_mode_sk cr_ship_mode_sk, w_warehouse_sk cr_warehouse_sk,
       r_reason_sk cr_reason_sk, cret_order_id cr_order_number,
       cret_return_qty cr_return_quantity, cret_return_amt cr_return_amount,
       cret_return_tax cr_return_tax,
       cret_return_amt + cret_return_tax cr_return_amt_inc_tax,
       cret_return_fee cr_fee, cret_return_ship_cost cr_return_ship_cost,
       cret_refunded_cash cr_refunded_cash,
       cret_reversed_charge cr_reversed_charge,
       cret_account_credit cr_store_credit,
       cret_return_amt + cret_return_tax + cret_return_fee
         - cret_refunded_cash - cret_reversed_charge - cret_account_credit cr_net_loss
FROM s_catalog_returns
LEFT OUTER JOIN date_dim ON (CAST(cret_return_date AS DATE) = d_date)
LEFT OUTER JOIN time_dim ON (cret_return_time = t_time)
LEFT OUTER JOIN item ON (cret_item_id = i_item_id)
LEFT OUTER JOIN customer c1 ON (cret_refund_customer_id = c1.c_customer_id)
LEFT OUTER JOIN customer c2 ON (cret_return_customer_id = c2.c_customer_id)
LEFT OUTER JOIN reason ON (cret_reason_id = r_reason_id)
LEFT OUTER JOIN call_center ON (cret_call_center_id = cc_call_center_id)
LEFT OUTER JOIN catalog_page ON (cret_catalog_page_id = cp_catalog_page_id)
LEFT OUTER JOIN ship_mode ON (cret_shipmode_id = sm_ship_mode_id)
LEFT OUTER JOIN warehouse ON (cret_warehouse_id = w_warehouse_id)""",
    "wsv" -> """SELECT d1.d_date_sk ws_sold_date_sk, t_time_sk ws_sold_time_sk,
       d2.d_date_sk ws_ship_date_sk, i_item_sk ws_item_sk,
       c1.c_customer_sk ws_bill_customer_sk,
       c1.c_current_cdemo_sk ws_bill_cdemo_sk,
       c1.c_current_hdemo_sk ws_bill_hdemo_sk,
       c1.c_current_addr_sk ws_bill_addr_sk,
       c2.c_customer_sk ws_ship_customer_sk,
       c2.c_current_cdemo_sk ws_ship_cdemo_sk,
       c2.c_current_hdemo_sk ws_ship_hdemo_sk,
       c2.c_current_addr_sk ws_ship_addr_sk,
       wp_web_page_sk ws_web_page_sk, web_site_sk ws_web_site_sk,
       sm_ship_mode_sk ws_ship_mode_sk, w_warehouse_sk ws_warehouse_sk,
       p_promo_sk ws_promo_sk, word_order_id ws_order_number,
       wlin_quantity ws_quantity, i_wholesale_cost ws_wholesale_cost,
       i_current_price ws_list_price, wlin_sale_price ws_sales_price,
       (i_current_price - wlin_sale_price) * wlin_quantity ws_ext_discount_amt,
       wlin_sale_price * wlin_quantity ws_ext_sales_price,
       i_wholesale_cost * wlin_quantity ws_ext_wholesale_cost,
       i_current_price * wlin_quantity ws_ext_list_price,
       wlin_coupon_amt ws_coupon_amt, wlin_ship_cost ws_ext_ship_cost,
       (wlin_sale_price * wlin_quantity) - wlin_coupon_amt ws_net_paid,
       (wlin_sale_price * wlin_quantity) - wlin_coupon_amt
         - (wlin_quantity * i_wholesale_cost) ws_net_profit
FROM s_web_order
LEFT OUTER JOIN date_dim d1 ON (CAST(word_order_date AS DATE) = d1.d_date)
LEFT OUTER JOIN time_dim ON (word_order_time = t_time)
LEFT OUTER JOIN customer c1 ON (word_bill_customer_id = c1.c_customer_id)
LEFT OUTER JOIN customer c2 ON (word_ship_customer_id = c2.c_customer_id)
LEFT OUTER JOIN web_site ON (word_web_site_id = web_site_id)
LEFT OUTER JOIN ship_mode ON (word_ship_mode_id = sm_ship_mode_id)
JOIN s_web_order_lineitem ON (word_order_id = wlin_order_id)
LEFT OUTER JOIN date_dim d2 ON (CAST(wlin_ship_date AS DATE) = d2.d_date)
LEFT OUTER JOIN item ON (wlin_item_id = i_item_id AND i_rec_end_date IS NULL)
LEFT OUTER JOIN web_page ON (wlin_web_page_id = wp_web_page_id)
LEFT OUTER JOIN warehouse ON (wlin_warehouse_id = w_warehouse_id)
LEFT OUTER JOIN promotion ON (wlin_promotion_id = p_promo_id)""",
    "wrv" -> """SELECT d_date_sk wr_returned_date_sk, t_time_sk wr_returned_time_sk,
       i_item_sk wr_item_sk, c1.c_customer_sk wr_refunded_customer_sk,
       c2.c_customer_sk wr_returning_customer_sk,
       wp_web_page_sk wr_web_page_sk, r_reason_sk wr_reason_sk,
       wret_order_id wr_order_number, wret_return_qty wr_return_quantity,
       wret_return_amt wr_return_amt, wret_return_tax wr_return_tax,
       wret_return_amt + wret_return_tax wr_return_amt_inc_tax,
       wret_return_fee wr_fee, wret_return_ship_cost wr_return_ship_cost,
       wret_refunded_cash wr_refunded_cash,
       wret_reversed_charge wr_reversed_charge,
       wret_account_credit wr_account_credit,
       wret_return_amt + wret_return_tax + wret_return_fee
         - wret_refunded_cash - wret_reversed_charge - wret_account_credit wr_net_loss
FROM s_web_returns
LEFT OUTER JOIN date_dim ON (CAST(wret_return_date AS DATE) = d_date)
LEFT OUTER JOIN time_dim ON (wret_return_time = t_time)
LEFT OUTER JOIN item ON (wret_item_id = i_item_id)
LEFT OUTER JOIN customer c1 ON (wret_refund_customer_id = c1.c_customer_id)
LEFT OUTER JOIN customer c2 ON (wret_return_customer_id = c2.c_customer_id)
LEFT OUTER JOIN reason ON (wret_reason_id = r_reason_id)
LEFT OUTER JOIN web_page ON (wret_web_page_id = wp_web_page_id)""",
    "iv" -> """SELECT w_warehouse_sk inv_warehouse_sk, i_item_sk inv_item_sk,
       d_date_sk inv_date_sk, invn_qty_on_hand inv_quantity_on_hand
FROM s_inventory
LEFT OUTER JOIN warehouse ON (invn_warehouse_id = w_warehouse_id)
LEFT OUTER JOIN item ON (invn_item_id = i_item_id AND i_rec_end_date IS NULL)
LEFT OUTER JOIN date_dim ON (CAST(invn_date AS DATE) = d_date)""")

  /** Tables (sources + dimensions) each view's SQL references. */
  val refreshViewSources: Map[String, Seq[String]] = Map(
    "ssv" -> Seq("s_purchase", "s_purchase_lineitem", "customer", "store", "date_dim", "time_dim", "promotion", "item"),
    "srv" -> Seq("s_store_returns", "date_dim", "time_dim", "item", "customer", "store", "reason"),
    "csv_v" -> Seq("s_catalog_order", "s_catalog_order_lineitem", "date_dim", "time_dim", "customer", "call_center", "ship_mode", "catalog_page", "warehouse", "item", "promotion"),
    "crv" -> Seq("s_catalog_returns", "date_dim", "time_dim", "item", "customer", "reason", "call_center", "catalog_page", "ship_mode", "warehouse"),
    "wsv" -> Seq("s_web_order", "s_web_order_lineitem", "date_dim", "time_dim", "customer", "web_site", "ship_mode", "item", "web_page", "warehouse", "promotion"),
    "wrv" -> Seq("s_web_returns", "date_dim", "time_dim", "item", "customer", "reason", "web_page"),
    "iv" -> Seq("s_inventory", "warehouse", "item", "date_dim"))

  /** Gate-entry summary over the 7 views: row counts, resolved-key
    * counts, and exact-decimal checksums surfaced as DOUBLE. */
  val refreshSummary: String = """SELECT * FROM (
  SELECT 'ssv' AS view_name, COUNT(*) AS n_rows,
         COUNT(ss_item_sk) AS n_resolved,
         CAST(SUM(ss_net_paid) AS DOUBLE) AS checksum
  FROM ssv
  UNION ALL
  SELECT 'srv', COUNT(*), COUNT(sr_item_sk),
         CAST(SUM(sr_return_amt) AS DOUBLE) FROM srv
  UNION ALL
  SELECT 'csv', COUNT(*), COUNT(cs_item_sk),
         CAST(SUM(cs_net_paid) AS DOUBLE) FROM csv_v
  UNION ALL
  SELECT 'crv', COUNT(*), COUNT(cr_item_sk),
         CAST(SUM(cr_return_amount) AS DOUBLE) FROM crv
  UNION ALL
  SELECT 'wsv', COUNT(*), COUNT(ws_item_sk),
         CAST(SUM(ws_net_paid) AS DOUBLE) FROM wsv
  UNION ALL
  SELECT 'wrv', COUNT(*), COUNT(wr_item_sk),
         CAST(SUM(wr_return_amt) AS DOUBLE) FROM wrv
  UNION ALL
  SELECT 'iv', COUNT(*), COUNT(inv_item_sk),
         CAST(SUM(CAST(inv_quantity_on_hand AS BIGINT)) AS DOUBLE) FROM iv)
ORDER BY view_name"""
}
