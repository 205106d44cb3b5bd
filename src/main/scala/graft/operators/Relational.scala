package graft.operators

import graft.{Cols, OpQuery, Tables}
import graft.Cols.{avgExact, dec, money, moneyOut}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType, IntegerType, LongType}

/** Core relational operator corpus — the SQL surface the reference's TPC-DS
  * queries exercise (joins of every flavor, agg/rollup/having, windows, set
  * ops, scalar functions, subqueries), re-expressed Spark-first on the
  * TPC-H-ish fixture tables. See SURVEY.md §2B; query shapes mirror
  * reference usages cited per query.
  *
  * Scale notes (100 TB design intent):
  *   - star joins keep dimension sides broadcast()-ed; the fact side never
  *     shuffles for the join, only for the aggregation on its group keys;
  *   - aggregations are partial (map-side combine) automatically because
  *     they are declarative groupBy/agg;
  *   - global-ORDER-BY windows only ever run on already-aggregated
  *     (small) relations, never on the fact table;
  *   - every top-k is orderBy(...).limit(k) → Spark plans
  *     TakeOrderedAndProject (no full sort/shuffle of the input).
  */
object Relational {

  private def t(s: SparkSession, d: String, n: String): DataFrame = Tables.load(s, d, n)
  private def ts(x: String): Column = lit(x).cast("timestamp")

  /** sum(extendedprice * (1 - discount)): exact decimal arithmetic inside
    * the aggregate, final value surfaced as DOUBLE (see Cols.moneyOut). */
  private def revenue(price: Column, disc: Column): Column =
    moneyOut(sum(dec(price) * (lit(1) - dec(disc))))

  // ---------------------------------------------------------------- q1
  // Full-scan hash aggregation, TPC-H Q1 shape (reference analog: the
  // grouped-agg family, e.g. q7/q43 — TPCDSBenchmarkQueries.scala:391).
  private val q1 = OpQuery(
    "q1_agg",
    Some("""
      SELECT l_returnflag, l_linestatus,
             CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
             CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_price,
             COUNT(*) AS count_order
      FROM lineitem
      WHERE l_shipdate <= TIMESTAMP '2001-09-01 00:00:00'
      GROUP BY l_returnflag, l_linestatus
      ORDER BY l_returnflag, l_linestatus
    """),
    (s, d) => {
      val li = t(s, d, "lineitem").filter(col("l_shipdate") <= ts("2001-09-01 00:00:00"))
      li.groupBy("l_returnflag", "l_linestatus")
        .agg(
          moneyOut(sum(dec(col("l_quantity")))).as("sum_qty"),
          moneyOut(sum(dec(col("l_extendedprice")))).as("sum_base_price"),
          revenue(col("l_extendedprice"), col("l_discount")).as("sum_disc_price"),
          avgExact(sum(dec(col("l_quantity"))), count(lit(1))).as("avg_qty"),
          avgExact(sum(dec(col("l_extendedprice"))), count(lit(1))).as("avg_price"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus")
    })

  // ---------------------------------------------------------------- q3
  // Star join + top-k: broadcast the filtered dimensions, aggregate the
  // fact, TakeOrderedAndProject for the limit (reference analog: q3,
  // TPCDSBenchmarkQueries.scala:104).
  private val q3 = OpQuery(
    "q3_star_topk",
    Some("""
      SELECT l_orderkey,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
             CAST(o_orderdate AS DATE) AS orderdate, o_orderpriority
      FROM customer JOIN orders ON c_custkey = o_custkey
                    JOIN lineitem ON o_orderkey = l_orderkey
      WHERE c_mktsegment = 'BUILDING'
        AND o_orderdate < TIMESTAMP '1998-06-01 00:00:00'
        AND l_shipdate  > TIMESTAMP '1998-06-01 00:00:00'
      GROUP BY l_orderkey, o_orderdate, o_orderpriority
      ORDER BY revenue DESC, l_orderkey
      LIMIT 10
    """),
    (s, d) => {
      // orders and customer are fact-sized at 100 TB — no broadcast hints;
      // these are shuffle joins on their keys (AQE may still pick broadcast
      // at small SF from runtime stats).
      val c = t(s, d, "customer").filter(col("c_mktsegment") === "BUILDING")
      val o = t(s, d, "orders").filter(col("o_orderdate") < ts("1998-06-01 00:00:00"))
      val l = t(s, d, "lineitem").filter(col("l_shipdate") > ts("1998-06-01 00:00:00"))
      l.join(o, l("l_orderkey") === o("o_orderkey"))
        .join(c, o("o_custkey") === c("c_custkey"))
        .groupBy(l("l_orderkey"), o("o_orderdate"), o("o_orderpriority"))
        .agg(revenue(col("l_extendedprice"), col("l_discount")).as("revenue"))
        .select(
          col("l_orderkey"), col("revenue"),
          col("o_orderdate").cast("date").as("orderdate"), col("o_orderpriority"))
        .orderBy(col("revenue").desc, col("l_orderkey"))
        .limit(10)
    })

  // ---------------------------------------------------------------- q5
  // Six-way join through region→nation→customer→orders→lineitem→supplier
  // with a correlated nation condition (reference analog: multi-table star
  // joins like q17/q25, TPCDSBenchmarkQueries.scala:1048).
  private val q5 = OpQuery(
    "q5_join6",
    Some("""
      SELECT r_name, n_name,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
             COUNT(*) AS n_items
      FROM region JOIN nation   ON n_regionkey = r_regionkey
                  JOIN customer ON c_nationkey = n_nationkey
                  JOIN orders   ON o_custkey = c_custkey
                  JOIN lineitem ON l_orderkey = o_orderkey
                  JOIN supplier ON s_suppkey = l_suppkey AND s_nationkey = c_nationkey
      WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
        AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
      GROUP BY r_name, n_name
      ORDER BY r_name, n_name
    """),
    (s, d) => {
      val o = t(s, d, "orders")
        .filter(col("o_orderdate") >= ts("1997-01-01 00:00:00") &&
                col("o_orderdate") < ts("1998-01-01 00:00:00"))
      val li = t(s, d, "lineitem")
      // Fact-to-fact join on l_orderkey shuffles both sides once; customer
      // AND supplier scale with the fact tables at 100 TB, so neither gets
      // a broadcast hint (AQE still broadcasts them at small scale); only
      // the bounded dimensions (nation/region) are hinted.
      li.join(o, li("l_orderkey") === o("o_orderkey"))
        .join(t(s, d, "customer"), col("o_custkey") === col("c_custkey"))
        .join(t(s, d, "supplier"),
          col("s_suppkey") === col("l_suppkey") && col("s_nationkey") === col("c_nationkey"))
        .join(broadcast(t(s, d, "nation")), col("n_nationkey") === col("c_nationkey"))
        .join(broadcast(t(s, d, "region")), col("r_regionkey") === col("n_regionkey"))
        .groupBy("r_name", "n_name")
        .agg(
          revenue(col("l_extendedprice"), col("l_discount")).as("revenue"),
          count(lit(1)).as("n_items"))
        .orderBy("r_name", "n_name")
    })

  // ------------------------------------------------------- join flavors
  // LEFT OUTER + null-aware count (reference: 88 LEFT OUTER JOIN uses,
  // e.g. q72 — TPCDSBenchmarkQueries.scala:3675).
  private val joinLeft = OpQuery(
    "join_left_outer",
    Some("""
      SELECT o_orderkey, COUNT(l.l_orderkey) AS n_big_items
      FROM orders o LEFT JOIN (SELECT * FROM lineitem WHERE l_quantity >= 45.0) l
        ON o.o_orderkey = l.l_orderkey
      GROUP BY o_orderkey
      ORDER BY o_orderkey
    """),
    (s, d) => {
      val o = t(s, d, "orders")
      val l = t(s, d, "lineitem").filter(col("l_quantity") >= 45.0)
      o.join(l, o("o_orderkey") === l("l_orderkey"), "left_outer")
        .groupBy(o("o_orderkey"))
        .agg(count(l("l_orderkey")).as("n_big_items"))
        .orderBy("o_orderkey")
    })

  // FULL OUTER of two aggregates (reference: q51/q97 —
  // TPCDSBenchmarkQueries.scala:2521, :4697).
  private val joinFull = OpQuery(
    "join_full_outer",
    Some("""
      SELECT COALESCE(c.k, s.k) AS nationkey,
             COALESCE(c.n_customers, 0) AS n_customers,
             COALESCE(s.n_suppliers, 0) AS n_suppliers
      FROM (SELECT c_nationkey AS k, COUNT(*) AS n_customers FROM customer GROUP BY 1) c
      FULL OUTER JOIN
           (SELECT s_nationkey AS k, COUNT(*) AS n_suppliers FROM supplier GROUP BY 1) s
        ON c.k = s.k
      ORDER BY nationkey
    """),
    (s, d) => {
      val c = t(s, d, "customer").groupBy(col("c_nationkey").as("k"))
        .agg(count(lit(1)).as("n_customers"))
      val sup = t(s, d, "supplier").groupBy(col("s_nationkey").as("k"))
        .agg(count(lit(1)).as("n_suppliers"))
      c.join(sup, c("k") === sup("k"), "full_outer")
        .select(
          coalesce(c("k"), sup("k")).as("nationkey"),
          coalesce(col("n_customers"), lit(0L)).as("n_customers"),
          coalesce(col("n_suppliers"), lit(0L)).as("n_suppliers"))
        .orderBy("nationkey")
    })

  // LEFT SEMI ≡ IN (subquery) (reference: 224 IN-subquery uses — q6/q14/
  // q23…; Catalyst rewrites to LeftSemi).
  private val joinSemi = OpQuery(
    "join_semi_in",
    Some("""
      SELECT c_custkey, c_name
      FROM customer
      WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_totalprice > 300000.0)
      ORDER BY c_custkey
    """),
    (s, d) => {
      val big = t(s, d, "orders").filter(col("o_totalprice") > 300000.0)
      t(s, d, "customer")
        .join(big, col("c_custkey") === big("o_custkey"), "left_semi")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    })

  // LEFT ANTI ≡ NOT EXISTS (reference: q16/q69/q94 —
  // TPCDSBenchmarkQueries.scala:1018).
  private val joinAnti = OpQuery(
    "join_anti_notexists",
    Some("""
      SELECT c_custkey, c_acctbal AS acctbal
      FROM customer c
      WHERE NOT EXISTS (SELECT 1 FROM orders o
                        WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000.0)
      ORDER BY c_custkey
    """),
    (s, d) => {
      val big = t(s, d, "orders").filter(col("o_totalprice") > 400000.0)
      t(s, d, "customer")
        .join(big, col("c_custkey") === big("o_custkey"), "left_anti")
        .select(col("c_custkey"), col("c_acctbal").as("acctbal"))
        .orderBy("c_custkey")
    })

  // Self join with theta (inequality) residual (reference: q2/q11/q39
  // self-joins — TPCDSBenchmarkQueries.scala:45, :1963; q72 inequality).
  private val joinSelfTheta = OpQuery(
    "join_self_theta",
    Some("""
      SELECT o1.o_custkey AS custkey, COUNT(*) AS n_dominated_pairs
      FROM orders o1 JOIN orders o2
        ON o1.o_custkey = o2.o_custkey
       AND o1.o_orderdate < o2.o_orderdate
       AND o1.o_totalprice > o2.o_totalprice * 2
      GROUP BY o1.o_custkey
      ORDER BY custkey
    """),
    (s, d) => {
      val o1 = t(s, d, "orders").as("o1")
      val o2 = t(s, d, "orders").as("o2")
      o1.join(o2,
          col("o1.o_custkey") === col("o2.o_custkey") &&
          col("o1.o_orderdate") < col("o2.o_orderdate") &&
          col("o1.o_totalprice") > col("o2.o_totalprice") * 2)
        .groupBy(col("o1.o_custkey").as("custkey"))
        .agg(count(lit(1)).as("n_dominated_pairs"))
        .orderBy("custkey")
    })

  // Explicit cross join (reference enables crossJoin globally —
  // TPCDSBenchmark.scala:86).
  private val joinCross = OpQuery(
    "join_cross",
    Some("""
      SELECT r_name, n_name, r_name || '/' || n_name AS pair
      FROM region CROSS JOIN nation
      ORDER BY r_name, n_name
    """),
    (s, d) =>
      t(s, d, "region").crossJoin(t(s, d, "nation"))
        .select(col("r_name"), col("n_name"),
          concat(col("r_name"), lit("/"), col("n_name")).as("pair"))
        .orderBy("r_name", "n_name"))

  // ------------------------------------------------------- aggregations
  // COUNT(DISTINCT) (reference: q16/q28/q94/q95 —
  // TPCDSBenchmarkQueries.scala:1018).
  private val aggCountDistinct = OpQuery(
    "agg_count_distinct",
    Some("""
      SELECT l_returnflag,
             COUNT(DISTINCT l_orderkey) AS n_orders,
             COUNT(DISTINCT l_partkey)  AS n_parts,
             COUNT(*) AS n_rows
      FROM lineitem
      GROUP BY l_returnflag
      ORDER BY l_returnflag
    """),
    (s, d) =>
      t(s, d, "lineitem")
        .groupBy("l_returnflag")
        .agg(
          countDistinct(col("l_orderkey")).as("n_orders"),
          countDistinct(col("l_partkey")).as("n_parts"),
          count(lit(1)).as("n_rows"))
        .orderBy("l_returnflag"))

  // Conditional aggregation / CASE pivot (reference: q2 day-of-week pivot
  // — TPCDSBenchmarkQueries.scala:56; q66 ×24).
  private val aggCasePivot = OpQuery(
    "agg_case_pivot",
    Some("""
      SELECT o_orderpriority,
             CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN CAST(o_totalprice AS DECIMAL(18,2)) END) AS DOUBLE) AS sum_f,
             CAST(SUM(CASE WHEN o_orderstatus = 'O' THEN CAST(o_totalprice AS DECIMAL(18,2)) END) AS DOUBLE) AS sum_o,
             CAST(SUM(CASE WHEN o_orderstatus = 'P' THEN 1 END) AS BIGINT) AS n_p
      FROM orders
      GROUP BY o_orderpriority
      ORDER BY o_orderpriority
    """),
    (s, d) =>
      t(s, d, "orders")
        .groupBy("o_orderpriority")
        .agg(
          moneyOut(sum(when(col("o_orderstatus") === "F", dec(col("o_totalprice"))))).as("sum_f"),
          moneyOut(sum(when(col("o_orderstatus") === "O", dec(col("o_totalprice"))))).as("sum_o"),
          sum(when(col("o_orderstatus") === "P", lit(1))).cast(LongType).as("n_p"))
        .orderBy("o_orderpriority"))

  // ROLLUP + GROUPING() (reference: 88 ROLLUP / 128 GROUPING uses — q5,
  // q18, q22, q27, q36, q67, q70, q77, q86).
  private val rollupSql = """
      SELECT n_name, c_mktsegment,
             CAST(GROUPING(n_name) AS INT) AS g_nation,
             CAST(GROUPING(c_mktsegment) AS INT) AS g_segment,
             CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS sum_bal,
             COUNT(*) AS n_cust
      FROM customer JOIN nation ON c_nationkey = n_nationkey
      GROUP BY ROLLUP(n_name, c_mktsegment)
      ORDER BY g_nation, g_segment, n_name ASC NULLS FIRST, c_mktsegment ASC NULLS FIRST
    """
  // Shared Spark-SQL/oracle text: GROUPING() on the DataFrame rollup trips
  // Spark's ambiguous-self-join lineage check, and the SQL form is the
  // reference's own shape anyway (q36/q70/q86).
  private val aggRollup = OpQuery(
    "agg_rollup_grouping",
    Some(rollupSql),
    (s, d) => { Tables.registerViews(s, d); s.sql(rollupSql) })

  // HAVING (reference: 128 uses — q6/q23).
  private val aggHaving = OpQuery(
    "agg_having",
    Some("""
      SELECT l_suppkey, CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
      FROM lineitem
      GROUP BY l_suppkey
      HAVING SUM(CAST(l_quantity AS DECIMAL(18,2))) > 15000.00
      ORDER BY l_suppkey
    """),
    (s, d) =>
      t(s, d, "lineitem")
        .groupBy("l_suppkey")
        .agg(sum(dec(col("l_quantity"))).as("sum_qty_exact"))
        .filter(col("sum_qty_exact") > lit(BigDecimal("15000.00")))
        .select(col("l_suppkey"), moneyOut(col("sum_qty_exact")).as("sum_qty"))
        .orderBy("l_suppkey"))

  // stddev via exact sums (reference: stddev_samp in q17/q29/q39 —
  // TPCDSBenchmarkQueries.scala:1048). Computed from exact decimal sums
  // with a fixed IEEE op order so Spark and DuckDB agree bit-for-bit.
  private val aggStats = OpQuery(
    "agg_stats",
    Some("""
      SELECT l_returnflag,
             COUNT(*) AS n,
             MIN(l_quantity) AS min_qty,
             MAX(l_quantity) AS max_qty,
             SQRT((CAST(SUM(CAST(l_quantity * l_quantity AS DECIMAL(18,2))) AS DOUBLE)
                   - CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
                     * CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*))
                  / (COUNT(*) - 1)) AS stddev_qty
      FROM lineitem
      GROUP BY l_returnflag
      ORDER BY l_returnflag
    """),
    (s, d) => {
      val df = t(s, d, "lineitem").groupBy("l_returnflag")
        .agg(
          count(lit(1)).as("n"),
          min(col("l_quantity")).as("min_qty"),
          max(col("l_quantity")).as("max_qty"),
          sum(dec(col("l_quantity") * col("l_quantity"))).cast(DoubleType).as("s2"),
          sum(dec(col("l_quantity"))).cast(DoubleType).as("s1"))
      df.select(col("l_returnflag"), col("n"), col("min_qty"), col("max_qty"),
          sqrt((col("s2") - col("s1") * col("s1") / col("n")) / (col("n") - 1))
            .as("stddev_qty"))
        .orderBy("l_returnflag")
    })

  // Exact interpolated percentiles (reference analog: the stats family;
  // percentile_cont's linear interpolation is the same IEEE arithmetic
  // on both engines — verified bit-identical including last-ulp cases).
  private val aggPercentiles = OpQuery(
    "agg_percentiles",
    Some("""
      SELECT l_returnflag,
             quantile_cont(l_quantity, 0.5) AS qty_p50,
             quantile_cont(l_quantity, 0.9) AS qty_p90,
             quantile_cont(l_extendedprice, 0.5) AS price_p50,
             quantile_cont(l_extendedprice, 0.99) AS price_p99
      FROM lineitem
      GROUP BY l_returnflag
      ORDER BY l_returnflag
    """),
    (s, d) => {
      // percentile(col, array(..)) shares ONE sort-aggregate per input
      // column (percentile_cont is the same Percentile expression under
      // the hood, but each WITHIN GROUP call pays its own sort buffer —
      // 4 aggs vs 2 here, and at scale each agg is a full shuffle pass).
      t(s, d, "lineitem")
        .groupBy("l_returnflag")
        .agg(
          expr("percentile(l_quantity, array(0.5D, 0.9D))").as("qty_p"),
          expr("percentile(l_extendedprice, array(0.5D, 0.99D))").as("price_p"))
        .select(col("l_returnflag"),
          col("qty_p")(0).as("qty_p50"),
          col("qty_p")(1).as("qty_p90"),
          col("price_p")(0).as("price_p50"),
          col("price_p")(1).as("price_p99"))
        .orderBy("l_returnflag")
    })

  // ------------------------------------------------------------ windows
  // Global RANK over an aggregate (reference: q44/q49 —
  // TPCDSBenchmarkQueries.scala:2133). The window input is the aggregated
  // per-supplier relation (|suppliers| rows), so the single-partition
  // global sort is safe at any fact-table scale.
  private val winRank = OpQuery(
    "window_rank_global",
    Some("""
      SELECT l_suppkey,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS rev,
             CAST(RANK()       OVER (ORDER BY SUM(CAST(l_extendedprice AS DECIMAL(18,2))) DESC, l_suppkey) AS INT) AS rnk,
             CAST(DENSE_RANK() OVER (ORDER BY SUM(CAST(l_extendedprice AS DECIMAL(18,2))) DESC, l_suppkey) AS INT) AS drnk,
             CAST(ROW_NUMBER() OVER (ORDER BY SUM(CAST(l_extendedprice AS DECIMAL(18,2))) DESC, l_suppkey) AS INT) AS rn
      FROM lineitem
      GROUP BY l_suppkey
      ORDER BY rnk
      LIMIT 100
    """),
    (s, d) => {
      val agg = t(s, d, "lineitem").groupBy("l_suppkey")
        .agg(sum(dec(col("l_extendedprice"))).as("rev_exact"))
      // Two-phase top-k: TakeOrderedAndProject trims to the 100 head rows
      // FIRST (distributed partial top-k, no global shuffle of the
      // aggregate), then the single-partition rank window runs on 100
      // rows. The (rev, suppkey) sort order is total, so ranks within
      // the head equal the global ranks.
      val top = agg.orderBy(col("rev_exact").desc, col("l_suppkey")).limit(100)
      val w = Window.orderBy(col("rev_exact").desc, col("l_suppkey"))
      top.select(
          col("l_suppkey"), moneyOut(col("rev_exact")).as("rev"),
          rank().over(w).as("rnk"), dense_rank().over(w).as("drnk"),
          row_number().over(w).as("rn"))
        .orderBy("rnk")
    })

  // Partitioned top-k per group (reference: q67 `partition by i_category
  // order by sumsales desc` — TPCDSBenchmarkQueries.scala:3452).
  private val winTopkGroup = OpQuery(
    "window_topk_per_group",
    Some("""
      SELECT * FROM (
        SELECT c_nationkey, c_custkey, c_acctbal AS acctbal,
               CAST(ROW_NUMBER() OVER (PARTITION BY c_nationkey
                                       ORDER BY c_acctbal DESC, c_custkey) AS INT) AS rn
        FROM customer)
      WHERE rn <= 3
      ORDER BY c_nationkey, rn
    """),
    (s, d) => {
      val w = Window.partitionBy("c_nationkey").orderBy(col("c_acctbal").desc, col("c_custkey"))
      t(s, d, "customer")
        .select(col("c_nationkey"), col("c_custkey"), col("c_acctbal").as("acctbal"),
          row_number().over(w).as("rn"))
        .filter(col("rn") <= 3)
        .orderBy("c_nationkey", "rn")
    })

  // Whole-partition AVG (no frame) via exact sum/count (reference:
  // q47/q53/q89 avg_monthly_sales — TPCDSBenchmarkQueries.scala:2220).
  private val winPartAvg = OpQuery(
    "window_partition_avg",
    Some("""
      SELECT o_orderkey, o_custkey, o_totalprice AS price,
             CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE)
               - CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (PARTITION BY o_custkey) AS DOUBLE)
                 / COUNT(*) OVER (PARTITION BY o_custkey) AS diff_from_avg
      FROM orders
      ORDER BY o_orderkey
    """),
    (s, d) => {
      val w = Window.partitionBy("o_custkey")
      t(s, d, "orders").select(
          col("o_orderkey"), col("o_custkey"), col("o_totalprice").as("price"),
          (dec(col("o_totalprice")).cast(DoubleType) -
            sum(dec(col("o_totalprice"))).over(w).cast(DoubleType) / count(lit(1)).over(w))
            .as("diff_from_avg"))
        .orderBy("o_orderkey")
    })

  // Running total, ROWS UNBOUNDED PRECEDING (reference: q51 cumulative —
  // TPCDSBenchmarkQueries.scala:2521).
  private val winRunning = OpQuery(
    "window_running_sum",
    Some("""
      SELECT o_custkey, o_orderkey,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
                  OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_spend
      FROM orders
      ORDER BY o_custkey, o_orderkey
    """),
    (s, d) => {
      val w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      t(s, d, "orders").select(
          col("o_custkey"), col("o_orderkey"),
          moneyOut(sum(dec(col("o_totalprice"))).over(w)).as("running_spend"))
        .orderBy("o_custkey", "o_orderkey")
    })

  // LAG/LEAD inter-event gaps in exact microseconds.
  private val winLag = OpQuery(
    "window_lag_gap",
    Some("""
      SELECT user_id, event_id,
             epoch_us(CAST(ts AS TIMESTAMP))
               - epoch_us(CAST(LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS TIMESTAMP)) AS gap_us
      FROM events
      ORDER BY user_id, event_id
    """),
    (s, d) => {
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      t(s, d, "events").select(
          col("user_id"), col("event_id"),
          (unix_micros(col("ts")) - unix_micros(lag(col("ts"), 1).over(w))).as("gap_us"))
        .orderBy("user_id", "event_id")
    })

  // Window over aggregate in the same block — the q12/q20/q98
  // revenueratio shape: `sum(sum(x)) over (partition by class)`
  // (TPCDSBenchmarkQueries.scala:713-714). Shared SQL text; exact
  // decimal sums, ratio as ordered double ops on both engines.
  private val winOverAggSql = """
      SELECT l_returnflag, l_linestatus,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS rev,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) * 100
               / CAST(SUM(SUM(CAST(l_extendedprice AS DECIMAL(18,2))))
                      OVER (PARTITION BY l_returnflag) AS DOUBLE) AS revenueratio
      FROM lineitem
      GROUP BY l_returnflag, l_linestatus
      ORDER BY l_returnflag, l_linestatus
    """
  private val winOverAgg = OpQuery(
    "window_over_agg_ratio",
    Some(winOverAggSql),
    (s, d) => { Tables.registerViews(s, d); s.sql(winOverAggSql) })

  // ------------------------------------------------------------ set ops
  private val setopUnionAll = OpQuery(
    "setop_union_all",
    Some("""
      SELECT k, COUNT(*) AS n FROM (
        SELECT c_nationkey AS k FROM customer
        UNION ALL
        SELECT s_nationkey AS k FROM supplier)
      GROUP BY k ORDER BY k
    """),
    (s, d) =>
      t(s, d, "customer").select(col("c_nationkey").as("k"))
        .unionByName(t(s, d, "supplier").select(col("s_nationkey").as("k")))
        .groupBy("k").agg(count(lit(1)).as("n"))
        .orderBy("k"))

  private val setopUnion = OpQuery(
    "setop_union_distinct",
    Some("""
      SELECT c_nationkey AS k FROM customer
      UNION
      SELECT s_nationkey AS k FROM supplier
      ORDER BY k
    """),
    (s, d) =>
      t(s, d, "customer").select(col("c_nationkey").as("k"))
        .union(t(s, d, "supplier").select(col("s_nationkey").as("k")))
        .distinct()
        .orderBy("k"))

  private val setopIntersect = OpQuery(
    "setop_intersect",
    Some("""
      SELECT c_nationkey AS k FROM customer
      INTERSECT
      SELECT s_nationkey AS k FROM supplier
      ORDER BY k
    """),
    (s, d) =>
      t(s, d, "customer").select(col("c_nationkey").as("k"))
        .intersect(t(s, d, "supplier").select(col("s_nationkey").as("k")))
        .orderBy("k"))

  private val setopExcept = OpQuery(
    "setop_except",
    Some("""
      SELECT o_custkey AS k FROM orders
      EXCEPT
      SELECT c_custkey AS k FROM customer WHERE c_mktsegment = 'BUILDING'
      ORDER BY k
    """),
    (s, d) =>
      t(s, d, "orders").select(col("o_custkey").as("k"))
        .except(t(s, d, "customer").filter(col("c_mktsegment") === "BUILDING")
          .select(col("c_custkey").as("k")))
        .orderBy("k"))

  // ----------------------------------------------------- scalar battery
  // substr/upper/lower/concat/coalesce-nullif/case/regexp/length/abs/
  // round (reference: §2B scalar functions — q5/q24/q66/q84/q91 shapes).
  private val scalarStrings = OpQuery(
    "scalar_string_battery",
    Some("""
      SELECT p_partkey,
             substr(p_name, 1, 8) AS name_prefix,
             upper(p_type) AS type_upper,
             lower(p_brand) AS brand_lower,
             p_brand || ':' || p_type AS brand_type,
             CAST(regexp_extract(p_brand, 'Brand#([0-9]+)', 1) AS INT) AS brand_num,
             CAST(length(p_name) AS INT) AS name_len,
             COALESCE(NULLIF(p_type, 'ECONOMY'), 'CHEAP') AS type_or_cheap,
             CASE WHEN p_size > 25 THEN 'large' WHEN p_size > 10 THEN 'medium' ELSE 'small' END AS size_class,
             CAST(abs(CAST(p_retailprice AS DECIMAL(18,2)) - 1000) AS DOUBLE) AS price_dist,
             round(CAST(CAST(p_retailprice AS DECIMAL(18,2)) AS DOUBLE) / 7, 2) AS price_div
      FROM part
      ORDER BY p_partkey
    """),
    (s, d) =>
      t(s, d, "part").select(
          col("p_partkey"),
          substring(col("p_name"), 1, 8).as("name_prefix"),
          upper(col("p_type")).as("type_upper"),
          lower(col("p_brand")).as("brand_lower"),
          concat(col("p_brand"), lit(":"), col("p_type")).as("brand_type"),
          regexp_extract(col("p_brand"), "Brand#([0-9]+)", 1).cast(IntegerType).as("brand_num"),
          length(col("p_name")).as("name_len"),
          coalesce(nullif(col("p_type"), lit("ECONOMY")), lit("CHEAP")).as("type_or_cheap"),
          when(col("p_size") > 25, "large").when(col("p_size") > 10, "medium")
            .otherwise("small").as("size_class"),
          moneyOut(abs(dec(col("p_retailprice")) - 1000)).as("price_dist"),
          round(dec(col("p_retailprice")).cast(DoubleType) / 7, 2).as("price_div"))
        .orderBy("p_partkey"))

  // Date/interval arithmetic (reference: q12/q20/q98 `+ INTERVAL 30 days`,
  // q72 interval in join cond — TPCDSBenchmarkQueries.scala:713, :3679).
  private val scalarDatetime = OpQuery(
    "scalar_datetime",
    Some("""
      SELECT CAST(year(l_shipdate) AS INT) AS yr,
             CAST(month(l_shipdate) AS INT) AS mo,
             CAST(date_trunc('month', l_shipdate) AS DATE) AS month_start,
             COUNT(*) AS n,
             CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1997-03-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1997-03-01 00:00:00' + INTERVAL 90 DAY
      GROUP BY 1, 2, 3
      ORDER BY yr, mo
    """),
    (s, d) =>
      t(s, d, "lineitem")
        .filter(col("l_shipdate") >= ts("1997-03-01 00:00:00") &&
                col("l_shipdate") < ts("1997-03-01 00:00:00") + expr("INTERVAL 90 DAY"))
        .groupBy(
          year(col("l_shipdate")).as("yr"),
          month(col("l_shipdate")).as("mo"),
          date_trunc("month", col("l_shipdate")).cast("date").as("month_start"))
        .agg(count(lit(1)).as("n"), moneyOut(sum(dec(col("l_quantity")))).as("sum_qty"))
        .orderBy("yr", "mo"))

  // Multi-column mixed-direction sort + LIMIT (reference: 93/103 queries
  // ORDER BY, 86 LIMIT 100 → TakeOrderedAndProject).
  private val sortMulti = OpQuery(
    "sort_multi_mixed",
    Some("""
      SELECT l_orderkey, l_linenumber,
             l_extendedprice AS price,
             CAST(l_shipdate AS DATE) AS shipdate
      FROM lineitem
      ORDER BY price DESC, shipdate ASC, l_orderkey, l_linenumber
      LIMIT 100
    """),
    (s, d) =>
      t(s, d, "lineitem").select(
          col("l_orderkey"), col("l_linenumber"),
          col("l_extendedprice").as("price"),
          col("l_shipdate").cast("date").as("shipdate"))
        .orderBy(col("price").desc, col("shipdate").asc, col("l_orderkey"), col("l_linenumber"))
        .limit(100))

  // SELECT DISTINCT (reference: q38/q87 — TPCDSBenchmarkQueries.scala:1941).
  private val distinctSel = OpQuery(
    "distinct_select",
    Some("""
      SELECT DISTINCT o_orderstatus, o_orderpriority
      FROM orders
      ORDER BY o_orderstatus, o_orderpriority
    """),
    (s, d) =>
      t(s, d, "orders").select("o_orderstatus", "o_orderpriority")
        .distinct()
        .orderBy("o_orderstatus", "o_orderpriority"))

  // Uncorrelated scalar subquery: broadcast a 1-row aggregate (reference:
  // q9/q32/q92 `1.3*avg` — TPCDSBenchmarkQueries.scala:518).
  private val subqScalar = OpQuery(
    "subquery_scalar_agg",
    Some("""
      SELECT p_partkey, p_name, p_retailprice AS price
      FROM part
      WHERE CAST(CAST(p_retailprice AS DECIMAL(18,2)) AS DOUBLE) >
            (SELECT CAST(SUM(CAST(p_retailprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) FROM part)
      ORDER BY p_partkey
    """),
    (s, d) => {
      val p = t(s, d, "part")
      val avgDf = p.agg(
        avgExact(sum(dec(col("p_retailprice"))), count(lit(1))).as("avg_price"))
      p.crossJoin(broadcast(avgDf))
        .filter(dec(col("p_retailprice")).cast(DoubleType) > col("avg_price"))
        .select(col("p_partkey"), col("p_name"), col("p_retailprice").as("price"))
        .orderBy("p_partkey")
    })

  // Correlated scalar subquery via spark.sql — the exact SQL text also
  // serves as the oracle (reference: q1 correlated avg —
  // TPCDSBenchmarkQueries.scala:36; Catalyst decorrelates).
  private val correlatedSql = """
      SELECT c1.c_custkey, c1.c_acctbal AS acctbal
      FROM customer c1
      WHERE c1.c_acctbal > (
        SELECT CAST(SUM(CAST(c2.c_acctbal AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*)
        FROM customer c2
        WHERE c2.c_nationkey = c1.c_nationkey)
      ORDER BY c1.c_custkey
    """
  private val subqCorrelated = OpQuery(
    "subquery_correlated",
    Some(correlatedSql),
    (s, d) => { Tables.registerViews(s, d); s.sql(correlatedSql) })

  // Correlated EXISTS semi-join (reference: q10/q35 correlated EXISTS —
  // TPCDSBenchmarkQueries.scala:567; Catalyst decorrelates to LeftSemi
  // with the correlation as the join key). Shared SQL text on both
  // engines.
  private val existsSemiSql = """
      SELECT s_suppkey, s_name
      FROM supplier s
      WHERE EXISTS (SELECT 1 FROM lineitem l
                    WHERE l.l_suppkey = s.s_suppkey AND l.l_quantity >= 49.5)
      ORDER BY s_suppkey
    """
  private val joinSemiExists = OpQuery(
    "join_semi_exists",
    Some(existsSemiSql),
    (s, d) => { Tables.registerViews(s, d); s.sql(existsSemiSql) })

  val defs: Seq[OpQuery] = Seq(
    q1, q3, q5,
    joinLeft, joinFull, joinSemi, joinSemiExists, joinAnti, joinSelfTheta, joinCross,
    aggCountDistinct, aggCasePivot, aggRollup, aggHaving, aggStats,
    aggPercentiles,
    winRank, winTopkGroup, winPartAvg, winRunning, winLag, winOverAgg,
    setopUnionAll, setopUnion, setopIntersect, setopExcept,
    scalarStrings, scalarDatetime, sortMulti, distinctSel,
    subqScalar, subqCorrelated)
}
