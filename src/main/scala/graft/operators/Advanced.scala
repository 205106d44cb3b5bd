package graft.operators

import graft.{Cols, OpQuery, Tables}
import graft.Cols.{dec, money, moneyOut}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, IntegerType}

/** Advanced SQL surface beyond the core corpus: GROUPING SETS / CUBE,
  * pivot, interval+inequality joins (q72 shape), multi-scalar-subquery
  * CASE (q9 shape), cross-channel cumulative compare (q51 shape), moving
  * frames, LIKE battery, and multiset set-ops. Reference citations per
  * query; see SURVEY.md §2B.
  */
object Advanced {

  private def t(s: SparkSession, d: String, n: String): DataFrame =
    Tables.load(s, d, n)

  // ------------------------------------------------- GROUPING SETS
  // (reference: rollup family q5/q14a/q18 — TPCDSBenchmarkQueries.scala:239 —
  // generalized to explicit sets; Spark 4 Dataset.groupingSets API.)
  private val groupingSetsQ = OpQuery(
    "agg_grouping_sets",
    Some("""
      SELECT CAST(GROUPING(o_orderstatus) AS INT) AS g_status,
             CAST(GROUPING(o_orderpriority) AS INT) AS g_prio,
             o_orderstatus, o_orderpriority, COUNT(*) AS n,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
      FROM orders
      GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
      ORDER BY g_status, g_prio,
               o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST
    """),
    (s, d) => t(s, d, "orders")
      .groupingSets(
        Seq(Seq(col("o_orderstatus")), Seq(col("o_orderpriority")), Seq.empty),
        col("o_orderstatus"), col("o_orderpriority"))
      .agg(
        grouping(col("o_orderstatus")).cast(IntegerType).as("g_status"),
        grouping(col("o_orderpriority")).cast(IntegerType).as("g_prio"),
        count(lit(1)).as("n"),
        moneyOut(sum(dec(col("o_totalprice")))).as("sum_price"))
      .select("g_status", "g_prio", "o_orderstatus", "o_orderpriority",
        "n", "sum_price")
      .orderBy(col("g_status"), col("g_prio"),
        col("o_orderstatus").asc_nulls_first,
        col("o_orderpriority").asc_nulls_first))

  // ------------------------------------------------------------ CUBE
  private val cubeQ = OpQuery(
    "agg_cube",
    Some("""
      SELECT CAST(GROUPING(l_returnflag) AS INT) AS g_rf,
             CAST(GROUPING(l_linestatus) AS INT) AS g_ls,
             l_returnflag, l_linestatus, COUNT(*) AS n,
             CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
      FROM lineitem
      GROUP BY CUBE (l_returnflag, l_linestatus)
      ORDER BY g_rf, g_ls,
               l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST
    """),
    (s, d) => t(s, d, "lineitem")
      .cube("l_returnflag", "l_linestatus")
      .agg(
        grouping(col("l_returnflag")).cast(IntegerType).as("g_rf"),
        grouping(col("l_linestatus")).cast(IntegerType).as("g_ls"),
        count(lit(1)).as("n"),
        moneyOut(sum(dec(col("l_quantity")))).as("sum_qty"))
      .select("g_rf", "g_ls", "l_returnflag", "l_linestatus", "n", "sum_qty")
      .orderBy(col("g_rf"), col("g_ls"),
        col("l_returnflag").asc_nulls_first,
        col("l_linestatus").asc_nulls_first))

  // ----------------------------------------------------------- PIVOT
  // (reference analog: conditional-agg day-of-week/month pivots, q2/q66 —
  // TPCDSBenchmarkQueries.scala:56/3233 — as a first-class pivot() with a
  // declared value list so the output schema is static.)
  private val pivotQ = OpQuery(
    "agg_pivot",
    Some("""
      SELECT o_orderpriority,
             CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN CAST(o_totalprice AS DECIMAL(18,2)) END) AS DOUBLE) AS F,
             CAST(SUM(CASE WHEN o_orderstatus = 'O' THEN CAST(o_totalprice AS DECIMAL(18,2)) END) AS DOUBLE) AS O,
             CAST(SUM(CASE WHEN o_orderstatus = 'P' THEN CAST(o_totalprice AS DECIMAL(18,2)) END) AS DOUBLE) AS P
      FROM orders
      GROUP BY o_orderpriority
      ORDER BY o_orderpriority
    """),
    (s, d) => t(s, d, "orders")
      .groupBy("o_orderpriority")
      .pivot("o_orderstatus", Seq("F", "O", "P"))
      .agg(moneyOut(sum(dec(col("o_totalprice")))))
      .orderBy("o_orderpriority"))

  // ---------------------------------- interval + inequality join (q72)
  // Equi-key join with an event-time interval band and a value inequality
  // as residual conditions (reference: q72's `d1.d_date + INTERVAL 5 days`
  // and `inv_quantity_on_hand < cs_quantity`,
  // TPCDSBenchmarkQueries.scala:3658-3679). The equi key keeps this a
  // hash/sort-merge join at scale; the band and inequality evaluate as
  // post-join residuals, never a cross product.
  private val intervalJoin = OpQuery(
    "join_interval_inequality",
    Some("""
      SELECT o_orderpriority, COUNT(*) AS n,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
      FROM lineitem JOIN orders
        ON l_orderkey = o_orderkey
       AND l_shipdate > o_orderdate + INTERVAL 5 DAY
       AND l_shipdate <= o_orderdate + INTERVAL 60 DAY
       AND l_quantity < 25.0
      GROUP BY o_orderpriority
      ORDER BY o_orderpriority
    """),
    (s, d) => t(s, d, "lineitem")
      .join(t(s, d, "orders"),
        col("l_orderkey") === col("o_orderkey") &&
          col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 5 DAY") &&
          col("l_shipdate") <= col("o_orderdate") + expr("INTERVAL 60 DAY") &&
          col("l_quantity") < 25.0)
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n"),
        moneyOut(sum(dec(col("l_extendedprice")))).as("sum_price"))
      .orderBy("o_orderpriority"))

  // --------------------------- multi-scalar-subquery CASE (q9 shape)
  // Five uncorrelated scalar subqueries selected between by CASE
  // (reference: q9's 15 scalar subqueries, TPCDSBenchmarkQueries.scala:518).
  // Identical SQL text runs on Spark (via temp views) and DuckDB —
  // Catalyst plans each scalar subquery as an independent broadcast-able
  // single-row aggregate.
  private val scalarCaseSql = """
      SELECT
        CASE WHEN (SELECT COUNT(*) FROM lineitem WHERE l_quantity BETWEEN 1 AND 15) > 10000
             THEN (SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
                   FROM lineitem WHERE l_quantity BETWEEN 1 AND 15)
             ELSE (SELECT CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
                   FROM lineitem WHERE l_quantity BETWEEN 1 AND 15) END AS bucket1,
        CASE WHEN (SELECT COUNT(*) FROM lineitem WHERE l_quantity BETWEEN 16 AND 30) > 10000
             THEN (SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
                   FROM lineitem WHERE l_quantity BETWEEN 16 AND 30)
             ELSE (SELECT CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
                   FROM lineitem WHERE l_quantity BETWEEN 16 AND 30) END AS bucket2,
        CASE WHEN (SELECT COUNT(*) FROM lineitem WHERE l_quantity > 30) > 10000
             THEN (SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
                   FROM lineitem WHERE l_quantity > 30)
             ELSE (SELECT CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
                   FROM lineitem WHERE l_quantity > 30) END AS bucket3
  """
  private val scalarCase = OpQuery(
    "subquery_scalar_case",
    Some(scalarCaseSql),
    (s, d) => { Tables.registerViews(s, d); s.sql(scalarCaseSql) })

  // --------------------- cross-channel cumulative compare (q51 shape)
  // Daily ship-revenue vs order-revenue: aggregate each channel, FULL
  // OUTER join on day, running totals, keep days where shipping runs
  // ahead (reference: q51's web-vs-store cumulative FULL OUTER JOIN,
  // TPCDSBenchmarkQueries.scala:2521). The global-ORDER-BY window runs on
  // the per-day relation (|days| rows), never on the fact tables.
  private val cumulativeCompare = OpQuery(
    "window_cumulative_fullouter",
    Some("""
      WITH l AS (
        SELECT CAST(l_shipdate AS DATE) AS d,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS rev
        FROM lineitem GROUP BY 1),
      o AS (
        SELECT CAST(o_orderdate AS DATE) AS d,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS rev
        FROM orders GROUP BY 1),
      x AS (
        SELECT COALESCE(l.d, o.d) AS d, l.rev AS lrev, o.rev AS orev
        FROM l FULL OUTER JOIN o ON l.d = o.d),
      c AS (
        SELECT d,
               CAST(SUM(COALESCE(lrev, 0)) OVER (ORDER BY d ROWS UNBOUNDED PRECEDING) AS DECIMAL(18,2)) AS cum_ship,
               CAST(SUM(COALESCE(orev, 0)) OVER (ORDER BY d ROWS UNBOUNDED PRECEDING) AS DECIMAL(18,2)) AS cum_order
        FROM x)
      SELECT d, CAST(cum_ship AS DOUBLE) AS cum_ship, CAST(cum_order AS DOUBLE) AS cum_order
      FROM c WHERE cum_ship * 1.2 > cum_order
      ORDER BY d
    """),
    (s, d) => {
      val zero = lit(BigDecimal("0.00")).cast(Cols.Money)
      val l = t(s, d, "lineitem")
        .groupBy(col("l_shipdate").cast("date").as("ld"))
        .agg(money(sum(dec(col("l_extendedprice")))).as("lrev"))
      val o = t(s, d, "orders")
        .groupBy(col("o_orderdate").cast("date").as("od"))
        .agg(money(sum(dec(col("o_totalprice")))).as("orev"))
      val w = Window.orderBy("d")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      l.join(o, col("ld") === col("od"), "full_outer")
        .select(coalesce(col("ld"), col("od")).as("d"),
          col("lrev"), col("orev"))
        .select(col("d"),
          money(sum(coalesce(col("lrev"), zero)).over(w)).as("cum_ship_x"),
          money(sum(coalesce(col("orev"), zero)).over(w)).as("cum_order_x"))
        .filter(col("cum_ship_x") * lit(BigDecimal("1.2")) > col("cum_order_x"))
        .select(col("d"),
          moneyOut(col("cum_ship_x")).as("cum_ship"),
          moneyOut(col("cum_order_x")).as("cum_order"))
        .orderBy("d")
    })

  // ---------------------------------------- moving frame (ROWS k PRECEDING)
  // 4-day trailing window over daily revenue (reference: frame windows,
  // q51 ROWS UNBOUNDED — TPCDSBenchmarkQueries.scala:2521 — here bounded).
  // Exact decimal sum over the frame; one IEEE division for the average.
  private val movingAvg = OpQuery(
    "window_moving_avg",
    Some("""
      WITH daily AS (
        SELECT CAST(l_shipdate AS DATE) AS d,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS rev
        FROM lineitem GROUP BY 1)
      SELECT d, CAST(rev AS DOUBLE) AS rev,
             CAST(CAST(SUM(rev) OVER (ORDER BY d ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) AS DOUBLE)
                  / COUNT(*) OVER (ORDER BY d ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) AS DOUBLE) AS rev_ma4
      FROM daily
      ORDER BY d
    """),
    (s, d) => {
      val w = Window.orderBy("d").rowsBetween(-3, Window.currentRow)
      t(s, d, "lineitem")
        .groupBy(col("l_shipdate").cast("date").as("d"))
        .agg(money(sum(dec(col("l_extendedprice")))).as("rev_x"))
        .select(col("d"), moneyOut(col("rev_x")).as("rev"),
          (sum(col("rev_x")).over(w).cast(DoubleType) /
            count(lit(1)).over(w)).cast(DoubleType).as("rev_ma4"))
        .orderBy("d")
    })

  // -------------------------------------------------- LIKE battery (q91)
  private val likeBattery = OpQuery(
    "scalar_like_patterns",
    Some("""
      SELECT p_brand,
             COUNT(*) AS n,
             CAST(SUM(CASE WHEN p_name LIKE '%ring%' THEN 1 ELSE 0 END) AS BIGINT) AS n_ring,
             CAST(SUM(CASE WHEN p_name LIKE 'small%' THEN 1 ELSE 0 END) AS BIGINT) AS n_small,
             CAST(SUM(CASE WHEN p_name LIKE '_ed%' THEN 1 ELSE 0 END) AS BIGINT) AS n_ed,
             CAST(SUM(CASE WHEN p_type NOT LIKE '%ECO%' THEN 1 ELSE 0 END) AS BIGINT) AS n_noneco
      FROM part
      WHERE p_brand LIKE 'Brand#1%'
      GROUP BY p_brand
      ORDER BY p_brand
    """),
    (s, d) => t(s, d, "part")
      .filter(col("p_brand").like("Brand#1%"))
      .groupBy("p_brand")
      .agg(
        count(lit(1)).as("n"),
        sum(when(col("p_name").like("%ring%"), 1).otherwise(0)).as("n_ring"),
        sum(when(col("p_name").like("small%"), 1).otherwise(0)).as("n_small"),
        sum(when(col("p_name").like("_ed%"), 1).otherwise(0)).as("n_ed"),
        sum(when(!col("p_type").like("%ECO%"), 1).otherwise(0)).as("n_noneco"))
      .orderBy("p_brand"))

  // ------------------------------------------- multiset set operations
  // INTERSECT ALL / EXCEPT ALL keep duplicate multiplicity (bag
  // semantics), unlike the distinct set-ops in the core corpus
  // (reference set-ops: q8/q14/q38/q87 — TPCDSBenchmarkQueries.scala:411).
  private val intersectAll = OpQuery(
    "setop_intersect_all",
    Some("""
      SELECT l_suppkey, CAST(floor(l_quantity) AS INT) AS qty FROM lineitem WHERE l_returnflag = 'A'
      INTERSECT ALL
      SELECT l_suppkey, CAST(floor(l_quantity) AS INT) AS qty FROM lineitem WHERE l_returnflag = 'R'
      ORDER BY l_suppkey, qty
    """),
    (s, d) => {
      val li = t(s, d, "lineitem")
      def side(flag: String) = li.filter(col("l_returnflag") === flag)
        .select(col("l_suppkey"), floor(col("l_quantity")).cast(IntegerType).as("qty"))
      side("A").intersectAll(side("R")).orderBy("l_suppkey", "qty")
    })

  private val exceptAll = OpQuery(
    "setop_except_all",
    Some("""
      SELECT l_suppkey, CAST(floor(l_quantity) AS INT) AS qty FROM lineitem WHERE l_returnflag = 'A'
      EXCEPT ALL
      SELECT l_suppkey, CAST(floor(l_quantity) AS INT) AS qty FROM lineitem WHERE l_returnflag = 'R'
      ORDER BY l_suppkey, qty
    """),
    (s, d) => {
      val li = t(s, d, "lineitem")
      def side(flag: String) = li.filter(col("l_returnflag") === flag)
        .select(col("l_suppkey"), floor(col("l_quantity")).cast(IntegerType).as("qty"))
      side("A").exceptAll(side("R")).orderBy("l_suppkey", "qty")
    })

  // -------------------------------------------------- salted skew join
  // Hot-key mitigation by salting: the fact side gets a deterministic
  // salt in [0, k), the dimension side is replicated k ways, and the
  // join key becomes (key, salt) — a single hot key spreads over k
  // reducers instead of one. AQE's skew-join split handles moderate
  // skew automatically; explicit salting is the portable fallback for
  // pathological keys. Results are identical to the unsalted join,
  // which is exactly what the oracle asserts.
  private val saltK = 8
  private val skewSalted = OpQuery(
    "join_skew_salted",
    Some("""
      SELECT o_orderstatus, COUNT(*) AS n,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      GROUP BY o_orderstatus
      ORDER BY o_orderstatus
    """),
    (s, d) => {
      val fact = t(s, d, "lineitem")
        .withColumn("salt", pmod(xxhash64(col("l_orderkey"), col("l_linenumber")), lit(saltK)))
      val dim = t(s, d, "orders")
        .crossJoin(s.range(saltK).select(col("id").cast(IntegerType).as("salt2")))
      fact.join(dim,
          col("l_orderkey") === col("o_orderkey") &&
          col("salt") === col("salt2"))
        .groupBy("o_orderstatus")
        .agg(count(lit(1)).as("n"),
          moneyOut(sum(dec(col("l_extendedprice")))).as("sum_price"))
        .orderBy("o_orderstatus")
    })

  // ------------------------------ conditional-aggregate battery
  // count_if / bool_and / bool_or / min_by / max_by. The argmin/argmax
  // pick key is a monotone (cents, orderkey) composite so price ties
  // resolve identically on every engine (min_by on a tied raw value is
  // pick-any — nondeterministic on a distributed engine by construction).
  private val condBattery = OpQuery(
    "agg_conditional_battery",
    Some("""
      SELECT o_orderpriority,
             CAST(COUNT(*) FILTER (WHERE o_totalprice > 100000) AS BIGINT) AS n_big,
             BOOL_AND(o_totalprice > 0) AS all_positive,
             BOOL_OR(o_orderstatus = 'P') AS any_pending,
             MIN_BY(o_orderkey, CAST(ROUND(o_totalprice * 100) AS BIGINT) * 1000000000 + o_orderkey) AS cheapest_key,
             MAX_BY(o_orderkey, CAST(ROUND(o_totalprice * 100) AS BIGINT) * 1000000000 + o_orderkey) AS priciest_key
      FROM orders
      GROUP BY o_orderpriority ORDER BY o_orderpriority
    """),
    (s, d) => {
      val tieKey = round(col("o_totalprice") * 100).cast("long") *
        lit(1000000000L) + col("o_orderkey")
      t(s, d, "orders").groupBy("o_orderpriority")
        .agg(
          count_if(col("o_totalprice") > 100000).as("n_big"),
          bool_and(col("o_totalprice") > 0).as("all_positive"),
          bool_or(col("o_orderstatus") === "P").as("any_pending"),
          min_by(col("o_orderkey"), tieKey).as("cheapest_key"),
          max_by(col("o_orderkey"), tieKey).as("priciest_key"))
        .orderBy("o_orderpriority")
    })

  // ------------------------------------ exact-sums covariance / corr
  // Like the stddev op: exact decimal sums (n, Σx, Σy, Σxy, Σx², Σy²)
  // shuffled as partial aggregates, then ONE double expression per
  // output — deterministic across engines where a streaming covar/corr
  // implementation would drift.
  private val corrExact = OpQuery(
    "agg_corr_exact",
    Some("""
      WITH s AS (
        SELECT l_returnflag, COUNT(*) AS n,
               SUM(CAST(l_quantity AS DECIMAL(18,2))) AS sx,
               SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS sy,
               SUM(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_extendedprice AS DECIMAL(18,2))) AS sxy,
               SUM(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_quantity AS DECIMAL(18,2))) AS sxx,
               SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_extendedprice AS DECIMAL(18,2))) AS syy
        FROM lineitem GROUP BY l_returnflag)
      SELECT l_returnflag,
             ROUND((CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE) / n) / (n - 1), 6) AS covar_samp,
             ROUND((CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE) / n)
                   / SQRT((CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) / n)
                        * (CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) / n)), 6) AS corr
      FROM s ORDER BY l_returnflag
    """),
    (s, d) => {
      val x = dec(col("l_quantity"))
      val y = dec(col("l_extendedprice"))
      val agg = t(s, d, "lineitem").groupBy("l_returnflag")
        .agg(count(lit(1)).as("n"),
          sum(x).as("sx"), sum(y).as("sy"), sum(x * y).as("sxy"),
          sum(x * x).as("sxx"), sum(y * y).as("syy"))
      val (n, sx, sy, sxy, sxx, syy) = (col("n"),
        col("sx").cast(DoubleType), col("sy").cast(DoubleType),
        col("sxy").cast(DoubleType), col("sxx").cast(DoubleType),
        col("syy").cast(DoubleType))
      agg.select(col("l_returnflag"),
        round((sxy - sx * sy / n) / (n - 1), 6).as("covar_samp"),
        round((sxy - sx * sy / n) /
          sqrt((sxx - sx * sx / n) * (syy - sy * sy / n)), 6).as("corr"))
        .orderBy("l_returnflag")
    })

  // ----------------------- multi-channel UNION ALL → ROLLUP composite
  // The q5/q77/q80 report shape (reference:
  // TPCDSBenchmarkQueries.scala:239/3865/4051): per-channel relations
  // unioned, then rolled up with grouping flags — union and rollup in
  // one pipeline rather than as isolated operators.
  private val channelRollup = OpQuery(
    "agg_channel_rollup",
    Some("""
      WITH channels AS (
        SELECT 'store' AS channel, o_orderpriority AS grp,
               CAST(o_totalprice AS DECIMAL(18,2)) AS amt
        FROM orders WHERE o_orderkey % 3 = 0
        UNION ALL
        SELECT 'web', o_orderpriority, CAST(o_totalprice AS DECIMAL(18,2))
        FROM orders WHERE o_orderkey % 3 <> 0)
      SELECT CAST(GROUPING(channel) AS INT) AS g_ch, CAST(GROUPING(grp) AS INT) AS g_grp,
             channel, grp, COUNT(*) AS n,
             CAST(SUM(amt) AS DOUBLE) AS sum_amt
      FROM channels
      GROUP BY ROLLUP (channel, grp)
      ORDER BY g_ch, g_grp, channel NULLS FIRST, grp NULLS FIRST
    """),
    (s, d) => {
      val o = t(s, d, "orders")
      def channel(name: String, pred: Column): DataFrame =
        o.filter(pred).select(lit(name).as("channel"),
          col("o_orderpriority").as("grp"), dec(col("o_totalprice")).as("amt"))
      channel("store", col("o_orderkey") % 3 === 0)
        .unionByName(channel("web", col("o_orderkey") % 3 =!= 0))
        .rollup("channel", "grp")
        .agg(
          grouping(col("channel")).cast(IntegerType).as("g_ch"),
          grouping(col("grp")).cast(IntegerType).as("g_grp"),
          count(lit(1)).as("n"),
          moneyOut(sum(col("amt"))).as("sum_amt"))
        .select("g_ch", "g_grp", "channel", "grp", "n", "sum_amt")
        .orderBy(col("g_ch"), col("g_grp"),
          col("channel").asc_nulls_first, col("grp").asc_nulls_first)
    })

  // ------------------------------------ MULTI-SUBQUERY CROSS JOIN (q88)
  // The TPC-DS q88 shape (reference: TPCDSBenchmarkQueries.scala:4407 —
  // eight independent time-bucket scalar aggregates cross-joined into
  // one row). Each bucket is its own scan+agg subquery, exactly as the
  // corpus writes it; every subquery reduces to a single row before the
  // (free) cross joins, so the shape is scan-bound at any scale and
  // Catalyst runs the eight scans in parallel.
  private val q88Buckets = OpQuery(
    "q88_time_buckets", {
      val buckets = for {
        h <- 0 to 3; ty <- Seq("view", "click")
      } yield (h, ty)
      val subs = buckets.map { case (h, ty) =>
        s"""(SELECT COUNT(*) AS n FROM events
            WHERE EXTRACT(hour FROM CAST(ts AS TIMESTAMP)) = $h
              AND event_type = '$ty') b_${h}_$ty"""
      }
      val cols = buckets.map { case (h, ty) => s"b_${h}_$ty.n AS n_h${h}_$ty" }
      Some(s"SELECT ${cols.mkString(", ")} FROM ${subs.mkString(" CROSS JOIN ")}")
    },
    (s, d) => {
      val ev = t(s, d, "events")
      val buckets = for {
        h <- 0 to 3; ty <- Seq("view", "click")
      } yield (h, ty)
      buckets.map { case (h, ty) =>
        ev.filter(hour(col("ts")) === h && col("event_type") === ty)
          .agg(count(lit(1)).as(s"n_h${h}_$ty"))
      }.reduce(_ crossJoin _)
    })

  // WITH RECURSIVE over an implicit binary-heap hierarchy on customer
  // keys (node i's parent is i div 2, root 1): per-depth node counts —
  // the org-chart / BOM-explosion traversal shape. Spark 4's recursive
  // CTE executes as UnionLoop: each iteration joins the (depth-sized)
  // frontier against the keyed customer scan, so work per round is
  // O(frontier), rounds = tree depth = log2(|customer|) — at 100 TB the
  // frontier join shuffles on the key like any equi-join and the loop
  // terminates in ~40 rounds. Spark-side text uses `div`, oracle `//`
  // (same BIGINT semantics); everything else is exact integer math.
  private val recursiveHierarchy = OpQuery(
    "recursive_hierarchy",
    Some("""
      WITH RECURSIVE tree AS (
        SELECT c_custkey AS node, 0 AS depth FROM customer WHERE c_custkey = 1
        UNION ALL
        SELECT c.c_custkey, t.depth + 1
        FROM customer c JOIN tree t ON c.c_custkey // 2 = t.node)
      SELECT depth, COUNT(*) AS n_nodes,
             MIN(node) AS min_node, MAX(node) AS max_node
      FROM tree GROUP BY depth ORDER BY depth
    """),
    (s, d) => {
      Tables.load(s, d, "customer").createOrReplaceTempView("customer")
      s.sql("""
        WITH RECURSIVE tree AS (
          SELECT c_custkey AS node, 0 AS depth FROM customer WHERE c_custkey = 1
          UNION ALL
          SELECT c.c_custkey, t.depth + 1
          FROM customer c JOIN tree t ON c.c_custkey div 2 = t.node)
        SELECT depth, COUNT(*) AS n_nodes,
               MIN(node) AS min_node, MAX(node) AS max_node
        FROM tree GROUP BY depth ORDER BY depth""")
    })

  val defs: Seq[OpQuery] = Seq(
    groupingSetsQ, cubeQ, pivotQ, intervalJoin, scalarCase,
    cumulativeCompare, movingAvg, likeBattery, intersectAll, exceptAll,
    skewSalted, condBattery, corrExact, channelRollup, q88Buckets,
    recursiveHierarchy)
}
