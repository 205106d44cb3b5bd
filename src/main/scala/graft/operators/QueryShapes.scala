package graft.operators

import graft.{OpQuery, Tables}
import graft.Cols.{dec, moneyOut}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.IntegerType

/** Marquee TPC-DS query shapes re-expressed on the TPC-H-ish fixtures —
  * the hardest composite plans of the reference corpus, each combining
  * several operator families the inventory already covers individually:
  *
  *   - q23 (TPCDSBenchmarkQueries.scala:1226): frequent-item set +
  *     best-customer set (HAVING + max() scalar subquery), both feeding
  *     semi joins into a one-row total;
  *   - q31 (:1657): two-channel quarter-over-quarter growth-ratio
  *     comparison — a 4-way self-join of one aggregated CTE;
  *   - q78 (:3972): returns-excluded net sales — LEFT OUTER against the
  *     returns relation with an IS NULL residual, then per-(year,
  *     supplier) aggregation and top-k.
  *
  * Scale notes: every self-join/comparison here runs on PRE-AGGREGATED
  * (dimension×time-sized) relations; the fact table is scanned once per
  * distinct aggregation, semi joins keep only keys on the shuffle, and
  * the q78 anti-ish exclusion is a key-only left join. AQE picks
  * broadcast for the small aggregated sides at runtime (no hints on
  * fact-derived frames).
  */
object QueryShapes {

  // ---------------------------------------------------------- q23 SHAPE
  private val q23FrequentBest = OpQuery(
    "q23_semi_scalar",
    Some("""
      WITH freq AS (
        SELECT l_partkey
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        GROUP BY l_partkey, year(o_orderdate)
        HAVING COUNT(*) > 4),
      spend AS (
        SELECT o_custkey, SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS ts
        FROM orders GROUP BY o_custkey),
      best AS (
        SELECT o_custkey FROM spend
        WHERE ts > 0.5 * (SELECT MAX(ts) FROM spend))
      SELECT COUNT(*) AS n_lines,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
      FROM lineitem
      WHERE l_partkey IN (SELECT l_partkey FROM freq)
        AND l_orderkey IN (SELECT o_orderkey FROM orders
                           WHERE o_custkey IN (SELECT o_custkey FROM best))
    """),
    (s, d) => {
      val li = Tables.load(s, d, "lineitem")
      val o = Tables.load(s, d, "orders")
      val freq = li.join(o, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("l_partkey"), year(col("o_orderdate")))
        .agg(count(lit(1)).as("cnt"))
        .filter(col("cnt") > 4)
        .select("l_partkey").distinct()
      val spend = o.groupBy("o_custkey")
        .agg(sum(dec(col("o_totalprice"))).as("ts"))
      val maxSpend = spend.agg(max(col("ts")).as("mx"))
      // ts * 2 > mx stays in exact decimal — 0.5 * mx would cast to
      // double while the DuckDB oracle compares in exact decimal, and a
      // customer landing within one ulp of half the max could flip
      val best = spend.crossJoin(broadcast(maxSpend))
        .filter(col("ts") * 2 > col("mx"))
        .select("o_custkey")
      val bestOrders = o.join(best, Seq("o_custkey"), "left_semi")
        .select("o_orderkey")
      li.join(freq, Seq("l_partkey"), "left_semi")
        .join(bestOrders, col("l_orderkey") === col("o_orderkey"), "left_semi")
        .agg(count(lit(1)).as("n_lines"),
          moneyOut(sum(dec(col("l_extendedprice")))).as("total_price"))
    })

  // ---------------------------------------------------------- q31 SHAPE
  // Two pseudo-channels (orderkey parity) × (nation, year, quarter)
  // totals; consecutive-quarter growth ratios per channel; nations where
  // the web channel out-grows the store channel. All four join inputs
  // are the SAME aggregated CTE — dimension×time-sized at any fact scale.
  private val q31QoqRatio = OpQuery(
    "q31_qoq_ratio",
    Some("""
      WITH agg AS (
        SELECT n_name,
               CASE WHEN o_orderkey % 2 = 0 THEN 'web' ELSE 'store' END AS channel,
               CAST(year(o_orderdate) AS INT) AS yr,
               CAST(quarter(o_orderdate) AS INT) AS qtr,
               SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS total
        FROM orders JOIN customer ON o_custkey = c_custkey
                    JOIN nation ON c_nationkey = n_nationkey
        GROUP BY 1, 2, 3, 4)
      SELECT w1.n_name, w1.yr, w1.qtr AS q1, w2.qtr AS q2,
             CAST(w2.total AS DOUBLE) / CAST(w1.total AS DOUBLE) AS web_ratio,
             CAST(s2.total AS DOUBLE) / CAST(s1.total AS DOUBLE) AS store_ratio
      FROM agg w1 JOIN agg w2 ON w1.n_name = w2.n_name AND w1.yr = w2.yr
                             AND w1.channel = 'web' AND w2.channel = 'web'
                             AND w2.qtr = w1.qtr + 1
                  JOIN agg s1 ON s1.n_name = w1.n_name AND s1.yr = w1.yr
                             AND s1.qtr = w1.qtr AND s1.channel = 'store'
                  JOIN agg s2 ON s2.n_name = w1.n_name AND s2.yr = w1.yr
                             AND s2.qtr = w2.qtr AND s2.channel = 'store'
      WHERE CAST(w2.total AS DOUBLE) / CAST(w1.total AS DOUBLE)
              > CAST(s2.total AS DOUBLE) / CAST(s1.total AS DOUBLE)
      ORDER BY w1.n_name, w1.yr, q1
    """),
    (s, d) => {
      val o = Tables.load(s, d, "orders")
      val agg = o
        .join(Tables.load(s, d, "customer"), col("o_custkey") === col("c_custkey"))
        .join(broadcast(Tables.load(s, d, "nation")),
          col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name"),
          when(col("o_orderkey") % 2 === 0, "web").otherwise("store").as("channel"),
          year(col("o_orderdate")).cast(IntegerType).as("yr"),
          quarter(col("o_orderdate")).cast(IntegerType).as("qtr"))
        .agg(sum(dec(col("o_totalprice"))).as("total"))
      def ch(n: String, c: String) = agg.filter(col("channel") === c).as(n)
      val joined = ch("w1", "web").join(ch("w2", "web"),
          col("w1.n_name") === col("w2.n_name") &&
            col("w1.yr") === col("w2.yr") &&
            col("w2.qtr") === col("w1.qtr") + 1)
        .join(ch("s1", "store"),
          col("s1.n_name") === col("w1.n_name") &&
            col("s1.yr") === col("w1.yr") && col("s1.qtr") === col("w1.qtr"))
        .join(ch("s2", "store"),
          col("s2.n_name") === col("w1.n_name") &&
            col("s2.yr") === col("w1.yr") && col("s2.qtr") === col("w2.qtr"))
      joined
        .select(col("w1.n_name").as("n_name"), col("w1.yr").as("yr"),
          col("w1.qtr").as("q1"), col("w2.qtr").as("q2"),
          (col("w2.total").cast("double") / col("w1.total").cast("double"))
            .as("web_ratio"),
          (col("s2.total").cast("double") / col("s1.total").cast("double"))
            .as("store_ratio"))
        .filter(col("web_ratio") > col("store_ratio"))
        .orderBy("n_name", "yr", "q1")
    })

  // ---------------------------------------------------------- q78 SHAPE
  // Net-of-returns sales: the returns relation excluded via LEFT OUTER +
  // IS NULL (q78's ws LEFT JOIN wr … WHERE wr_order_number IS NULL),
  // aggregated per (year, supplier), top-100 by net revenue with a
  // unique tie-break.
  private val q78NetSales = OpQuery(
    "q78_returns_excluded",
    Some("""
      WITH ret AS (
        SELECT l_orderkey, l_linenumber FROM lineitem WHERE l_returnflag = 'R')
      SELECT CAST(year(o_orderdate) AS INT) AS yr, l.l_suppkey,
             COUNT(*) AS n_lines,
             CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS net_price
      FROM lineitem l
      JOIN orders ON l.l_orderkey = o_orderkey
      LEFT JOIN ret r ON l.l_orderkey = r.l_orderkey
                     AND l.l_linenumber = r.l_linenumber
      WHERE r.l_orderkey IS NULL
      GROUP BY 1, 2
      ORDER BY net_price DESC, yr, l_suppkey
      LIMIT 100
    """),
    (s, d) => {
      val li = Tables.load(s, d, "lineitem")
      val ret = li.filter(col("l_returnflag") === "R")
        .select(col("l_orderkey").as("r_orderkey"),
          col("l_linenumber").as("r_linenumber"))
      li.join(Tables.load(s, d, "orders"), col("l_orderkey") === col("o_orderkey"))
        .join(ret,
          col("l_orderkey") === col("r_orderkey") &&
            col("l_linenumber") === col("r_linenumber"),
          "left_outer")
        .filter(col("r_orderkey").isNull)
        .groupBy(year(col("o_orderdate")).cast(IntegerType).as("yr"),
          col("l_suppkey"))
        .agg(count(lit(1)).as("n_lines"),
          moneyOut(sum(dec(col("l_extendedprice")))).as("net_price"))
        .orderBy(col("net_price").desc, col("yr"), col("l_suppkey"))
        .limit(100)
    })

  val defs: Seq[OpQuery] = Seq(q23FrequentBest, q31QoqRatio, q78NetSales)
}
