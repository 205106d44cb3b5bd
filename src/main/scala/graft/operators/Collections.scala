package graft.operators

import graft.{OpQuery, Tables}
import graft.Cols.{dec, moneyOut}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Collection-typed and distribution-window operators: lateral explode
  * with ordinality, an array-function battery over the embedding column,
  * deterministic string aggregation, ntile/percent_rank/cume_dist, and
  * PII redaction — rounding out SURVEY.md §2B's extension surface.
  *
  * All row-local transforms stay inside whole-stage codegen (built-in
  * collection functions + lambda HOFs, no UDFs); the only shuffles are
  * the group-by in `agg_string_concat` and the per-segment sort feeding
  * the distribution windows.
  */
object Collections {

  private def t(s: SparkSession, d: String, n: String): DataFrame =
    Tables.load(s, d, n)

  // ------------------------------------- LATERAL EXPLODE W/ ORDINALITY
  // posexplode = UNNEST WITH ORDINALITY: each document's words with their
  // positions. Row-local generator, distributes with the scan.
  private val lateralExplode = OpQuery(
    "lateral_explode",
    Some("""
      SELECT doc_id,
             CAST(UNNEST(range(len(string_split(text, ' ')))) AS INT) AS pos,
             UNNEST(string_split(text, ' ')) AS word
      FROM documents WHERE doc_id < 50 ORDER BY doc_id, pos
    """),
    (s, d) => t(s, d, "documents").filter(col("doc_id") < 50)
      .select(col("doc_id"),
        posexplode(split(col("text"), " ")).as(Seq("pos", "word")))
      .orderBy("doc_id", "pos"))

  // ------------------------------------------- ARRAY FUNCTION BATTERY
  // size / element_at / array_max / array_min / filter-lambda over the
  // 64-dim embedding column. Floats widen to double losslessly; round(6)
  // absorbs nothing here but keeps the convention uniform.
  private val arrayFunctions = OpQuery(
    "array_functions",
    Some("""
      SELECT vec_id,
             CAST(len(embedding) AS INT) AS dim,
             ROUND(CAST(embedding[1] AS DOUBLE), 6) AS first_dim,
             ROUND(CAST(list_aggregate(embedding, 'max') AS DOUBLE), 6) AS vmax,
             ROUND(CAST(list_aggregate(embedding, 'min') AS DOUBLE), 6) AS vmin,
             CAST(len(list_filter(embedding, x -> x > 0)) AS INT) AS n_pos
      FROM embeddings ORDER BY vec_id
    """),
    (s, d) => t(s, d, "embeddings")
      .select(col("vec_id"),
        size(col("embedding")).as("dim"),
        round(element_at(col("embedding"), 1).cast("double"), 6)
          .as("first_dim"),
        round(array_max(col("embedding")).cast("double"), 6).as("vmax"),
        round(array_min(col("embedding")).cast("double"), 6).as("vmin"),
        size(filter(col("embedding"), x => x > 0)).as("n_pos"))
      .orderBy("vec_id"))

  // -------------------------------------------- DETERMINISTIC LISTAGG
  // string_agg with declared ordering: collect_set is unordered on a
  // distributed engine, so array_sort pins the order before concat —
  // the only way listagg is reproducible at scale.
  private val stringConcat = OpQuery(
    "agg_string_concat",
    Some("""
      SELECT o_orderpriority,
             STRING_AGG(DISTINCT o_orderstatus, ',' ORDER BY o_orderstatus)
               AS statuses,
             COUNT(*) AS n
      FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority
    """),
    (s, d) => t(s, d, "orders").groupBy("o_orderpriority")
      .agg(
        concat_ws(",", array_sort(collect_set(col("o_orderstatus"))))
          .as("statuses"),
        count(lit(1)).as("n"))
      .orderBy("o_orderpriority"))

  // ------------------------------------ NTILE / PERCENT_RANK / CUME_DIST
  // Distribution windows per market segment; the unique c_custkey
  // tie-break makes ntile's row-order-dependent buckets deterministic.
  private val ntileDist = OpQuery(
    "window_ntile_dist",
    Some("""
      SELECT c_custkey, c_mktsegment,
             CAST(NTILE(4) OVER w AS INT) AS quartile,
             PERCENT_RANK() OVER w AS pr,
             CUME_DIST() OVER w AS cd
      FROM customer
      WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey)
      ORDER BY c_custkey
    """),
    (s, d) => {
      // 5 market segments = 5 sort tasks for a plain partitioned window;
      // ScaleWindow range-splits each segment across the cluster and the
      // distribution stats derive exactly from the global row number
      // (sort keys are unique, so rank == row_number, cume_dist == rn/n)
      val stats = ScaleWindow.orderStats(t(s, d, "customer"),
        Seq("c_mktsegment"), Seq(col("c_acctbal"), col("c_custkey")),
        "graft_rn", "graft_n")
      val rn = col("graft_rn")
      val n = col("graft_n")
      stats.select(col("c_custkey"), col("c_mktsegment"),
          ScaleWindow.ntileOf(4, rn, n).as("quartile"),
          when(n === 1, 0.0)
            .otherwise((rn - 1).cast("double") / (n - 1)).as("pr"),
          (rn.cast("double") / n).as("cd"))
        .orderBy("c_custkey")
    })

  // ------------------------------------------------------ PII REDACTION
  // Scrub numeric runs from the events' raw props payload and count the
  // redactions (documents carry no digits, so the JSON-ish props column
  // is the fixture's PII-bearing field). Row-local regex, codegen'd.
  private val piiScrub = OpQuery(
    "text_pii_scrub",
    Some("""
      SELECT event_id,
             regexp_replace(props, '[0-9]+', '#', 'g') AS scrubbed,
             CAST(len(regexp_extract_all(props, '[0-9]+')) AS INT)
               AS n_redactions
      FROM events WHERE event_id < 500 ORDER BY event_id
    """),
    (s, d) => t(s, d, "events").filter(col("event_id") < 500)
      .select(col("event_id"),
        regexp_replace(col("props"), "[0-9]+", "#").as("scrubbed"),
        expr("CAST(regexp_count(props, '[0-9]+') AS INT)")
          .as("n_redactions"))
      .orderBy("event_id"))

  // ------------------------------------------------- UNPIVOT (melt)
  // The inverse of the pivot op: wide per-flag measures back to long
  // (flag, measure, value) rows. Row-local generator after the agg.
  private val unpivotQ = OpQuery(
    "agg_unpivot",
    Some("""
      WITH agg AS (
        SELECT l_returnflag,
               CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
               CAST(SUM(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS sum_disc
        FROM lineitem GROUP BY l_returnflag)
      SELECT l_returnflag, measure, value
      FROM agg UNPIVOT (value FOR measure IN (sum_qty, sum_price, sum_disc))
      ORDER BY l_returnflag, measure
    """),
    (s, d) => t(s, d, "lineitem").groupBy("l_returnflag")
      .agg(
        moneyOut(sum(dec(col("l_quantity")))).as("sum_qty"),
        moneyOut(sum(dec(col("l_extendedprice")))).as("sum_price"),
        moneyOut(sum(dec(col("l_discount")))).as("sum_disc"))
      .unpivot(Array(col("l_returnflag")),
        Array(col("sum_qty"), col("sum_price"), col("sum_disc")),
        "measure", "value")
      .orderBy("l_returnflag", "measure"))

  // ------------------------------------------------- NULL-SAFE JOIN
  // <=> (IS NOT DISTINCT FROM) equi-join: NULL keys match each other —
  // still hashable, so Catalyst keeps it a hash join, not a theta join.
  private val nullSafeJoin = OpQuery(
    "join_null_safe",
    Some("""
      WITH a AS (SELECT NULLIF(o_orderstatus, 'P') AS k, COUNT(*) AS n_a
                 FROM orders GROUP BY 1),
           b AS (SELECT NULLIF(o_orderstatus, 'P') AS k, COUNT(*) AS n_b
                 FROM orders WHERE o_orderkey % 2 = 0 GROUP BY 1)
      SELECT a.k, n_a, n_b
      FROM a JOIN b ON a.k IS NOT DISTINCT FROM b.k
      ORDER BY a.k NULLS FIRST
    """),
    (s, d) => {
      val base = t(s, d, "orders")
      val a = base
        .groupBy(expr("nullif(o_orderstatus, 'P')").as("k"))
        .agg(count(lit(1)).as("n_a"))
      val b = base.filter(col("o_orderkey") % 2 === 0)
        .groupBy(expr("nullif(o_orderstatus, 'P')").as("k2"))
        .agg(count(lit(1)).as("n_b"))
      a.join(b, col("k") <=> col("k2"))
        .select(col("k"), col("n_a"), col("n_b"))
        .orderBy(col("k").asc_nulls_first)
    })

  // --------------------------------- FIRST / LAST / NTH VALUE WINDOWS
  // Whole-partition value picks with an explicit full frame (last_value
  // over the default frame is the current row — the classic trap).
  private val firstLast = OpQuery(
    "window_first_last",
    Some("""
      SELECT o_orderkey, o_custkey,
             FIRST_VALUE(o_totalprice) OVER w AS first_price,
             LAST_VALUE(o_totalprice) OVER w AS last_price,
             NTH_VALUE(o_totalprice, 2) OVER w AS second_price
      FROM orders
      WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                   ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
      ORDER BY o_orderkey
    """),
    (s, d) => {
      val win = Window.partitionBy("o_custkey")
        .orderBy(col("o_orderdate"), col("o_orderkey"))
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      t(s, d, "orders")
        .select(col("o_orderkey"), col("o_custkey"),
          first(col("o_totalprice")).over(win).as("first_price"),
          last(col("o_totalprice")).over(win).as("last_price"),
          nth_value(col("o_totalprice"), 2).over(win).as("second_price"))
        .orderBy("o_orderkey")
    })

  val defs: Seq[OpQuery] = Seq(
    lateralExplode, arrayFunctions, stringConcat, ntileDist, piiScrub,
    unpivotQ, nullSafeJoin, firstLast)
}
