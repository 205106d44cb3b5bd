package graft.operators

import graft.{OpQuery, Tables}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.IntegerType

/** Training-data pipeline composites: chained quality filtering with
  * reject reasons, int8 embedding quantization, corpus-level token
  * accounting, sketch-based approximate distinct, and the bucketized
  * range join that replaces inequality joins at scale.
  *
  * Scale notes: the filter pipeline and quantization are row-local
  * (zero shuffle); accounting is one partial-agg groupBy; the range
  * join shuffles (bucket, key) pairs instead of exploding a
  * broadcast-nested-loop product.
  */
object Pipeline {

  // -------------------------------------------- QUALITY FILTER PIPELINE
  // Chained expectations (the C4/RefinedWeb-style keep/drop cascade):
  // each document gets its FIRST failing rule as the verdict, 'keep'
  // when every rule passes. Rules are exact integer/double arithmetic,
  // reproducible in any engine; the summary is one partial-agg groupBy.
  private val qualityFilter = OpQuery(
    "quality_filter_pipeline",
    Some("""
      WITH t AS (
        SELECT lang,
               len(string_split(lower(text), ' ')) AS n_tok,
               len(list_distinct(string_split(lower(text), ' '))) AS n_uniq
        FROM documents),
      v AS (
        SELECT lang,
               CASE WHEN n_tok < 20 THEN 'too_short'
                    WHEN n_tok > 350 THEN 'too_long'
                    WHEN CAST(n_uniq AS DOUBLE) / n_tok < 0.3 THEN 'repetitive'
                    ELSE 'keep' END AS verdict
        FROM t)
      SELECT lang, verdict, COUNT(*) AS n
      FROM v GROUP BY lang, verdict ORDER BY lang, verdict
    """),
    (s, d) => {
      val toks = split(lower(col("text")), " ")
      val nTok = size(toks)
      val nUniq = size(array_distinct(toks))
      Tables.load(s, d, "documents")
        .select(col("lang"),
          when(nTok < 20, "too_short")
            .when(nTok > 350, "too_long")
            .when(nUniq.cast("double") / nTok < 0.3, "repetitive")
            .otherwise("keep").as("verdict"))
        .groupBy("lang", "verdict").agg(count(lit(1)).as("n"))
        .orderBy("lang", "verdict")
    })

  // --------------------------------------------- INT8 QUANTIZATION
  // Max-abs int8 quantization of the embedding column — the storage/
  // serving compression step of an embedding pipeline. Entirely
  // row-local higher-order functions (no UDF, no shuffle); float→double
  // casts are exact and mult-then-div ordering is fixed, so Spark and
  // DuckDB agree bit-for-bit; round() is ties-away-from-zero in both.
  private val embeddingQuantize = OpQuery(
    "embedding_quantize",
    Some("""
      WITH s AS (
        SELECT vec_id, embedding,
               list_aggregate(
                 list_transform(embedding, x -> abs(CAST(x AS DOUBLE))),
                 'max') AS scale
        FROM embeddings),
      q AS (
        SELECT vec_id, scale,
               list_transform(embedding,
                 x -> CASE WHEN scale = 0 THEN 0
                           ELSE CAST(round(CAST(x AS DOUBLE) * 127.0 / scale) AS INT)
                      END) AS qv
        FROM s)
      SELECT vec_id, scale,
             CAST(list_sum(qv) AS BIGINT) AS q_sum,
             CAST(list_min(qv) AS INT) AS q_min,
             CAST(list_max(qv) AS INT) AS q_max
      FROM q ORDER BY vec_id
    """),
    (s, d) => {
      val scale = aggregate(
        transform(col("embedding"), x => abs(x.cast("double"))),
        lit(0.0), (acc, x) => greatest(acc, x))
      Tables.load(s, d, "embeddings")
        .withColumn("scale", scale)
        .withColumn("qv", transform(col("embedding"),
          x => when(col("scale") === 0.0, 0)
            .otherwise(round(x.cast("double") * 127.0 / col("scale"))
              .cast(IntegerType))))
        .select(col("vec_id"), col("scale"),
          aggregate(col("qv"), lit(0L), (acc, x) => acc + x).as("q_sum"),
          array_min(col("qv")).as("q_min"),
          array_max(col("qv")).as("q_max"))
        .orderBy("vec_id")
    })

  // --------------------------------------------- CORPUS ACCOUNTING
  // Per-(lang, source) token/char budgets — the dataset-card numbers a
  // training run reports. One partial-agg shuffle of ~|lang|×|source|
  // groups regardless of corpus size.
  private val corpusAccounting = OpQuery(
    "corpus_token_accounting",
    Some("""
      SELECT lang, source, COUNT(*) AS n_docs,
             CAST(SUM(len(string_split(lower(text), ' '))) AS BIGINT) AS total_tokens,
             CAST(SUM(length(text)) AS BIGINT) AS total_chars,
             CAST(SUM(length(text)) AS DOUBLE) / COUNT(*) AS avg_chars
      FROM documents
      GROUP BY lang, source ORDER BY lang, source
    """),
    (s, d) =>
      Tables.load(s, d, "documents")
        .groupBy("lang", "source")
        .agg(count(lit(1)).as("n_docs"),
          sum(size(split(lower(col("text")), " "))).cast("long").as("total_tokens"),
          sum(length(col("text"))).cast("long").as("total_chars"),
          (sum(length(col("text"))).cast("double") / count(lit(1))).as("avg_chars"))
        .orderBy("lang", "source"))

  // --------------------------------------------- APPROX DISTINCT SKETCH
  // HyperLogLog++ distinct (Spark's approx_count_distinct) next to the
  // exact count — the sketch path that replaces an exact distinct
  // shuffle at 100 TB (fixed-size sketch per partition, constant-memory
  // merge). The sketch estimate is engine-specific, so the oracle checks
  // the exact counts plus the pinned relative-error bound; the estimate
  // itself is deterministic for a given dataset (fixed HLL hash).
  private val approxDistinct = OpQuery(
    "agg_approx_distinct",
    Some("""
      SELECT CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS exact_orders,
             CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS exact_parts,
             true AS orders_within_5pct, true AS parts_within_5pct
      FROM lineitem
    """),
    (s, d) => {
      val li = Tables.load(s, d, "lineitem")
      // Two separate one-row aggregates: mixing multi-column exact
      // DISTINCT with HLL sketches in ONE Aggregate forces a combined
      // expand+object-hash plan ~7× slower; split, each side plans its
      // natural strategy and the join of two single rows is free.
      val exact = li.agg(
        countDistinct(col("l_orderkey")).as("exact_orders"),
        countDistinct(col("l_partkey")).as("exact_parts"))
      val approx = li.agg(
        approx_count_distinct(col("l_orderkey"), 0.02).as("approx_orders"),
        approx_count_distinct(col("l_partkey"), 0.02).as("approx_parts"))
      exact.crossJoin(approx)
        .select(col("exact_orders"), col("exact_parts"),
          (abs(col("approx_orders") - col("exact_orders")).cast("double")
            / col("exact_orders") <= 0.05).as("orders_within_5pct"),
          (abs(col("approx_parts") - col("exact_parts")).cast("double")
            / col("exact_parts") <= 0.05).as("parts_within_5pct"))
    })

  // --------------------------------------------- BUCKETIZED RANGE JOIN
  // Point-in-interval join done the scale way: intervals explode into
  // the day buckets they cover, points map to their single bucket, and
  // the match becomes an EQUI-join on the bucket plus a residual BETWEEN
  // — a hash shuffle instead of the O(|points|×|intervals|)
  // broadcast-nested-loop a raw inequality join plans. Each point holds
  // exactly one bucket, so no pair dedup is needed.
  private val rangeBucketed = OpQuery(
    "join_range_bucketed",
    Some("""
      WITH campaigns AS (
        SELECT o_orderkey AS campaign_id, o_orderdate AS start_ts,
               o_orderdate + INTERVAL 7 DAY AS end_ts
        FROM orders WHERE o_orderkey % 1000 = 0)
      SELECT c.campaign_id, COUNT(*) AS n_orders,
             CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
      FROM campaigns c JOIN orders o
        ON o.o_orderdate >= c.start_ts AND o.o_orderdate < c.end_ts
      GROUP BY c.campaign_id ORDER BY c.campaign_id
    """),
    (s, d) => {
      val o = Tables.load(s, d, "orders")
      val campaigns = o.filter(col("o_orderkey") % 1000 === 0)
        .select(col("o_orderkey").as("campaign_id"),
          col("o_orderdate").as("start_ts"),
          (col("o_orderdate") + expr("INTERVAL 7 DAYS")).as("end_ts"))
      // interval → covered day buckets (8 per 7-day window)
      val byBucket = campaigns.select(col("campaign_id"), col("start_ts"),
        col("end_ts"),
        explode(sequence(to_date(col("start_ts")), to_date(col("end_ts"))))
          .as("bucket"))
      val points = o.select(col("o_orderdate"), col("o_totalprice"),
        to_date(col("o_orderdate")).as("bucket"))
      points.join(byBucket, Seq("bucket"))
        .filter(col("o_orderdate") >= col("start_ts") &&
          col("o_orderdate") < col("end_ts"))
        .groupBy("campaign_id")
        .agg(count(lit(1)).as("n_orders"),
          graft.Cols.moneyOut(sum(graft.Cols.dec(col("o_totalprice"))))
            .as("sum_price"))
        .orderBy("campaign_id")
    })

  val defs: Seq[OpQuery] = Seq(
    qualityFilter, embeddingQuantize, corpusAccounting, approxDistinct,
    rangeBucketed)
}
