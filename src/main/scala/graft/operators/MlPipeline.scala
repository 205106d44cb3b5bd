package graft.operators

import graft.{OpQuery, Tables}
import graft.functions.GraftFunctions
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Training-data-pipeline composites over `documents` / `embeddings`:
  * clustering, LM-based quality scoring, dedup resolution, and eval-set
  * decontamination — the stages a corpus pipeline runs between raw
  * ingest and training-shard export.
  *
  * Scale design (100 TB read):
  *   - k-means assignment is row-local: the k×64 centroid matrix rides
  *     along as a broadcast one-row array and each vector computes its
  *     argmin inside a codegen'd HOF chain — zero shuffle; the centroid
  *     update is one partial-agg shuffle keyed by (cluster, dim), i.e.
  *     k×64 groups regardless of corpus size. Lloyd iterations are fixed
  *     (2) with deterministic id-ordered seeds, so the operator is a
  *     pure function of the corpus and both engines agree exactly
  *     (distances and centroid coordinates rounded to 6 decimals at the
  *     same algebraic points to absorb summation-order drift).
  *   - unigram log-prob is the two-pass LM formulation: token counts by
  *     partial aggregation, then a vocabulary-keyed join back to the
  *     token stream (the tf-idf pattern) with the corpus total riding
  *     along as a broadcast scalar.
  *   - keep-best resolution reuses the staged MinHash-LSH cluster labels
  *     ([[Dedup.ccBuild]]): windows run per duplicate cluster (tiny next
  *     to the corpus); survivors outside any cluster arrive via a
  *     broadcast anti-join, never a full-corpus window.
  *   - decontamination broadcasts the eval-set shingles (eval suites are
  *     dimension-sized) against the exploded corpus shingles — the same
  *     semi-join shape as `contamination_check`, inverted into a
  *     keep/drop accounting per source.
  */
object MlPipeline {

  private def docs(s: SparkSession, d: String): DataFrame =
    Tables.load(s, d, "documents")

  private def emb(s: SparkSession, d: String): DataFrame =
    Tables.load(s, d, "embeddings")
      .select(col("vec_id"),
        expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("v"))

  /** Row-local argmin over the broadcast centroid array: squared-L2 per
    * centroid rounded to 6 decimals, ties to the lowest cluster id
    * (struct ordering on (dist, cluster)). */
  private def assign(e: DataFrame, cents: DataFrame): DataFrame =
    e.crossJoin(broadcast(cents))
      .withColumn("cluster", expr(
        """array_min(transform(cents, c -> named_struct(
          |  'dist', round(aggregate(zip_with(v, c.cv,
          |            (x, y) -> (x - y) * (x - y)),
          |            0D, (acc, x) -> acc + x), 6),
          |  'cluster', c.cluster))).cluster""".stripMargin))
      .select("vec_id", "cluster", "v")

  /** Element-wise per-cluster means, rounded to 6 decimals per
    * coordinate (the engine-agnostic fixpoint of the AVG), re-assembled
    * into ordered arrays and collapsed to a broadcast one-row matrix. */
  private def centroidMatrix(assigned: DataFrame): DataFrame =
    assigned.select(col("cluster"), posexplode(col("v")).as(Seq("i", "x")))
      .groupBy("cluster", "i").agg(round(avg("x"), 6).as("x"))
      .groupBy("cluster").agg(
        expr("transform(array_sort(collect_list(struct(i, x))), s -> s.x)")
          .as("cv"))
      .agg(expr("array_sort(collect_list(struct(cluster, cv)))").as("cents"))

  // Deterministic Lloyd's: k=8 centroids seeded from vec_id 0..7, two
  // fixed iterations, per-cluster membership as the result relation.
  private val kmeans = OpQuery(
    "embedding_kmeans",
    Some("""
      WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
      dims AS (SELECT vec_id, unnest(v) AS x, generate_subscripts(v, 1) AS i FROM e),
      c0 AS (SELECT vec_id AS cluster, i, x FROM dims WHERE vec_id < 8),
      d1 AS (SELECT d.vec_id, c.cluster, ROUND(SUM((d.x - c.x) * (d.x - c.x)), 6) AS dist
             FROM dims d JOIN c0 c ON d.i = c.i GROUP BY 1, 2),
      a1 AS (SELECT vec_id, cluster FROM (
               SELECT vec_id, cluster,
                      ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY dist, cluster) AS rn
               FROM d1) WHERE rn = 1),
      c1 AS (SELECT a1.cluster, dims.i, ROUND(AVG(dims.x), 6) AS x
             FROM dims JOIN a1 ON dims.vec_id = a1.vec_id GROUP BY 1, 2),
      d2 AS (SELECT d.vec_id, c.cluster, ROUND(SUM((d.x - c.x) * (d.x - c.x)), 6) AS dist
             FROM dims d JOIN c1 c ON d.i = c.i GROUP BY 1, 2),
      a2 AS (SELECT vec_id, cluster FROM (
               SELECT vec_id, cluster,
                      ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY dist, cluster) AS rn
               FROM d2) WHERE rn = 1)
      SELECT cluster, COUNT(*) AS n_members, MIN(vec_id) AS first_member
      FROM a2 GROUP BY cluster ORDER BY cluster
    """),
    (s, d) => {
      val e = emb(s, d)
      val c0 = e.filter(col("vec_id") < 8)
        .select(col("vec_id").as("cluster"), col("v").as("cv"))
        .agg(expr("array_sort(collect_list(struct(cluster, cv)))").as("cents"))
      val a2 = assign(e, centroidMatrix(assign(e, c0)))
      a2.groupBy("cluster").agg(count(lit(1)).as("n_members"),
          min("vec_id").as("first_member"))
        .orderBy("cluster")
    })

  // Per-document average token log-probability under the corpus unigram
  // LM — the classic LM-based quality score (low = gibberish / rare-token
  // soup, high = plain prose).
  private val unigramLogprob = OpQuery(
    "text_unigram_logprob",
    Some("""
      WITH tok AS (SELECT doc_id, unnest(string_split(lower(text), ' ')) AS w
                   FROM documents),
      tokf AS (SELECT doc_id, w FROM tok WHERE w <> ''),
      vocab AS (SELECT w, COUNT(*) AS c FROM tokf GROUP BY w),
      tot AS (SELECT COUNT(*) AS t FROM tokf)
      SELECT doc_id, COUNT(*) AS n_tokens,
             ROUND(AVG(LN(CAST(c AS DOUBLE) / t)), 4) AS avg_logprob
      FROM tokf JOIN vocab USING (w), tot
      GROUP BY doc_id ORDER BY doc_id
    """),
    (s, d) => {
      val tok = docs(s, d)
        .select(col("doc_id"), explode(split(lower(col("text")), " ")).as("w"))
        .filter(col("w") =!= "")
      val vocab = tok.groupBy("w").agg(count(lit(1)).as("c"))
      val tot = tok.agg(count(lit(1)).as("t"))
      tok.join(vocab, "w")
        .crossJoin(broadcast(tot))
        .groupBy("doc_id").agg(
          count(lit(1)).as("n_tokens"),
          round(avg(log(col("c").cast("double") / col("t"))), 4)
            .as("avg_logprob"))
        .orderBy("doc_id")
    })

  // Dedup RESOLUTION: near-dup clusters keep their best document (most
  // content, ties to the lowest id); everything unclustered survives
  // as-is. The output is the surviving corpus roster.
  private val keepBest = OpQuery(
    "dedup_keep_best",
    Some(s"""
      ${Dedup.ccPrelude},
      cl AS (SELECT id AS doc_id, MIN(lbl) AS cluster FROM reach GROUP BY id),
      best AS (SELECT d.doc_id, c.cluster,
                      COUNT(*) OVER (PARTITION BY c.cluster) AS n_members,
                      ROW_NUMBER() OVER (PARTITION BY c.cluster
                        ORDER BY d.n_chars DESC, d.doc_id) AS rn
               FROM cl c JOIN documents d ON c.doc_id = d.doc_id)
      SELECT doc_id, cluster, n_members FROM best WHERE rn = 1
      UNION ALL
      SELECT doc_id, doc_id AS cluster, CAST(1 AS BIGINT) AS n_members
      FROM documents WHERE doc_id NOT IN (SELECT doc_id FROM cl)
      ORDER BY doc_id
    """),
    (s, d) => {
      val cl = Dedup.ccBuild(s, d)
      val dd = docs(s, d).select("doc_id", "n_chars")
      val wc = Window.partitionBy("cluster")
      val wr = Window.partitionBy("cluster")
        .orderBy(col("n_chars").desc, col("doc_id"))
      val best = cl.join(dd, "doc_id")
        .withColumn("n_members", count(lit(1)).over(wc))
        .withColumn("rn", row_number().over(wr))
        .filter(col("rn") === 1)
        .select(col("doc_id"), col("cluster"), col("n_members"))
      val singles = dd.join(broadcast(cl.select("doc_id")), Seq("doc_id"), "left_anti")
        .select(col("doc_id"), col("doc_id").as("cluster"),
          lit(1L).as("n_members"))
      best.unionByName(singles).orderBy("doc_id")
    })

  // Eval-set decontamination accounting: a corpus document is dropped if
  // it shares any 5-gram with the (broadcast) eval set; kept/dropped
  // tallies per source feed the pipeline's retention report.
  private val decontaminate = OpQuery(
    "doc_decontaminate",
    Some("""
      WITH sh AS (
        SELECT doc_id, unnest(list_distinct(
                 list_transform(range(1, len(w) - 3),
                                i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2] || ' ' || w[i+3] || ' ' || w[i+4]))) AS sg
        FROM (SELECT doc_id, string_split(lower(text), ' ') AS w FROM documents)),
      eval_sh AS (SELECT DISTINCT sg FROM sh WHERE doc_id < 5),
      hits AS (SELECT DISTINCT doc_id FROM sh
               WHERE doc_id >= 5 AND sg IN (SELECT sg FROM eval_sh))
      SELECT d.source, COUNT(CASE WHEN h.doc_id IS NULL THEN 1 END) AS n_kept,
             COUNT(h.doc_id) AS n_dropped
      FROM documents d LEFT JOIN hits h ON d.doc_id = h.doc_id
      WHERE d.doc_id >= 5
      GROUP BY d.source ORDER BY d.source
    """),
    (s, d) => {
      GraftFunctions.registerAll(s)
      val sh = docs(s, d).select(col("doc_id"),
        explode(array_distinct(expr("graft_shingles(text, 5)"))).as("sg"))
      val evalSh = sh.filter(col("doc_id") < 5).select("sg").distinct()
      val hits = sh.filter(col("doc_id") >= 5)
        .join(broadcast(evalSh), "sg").select("doc_id").distinct()
      docs(s, d).filter(col("doc_id") >= 5)
        .join(hits.withColumn("hit", lit(1)), Seq("doc_id"), "left_outer")
        .groupBy("source").agg(
          count(when(col("hit").isNull, lit(1))).as("n_kept"),
          count(col("hit")).as("n_dropped"))
        .orderBy("source")
    })

  // Training-shard sequence packing (concat-and-chunk): per source the
  // token stream is laid out doc after doc in doc_id order and cut into
  // fixed-capacity sequences; a document whose tokens straddle a cut
  // belongs to both bins. Per-bin accounting (docs touching the bin,
  // tokens in the bin, continuation docs carried over the cut) is the
  // shard-export manifest a trainer consumes.
  //
  // Scale: the only shuffle is the per-source window (packing is by
  // construction a per-shard-stream operation; at 100 TB the partition
  // key widens to source × writer-shard, same plan shape). Everything
  // else is row-local integer arithmetic — offsets via one running sum,
  // bin spans via integer division, the bin explode emits
  // ceil(n_tokens/C) ≈ 1 row per doc. No doubles anywhere.
  private val seqPack = OpQuery(
    "corpus_seq_pack",
    Some("""
      WITH t AS (
        SELECT source, doc_id,
               len(list_filter(string_split(text, ' '), x -> x <> '')) AS n_tokens
        FROM documents),
      o AS (
        SELECT source, doc_id, n_tokens,
               CAST(COALESCE(SUM(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS off
        FROM t WHERE n_tokens > 0),
      b AS (
        SELECT source, doc_id, n_tokens, off,
               unnest(generate_series(off // 512, (off + n_tokens - 1) // 512)) AS bin
        FROM o)
      SELECT source, bin, COUNT(*) AS n_docs,
             CAST(SUM(least((bin + 1) * 512, off + n_tokens)
                      - greatest(bin * 512, off)) AS BIGINT) AS n_tokens,
             COUNT(CASE WHEN off < bin * 512 THEN 1 END) AS n_carried,
             MIN(doc_id) AS first_doc
      FROM b GROUP BY source, bin ORDER BY source, bin
    """),
    (s, d) => {
      val cap = lit(512L)
      val t = docs(s, d).select(col("source"), col("doc_id"),
        size(filter(split(col("text"), " "), x => x =!= ""))
          .cast("long").as("n_tokens"))
      val w = Window.partitionBy("source").orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
      val o = t.filter(col("n_tokens") > 0)
        .withColumn("off", coalesce(sum("n_tokens").over(w), lit(0L)))
      val b = o.withColumn("bin",
        explode(sequence(expr("off div 512"),
          expr("(off + n_tokens - 1) div 512"))))
      b.groupBy("source", "bin").agg(
          count(lit(1)).as("n_docs"),
          sum(least((col("bin") + 1) * cap, col("off") + col("n_tokens"))
            - greatest(col("bin") * cap, col("off")))
            .cast("long").as("n_tokens"),
          count(when(col("off") < col("bin") * cap, lit(1))).as("n_carried"),
          min("doc_id").as("first_doc"))
        .orderBy("source", "bin")
    })

  // Temperature-weighted mixture sampling (α = 0.5): down-sample each
  // source so the mixture follows N_s^α — the rarest source survives
  // whole, a source k× larger keeps ~√(min/N_s) of its docs. The keep
  // decision h·h·N_s < min_N·10¹² (h = multiplicative doc-id hash in
  // [0, 10⁶)) realizes the √ rate in pure BIGINT arithmetic: no sqrt,
  // no doubles, no rand() — both engines agree bit-for-bit and the
  // sample is reproducible row-locally on any executor.
  //
  // Scale: per-source counts are dimension-sized (broadcast), the
  // global min is a broadcast scalar, the filter is row-local; one
  // partial-agg shuffle over the corpus total.
  private val sampleTemperature = OpQuery(
    "sample_temperature",
    Some("""
      WITH n AS (SELECT source, COUNT(*) AS n_total FROM documents GROUP BY source),
      m AS (SELECT MIN(n_total) AS min_n FROM n),
      h AS (SELECT source, (doc_id * 2654435761) % 1000000 AS h FROM documents)
      SELECT h.source, n.n_total,
             COUNT(CASE WHEN h.h * h.h * n.n_total < m.min_n * 1000000000000
                   THEN 1 END) AS n_kept
      FROM h JOIN n ON h.source = n.source CROSS JOIN m
      GROUP BY h.source, n.n_total ORDER BY h.source
    """),
    (s, d) => {
      val d0 = docs(s, d)
      val n = d0.groupBy("source").agg(count(lit(1)).as("n_total"))
      val m = n.agg(min("n_total").as("min_n"))
      d0.join(broadcast(n), "source")
        .crossJoin(broadcast(m))
        .withColumn("h", (col("doc_id") * 2654435761L) % 1000000L)
        .groupBy("source", "n_total")
        .agg(count(when(
          col("h") * col("h") * col("n_total") < col("min_n") * 1000000000000L,
          lit(1))).as("n_kept"))
        .select("source", "n_total", "n_kept")
        .orderBy("source")
    })

  // Model-based quality filtering (fastText/CCNet-style classifier
  // inference): each token hashes into a D=4096 feature bucket whose
  // weight is a fixed integer milli-unit in [-1000, 1000]; the document
  // score is the mean token weight and the keep decision is its sign.
  // Weights here are hash-derived (deterministic, embeddable in the
  // oracle); a production model swaps in a broadcast D-length INT array
  // — the plan shape is identical: a row-local codegen'd fold per
  // document, ZERO shuffle, linear at any corpus size. The milli-weight
  // sum stays in exact BIGINT (order-independent across engines and
  // partitionings); the only float op is one final division, and the
  // keep flag compares the exact integer sum — no IEEE drift can flip a
  // classification.
  private val qualityClassifier = OpQuery(
    "text_quality_classifier", {
      val duckW =
        s"""((${graft.functions.TextFunctions.duckPolyHash("t")} % 4096)
           |  * 2654435761) % 2001 - 1000""".stripMargin
      Some(s"""
      WITH tok AS (
        SELECT doc_id, unnest(list_filter(string_split(lower(text), ' '),
                                          t -> t <> '')) AS t
        FROM documents),
      w AS (SELECT doc_id, $duckW AS w FROM tok),
      agg AS (SELECT doc_id, COUNT(*) AS n_tokens,
                     CAST(SUM(w) AS BIGINT) AS score_milli
              FROM w GROUP BY doc_id)
      SELECT doc_id, CAST(n_tokens AS INT) AS n_tokens, score_milli,
             CAST(score_milli AS DOUBLE) / (n_tokens * 1000.0) AS score,
             score_milli > 0 AS keep
      FROM agg ORDER BY doc_id
      """)
    },
    (s, d) => {
      GraftFunctions.registerAll(s)
      val toks = "filter(split(lower(text), ' '), t -> t <> '')"
      docs(s, d).select(
          col("doc_id"),
          expr(s"size($toks)").as("n_tokens"),
          expr(
            s"""aggregate($toks, CAST(0 AS BIGINT),
               |  (acc, t) -> acc +
               |    ((graft_polyhash(t) % 4096) * 2654435761) % 2001 - 1000)"""
              .stripMargin).as("score_milli"))
        // zero-token documents have no classification (the oracle's
        // token unnest omits them; a NULL-score row here would be a
        // fixture-dependent schema divergence) — structural parity,
        // and the production semantics: nothing to classify
        .filter(col("n_tokens") > 0)
        .withColumn("score",
          col("score_milli").cast("double") / (col("n_tokens") * 1000.0))
        .withColumn("keep", col("score_milli") > 0)
        .orderBy("doc_id")
    })

  def defs: Seq[OpQuery] =
    Seq(kmeans, unigramLogprob, keepBest, decontaminate, seqPack,
      sampleTemperature, qualityClassifier)
}
