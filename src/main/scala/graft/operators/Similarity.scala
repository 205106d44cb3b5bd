package graft.operators

import graft.{OpQuery, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over the `embeddings` table.
  *
  * Two paths:
  *   - brute-force cosine top-k (the correctness baseline): broadcast the
  *     (tiny) probe set against the candidate corpus — one scan of the
  *     corpus, no |corpus|² blow-up, scales linearly with candidates;
  *   - sign-LSH (random-hyperplane) bucketing (the 100 TB path): each
  *     vector maps row-locally to a bucket id; probes only score
  *     candidates in their own bucket, cutting the scan by the bucket
  *     fan-out. Hyperplanes are seeded-deterministic literals compiled
  *     into the plan (broadcast implicitly with the closure).
  */
object Similarity {

  // dot products run through the codegen'd graft_dot expression (same
  // sequential fold as the HOF chain it replaces — bit-identical, ~an
  // order of magnitude less per-element dispatch; PolyHash.scala)
  private def emb(s: SparkSession, d: String): DataFrame = {
    graft.functions.GraftFunctions.registerAll(s)
    Tables.load(s, d, "embeddings")
      .withColumn("v", expr("transform(embedding, x -> CAST(x AS DOUBLE))"))
      .withColumn("norm", expr("sqrt(graft_dot(v, v))"))
  }

  private def cosine(a: String, b: String): Column =
    expr(s"graft_dot($a.v, $b.v)") / (col(s"$a.norm") * col(s"$b.norm"))

  // Brute-force top-10 cosine neighbors for probe vectors (vec_id < 5).
  private val bruteTopk = OpQuery(
    "simsearch_topk",
    Some("""
      SELECT probe_id, neighbor_id, sim, CAST(rn AS INT) AS rank FROM (
        SELECT a.vec_id AS probe_id, b.vec_id AS neighbor_id,
               round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])), 6) AS sim,
               ROW_NUMBER() OVER (PARTITION BY a.vec_id
                 ORDER BY round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])), 6) DESC,
                          b.vec_id) AS rn
        FROM embeddings a JOIN embeddings b ON a.vec_id <> b.vec_id
        WHERE a.vec_id < 5)
      WHERE rn <= 10
      ORDER BY probe_id, rank
    """),
    (s, d) => {
      val e = emb(s, d)
      val probes = e.filter(col("vec_id") < 5)
        .select(col("vec_id").as("probe_id"), col("v"), col("norm")).as("a")
      val cand = e.select(col("vec_id").as("neighbor_id"), col("v"), col("norm")).as("b")
      val sim = round(cosine("a", "b"), 6)
      val w = Window.partitionBy(col("probe_id")).orderBy(col("sim").desc, col("neighbor_id"))
      cand.join(broadcast(probes), col("probe_id") =!= col("neighbor_id"))
        .select(col("probe_id"), col("neighbor_id"), sim.as("sim"))
        .withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 10)
        .orderBy("probe_id", "rank")
    })

  /** Seeded deterministic hyperplanes: 4 planes × 64 dims → 16 buckets. */
  private[operators] def hyperplanes(nPlanes: Int = 4, dims: Int = 64): Seq[Seq[Double]] = {
    val rnd = new scala.util.Random(42)
    Seq.fill(nPlanes)(Seq.fill(dims)(rnd.nextGaussian()))
  }

  /** Row-local sign-LSH bucket id of vector column `v`. The `D` suffix
    * keeps Spark SQL from parsing plane weights as DECIMAL literals. */
  private[operators] def bucketCol(planes: Seq[Seq[Double]]): Column =
    planes.zipWithIndex.map { case (p, j) =>
      val arr = p.map(x => s"${x}D").mkString("array(", ",", ")")
      val dot = expr(s"graft_dot(v, $arr)")
      when(dot > 0, lit(1 << j)).otherwise(lit(0))
    }.reduce(_ + _)

  /** DuckDB mirror of [[bucketCol]]: the SAME hyperplane literals
    * embedded in SQL, with the bucket dot-products as an explicit
    * left-fold (list_reduce with prepended 0.0) matching Spark's
    * aggregate() evaluation order bit-for-bit, so bucket signs agree
    * exactly. Expects a `v` DOUBLE[] column in scope. */
  private[operators] def duckBucketExpr(planes: Seq[Seq[Double]] = hyperplanes()): String =
    planes.zipWithIndex.map { case (p, j) =>
      val arr = p.map(x => s"${x}").mkString("[", ", ", "]")
      s"""CASE WHEN list_reduce(
         |  list_prepend(0.0, list_transform(range(1, ${p.size + 1}), i -> v[i] * ($arr)[i])),
         |  (acc, x) -> acc + x) > 0 THEN ${1 << j} ELSE 0 END""".stripMargin
    }.mkString(" + ")

  /** DuckDB oracle for the LSH probe path; 6-decimal similarity rounding
    * like the brute-force oracle. */
  private def lshOracle: String = {
    val folds = duckBucketExpr()
    s"""
      WITH bkt AS (
        SELECT vec_id, $folds AS bucket
        FROM (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
              FROM embeddings))
      SELECT probe_id, neighbor_id, sim, CAST(rn AS INT) AS rank FROM (
        SELECT a.vec_id AS probe_id, b.vec_id AS neighbor_id,
               round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])), 6) AS sim,
               ROW_NUMBER() OVER (PARTITION BY a.vec_id
                 ORDER BY round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])), 6) DESC,
                          b.vec_id) AS rn
        FROM embeddings a
        JOIN embeddings b ON a.vec_id <> b.vec_id
        JOIN bkt ba ON ba.vec_id = a.vec_id
        JOIN bkt bb ON bb.vec_id = b.vec_id AND ba.bucket = bb.bucket
        WHERE a.vec_id < 5)
      WHERE rn <= 3
      ORDER BY probe_id, rank
    """
  }

  // LSH-bucketed ANN: probes score only their own bucket's candidates.
  // Seeded hyperplanes are compiled into BOTH the Spark plan and the
  // DuckDB oracle as identical double literals.
  private val lshTopk = OpQuery(
    "simsearch_lsh",
    Some(lshOracle),
    (s, d) => {
      val planes = hyperplanes()
      val e = emb(s, d).withColumn("bucket", bucketCol(planes))
      val probes = e.filter(col("vec_id") < 5)
        .select(col("vec_id").as("probe_id"), col("v"), col("norm"), col("bucket")).as("a")
      val cand = e.select(col("vec_id").as("neighbor_id"), col("v"), col("norm"),
        col("bucket").as("cbucket")).as("b")
      val sim = round(cosine("a", "b"), 6)
      val w = Window.partitionBy(col("probe_id")).orderBy(col("sim").desc, col("neighbor_id"))
      cand.join(broadcast(probes),
          col("bucket") === col("cbucket") && col("probe_id") =!= col("neighbor_id"))
        .select(col("probe_id"), col("neighbor_id"), sim.as("sim"))
        .withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 3)
        .orderBy("probe_id", "rank")
    })

  // Per-label centroids (posexplode → (label, dim) partial agg) and each
  // vector's cosine against its own centroid — the IVF building block.
  private val centroids = OpQuery(
    "embedding_centroid_sim",
    Some("""
      WITH c AS (
        SELECT label, dim, SUM(x) / COUNT(*) AS cx
        FROM (SELECT label, unnest(list_transform(embedding, x -> CAST(x AS DOUBLE))) AS x,
                     generate_subscripts(embedding, 1) AS dim
              FROM embeddings)
        GROUP BY label, dim),
      n AS (
        SELECT e.vec_id, e.label,
               SUM(CAST(e.embedding[dim] AS DOUBLE) * cx) AS dot,
               sqrt(SUM(CAST(e.embedding[dim] AS DOUBLE) * CAST(e.embedding[dim] AS DOUBLE))) AS vn,
               sqrt(SUM(cx * cx)) AS cn
        FROM embeddings e JOIN c ON e.label = c.label
        GROUP BY e.vec_id, e.label)
      SELECT vec_id, label, round(dot / (vn * cn), 4) AS centroid_sim
      FROM n
      ORDER BY vec_id
    """),
    (s, d) => {
      val e = Tables.load(s, d, "embeddings")
        .withColumn("v", expr("transform(embedding, x -> CAST(x AS DOUBLE))"))
      val flat = e.select(col("vec_id"), col("label"),
        posexplode(col("v")).as(Seq("dim0", "x")))
        .withColumn("dim", col("dim0") + 1).drop("dim0")
      val cent = flat.groupBy("label", "dim")
        .agg((sum(col("x")) / count(lit(1))).as("cx"))
      flat.join(cent, Seq("label", "dim"))
        .groupBy("vec_id", "label")
        .agg(
          sum(col("x") * col("cx")).as("dot"),
          sqrt(sum(col("x") * col("x"))).as("vn"),
          sqrt(sum(col("cx") * col("cx"))).as("cn"))
        .select(col("vec_id"), col("label"),
          round(col("dot") / (col("vn") * col("cn")), 4).as("centroid_sim"))
        .orderBy("vec_id")
    })

  // ------------------------------------------------------------- IVF
  // Full inverted-file ANN: per-label centroids act as the coarse
  // quantizer, every vector is assigned to its NEAREST centroid (not
  // its own label's), and probes scan only their assigned cell.
  //
  // 100 TB shape: the centroid table is k rows (broadcast); assignment
  // is a broadcast cross-join + map-side max_by partial agg (no |corpus|
  // shuffle beyond the one groupBy on vec_id); the probe scan joins on
  // cell id, so scanned candidates shrink by the cell fan-out. Cosine
  // drift control: centroid similarity rounds to 4 decimals before the
  // argmax (distributed double sums differ in the last ulps), neighbor
  // similarity to 6 (row-local fold), both mirrored in the oracle.
  private val ivfTopk = OpQuery(
    "simsearch_ivf",
    Some("""
      WITH v AS (
        SELECT vec_id, label, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        FROM embeddings),
      flat AS (
        SELECT label, unnest(v) AS x, generate_subscripts(v, 1) AS dim FROM v),
      c0 AS (SELECT label, dim, SUM(x)/COUNT(*) AS cx FROM flat GROUP BY label, dim),
      c AS (SELECT label AS clabel, list(cx ORDER BY dim) AS cv FROM c0 GROUP BY label),
      sims AS (
        SELECT vec_id, clabel,
               round(list_cosine_similarity(CAST(v.v AS DOUBLE[]), CAST(c.cv AS DOUBLE[])), 4) AS csim
        FROM v CROSS JOIN c),
      assign AS (
        SELECT vec_id, clabel AS cell FROM (
          SELECT vec_id, clabel,
                 ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY csim DESC, clabel) AS rn
          FROM sims) WHERE rn = 1),
      cell_of AS (
        SELECT a.vec_id, a.cell, e.embedding
        FROM assign a JOIN embeddings e ON e.vec_id = a.vec_id)
      SELECT probe_id, cell, neighbor_id, sim, CAST(rn AS INT) AS rank FROM (
        SELECT a.vec_id AS probe_id, a.cell AS cell, b.vec_id AS neighbor_id,
               round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])), 6) AS sim,
               ROW_NUMBER() OVER (PARTITION BY a.vec_id
                 ORDER BY round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])), 6) DESC,
                          b.vec_id) AS rn
        FROM cell_of a JOIN cell_of b ON a.cell = b.cell AND a.vec_id <> b.vec_id
        WHERE a.vec_id < 5)
      WHERE rn <= 3
      ORDER BY probe_id, rank
    """),
    (s, d) => {
      val e = emb(s, d)
      // train: per-label mean vector, re-assembled in dim order
      val cent = e
        .select(col("label"), posexplode(col("v")).as(Seq("dim", "x")))
        .groupBy("label", "dim")
        .agg((sum(col("x")) / count(lit(1))).as("cx"))
        .groupBy("label")
        .agg(expr("transform(array_sort(collect_list(struct(dim, cx))), p -> p.cx)")
          .as("cv"))
        .withColumn("cnorm", expr("sqrt(graft_dot(cv, cv))"))
        .select(col("label").as("clabel"), col("cv"), col("cnorm"))
      // assign: nearest centroid per vector (max_by = argmax w/ label
      // tie-break), map-side partial agg under the vec_id groupBy
      val csim = round(
        expr("graft_dot(v, cv)") / (col("norm") * col("cnorm")), 4)
      val assigned = e.crossJoin(broadcast(cent))
        .withColumn("csim", csim)
        .groupBy("vec_id")
        .agg(expr("max_by(clabel, struct(csim, -clabel))").as("cell"),
          first(col("v")).as("v"), first(col("norm")).as("norm"))
      // probe: scan only the probe's own cell
      val probes = assigned.filter(col("vec_id") < 5)
        .select(col("vec_id").as("probe_id"), col("cell"),
          col("v"), col("norm")).as("a")
      val cand = assigned.select(col("vec_id").as("neighbor_id"),
        col("cell").as("ccell"), col("v"), col("norm")).as("b")
      val sim = round(cosine("a", "b"), 6)
      val w = Window.partitionBy(col("probe_id"))
        .orderBy(col("sim").desc, col("neighbor_id"))
      cand.join(broadcast(probes),
          col("cell") === col("ccell") && col("probe_id") =!= col("neighbor_id"))
        .select(col("probe_id"), col("cell"), col("neighbor_id"), sim.as("sim"))
        .withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 3)
        .orderBy("probe_id", "rank")
    })

  // Recall@10 of the sign-LSH candidate set against the brute-force
  // ground truth — the evaluation every ANN deployment runs before
  // trusting the approximate path. One brute pass computes both sides:
  // each exact top-10 neighbor carries an in_bucket flag (would LSH have
  // scored it?), so recall needs no second scan. At scale the probe set
  // stays broadcast-sized and ground truth is only computed for probes —
  // the candidate corpus is scanned once.
  private val recallEval = OpQuery(
    "simsearch_recall",
    Some {
      val folds = duckBucketExpr()
      s"""
      WITH bkt AS (
        SELECT vec_id, $folds AS bucket
        FROM (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
              FROM embeddings)),
      exact AS (
        SELECT probe_id, neighbor_id, in_bucket FROM (
          SELECT a.vec_id AS probe_id, b.vec_id AS neighbor_id,
                 (ba.bucket = bb.bucket) AS in_bucket,
                 ROW_NUMBER() OVER (PARTITION BY a.vec_id
                   ORDER BY round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])), 6) DESC,
                            b.vec_id) AS rn
          FROM embeddings a
          JOIN embeddings b ON a.vec_id <> b.vec_id
          JOIN bkt ba ON ba.vec_id = a.vec_id
          JOIN bkt bb ON bb.vec_id = b.vec_id
          WHERE a.vec_id < 5)
        WHERE rn <= 10)
      SELECT probe_id, COUNT(*) AS n_exact,
             CAST(SUM(CASE WHEN in_bucket THEN 1 ELSE 0 END) AS BIGINT) AS n_hit,
             CAST(SUM(CASE WHEN in_bucket THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*) AS recall
      FROM exact GROUP BY probe_id ORDER BY probe_id
      """
    },
    (s, d) => {
      val planes = hyperplanes()
      val e = emb(s, d).withColumn("bucket", bucketCol(planes))
      val probes = e.filter(col("vec_id") < 5)
        .select(col("vec_id").as("probe_id"), col("v"), col("norm"), col("bucket")).as("a")
      val cand = e.select(col("vec_id").as("neighbor_id"), col("v"), col("norm"),
        col("bucket").as("cbucket")).as("b")
      val sim = round(cosine("a", "b"), 6)
      val w = Window.partitionBy(col("probe_id")).orderBy(col("sim").desc, col("neighbor_id"))
      cand.join(broadcast(probes), col("probe_id") =!= col("neighbor_id"))
        .select(col("probe_id"), col("neighbor_id"), sim.as("sim"),
          (col("bucket") === col("cbucket")).as("in_bucket"))
        .withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 10)
        .groupBy("probe_id")
        .agg(count(lit(1)).as("n_exact"),
          sum(when(col("in_bucket"), 1L).otherwise(0L)).as("n_hit"))
        .withColumn("recall", col("n_hit").cast("double") / col("n_exact"))
        .orderBy("probe_id")
    })

  /** CTE prefix shared by the ivfpq oracle and the pq-recall oracle:
    * everything up to the per-probe ADC distance relation `adc`. */
  private val ivfpqOracleCtes: String = """
      WITH v AS (
        SELECT vec_id, label, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        FROM embeddings),
      flat AS (
        SELECT vec_id, label, unnest(v) AS x, generate_subscripts(v, 1) AS dim FROM v),
      c0 AS (SELECT label, dim, SUM(x)/COUNT(*) AS cx FROM flat GROUP BY label, dim),
      c AS (SELECT label AS clabel, list(cx ORDER BY dim) AS cv FROM c0 GROUP BY label),
      sims AS (
        SELECT vec_id, clabel,
               round(list_cosine_similarity(CAST(v.v AS DOUBLE[]), CAST(c.cv AS DOUBLE[])), 4) AS csim
        FROM v CROSS JOIN c),
      cells AS (
        SELECT vec_id, clabel AS cell FROM (
          SELECT vec_id, clabel,
                 ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY csim DESC, clabel) AS rn
          FROM sims) WHERE rn = 1),
      subs AS (
        SELECT vec_id, label, m, CAST(list_slice(v, m*8 + 1, m*8 + 8) AS DOUBLE[]) AS sv
        FROM v CROSS JOIN (SELECT unnest(range(0, 8)) AS m)),
      sflat AS (
        SELECT label, m, unnest(sv) AS x, generate_subscripts(sv, 1) AS dim FROM subs),
      cb0 AS (SELECT label, m, dim, SUM(x)/COUNT(*) AS cx FROM sflat GROUP BY label, m, dim),
      cb AS (SELECT label AS code, m, CAST(list(cx ORDER BY dim) AS DOUBLE[]) AS cbv
             FROM cb0 GROUP BY label, m),
      terms AS (
        SELECT s.vec_id, s.m, cb.code,
               CAST(round((list_dot_product(s.sv, s.sv)
                           - 2 * list_dot_product(s.sv, cb.cbv)
                           + list_dot_product(cb.cbv, cb.cbv)) * 10000) AS BIGINT) AS dterm
        FROM subs s JOIN cb USING (m)),
      codes AS (
        SELECT vec_id, m, code FROM (
          SELECT vec_id, m, code,
                 ROW_NUMBER() OVER (PARTITION BY vec_id, m ORDER BY dterm, code) AS rn
          FROM terms) WHERE rn = 1),
      lut AS (SELECT vec_id AS probe_id, m, code, dterm FROM terms WHERE vec_id < 5),
      probes AS (SELECT vec_id AS probe_id, cell FROM cells WHERE vec_id < 5),
      cand AS (
        SELECT c.vec_id AS neighbor_id, cl.cell, c.m, c.code
        FROM codes c JOIN cells cl ON cl.vec_id = c.vec_id),
      adc AS (
        SELECT p.probe_id, cand.neighbor_id,
               CAST(SUM(l.dterm) AS BIGINT) / 10000.0 AS adc
        FROM cand
        JOIN probes p ON cand.cell = p.cell AND cand.neighbor_id <> p.probe_id
        JOIN lut l ON l.probe_id = p.probe_id AND l.m = cand.m AND l.code = cand.code
        GROUP BY 1, 2)"""

  // ------------------------------------------------------------ IVF-PQ
  // IVF + product quantization, the memory-compressed ANN layout (at
  // 100 TB of embeddings the scanned side cannot carry raw floats):
  // vectors split into M=8 subspaces of 8 dims; each subspace quantizes
  // to the nearest of K=10 deterministic codebook entries (per-label
  // subvector means — the same seeding discipline as the coarse/IVF
  // centroids, embeddable in the oracle), so a candidate is M small
  // codes instead of 64 doubles (32× compression at float32 parity).
  // Search is the classic asymmetric-distance computation: each probe
  // precomputes a K×M lookup table of subspace L2² terms ONCE, and a
  // candidate's distance is the sum of M table lookups — no candidate
  // vector is ever touched. Scale shape: codebooks and probe LUTs are
  // broadcast-sized, candidates carry only (cell, codes), and the scan
  // is restricted to the probe's IVF cell. Distance terms accumulate as
  // exact 1e-4-unit BIGINTs (order-independent across engines); ranking
  // ties break on neighbor id.
  private val ivfpqTopk = OpQuery(
    "simsearch_ivfpq",
    Some(ivfpqOracleCtes + """
      SELECT probe_id, neighbor_id, adc, CAST(rn AS INT) AS rank FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY probe_id
                    ORDER BY adc, neighbor_id) AS rn
        FROM adc)
      WHERE rn <= 3
      ORDER BY probe_id, rank
    """),
    (s, d) => ivfpqRanked(s, d, 3)
      .select(col("probe_id"), col("neighbor_id"), col("adc"),
        col("rank").cast(org.apache.spark.sql.types.IntegerType).as("rank"))
      .orderBy("probe_id", "rank"))

  /** The IVF-PQ dataflow shared by [[ivfpqTopk]] and [[pqRecall]]:
    * per-probe ADC-ranked neighbors (probe_id, neighbor_id, adc, rank)
    * with rank ≤ k. See [[ivfpqTopk]] for the full design commentary. */
  private def ivfpqRanked(s: SparkSession, d: String, k: Int): DataFrame = {
      val e = emb(s, d)
      // coarse quantizer: label-mean centroids (same as simsearch_ivf)
      val cent = e.select(col("label"), posexplode(col("v")).as(Seq("dim", "x")))
        .groupBy("label", "dim").agg((sum(col("x")) / count(lit(1))).as("cx"))
        .groupBy("label")
        .agg(expr("transform(array_sort(collect_list(struct(dim, cx))), p -> p.cx)")
          .as("cv"))
        .withColumn("cnorm", expr("sqrt(graft_dot(cv, cv))"))
        .select(col("label").as("clabel"), col("cv"), col("cnorm"))
      val csim = round(expr("graft_dot(v, cv)") / (col("norm") * col("cnorm")), 4)
      val cells = e.crossJoin(broadcast(cent))
        .withColumn("csim", csim)
        .groupBy("vec_id")
        .agg(expr("max_by(clabel, struct(csim, -clabel))").as("cell"))
      // subvectors: row-local explode into (vec, m, 8-dim slice)
      val subs = e.select(col("vec_id"), col("label"),
          explode(expr(
            "transform(sequence(0, 7), m -> named_struct('m', m, 'sv', slice(v, m*8 + 1, 8)))"))
            .as("p"))
        .select(col("vec_id"), col("label"),
          col("p.m").as("m"), col("p.sv").as("sv"))
      // PQ codebooks: per (subspace, label) mean subvector — K×M×8
      // numbers total, broadcast everywhere below
      val cb = subs.select(col("label"), col("m"),
          posexplode(col("sv")).as(Seq("dim", "x")))
        .groupBy("label", "m", "dim").agg((sum(col("x")) / count(lit(1))).as("cx"))
        .groupBy("label", "m")
        .agg(expr("transform(array_sort(collect_list(struct(dim, cx))), p -> p.cx)")
          .as("cbv"))
        .select(col("label").as("code"), col("m"), col("cbv"))
      // exact-integer subspace distance term (1e-4 units): L2² via the
      // dot-product identity, one rounding point shared by both engines
      val dInt = round((expr("graft_dot(sv, sv)")
        - lit(2) * expr("graft_dot(sv, cbv)")
        + expr("graft_dot(cbv, cbv)")) * 10000).cast("long")
      val terms = subs.join(broadcast(cb), Seq("m"))
        .select(col("vec_id"), col("m"), col("code"), dInt.as("dterm"))
      // encode: per (vec, m) argmin over the K codebook entries
      val codes = terms.groupBy("vec_id", "m")
        .agg(expr("min_by(code, struct(dterm, code))").as("code"))
      val lut = terms.filter(col("vec_id") < 5)
        .select(col("vec_id").as("probe_id"), col("m"), col("code"), col("dterm"))
      val probeCells = cells.filter(col("vec_id") < 5)
        .select(col("vec_id").as("probe_id"), col("cell").as("pcell"))
      val cand = codes.join(cells, "vec_id")
        .select(col("vec_id").as("neighbor_id"), col("cell"), col("m"), col("code"))
      // ADC: cell-restricted candidates sum M broadcast-LUT lookups
      val w = Window.partitionBy("probe_id").orderBy(col("adc"), col("neighbor_id"))
      cand.join(broadcast(probeCells),
          col("cell") === col("pcell") && col("probe_id") =!= col("neighbor_id"))
        .join(broadcast(lut), Seq("probe_id", "m", "code"))
        .groupBy("probe_id", "neighbor_id")
        .agg((sum("dterm") / 10000.0).as("adc"))
        .withColumn("rank", row_number().over(w))
        .filter(col("rank") <= k)
  }

  // Recall@10 of the IVF-PQ ADC ranking against the exact brute-force
  // top-10 — the same evaluation discipline simsearch_recall applies to
  // sign-LSH, here quantifying the ivfpq entry's TOTAL approximation
  // loss (coarse-cell misses + PQ quantization error in one number; an
  // unquantified ANN index is an untrustworthy one). One brute pass over
  // the corpus computes ground truth for the broadcast-sized probe set;
  // the ADC side reuses the exact ivfpq dataflow at k=10, and the
  // per-probe hit count is a left join of the two small top-k sets.
  private val pqRecall = OpQuery(
    "simsearch_pq_recall",
    Some {
      ivfpqOracleCtes + """,
      adc_topk AS (
        SELECT probe_id, neighbor_id FROM (
          SELECT *, ROW_NUMBER() OVER (PARTITION BY probe_id
                      ORDER BY adc, neighbor_id) AS rn
          FROM adc)
        WHERE rn <= 10),
      exact AS (
        SELECT probe_id, neighbor_id FROM (
          SELECT a.vec_id AS probe_id, b.vec_id AS neighbor_id,
                 ROW_NUMBER() OVER (PARTITION BY a.vec_id
                   ORDER BY round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])), 6) DESC,
                            b.vec_id) AS rn
          FROM embeddings a JOIN embeddings b ON a.vec_id <> b.vec_id
          WHERE a.vec_id < 5)
        WHERE rn <= 10)
      SELECT e.probe_id, COUNT(*) AS n_exact,
             CAST(SUM(CASE WHEN t.neighbor_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_hit,
             CAST(SUM(CASE WHEN t.neighbor_id IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*) AS recall
      FROM exact e
      LEFT JOIN adc_topk t
        ON t.probe_id = e.probe_id AND t.neighbor_id = e.neighbor_id
      GROUP BY e.probe_id ORDER BY e.probe_id
      """
    },
    (s, d) => {
      val adcTop = ivfpqRanked(s, d, 10)
        .select(col("probe_id"), col("neighbor_id")).withColumn("hit", lit(true))
      val e = emb(s, d)
      val probes = e.filter(col("vec_id") < 5)
        .select(col("vec_id").as("probe_id"), col("v"), col("norm")).as("a")
      val cand = e.select(col("vec_id").as("neighbor_id"), col("v"), col("norm")).as("b")
      val sim = round(cosine("a", "b"), 6)
      val w = Window.partitionBy(col("probe_id")).orderBy(col("sim").desc, col("neighbor_id"))
      cand.join(broadcast(probes), col("probe_id") =!= col("neighbor_id"))
        .select(col("probe_id"), col("neighbor_id"), sim.as("sim"))
        .withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 10)
        .join(broadcast(adcTop), Seq("probe_id", "neighbor_id"), "left")
        .groupBy("probe_id")
        .agg(count(lit(1)).as("n_exact"),
          sum(when(col("hit"), 1L).otherwise(0L)).as("n_hit"))
        .withColumn("recall", col("n_hit").cast("double") / col("n_exact"))
        .orderBy("probe_id")
    })

  val defs: Seq[OpQuery] = Seq(bruteTopk, lshTopk, centroids, ivfTopk, recallEval,
    ivfpqTopk, pqRecall)
}
