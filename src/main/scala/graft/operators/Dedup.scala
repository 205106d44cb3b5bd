package graft.operators

import graft.{OpQuery, Tables}
import graft.functions.TextFunctions._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deduplication suite over `documents` (+ embedding near-dup over
  * `embeddings`): exact, MinHash+LSH, SimHash, n-gram Jaccard,
  * embedding-cosine.
  *
  * Scale design:
  *   - exact dedup = one hash-partitioned groupBy on the key — the only
  *     shuffle moves (key, id) pairs, never full rows;
  *   - MinHash signatures and SimHash are row-local HOF folds (no
  *     shuffle); LSH banding shuffles 4 small (band, hash, id) rows per
  *     doc and only joins within band buckets — this is the 100 TB path
  *     (candidate pairs ∝ true dups, not |docs|²);
  *   - exact-Jaccard runs on a bounded id-range sample: it is the
  *     verification stage for LSH candidates, never the full corpus;
  *   - embedding near-dup blocks on `label` (IVF-style coarse
  *     partitioning) so the pair space is |label-bucket|², not |corpus|².
  */
object Dedup {

  private def docs(s: SparkSession, d: String): DataFrame =
    Tables.load(s, d, "documents")

  // Exact dedup: canonical row per identical text.
  private val exact = OpQuery(
    "dedup_exact",
    Some("""
      SELECT MIN(doc_id) AS canonical_id, COUNT(*) AS n_copies, text
      FROM documents
      GROUP BY text
      ORDER BY canonical_id
    """),
    (s, d) =>
      docs(s, d).groupBy("text")
        .agg(min(col("doc_id")).as("canonical_id"), count(lit(1)).as("n_copies"))
        .select("canonical_id", "n_copies", "text")
        .orderBy("canonical_id"))

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
      val sh = docs(s, d).filter(col("doc_id") < 1000)
        .select(col("doc_id"),
          explode(array_distinct(shingles("text", 3))).as("s"))
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

  // MinHash (16 perms) + LSH (4 bands × 4 rows): candidate pairs whose
  // estimated similarity (matching signature fraction) >= 0.5.
  // xxhash64-based → Spark-only (rows-only correctness check).
  private def minhashLshBuild(s: SparkSession, d: String): DataFrame = {
    // Map-reduce MinHash: explode distinct shingles once, then 16
    // codegen'd min(xxhash64(shingle, p)) aggregates. Shingles are built
    // exactly once per doc (HOF-composed signatures get re-inlined by
    // CollapseProject into every consumer and recompute 16×). The
    // groupBy(doc_id) is a standard partial-agg shuffle — the 100 TB
    // formulation. persist() keeps the two LSH join sides from
    // recomputing the signature stage.
    val perms = 16
    val sh = docs(s, d).select(
      col("doc_id"), explode(array_distinct(shingles("text", 3))).as("s"))
    val sigCols = (0 until perms).map(p => min(expr(s"xxhash64(s, $p)")).as(s"m$p"))
    val sigDf = sh.groupBy("doc_id")
      .agg(sigCols.head, sigCols.tail: _*)
      .select(col("doc_id"), array((0 until perms).map(p => col(s"m$p")): _*).as("sig"))
      .persist()
    val bands = sigDf.select(
      col("doc_id"), col("sig"),
      explode(expr(
        """transform(sequence(0, 3), b -> named_struct(
          |  'b', b,
          |  'h', xxhash64(b, element_at(sig, b*4 + 1), element_at(sig, b*4 + 2),
          |                element_at(sig, b*4 + 3), element_at(sig, b*4 + 4))))""".stripMargin))
        .as("band"))
      .select(col("doc_id"), col("sig"), col("band.b").as("b"), col("band.h").as("h"))
    val a = bands.as("a"); val b = bands.as("b")
    a.join(b, col("a.b") === col("b.b") && col("a.h") === col("b.h") &&
        col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        (expr("size(filter(zip_with(a.sig, b.sig, (x, y) -> x = y), v -> v))") / 16.0)
          .as("est_sim"))
      .distinct()
      .filter(col("est_sim") >= 0.5)
      .orderBy("doc_a", "doc_b")
  }

  // SimHash near-dup pairs: 64-bit signatures, blocked on 16-bit chunks
  // (a pair within hamming distance <= 8 must share a chunk only
  // probabilistically — chunk blocking is the standard recall/cost
  // trade), verified with bit_count(xor) <= 12.
  private def simhashBuild(s: SparkSession, d: String): DataFrame = {
    // Same materialization barrier as MinHash: one SimHash per doc, not
    // one per downstream reference.
    val sig = docs(s, d)
      .withColumn("sh3", shingles("text", 3))
      .select(col("doc_id"), simhash64("sh3").as("sh"))
      .persist()
    val chunks = sig.select(
      col("doc_id"), col("sh"),
      explode(expr(
        "transform(sequence(0, 3), c -> named_struct('c', c, 'v', (shiftright(sh, c*16) & 65535)))"))
        .as("ch"))
      .select(col("doc_id"), col("sh"), col("ch.c").as("c"), col("ch.v").as("v"))
    val a = chunks.as("a"); val b = chunks.as("b")
    a.join(b, col("a.c") === col("b.c") && col("a.v") === col("b.v") &&
        col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        expr("bit_count(a.sh ^ b.sh)").as("hamming"))
      .distinct()
      .filter(col("hamming") <= 8)
      .orderBy("doc_a", "doc_b")
  }

  private val simhash = OpQuery("dedup_simhash", None, (s, d) => simhashBuild(s, d))

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
      val e = Tables.load(s, d, "embeddings")
        .withColumn("v", expr("transform(embedding, x -> CAST(x AS DOUBLE))"))
        .withColumn("norm", expr("sqrt(aggregate(v, CAST(0 AS DOUBLE), (s, x) -> s + x * x))"))
        .select("vec_id", "label", "v", "norm")
      val a = e.as("a"); val b = e.as("b")
      val sim = round(
        expr("aggregate(zip_with(a.v, b.v, (x, y) -> x * y), CAST(0 AS DOUBLE), (s, x) -> s + x)") /
          (col("a.norm") * col("b.norm")), 6)
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("vec_id")).orderBy(col("sim").desc, col("nn_id"))
      a.join(b, col("a.label") === col("b.label") && col("a.vec_id") =!= col("b.vec_id"))
        .select(col("a.vec_id").as("vec_id"), col("b.vec_id").as("nn_id"), sim.as("sim"))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("vec_id"), col("nn_id"), col("sim"), (col("sim") >= 0.99).as("is_dup"))
        .orderBy("vec_id")
    })

  val defs: Seq[OpQuery] = Seq(
    exact, ngramJaccard,
    OpQuery("dedup_minhash_lsh", None, (s, d) => minhashLshBuild(s, d)),
    simhash, embedNn)
}
