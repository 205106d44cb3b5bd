package graft.operators

import graft.{OpQuery, Tables}
import graft.functions.TextFunctions._
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.IntegerType

/** Text-analysis pipeline ops over the `documents` table: token stats,
  * language identification, quality scoring, document fingerprinting,
  * corpus term frequencies.
  *
  * All per-document computation is row-local (no shuffle); only the
  * corpus-level term-frequency op aggregates, and that is a standard
  * partial-agg groupBy. Everything here holds at 100 TB: the ops scale
  * linearly and shuffle at most (token, count) pairs.
  */
object TextAnalysis {

  // DuckDB mirrors of the Scala column builders (Core.scala conventions:
  // every DuckDB-widened type cast down to Spark's).
  private def duckTokens = "string_split(lower(text), ' ')"
  private def duckClean = "regexp_replace(lower(text), '[^a-z ]', '', 'g')"
  private def duckFp =
    s"""list_reduce(
       |  list_prepend(CAST(0 AS BIGINT),
       |    list_transform(
       |      list_filter(string_split($duckClean, ''), c -> c <> ''),
       |      c -> unicode(c))),
       |  (acc, c) -> (acc * 31 + c) % 1000000007)""".stripMargin

  private val tokenStats = OpQuery(
    "text_token_stats",
    Some(s"""
      SELECT doc_id,
             CAST(len($duckTokens) AS INT) AS n_tokens,
             CAST(length(text) AS INT) AS n_chars,
             (length(text) - (len($duckTokens) - 1)) / len($duckTokens) AS avg_token_len,
             (length(lower(text)) - length(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'))) / length(lower(text)) AS punct_ratio
      FROM documents
      ORDER BY doc_id
    """),
    (s, d) =>
      Tables.load(s, d, "documents").select(
          col("doc_id"),
          tokenCount("text").as("n_tokens"),
          length(col("text")).as("n_chars"),
          avgTokenLen("text").as("avg_token_len"),
          punctRatio("text").as("punct_ratio"))
        .orderBy("doc_id"))

  // Stopword-ratio language heuristic; identical tie-break chain in both
  // engines (ties resolve in list order en,es,de,fr,zh).
  private val langCases: Seq[(String, String)] = stopwords.map { case (lang, words) =>
    val arr = words.map(w => s"'$w'").mkString("[", ", ", "]")
    lang -> s"CAST(len(list_filter($duckTokens, w -> list_contains($arr, w))) AS INT)"
  }
  private val langId = OpQuery(
    "text_language_id", {
      val hits = langCases.map { case (l, e) => s"$e AS hits_$l" }.mkString(",\n             ")
      val langs = stopwords.map(_._1)
      val guess = langs.init.zipWithIndex.map { case (l, i) =>
        val rest = langs.drop(i + 1)
        val bound = if (rest.size > 1) s"GREATEST(${rest.map("hits_" + _).mkString(", ")})"
                    else s"hits_${rest.head}"
        s"WHEN hits_$l >= $bound THEN '$l'"
      }.mkString(" ") + s" ELSE '${langs.last}'"
      Some(s"""
        SELECT doc_id, lang, CASE $guess END AS lang_guess FROM (
          SELECT doc_id, lang,
             $hits
          FROM documents)
        ORDER BY doc_id
      """)
    },
    (s, d) => {
      val langs = stopwords.map(_._1)
      val withHits = stopwords.foldLeft(Tables.load(s, d, "documents")) {
        case (df, (lang, words)) =>
          df.withColumn(s"hits_$lang", stopwordHits("text", words).cast(IntegerType))
      }
      val guess = langs.init.zipWithIndex.foldLeft(when(lit(false), "")) {
        case (acc, (l, i)) =>
          val rest = langs.drop(i + 1).map(r => col(s"hits_$r"))
          val bound = if (rest.size > 1) greatest(rest: _*) else rest.head
          acc.when(col(s"hits_$l") >= bound, l)
      }.otherwise(langs.last)
      withHits.select(col("doc_id"), col("lang"), guess.as("lang_guess"))
        .orderBy("doc_id")
    })

  // Composite quality score from exact int stats; fixed IEEE op order.
  private val qualityExprDuck =
    s"""0.3 * LEAST(1.0, len($duckTokens) / 100.0)
       | + 0.3 * (1.0 - (length(lower(text)) - length(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'))) / length(lower(text)))
       | + 0.2 * LEAST(1.0, ((length(text) - (len($duckTokens) - 1)) / len($duckTokens)) / 8.0)
       | + 0.2 * (CASE WHEN len($duckTokens) BETWEEN 5 AND 2000 THEN 1.0 ELSE 0.0 END)""".stripMargin
  private val quality = OpQuery(
    "text_quality_score",
    Some(s"""
      SELECT doc_id, CAST(len($duckTokens) AS INT) AS n_tokens,
             $qualityExprDuck AS quality
      FROM documents
      ORDER BY doc_id
    """),
    (s, d) =>
      Tables.load(s, d, "documents").select(
          col("doc_id"),
          tokenCount("text").as("n_tokens"),
          (lit(0.3) * least(lit(1.0), tokenCount("text") / 100.0)
            + lit(0.3) * (lit(1.0) - punctRatio("text"))
            + lit(0.2) * least(lit(1.0), avgTokenLen("text") / 8.0)
            + lit(0.2) * when(tokenCount("text").between(5, 2000), 1.0).otherwise(0.0))
            .as("quality"))
        .orderBy("doc_id"))

  private val fingerprintQ = OpQuery(
    "text_fingerprint",
    Some(s"""
      SELECT doc_id, $duckFp AS fp
      FROM documents
      ORDER BY doc_id
    """),
    (s, d) =>
      Tables.load(s, d, "documents")
        .select(col("doc_id"), fingerprint("text").as("fp"))
        .orderBy("doc_id"))

  // Corpus term frequency: explode → partial-agg count → top 20.
  private val topTerms = OpQuery(
    "text_top_terms",
    Some(s"""
      SELECT token, COUNT(*) AS n
      FROM (SELECT unnest($duckTokens) AS token FROM documents)
      GROUP BY token
      ORDER BY n DESC, token
      LIMIT 20
    """),
    (s, d) =>
      Tables.load(s, d, "documents")
        .select(explode(tokens("text")).as("token"))
        .groupBy("token").agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("token"))
        .limit(20))

  // BPE-ish subword token counting: letter runs / digit runs / single
  // punctuation, the shape of GPT-style pre-tokenizers (whitespace-only
  // counting under-estimates token budgets on code/numeric text). The
  // pattern uses only plain character classes so Java (Spark) and RE2
  // (DuckDB) agree. Row-local, zero shuffle.
  private val bpePattern = "[a-z]+|[0-9]+|[^a-z0-9 ]"
  private val tokenizeBpe = OpQuery(
    "text_tokenize_bpe",
    Some(s"""
      SELECT doc_id,
             CAST(len(regexp_extract_all(lower(text), '$bpePattern')) AS INT) AS n_bpe_tokens,
             CAST(len($duckTokens) AS INT) AS n_ws_tokens,
             CAST(len(regexp_extract_all(lower(text), '$bpePattern')) AS DOUBLE)
               / len($duckTokens) AS tokens_per_word
      FROM documents
      ORDER BY doc_id
    """),
    (s, d) =>
      Tables.load(s, d, "documents").select(
          col("doc_id"),
          regexp_count(lower(col("text")), lit(bpePattern)).cast(IntegerType)
            .as("n_bpe_tokens"),
          tokenCount("text").as("n_ws_tokens"),
          (regexp_count(lower(col("text")), lit(bpePattern)).cast("double")
            / tokenCount("text")).as("tokens_per_word"))
        .orderBy("doc_id"))

  // Deterministic train/val/test split via multiplicative hashing of the
  // id — the held-out-split op every training pipeline needs. Pure
  // row-local arithmetic (no rand(), no shuffle except the summary agg),
  // reproducible in any engine.
  private val sampleSplit = OpQuery(
    "sample_split",
    Some("""
      SELECT split, COUNT(*) AS n_docs,
             CAST(SUM(n_chars) AS BIGINT) AS sum_chars
      FROM (SELECT CASE WHEN (doc_id * 2654435761) % 100 < 80 THEN 'train'
                        WHEN (doc_id * 2654435761) % 100 < 90 THEN 'val'
                        ELSE 'test' END AS split,
                   length(text) AS n_chars
            FROM documents)
      GROUP BY split
      ORDER BY split
    """),
    (s, d) => {
      val bucket = (col("doc_id") * 2654435761L) % 100
      Tables.load(s, d, "documents")
        .select(
          when(bucket < 80, "train").when(bucket < 90, "val").otherwise("test")
            .as("split"),
          length(col("text")).as("n_chars"))
        .groupBy("split")
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_chars")).cast("long").as("sum_chars"))
        .orderBy("split")
    })

  // ------------------------------------------------------ TF-IDF TOP-K
  // Per-document top-3 TF-IDF terms. Three partial-agg shuffles — tokens
  // → (doc,term) tf, tf → term df — then a term-keyed join and a per-doc
  // top-k window. df is vocabulary-sized; n_docs is one broadcast
  // scalar. Ranking keys on the ROUNDED score (6 dp) with a term
  // tie-break, so last-ulp ln() differences between engines cannot flip
  // ranks.
  private val tfidf = OpQuery(
    "text_tfidf_topk",
    Some("""
      WITH tok AS (
        SELECT doc_id, unnest(string_split(lower(text), ' ')) AS term
        FROM documents),
      tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM tok GROUP BY 1, 2),
      df AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY 1),
      n AS (SELECT COUNT(*) AS n_docs FROM documents),
      scored AS (
        SELECT t.doc_id, t.term, t.tf,
               ROUND(t.tf * LN(CAST(n.n_docs AS DOUBLE) / d.df), 6) AS score
        FROM tf t JOIN df d USING (term), n),
      ranked AS (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id
                    ORDER BY score DESC, term) AS rnk
        FROM scored)
      SELECT doc_id, CAST(rnk AS INT) AS rnk, term, tf, score
      FROM ranked WHERE rnk <= 3 ORDER BY doc_id, rnk
    """),
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val docs = Tables.load(s, d, "documents")
      val tf = docs
        .select(col("doc_id"), explode(split(lower(col("text")), " ")).as("term"))
        .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
      val df = tf.groupBy("term").agg(count(lit(1)).as("df"))
      val n = docs.agg(count(lit(1)).as("n_docs"))
      val w = Window.partitionBy("doc_id").orderBy(col("score").desc, col("term"))
      tf.join(df, "term").crossJoin(broadcast(n))
        .withColumn("score",
          round(col("tf") * log(col("n_docs").cast("double") / col("df")), 6))
        .withColumn("rnk", row_number().over(w))
        .filter(col("rnk") <= 3)
        .select(col("doc_id"), col("rnk").cast(IntegerType).as("rnk"),
          col("term"), col("tf"), col("score"))
        .orderBy("doc_id", "rnk")
    })

  // --------------------------------------------- TRAINING-CHUNK SPLIT
  // Overlapping fixed-size token windows (size 32, stride 24 → 8-token
  // overlap) — the document→training-sample chunking step of an LLM data
  // pipeline. Entirely row-local: a generator expression per document,
  // no shuffle, linear at any corpus size.
  private val chunkSplit = OpQuery(
    "text_chunk_split",
    Some("""
      WITH t0 AS (
        SELECT doc_id, string_split(lower(text), ' ') AS toks,
               len(string_split(lower(text), ' ')) AS n
        FROM documents),
      ks AS (
        SELECT doc_id, toks,
               unnest(generate_series(0,
                 GREATEST(0, CAST(CEIL((n - 32) / 24.0) AS INT)))) AS chunk_id
        FROM t0)
      SELECT doc_id, CAST(chunk_id AS INT) AS chunk_id,
             CAST(len(list_slice(toks, chunk_id*24 + 1, chunk_id*24 + 32)) AS INT)
               AS n_chunk_tokens,
             array_to_string(list_slice(toks, chunk_id*24 + 1, chunk_id*24 + 32), ' ')
               AS chunk_text
      FROM ks ORDER BY doc_id, chunk_id
    """),
    (s, d) => {
      val toks = split(lower(col("text")), " ")
      val lastChunk = greatest(lit(0),
        ceil((size(col("toks")) - lit(32)).cast("double") / 24.0).cast(IntegerType))
      Tables.load(s, d, "documents")
        .select(col("doc_id"), toks.as("toks"))
        .select(col("doc_id"), col("toks"),
          explode(sequence(lit(0), lastChunk)).as("chunk_id"))
        .select(col("doc_id"), col("chunk_id"),
          slice(col("toks"), col("chunk_id") * 24 + 1, lit(32)).as("chunk"))
        .select(col("doc_id"), col("chunk_id"),
          size(col("chunk")).as("n_chunk_tokens"),
          array_join(col("chunk"), " ").as("chunk_text"))
        .orderBy("doc_id", "chunk_id")
    })

  val defs: Seq[OpQuery] = Seq(
    tokenStats, langId, quality, fingerprintQ, topTerms, tokenizeBpe,
    sampleSplit, tfidf, chunkSplit)
}
