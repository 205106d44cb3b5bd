package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis column builders for the training-data pipeline ops.
  *
  * Everything here is a pure, codegen-friendly composition of Spark
  * built-ins (split/regexp/length + higher-order array functions) — no
  * UDFs, no shuffles: each function is evaluated row-local, so the ops
  * scale embarrassingly-parallel across any number of executors.
  *
  * Functions take the text column as a SQL expression string (usually
  * just the column name) because they compose via `expr(...)` lambdas.
  * The oracle-checked ones use only engine-agnostic arithmetic: integer
  * polynomial hashing, int/int → double division.
  */
object TextFunctions {

  /** Whitespace tokens of the lowercased text (fixtures are
    * single-space separated). */
  def tokens(text: String): Column = split(lower(expr(text)), " ")

  def tokenCount(text: String): Column = size(tokens(text))

  /** Word k-shingles as space-joined strings (k=3 → word trigrams).
    * Guards size<k explicitly: sequence(1,0) would count DOWN in Spark. */
  def shingles(text: String, k: Int): Column = {
    val w = s"split(lower($text), ' ')"
    val joined = (0 until k)
      .map(off => s"element_at($w, i + $off)")
      .mkString("concat_ws(' ', ", ", ", ")")
    expr(
      s"""CASE WHEN size($w) < $k THEN CAST(array() AS ARRAY<STRING>)
         |ELSE transform(sequence(1, size($w) - ${k - 1}), i -> $joined) END""".stripMargin)
  }

  /** Fraction of characters that are not [a-z0-9 ] in the lowered text. */
  def punctRatio(text: String): Column = {
    val t = lower(expr(text))
    (length(t) - length(regexp_replace(t, "[^a-z0-9 ]", ""))) / length(t)
  }

  /** Mean token length assuming single-space separation:
    * (chars - separators) / tokens. Exact int arithmetic → one double
    * division (engine-agnostic). */
  def avgTokenLen(text: String): Column = {
    val n = tokenCount(text)
    (length(expr(text)) - (n - lit(1))) / n
  }

  /** Deterministic rolling polynomial fingerprint over the sanitized
    * text: h = fold(h*31 + code) mod 1e9+7 on [a-z ] codepoints.
    * Pure integer arithmetic — reproducible in any engine (DuckDB:
    * list_reduce over unicode()). */
  def fingerprint(text: String): Column = {
    // split('') turns the sanitized text into a char array in ONE pass —
    // a per-position substr() lambda would re-inline (and re-run) the
    // sanitizing regexp_replace once per character, O(n²).
    val chars = s"filter(split(regexp_replace(lower($text), '[^a-z ]', ''), ''), c -> c <> '')"
    expr(
      s"""aggregate($chars,
         |  CAST(0 AS BIGINT),
         |  (acc, c) -> (acc * 31 + ascii(c)) % 1000000007)""".stripMargin)
  }

  /** Tiny per-language stopword sets for the stopword-ratio language
    * heuristic. Deliberately small and fixed so the oracle can embed
    * the same lists. */
  val stopwords: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "to", "is"),
    "es" -> Seq("el", "la", "de", "y", "que", "en"),
    "de" -> Seq("der", "die", "das", "und", "ist", "ein"),
    "fr" -> Seq("le", "la", "de", "et", "les", "un"),
    "zh" -> Seq("de", "shi", "bu", "le", "ren", "wo"))

  /** Count of tokens of `text` contained in `words`. */
  def stopwordHits(text: String, words: Seq[String]): Column = {
    val arr = words.map(w => s"'$w'").mkString("array(", ", ", ")")
    expr(s"size(filter(split(lower($text), ' '), w -> array_contains($arr, w)))")
  }

  /** Portable 31-polynomial string hash mod 1e9+7 over ALL characters of
    * the expression (unlike [[fingerprint]], no sanitizing): exact integer
    * arithmetic reproducible in any engine (DuckDB: list_reduce over
    * unicode()). The 30-bit range keeps every downstream universal-hash
    * product `a*h+b` (a,h < 1e9+7) inside BIGINT on both engines. */
  def polyHash(strExpr: String): Column =
    expr(
      s"""aggregate(
         |  filter(split($strExpr, ''), c -> c <> ''),
         |  CAST(0 AS BIGINT),
         |  (acc, c) -> (acc * 31 + ascii(c)) % 1000000007)""".stripMargin)

  /** DuckDB mirror of [[polyHash]] for oracle SQL generation. */
  def duckPolyHash(strExpr: String): String =
    s"""list_reduce(
       |  list_prepend(CAST(0 AS BIGINT),
       |    list_transform(
       |      list_filter(string_split($strExpr, ''), c -> c <> ''),
       |      c -> CAST(unicode(c) AS BIGINT))),
       |  (acc, c) -> (acc * 31 + c) % 1000000007)""".stripMargin

  /** 64-bit SimHash over the distinct elements of `featuresExpr` (an
    * array<string> SQL expression — use word shingles, not unigrams:
    * small vocabularies make unigram SimHash non-discriminative).
    * Row-local higher-order-function fold — no shuffle, scales linearly
    * with rows. Not oracle-reproducible (xxhash64 is Spark-specific). */
  def simhash64(featuresExpr: String): Column =
    expr(
      // Single pass: one xxhash64 per feature, 64-wide ±1 accumulator,
      // then a finish lambda assembles the sign bits into one BIGINT.
      s"""aggregate(
         |  transform(array_distinct($featuresExpr), w -> xxhash64(w)),
         |  array_repeat(0, 64),
         |  (acc, h) -> zip_with(acc,
         |                transform(sequence(0, 63),
         |                  b -> IF((shiftright(h, b) & 1) = 1, 1, -1)),
         |                (a, x) -> a + x),
         |  acc -> aggregate(
         |           transform(sequence(0, 63),
         |             b -> IF(element_at(acc, b + 1) > 0, shiftleft(CAST(1 AS BIGINT), b), CAST(0 AS BIGINT))),
         |           CAST(0 AS BIGINT),
         |           (x, y) -> x | y))""".stripMargin)

  /** MinHash signature over `shinglesExpr` (an array<string> SQL
    * expression): per seeded permutation p, min xxhash64(shingle, p).
    * Returns array<bigint> of length `perms`. */
  def minhashSig(shinglesExpr: String, perms: Int): Column =
    expr(
      s"""transform(sequence(0, ${perms - 1}),
         |  p -> array_min(transform(array_distinct($shinglesExpr), s -> xxhash64(s, p))))""".stripMargin)
}
