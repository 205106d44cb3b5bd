package graft

import graft.functions.TextFunctions._
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class TextFunctionsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def one(text: String) = Seq(text).toDF("text")

  test("shingles builds word trigrams") {
    val r = one("a b c d").select(shingles("text", 3).as("s")).head.getSeq[String](0)
    assert(r == Seq("a b c", "b c d"))
  }

  test("shingles shorter than k is empty, not descending-sequence garbage") {
    val r = one("a b").select(shingles("text", 3).as("s")).head.getSeq[String](0)
    assert(r.isEmpty)
  }

  test("fingerprint is the rolling 31-polynomial mod 1e9+7") {
    // "ab" -> (0*31+97)*31+98 = 3105; sanitation lowercases + strips punct
    assert(one("ab").select(fingerprint("text")).head.getLong(0) == 3105L)
    assert(one("A!B?").select(fingerprint("text")).head.getLong(0) == 3105L)
    assert(one("123").select(fingerprint("text")).head.getLong(0) == 0L)
  }

  test("token stats") {
    val df = one("ab cd, ef!").select(
      tokenCount("text").as("n"),
      avgTokenLen("text").as("avg"),
      punctRatio("text").as("punct"))
    val r = df.head
    assert(r.getInt(0) == 3)
    assert(math.abs(r.getDouble(1) - 8.0 / 3) < 1e-12)
    assert(math.abs(r.getDouble(2) - 2.0 / 10) < 1e-12)
  }

  test("stopword hits count tokens in the set") {
    val n = one("the cat and the dog")
      .select(stopwordHits("text", Seq("the", "and"))).head.getInt(0)
    assert(n == 3)
  }

  test("simhash: identical texts collide, near texts are closer than far texts") {
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"
    val near = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda nu"
    val far = "one two three four five six seven eight nine ten eleven twelve"
    val df = Seq(base, base, near, far).toDF("text")
      .withColumn("sh3", shingles("text", 3))
      .select(simhash64("sh3").as("h"))
    val Array(h1, h2, hNear, hFar) = df.collect().map(_.getLong(0))
    assert(h1 == h2)
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(h1, hNear) < ham(h1, hFar))
  }

  test("minhash signature of identical shingle sets is identical") {
    val df = Seq("p q r s t u v w", "p q r s t u v w").toDF("text")
      .withColumn("sh", shingles("text", 3))
      .select(minhashSig("sh", 16).as("sig"))
    val Array(s1, s2) = df.collect().map(_.getSeq[Long](0))
    assert(s1 == s2 && s1.length == 16)
  }
}

class DedupRecallSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.01"

  test("minhash LSH recovers most planted near-duplicate pairs (truth = exact jaccard >= 0.5)") {
    val truth = SparkEntry.queries("dedup_ngram_jaccard")(spark, sf)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val found = SparkEntry.queries("dedup_minhash_lsh")(spark, sf)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(truth.nonEmpty)
    val recall = truth.count(found).toDouble / truth.size
    assert(recall >= 0.6, s"LSH recall $recall over ${truth.size} truth pairs")
  }

  test("simhash pairs overlap planted near-duplicates") {
    val truth = SparkEntry.queries("dedup_ngram_jaccard")(spark, sf)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val found = SparkEntry.queries("dedup_simhash")(spark, sf)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(truth.intersect(found).nonEmpty)
  }

  test("brute-force and LSH similarity search agree on in-bucket neighbors") {
    val brute = SparkEntry.queries("simsearch_topk")(spark, sf)
      .select("probe_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = SparkEntry.queries("simsearch_lsh")(spark, sf)
      .select("probe_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(lsh.nonEmpty)
  }
}
