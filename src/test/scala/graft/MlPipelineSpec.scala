package graft

import org.scalatest.funsuite.AnyFunSuite

/** Invariants of the ML-pipeline composites beyond the oracle hash:
  * the clustering partitions the corpus, the dedup resolution emits a
  * consistent survivor roster, and decontamination tallies conserve the
  * corpus. (Value-level correctness is the DuckDB differential gate.) */
class MlPipelineSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  test("embedding_kmeans partitions the corpus across the 8 seeds") {
    val rows = run("embedding_kmeans").collect()
    val total = Tables.load(spark, sf, "embeddings").count()
    assert(rows.map(_.getLong(1)).sum == total)
    assert(rows.map(_.getLong(0)).toSet.subsetOf((0L until 8L).toSet))
    // every cluster's first member is a real member count lower bound
    assert(rows.forall(r => r.getLong(1) >= 1L && r.getLong(2) >= 0L))
  }

  test("text_quality_classifier scores all docs; zero-token docs are excluded") {
    import org.apache.spark.sql.functions._
    val rows = run("text_quality_classifier").collect()
    val nDocs = Tables.load(spark, sf, "documents").count()
    assert(rows.length == nDocs) // fixture has no zero-token docs
    assert(rows.forall(!_.isNullAt(3))) // every score defined
    // structural pin (not fixture luck): a corpus WITH an all-whitespace
    // doc must omit it — same shape as the oracle's token unnest
    val dir = java.nio.file.Files.createTempDirectory("graft_qc").toString
    import spark.implicits._
    Tables.load(spark, sf, "documents")
      .unionByName(Seq((999999L, "   ", "en", "synthetic", 3L))
        .toDF("doc_id", "text", "lang", "source", "n_chars"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val withEmpty = SparkEntry.queries("text_quality_classifier")(spark, dir)
    assert(withEmpty.filter(col("doc_id") === 999999L).isEmpty)
    assert(withEmpty.count() == nDocs)
  }

  test("text_unigram_logprob scores every document with negative log-prob") {
    val rows = run("text_unigram_logprob").collect()
    val nDocs = Tables.load(spark, sf, "documents").count()
    assert(rows.length == nDocs)
    assert(rows.forall(_.getDouble(2) < 0.0)) // p(w) < 1 for all tokens
    assert(rows.forall(_.getLong(1) > 0L))
  }

  test("dedup_keep_best emits one survivor per cluster, doc_ids unique") {
    val roster = run("dedup_keep_best").collect()
    val ids = roster.map(_.getLong(0))
    assert(ids.distinct.length == ids.length)
    val clusters = roster.map(_.getLong(1))
    assert(clusters.distinct.length == clusters.length)
    // roster size = corpus - clustered + clusters (one kept per cluster)
    val cc = run("dedup_cluster_cc").collect()
    val nDocs = Tables.load(spark, sf, "documents").count()
    val nClusters = cc.map(_.getLong(1)).distinct.length
    assert(roster.length == nDocs - cc.length + nClusters)
    // multi-member rows only for real clusters
    assert(roster.filter(_.getLong(2) > 1L).map(_.getLong(1)).toSet
      .subsetOf(cc.map(_.getLong(1)).toSet))
  }

  test("corpus_seq_pack cuts exact 512-token bins and conserves tokens") {
    import org.apache.spark.sql.functions._
    val bins = run("corpus_seq_pack").collect()
    // bins per source are dense 0..max and every non-final bin is full
    bins.groupBy(_.getString(0)).foreach { case (_, rows) =>
      val sorted = rows.sortBy(_.getLong(1))
      assert(sorted.map(_.getLong(1)).toSeq ==
        (0L until sorted.length.toLong).toSeq)
      assert(sorted.init.forall(_.getLong(3) == 512L),
        "non-final bin not at capacity")
      assert(sorted.last.getLong(3) <= 512L)
    }
    // packing conserves the token stream exactly
    val tokenTotal = Tables.load(spark, sf, "documents")
      .select(size(filter(split(col("text"), " "), x => x =!= ""))
        .cast("long").as("n")).agg(sum("n")).collect()(0).getLong(0)
    assert(bins.map(_.getLong(3)).sum == tokenTotal)
  }

  test("sample_temperature keeps the rarest source whole, rates ~ sqrt") {
    val rows = run("sample_temperature").collect()
    val minRow = rows.minBy(_.getLong(1))
    assert(minRow.getLong(2) == minRow.getLong(1),
      "smallest source must survive whole")
    // realized rate within sampling noise of sqrt(min/n): |kept - n*sqrt(min/n)|
    // < 4*sqrt(n) (deterministic hash, but bound loose on purpose)
    val minN = minRow.getLong(1).toDouble
    rows.foreach { r =>
      val n = r.getLong(1).toDouble
      val expect = n * math.sqrt(minN / n)
      assert(math.abs(r.getLong(2) - expect) < 4 * math.sqrt(n) + 8,
        s"${r.getString(0)}: kept ${r.getLong(2)} vs expected ~$expect")
    }
  }

  test("doc_decontaminate tallies conserve the corpus minus the eval set") {
    val rows = run("doc_decontaminate").collect()
    val corpus = Tables.load(spark, sf, "documents")
      .filter("doc_id >= 5").count()
    assert(rows.map(r => r.getLong(1) + r.getLong(2)).sum == corpus)
    assert(rows.forall(r => r.getLong(1) >= 0L && r.getLong(2) >= 0L))
  }
}
