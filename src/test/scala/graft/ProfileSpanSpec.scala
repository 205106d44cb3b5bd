package graft

import org.scalatest.funsuite.AnyFunSuite

/** Edge-case semantics of the round-10 profiling/dedup additions on
  * literal fixtures: duplicated-span coverage must count a shingle as
  * duplicated only when a DIFFERENT document carries it (intra-doc
  * repeats don't count — shingles are distinct per doc before the
  * corpus count), and the one-pass profile must count nulls and exact
  * distincts per column with engine-independent min/max rendering. */
class ProfileSpanSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def stage(write: String => Unit): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_ps").toString
    write(dir)
    dir
  }

  test("dedup_span_coverage counts cross-doc shingles only") {
    import spark.implicits._
    val shared = "alpha beta gamma delta epsilon" // one 5-gram, in docs 1+2
    val dir = stage { d =>
      Seq(
        (1L, s"$shared zeta eta theta iota kappa"), // 6 shingles, 1 shared
        (2L, shared),                               // 1 shingle, shared
        (3L, "one two three four five"),            // unique 5-gram
        // intra-doc repetition: same 5-gram twice inside ONE doc — must
        // NOT count as duplicated (distinct-per-doc before the count)
        (4L, "p q r s t p q r s t"))
        .toDF("doc_id", "text")
        .write.mode("overwrite").parquet(s"$d/documents.parquet")
    }
    val rows = SparkEntry.queries("dedup_span_coverage")(spark, dir)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(rows(1L) == ((6L, 1L, 1.0 / 6)))
    assert(rows(2L) == ((1L, 1L, 1.0)))
    assert(rows(3L)._2 == 0L && rows(3L)._3 == 0.0)
    // doc 4: 10 words -> 6 positional shingles but "p q r s t" windows
    // wrap distinct text; its repeated window dedups to distinct set
    // with zero cross-doc matches
    assert(rows(4L)._2 == 0L)
  }

  test("data_profile counts nulls and exact distincts in one pass") {
    import spark.implicits._
    val ts = java.sql.Timestamp.valueOf("2024-03-01 12:30:45.5")
    val dir = stage { d =>
      Seq(
        (1L, Option(10L), Option("A"), Option(5.0), Option(ts), "P1"),
        (2L, Option(10L), None, Option(7.25), Option(ts), "P2"),
        (3L, None, Option("B"), None, None, "P1"))
        .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
          "o_orderdate", "o_orderpriority")
        .write.mode("overwrite").parquet(s"$d/orders.parquet")
    }
    val rows = SparkEntry.queries("data_profile")(spark, dir)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3), r.getString(4)))).toMap
    assert(rows.size == 6)
    assert(rows("o_orderkey") == ((0L, 3L, "1", "3")))
    assert(rows("o_custkey") == ((1L, 1L, "10", "10")))
    assert(rows("o_orderstatus") == ((1L, 2L, "A", "B")))
    // money renders through DECIMAL(18,2); timestamp through a fixed
    // micros pattern — both engine-independent string forms
    assert(rows("o_totalprice") == ((1L, 2L, "5.00", "7.25")))
    assert(rows("o_orderdate") ==
      ((1L, 1L, "2024-03-01 12:30:45.500000", "2024-03-01 12:30:45.500000")))
    assert(rows("o_orderpriority") == ((0L, 2L, "P1", "P2")))
  }
}
