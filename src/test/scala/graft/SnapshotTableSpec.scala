package graft

import graft.sources.SnapshotTable
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** SnapshotTable DML semantics: copy-on-write MERGE (with partition
  * pruning + manifest carry-over), compaction invariance, history/detail
  * metadata. */
class SnapshotTableSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  private def tmp(p: String) = Files.createTempDirectory(s"graft_$p").toString

  test("merge updates matched keys and inserts new ones") {
    import spark.implicits._
    val base = Seq((1L, "a", 10.0), (2L, "a", 20.0), (3L, "b", 30.0))
      .toDF("k", "p", "v")
    val src = Seq((2L, "a", 99.0), (4L, "b", 40.0)).toDF("k", "p", "v")
    val t = new SnapshotTable(spark, tmp("m"))
      .create(base, Some("p"))
      .merge(src, Seq("k", "p"), Some("p"))
    val got = t.read().orderBy("k").collect().map(r =>
      (r.getLong(0), r.getString(1), r.getDouble(2))).toSeq
    assert(got == Seq((1L, "a", 10.0), (2L, "a", 99.0), (3L, "b", 30.0),
      (4L, "b", 40.0)))
  }

  test("partition-pruned merge carries over untouched partitions by reference") {
    import spark.implicits._
    val base = Seq((1L, "a", 1.0), (2L, "b", 2.0), (3L, "c", 3.0))
      .toDF("k", "p", "v").repartition(3)
    val src = Seq((1L, "a", 9.0)).toDF("k", "p", "v")
    val t = new SnapshotTable(spark, tmp("mp"))
      .create(base, Some("p"))
      .merge(src, Seq("k", "p"), Some("p"))
    // b and c partition files must be the version-0 files (carried over,
    // not rewritten): their paths still point into the c00000 data dir.
    val carried = t.files.filter(e => e.partValue == "b" || e.partValue == "c")
    assert(carried.nonEmpty && carried.forall(_.path.contains("c00000")))
    // carried manifest entries keep their footer row counts
    assert(t.countFromManifest == 3)
    assert(t.read().orderBy("k").collect().map(_.getDouble(2)).toSeq ==
      Seq(9.0, 2.0, 3.0))
  }

  test("mergeDelete removes matched keys and prunes untouched partitions") {
    import spark.implicits._
    val base = Seq((1L, "a", 1.0), (2L, "a", 2.0), (3L, "b", 3.0))
      .toDF("k", "p", "v").repartition(2)
    val del = Seq((2L, "a")).toDF("k", "p")
    val t = new SnapshotTable(spark, tmp("md"))
      .create(base, Some("p"))
      .mergeDelete(del, Seq("k", "p"), Some("p"))
    assert(t.read().orderBy("k").collect().map(_.getLong(0)).toSeq ==
      Seq(1L, 3L))
    // the b partition was not named by the delete source → carried over
    val carried = t.files.filter(_.partValue == "b")
    assert(carried.nonEmpty && carried.forall(_.path.contains("c00000")))
    assert(t.countFromManifest == 2)
    // history records the delete commit
    assert(t.history.orderBy("version").collect().map(_.getString(1)).toSeq
      == Seq("CREATE", "MERGE_DELETE"))
  }

  test("compaction preserves data and resets the file count") {
    val li = Tables.load(spark, sf, "lineitem")
    val t = new SnapshotTable(spark, tmp("c"))
      .create(li.repartition(16))
    val before = t.read().agg(sum("l_quantity")).head().getDouble(0)
    t.compact(2)
    assert(t.files.size == 2)
    assert(t.read().agg(sum("l_quantity")).head().getDouble(0) == before)
    assert(t.countFromManifest == li.count())
  }

  test("history records one commit row per operation in order") {
    import spark.implicits._
    val base = Seq((1L, "a", 1.0), (2L, "b", 2.0)).toDF("k", "p", "v")
    val t = new SnapshotTable(spark, tmp("h"))
      .create(base, Some("p"))
      .merge(Seq((3L, "a", 3.0)).toDF("k", "p", "v"), Seq("k", "p"), Some("p"))
      .compact(1, Some("p"))
    val hist = t.history.collect().map(r =>
      (r.getInt(0), r.getString(1), r.getLong(3))).toSeq
    assert(hist == Seq((0, "CREATE", 2L), (1, "MERGE", 3L), (2, "COMPACT", 3L)))
  }

  test("detail aggregates manifest stats without scanning data") {
    import spark.implicits._
    val t = new SnapshotTable(spark, tmp("d"))
      .create(Seq((1L, 1.0), (2L, 2.0)).toDF("k", "v").repartition(2))
    val row = t.detail.head()
    assert(row.getAs[Int]("version") == 0)
    assert(row.getAs[Long]("num_files") == 2L)
    assert(row.getAs[Long]("num_rows") == 2L)
    assert(row.getAs[Long]("total_bytes") > 0L)
  }
}
