package graft

import org.apache.hadoop.fs.Path
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The bloom-filter table property must materialize as parquet-native
  * bloom filters in every data file the table writes — on the creating
  * handle AND on a reopened one (the property is persisted, not
  * instance state). Value-level correctness of the probe itself is the
  * `bloom_point_lookup` oracle entry. */
class ParquetBloomSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  /** For each data file under the table root: does column `c` carry a
    * bloom filter? */
  private def bloomPresence(root: String, c: String): Seq[Boolean] = {
    val conf = spark.sessionState.newHadoopConf()
    val fs = new Path(root).getFileSystem(conf)
    val it = fs.listFiles(new Path(root, "data"), true)
    val files = Iterator.continually(it)
      .takeWhile(_.hasNext).map(_.next().getPath)
      .filter(_.getName.endsWith(".parquet")).toSeq
    assert(files.nonEmpty, "no data files written")
    files.map { p =>
      val r = ParquetFileReader.open(HadoopInputFile.fromPath(p, conf))
      try r.getFooter.getBlocks.size() > 0 && {
        val block = r.getFooter.getBlocks.get(0)
        val colOpt = block.getColumns.toArray.map(
          _.asInstanceOf[org.apache.parquet.hadoop.metadata.ColumnChunkMetaData])
          .find(_.getPath.toDotString == c)
        colOpt.exists(m =>
          r.getBloomFilterDataReader(block).readBloomFilter(m) != null)
      } finally r.close()
    }
  }

  test("withBloomFilters writes blooms for the declared column only") {
    val root = Scratch.dir("bloomspec")
    new sources.SnapshotTable(spark, root)
      .withBloomFilters("key")
      .create(sources.Ingest.synthetic(spark, 20000L).repartition(4))
    assert(bloomPresence(root, "key").forall(identity),
      "every file must carry a bloom on key")
    assert(!bloomPresence(root, "value2").exists(identity),
      "no bloom expected on undeclared columns")
  }

  test("the property survives a reopened handle across MERGE") {
    val root = Scratch.dir("bloomspec2")
    val base = sources.Ingest.synthetic(spark, 20000L)
    new sources.SnapshotTable(spark, root)
      .withBloomFilters("key")
      .create(base, partitionBy = Some("partition"))
    // a FRESH handle (no instance state) must keep writing blooms
    val reopened = new sources.SnapshotTable(spark, root)
    reopened.merge(
      sources.Ingest.mergeSource(base, "key",
        updateEveryNth = 100L, insertEveryNth = 200L, insertKeyOffset = 20000L),
      keys = Seq("key", "partition"), partitionBy = Some("partition"))
    assert(bloomPresence(root, "key").forall(identity),
      "merge-written files from a reopened handle must carry blooms")
    // and the probe still answers correctly through the bloom path
    val hits = reopened.read().filter(col("key") === 777L).collect()
    assert(hits.length == 1 && hits(0).getAs[Long]("key") == 777L)
  }
}
